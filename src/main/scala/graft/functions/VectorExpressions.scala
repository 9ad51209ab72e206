package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector kernels the reference engine
  * gets from faiss/numpy (cohere-ai/BinaryVectorDB `BinaryVectorDB.py:211,
  * 221-224,242`; `README.md:132,166`). All hot-path kernels implement
  * `doGenCode` so the exhaustive Phase-I scan and the all-pairs similarity
  * joins stay inside whole-stage codegen — the Spark analogue of the
  * reference's SIMD popcount loop.
  */
object VectorExpressions {

  private[functions] def elemGetter(dt: DataType): String = dt match {
    case FloatType  => "getFloat"
    case DoubleType => "getDouble"
    case LongType   => "getLong"
    case IntegerType => "getInt"
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  private[functions] def numericArrayCheck(name: String, es: Seq[Expression]): TypeCheckResult = {
    val ok = es.forall(_.dataType match {
      case ArrayType(FloatType | DoubleType | LongType | IntegerType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects array<float|double|long|int> arguments, " +
        s"got ${es.map(_.dataType.simpleString).mkString(", ")}")
  }

  /** Read element i of an ArrayData as double, whatever numeric type it is. */
  private[functions] def getAsDouble(a: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType  => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case LongType   => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }
}

/** popcount(xor) over packed bit codes (`array<long>`) — Phase-I hamming.
  * Mirrors faiss `IndexBinaryFlat.search` semantics (reference
  * `BinaryVectorDB.py:211`).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<long>, array<long>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var acc = 0
    while (i < n) { acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |${ev.value} = 0;
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product of two numeric arrays, accumulated in double — the
  * `q @ M.T` kernel (reference `BinaryVectorDB.py:224,242`). Element types
  * may differ (e.g. a double query literal against a float column) —
  * no per-row array cast needed.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.numericArrayCheck(prettyName, Seq(left, right))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  @transient private lazy val leftElem = left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rightElem = right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var acc = 0.0
    while (i < n) {
      acc += VectorExpressions.getAsDouble(x, leftElem, i) *
        VectorExpressions.getAsDouble(y, rightElem, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gl = VectorExpressions.elemGetter(leftElem)
    val gr = VectorExpressions.elemGetter(rightElem)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |${ev.value} = 0.0;
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += (double) $a.$gl($i) * (double) $b.$gr($i);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Phase-II rescore kernel: dot of a float/double query with the ±1
  * expansion of a packed binary code — `q · (2*unpackbits(code) - 1)`
  * (reference `BinaryVectorDB.py:221-224`). Bit layout is MSB-first within
  * each long, matching `np.unpackbits` byte-wise MSB-first order
  * (round-trip tested against `PackSignBits`).
  */
case class SignDotPacked(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val leftOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val rightOk = right.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (leftOk && rightOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float|double>, array<long>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sign_dot"

  @transient private lazy val leftElem = left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val code = b.asInstanceOf[ArrayData]
    val n = math.min(q.numElements(), code.numElements() * 64)
    var j = 0
    var acc = 0.0
    while (j < n) {
      val bit = (code.getLong(j >> 6) >>> (63 - (j & 63))) & 1L
      val qv = VectorExpressions.getAsDouble(q, leftElem, j)
      acc += qv * (2.0 * bit - 1.0)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = VectorExpressions.elemGetter(leftElem)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val bit = ctx.freshName("bit")
      s"""
         |${ev.value} = 0.0;
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements() * 64);
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $bit = ($b.getLong($j >> 6) >>> (63 - ($j & 63))) & 1L;
         |  ${ev.value} += (double) $a.$g($j) * (2.0 * $bit - 1.0);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Q1 quantizer: pack the sign bit of each dimension (bit = 1 iff x > 0)
  * into 64-bit words, MSB-first — same layout the reference's binary
  * embeddings use (`np.unpackbits` convention, `BinaryVectorDB.py:221`;
  * semantics spec `README.md:128-131`). Codegen'd so query-time packing
  * (fixtures store raw floats) doesn't break the Phase-I scan's
  * whole-stage codegen span.
  */
case class PackSignBits(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.numericArrayCheck(prettyName, Seq(child))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pack_bits"

  @transient private lazy val elem = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val words = new Array[Long]((n + 63) / 64)
    var j = 0
    while (j < n) {
      if (VectorExpressions.getAsDouble(x, elem, j) > 0.0)
        words(j >> 6) |= (1L << (63 - (j & 63)))
      j += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = VectorExpressions.elemGetter(elem)
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val words = ctx.freshName("words")
      s"""
         |final int $n = $a.numElements();
         |final long[] $words = new long[($n + 63) / 64];
         |for (int $j = 0; $j < $n; $j++) {
         |  if ((double) $a.$g($j) > 0.0) {
         |    $words[$j >> 6] |= (1L << (63 - ($j & 63)));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Q2 quantizer: linear symmetric int8 — `clip(floor(x * 127 / maxAbs +
  * 0.5), -127, 127)` per dimension, emitted as a compact binary column
  * (1 byte/dim, the layout the reference keeps in RocksDB values,
  * `BinaryVectorDB.py:153`). `right` is the calibration constant maxAbs
  * (driver-computed global max |x|). Build-path: CodegenFallback.
  */
case class QuantizeInt8(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = {
    val leftOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (leftOk && right.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float|double>, double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_int8"

  @transient private lazy val elem = left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val maxAbs = b.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var j = 0
    while (j < n) {
      val v = math.floor(VectorExpressions.getAsDouble(x, elem, j) * 127.0 / maxAbs + 0.5)
      out(j) = math.min(127.0, math.max(-127.0, v)).toByte
      j += 1
    }
    out
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Phase-III rescore kernel: dot of a float/double query with an int8
  * binary column (signed bytes) — `q_float @ emb_int8` (reference
  * `BinaryVectorDB.py:242`). Codegen'd: runs over every candidate row.
  */
case class DotInt8(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val leftOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (leftOk && right.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float|double>, binary), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_int8"

  @transient private lazy val leftElem = left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val bytes = b.asInstanceOf[Array[Byte]]
    val n = math.min(q.numElements(), bytes.length)
    var i = 0
    var acc = 0.0
    while (i < n) {
      acc += VectorExpressions.getAsDouble(q, leftElem, i) * bytes(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = VectorExpressions.elemGetter(leftElem)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |${ev.value} = 0.0;
         |final int $n = java.lang.Math.min($a.numElements(), $b.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += (double) $a.$g($i) * (double) $b[$i];
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm of an int8 binary column — the `np.linalg.norm(axis=1)`
  * denominator of the reference's Phase-III score (`BinaryVectorDB.py:242`;
  * note the reference divides by the DOC norm only, not the query norm).
  */
case class NormInt8(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm_int8"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var i = 0
    var acc = 0.0
    while (i < bytes.length) { val v = bytes(i).toDouble; acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.length; $i++) {
         |  final double $v = (double) $a[$i];
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 60-bit SimHash over an array of (60-bit) token hashes: bit j of the
  * result is 1 iff the sum of votes (+1 when bit j of a token hash is set,
  * −1 otherwise) is positive. 60 bits (not 64) so the value stays
  * non-negative and bit-compatible with the DuckDB oracle's BIGINT
  * arithmetic. Codegen'd: runs once per document over all its shingles.
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<long>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](60)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
         |final int[] $votes = new int[60];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  final long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 60; $j++) {
         |    $votes[$j] += (($h >>> $j) & 1L) == 1L ? 1 : -1;
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $j = 0; $j < 60; $j++) {
         |  if ($votes[$j] > 0) ${ev.value} |= (1L << $j);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 60-bit md5 hash of a UTF-8 string: numerically equal to
  * `conv(substr(md5(s),1,15),16,10)` (the first 15 hex chars as a BIGINT,
  * i.e. big-endian first 8 digest bytes >>> 4) but computed in one digest
  * pass — no hex-string round-trip. DuckDB mirror:
  * `cast(concat('0x', substr(md5(s),1,15)) as bigint)`.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h60"

  override def nullSafeEval(input: Any): Any =
    Md5Hash60.hash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Md5Hash60 {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def hash(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(bytes)
    // big-endian first 8 bytes, top 60 bits (= first 15 hex chars)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** [[Md5Hash60]] applied to every element of an `array<string>` in one
  * call — avoids per-element interpreted-lambda overhead on the hot
  * shingle-hashing path.
  */
case class Md5Hash60Array(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_h60_array"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val out = new Array[Long](a.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = Md5Hash60.hash(a.getUTF8String(i).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature in one pass: for permutation p of `numHashes`,
  * min over the input hashes of `((2p+1)·(h mod M) + p·12582917) mod M`
  * with M = 2^31−1 — the same affine family the DuckDB oracle computes.
  * One Java call per row replaces numHashes × |shingles| interpreted
  * lambda evaluations.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<long>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  private val M = 2147483647L

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < a.numElements()) {
      val base = a.getLong(i) % M
      var p = 0
      while (p < numHashes) {
        val v = ((2L * p + 1L) * base + p * 12582917L) % M
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Q3: offline deterministic text embedder — feature hashing of tokens
  * into `dim` buckets (via [[Md5Hash60]] mod dim), term-frequency counts,
  * L2-normalized, as `array<float>`. Stands in for the reference's
  * network embed API (`BinaryVectorDB.py:109,193` — unavailable
  * zero-egress); correctness tests use precomputed fixture vectors, this
  * is for end-to-end text→search flows only.
  */
case class HashingEmbed(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> (tokens), got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_embed"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val counts = new Array[Double](dim)
    var i = 0
    while (i < toks.numElements()) {
      val b = (Md5Hash60.hash(toks.getUTF8String(i).getBytes) % dim).toInt
      counts(b) += 1.0
      i += 1
    }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += counts(j) * counts(j); j += 1 }
    val inv = if (ss > 0.0) 1.0 / math.sqrt(ss) else 0.0
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) { out(j) = (counts(j) * inv).toFloat; j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word 3-gram shingles of a token array in one pass —
  * semantically identical to the HOF form
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ', w[i],
  * w[i+1], w[i+2])))` and to the DuckDB mirror
  * `list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1,len(w)-1)])`,
  * but without per-shingle interpreted-lambda overhead. One call per row
  * (build path for every dedup operator).
  */
case class Shingle3(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> (tokens), got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle3"

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[ArrayData]
    val n = w.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    var i = 0
    while (i < n - 2) {
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space,
        w.getUTF8String(i), w.getUTF8String(i + 1), w.getUTF8String(i + 2)))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
