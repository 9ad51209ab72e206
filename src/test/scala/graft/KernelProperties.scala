package graft

import graft.functions._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property suite (SURVEY §5.2 item 3) over the kernel
  * expressions' eval paths — no SparkSession needed: inputs are built as
  * `GenericArrayData` and evaluated directly, so hundreds of cases run in
  * milliseconds.
  */
object KernelProperties extends Properties("graft.kernels") {

  private val dim = 64
  private val vecGen: Gen[Array[Double]] =
    Gen.containerOfN[Array, Double](dim, Gen.chooseNum(-1.0, 1.0))

  private def arr(v: Array[Double]): ArrayData = new GenericArrayData(v)

  private val packExpr = PackSignBits(Literal.create(null, ArrayType(DoubleType)))
  private def pack(v: Array[Double]): ArrayData =
    packExpr.nullSafeEval(arr(v)).asInstanceOf[ArrayData]

  private val hammingExpr = HammingDistance(
    Literal.create(null, ArrayType(LongType)), Literal.create(null, ArrayType(LongType)))
  private def hamming(a: ArrayData, b: ArrayData): Int =
    hammingExpr.nullSafeEval(a, b).asInstanceOf[Int]

  property("hamming(a,a) == 0") = forAll(vecGen) { v =>
    hamming(pack(v), pack(v)) == 0
  }

  property("hamming symmetry") = forAll(vecGen, vecGen) { (a, b) =>
    hamming(pack(a), pack(b)) == hamming(pack(b), pack(a))
  }

  property("hamming bounds [0, dim]") = forAll(vecGen, vecGen) { (a, b) =>
    val h = hamming(pack(a), pack(b))
    h >= 0 && h <= dim
  }

  property("hamming triangle inequality") = forAll(vecGen, vecGen, vecGen) { (a, b, c) =>
    hamming(pack(a), pack(c)) <= hamming(pack(a), pack(b)) + hamming(pack(b), pack(c))
  }

  property("popcount(pack(v)) == |{i : v_i > 0}|") = forAll(vecGen) { v =>
    val code = pack(v)
    val pop = (0 until code.numElements()).map(i =>
      java.lang.Long.bitCount(code.getLong(i))).sum
    pop == v.count(_ > 0.0)
  }

  property("signDot identity: q·(2b−1) == Σ_{v>0} q − Σ_{v≤0} q") =
    forAll(vecGen, vecGen) { (v, q) =>
      val e = SignDotPacked(
        Literal.create(null, ArrayType(DoubleType)), Literal.create(null, ArrayType(LongType)))
      val got = e.nullSafeEval(arr(q), pack(v)).asInstanceOf[Double]
      val want = v.zip(q).map { case (x, qi) => if (x > 0) qi else -qi }.sum
      math.abs(got - want) < 1e-9
    }

  property("int8 quantization stays in [-127, 127] and fixes maxAbs to ±127") =
    forAll(vecGen.suchThat(_.exists(_ != 0.0))) { v =>
      val ma = v.map(math.abs).max
      val e = QuantizeInt8(
        Literal.create(null, ArrayType(DoubleType)), Literal.create(null, DoubleType))
      val bytes = e.nullSafeEval(arr(v), ma).asInstanceOf[Array[Byte]]
      val inRange = bytes.forall(b => b >= -127 && b <= 127)
      val maxIdx = v.indexWhere(x => math.abs(x) == ma)
      inRange && math.abs(bytes(maxIdx).toInt) == 127
    }

  private val hashListGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, (1L << 60) - 1))

  property("minhash: sig(A ++ B) == elementwise min of sig(A), sig(B)") =
    forAll(hashListGen, hashListGen) { (a, b) =>
      val e = MinHashSig(Literal.create(null, ArrayType(LongType)), 16)
      def sig(xs: List[Long]): Seq[Long] =
        e.nullSafeEval(new GenericArrayData(xs.toArray))
          .asInstanceOf[ArrayData].toLongArray.toSeq
      sig(a ++ b) == sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
    }

  property("minhash values in [0, 2^31)") = forAll(hashListGen) { xs =>
    val e = MinHashSig(Literal.create(null, ArrayType(LongType)), 16)
    e.nullSafeEval(new GenericArrayData(xs.toArray)).asInstanceOf[ArrayData]
      .toLongArray.forall(v => v >= 0 && v < 2147483647L)
  }

  property("h60 matches the hex-string definition and is < 2^60") =
    forAll(Gen.alphaNumStr) { s =>
      val got = Md5Hash60.hash(s.getBytes("UTF-8"))
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      got == java.lang.Long.parseLong(hex.take(15), 16) && got >= 0 && got < (1L << 60)
    }

  property("simhash of a single hash is its low 60 bits") =
    forAll(Gen.chooseNum(0L, (1L << 60) - 1)) { h =>
      val e = SimHash60(Literal.create(null, ArrayType(LongType)))
      e.nullSafeEval(new GenericArrayData(Array(h))).asInstanceOf[Long] ==
        (h & ((1L << 60) - 1))
    }

  // Parameterized bounded top-k heap: for any k and any (score, id)
  // multiset, merging arbitrary partition splits equals the smallest k of
  // the globally sorted input — the partial/final reduction invariant the
  // batched search paths rely on.
  private val topkInputGen = for {
    n <- Gen.chooseNum(0, 60)
    k <- Gen.chooseNum(1, 20)
    rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0, 64), Gen.chooseNum(0L, 50L)))
    split <- Gen.chooseNum(0, n)
  } yield (k, rows, split)

  property("HammingTopKAgg(k): split-merge equals global sort-take(k)") =
    forAll(topkInputGen) { case (k, rows, split) =>
      val agg = HammingTopKAgg(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0, IntegerType, nullable = false),
        org.apache.spark.sql.catalyst.expressions.BoundReference(1, LongType, nullable = false),
        k)
      def heapOf(part: Seq[(Int, Long)]) = {
        val h = agg.createAggregationBuffer()
        part.foreach { case (s, i) =>
          agg.update(h, org.apache.spark.sql.catalyst.InternalRow(s, i)) }
        h
      }
      val (l, r) = rows.splitAt(split)
      val merged = agg.merge(heapOf(l), heapOf(r))
      val got = agg.eval(merged).asInstanceOf[ArrayData]
      val gotPairs = (0 until got.numElements()).map { i =>
        val row = got.getStruct(i, 2)
        (row.getInt(1), row.getLong(0))
      }
      val expected = rows.sorted.take(k).map { case (s, i) => (s, i) }
      gotPairs == expected
    }

  // Double-scored sibling (v4's per-label top-k): split-merge across a
  // serialization round-trip equals global sort by (score desc, id asc)
  // take k. Scores draw from a small quantized set so ties are common and
  // the id tie-break is actually exercised.
  private val scoreTopkGen = for {
    n <- Gen.chooseNum(0, 60)
    k <- Gen.chooseNum(1, 20)
    rows <- Gen.listOfN(n, Gen.zip(
      Gen.chooseNum(0, 16).map(_ / 4.0), Gen.chooseNum(0L, 50L)))
    split <- Gen.chooseNum(0, n)
  } yield (k, rows, split)

  property("ScoreTopKAgg(k): split-serialize-merge equals sort by (score desc, id asc) take(k)") =
    forAll(scoreTopkGen) { case (k, rows, split) =>
      val agg = ScoreTopKAgg(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0, DoubleType, nullable = false),
        org.apache.spark.sql.catalyst.expressions.BoundReference(1, LongType, nullable = false),
        k)
      def heapOf(part: Seq[(Double, Long)]) = {
        val h = agg.createAggregationBuffer()
        part.foreach { case (s, i) =>
          agg.update(h, org.apache.spark.sql.catalyst.InternalRow(s, i)) }
        h
      }
      val (l, r) = rows.splitAt(split)
      val merged = agg.merge(agg.deserialize(agg.serialize(heapOf(l))), heapOf(r))
      val got = agg.eval(merged).asInstanceOf[ArrayData]
      val gotPairs = (0 until got.numElements()).map { i =>
        val row = got.getStruct(i, 2)
        (row.getDouble(1), row.getLong(0))
      }
      val expected = rows.sortBy { case (s, i) => (-s, i) }.take(k)
      gotPairs == expected
    }

  // KMV merge algebra as a law (not just fixture evidence): the kept-set
  // of A ∪ B equals the k smallest distinct values of
  // union(sketch(A), sketch(B)) — the downstream array_union merge
  // `operators.Sketches` runs on EMITTED sketches — and the estimator is
  // exact below k (kept-set size == |distinct| when |distinct| < k).
  private val kmvGen = for {
    k <- Gen.chooseNum(2, 24)
    a <- Gen.listOf(Gen.chooseNum(0L, 100L))
    b <- Gen.listOf(Gen.chooseNum(0L, 100L))
  } yield (k, a, b)

  property("KMV: sketch(A ∪ B) == k-smallest of union(sketch(A), sketch(B)); exact below k") =
    forAll(kmvGen) { case (k, a, b) =>
      val agg = KmvSketchAgg(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0, LongType, nullable = false),
        k)
      def sketchOf(xs: Seq[Long]): Seq[Long] = {
        val buf = agg.createAggregationBuffer()
        xs.foreach(h => agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(h)))
        val out = agg.eval(buf).asInstanceOf[ArrayData]
        out.toLongArray().toSeq
      }
      val direct = sketchOf(a ++ b)
      val merged = (sketchOf(a) ++ sketchOf(b)).distinct.sorted.take(k)
      val unionLaw = direct == merged
      val distinctA = a.distinct.size
      val exactBelowK = distinctA >= k || sketchOf(a).size == distinctA
      unionLaw && exactBelowK
    }

  // Payload-carrying funnel heap (phase I of the single-query funnel):
  // split-serialize-merge equals global sort-take(k) AND each winner's
  // payloads (code, embedding) are exactly the ones ingested with its
  // id — payloads derive deterministically from the id here, so a
  // heap that mixed up payload/row pairing would fail even when the
  // (score, id) ranking is right. Scores draw from a small set so ties
  // are common and the id tie-break is exercised.
  private val candTopkGen = for {
    n <- Gen.chooseNum(0, 60)
    k <- Gen.chooseNum(1, 20)
    rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0, 8), Gen.chooseNum(0L, 50L)))
    split <- Gen.chooseNum(0, n)
  } yield (k, rows, split)

  private def candCode(id: Long): Array[Long] = Array(id * 7919L, ~id)
  private def candEmb(id: Long): Array[Float] = Array(id.toFloat, id * 0.5f, -id.toFloat)

  property("HammingTopKCandAgg(k): split-serialize-merge equals sort-take(k) with payloads intact") =
    forAll(candTopkGen) { case (k, rows, split) =>
      val agg = HammingTopKCandAgg(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0, IntegerType, nullable = false),
        org.apache.spark.sql.catalyst.expressions.BoundReference(1, LongType, nullable = false),
        org.apache.spark.sql.catalyst.expressions.BoundReference(2, ArrayType(LongType, containsNull = false), nullable = false),
        org.apache.spark.sql.catalyst.expressions.BoundReference(3, ArrayType(FloatType, containsNull = false), nullable = false),
        k)
      def heapOf(part: Seq[(Int, Long)]) = {
        val h = agg.createAggregationBuffer()
        part.foreach { case (s, i) =>
          agg.update(h, org.apache.spark.sql.catalyst.InternalRow(
            s, i, new GenericArrayData(candCode(i)), new GenericArrayData(candEmb(i))))
        }
        h
      }
      val (l, r) = rows.splitAt(split)
      val merged = agg.merge(agg.deserialize(agg.serialize(heapOf(l))), heapOf(r))
      val got = agg.eval(merged).asInstanceOf[ArrayData]
      val gotRows = (0 until got.numElements()).map { i =>
        val row = got.getStruct(i, 4)
        (row.getInt(1), row.getLong(0),
          row.getArray(2).toLongArray().toSeq, row.getArray(3).toFloatArray().toSeq)
      }
      val expected = rows.sorted.take(k).map { case (s, i) =>
        (s, i, candCode(i).toSeq, candEmb(i).toSeq) }
      gotRows == expected
    }
}
