package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch: keeps the k SMALLEST
  * distinct hash values seen, merged associatively — the classic bounded
  * sketch for approximate COUNT(DISTINCT) (Bar-Yossef et al. 2002; the
  * same estimator family as DataSketches' theta sketch). With map-side
  * partial aggregation each partition contributes at most k longs, so a
  * 100 TB distinct count shuffles O(groups·k) state instead of the
  * distinct values themselves — the scale path Spark's exact
  * `countDistinct` (shuffle all distinct values) doesn't have.
  *
  * Unlike HLL, the KMV state is a deterministic FUNCTION OF THE INPUT SET
  * (the k smallest distinct hashes, no ordering or randomness), so with a
  * deterministic 60-bit hash ([[Md5Hash60]]) the sketch — and the
  * estimate derived from it — is exactly mirrorable in SQL:
  * `row_number() OVER (ORDER BY hash) <= k`. That makes an APPROXIMATE
  * operator oracle-checkable, which faiss/DataSketches-style randomized
  * implementations are not.
  *
  * Output: the kept set itself as a sorted-ascending `array<long>` (at
  * most k values). Emitting the set rather than summary statistics keeps
  * the sketch MERGEABLE downstream of the aggregation: the k smallest of
  * `array_union(sketchA, sketchB)` are exactly the k smallest distinct
  * hashes of A ∪ B, so pre-aggregated sketches compose into union (and,
  * by inclusion–exclusion, intersection/Jaccard) estimates without
  * rescanning the inputs — the distributed-sketch algebra
  * (`operators.Sketches` uses it for the cross-language overlap matrix).
  * The standard estimator from a sketch `s` is
  * `size(s) < k ? size(s) : floor((k−1) · 2^60 / s[k−1])`
  * (exact when fewer than k distinct values exist; relative standard
  * error ~1/√(k−2) otherwise).
  *
  * Reference scope: the reference engine has no sketches (its only
  * aggregate is an exact count, `BinaryVectorDB/BinaryVectorDB.py:259`);
  * this is a scale-path extension operator (SURVEY.md §2.3).
  */
case class KmvSketchAgg(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"kmv: k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv"

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a long hash, got ${hash.dataType.simpleString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last && buf.add(h)) { buf.pollLast(); () }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val h = hash.eval(input)
    if (h != null) offer(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0))
}
