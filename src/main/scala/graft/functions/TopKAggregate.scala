package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k (score asc, id asc)-smallest
  * (score, id) pairs in a per-partition heap, merged associatively —
  * the partial/final reduction faiss gets from per-thread heaps, as a
  * Catalyst `TypedImperativeAggregate`. With map-side partial
  * aggregation, a multi-query scan scores N×Q rows but shuffles only
  * Q×k heap states; the N×Q relation is never materialized.
  *
  * Output: `array<struct<vec_id:long, score:int>>` sorted by
  * (score asc, vec_id asc).
  */
case class HammingTopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Int, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("score", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = s"graft_topk_hamming"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == IntegerType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (int score, long id), got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  // Max-heap on (score, id): the head is the WORST kept pair, evicted
  // when a better one arrives.
  private def newHeap() =
    scala.collection.mutable.PriorityQueue.empty[(Int, Long)](Ordering.Tuple2[Int, Long])

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Int, Long)] =
    newHeap()

  override def update(
      buf: scala.collection.mutable.PriorityQueue[(Int, Long)],
      input: InternalRow): scala.collection.mutable.PriorityQueue[(Int, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val pair = (s.asInstanceOf[Int], i.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(pair)
      else if (Ordering.Tuple2[Int, Long].lt(pair, buf.head)) {
        buf.dequeue(); buf.enqueue(pair)
      }
    }
    buf
  }

  override def merge(
      a: scala.collection.mutable.PriorityQueue[(Int, Long)],
      b: scala.collection.mutable.PriorityQueue[(Int, Long)])
      : scala.collection.mutable.PriorityQueue[(Int, Long)] = {
    b.foreach { pair =>
      if (a.size < k) a.enqueue(pair)
      else if (Ordering.Tuple2[Int, Long].lt(pair, a.head)) { a.dequeue(); a.enqueue(pair) }
    }
    a
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[(Int, Long)]): Any = {
    val sorted = buf.toArray.sorted(Ordering.Tuple2[Int, Long])
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(i, s).asInstanceOf[Any]
    })
  }

  override def serialize(buf: scala.collection.mutable.PriorityQueue[(Int, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 12)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putInt(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Int, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = newHeap()
    (0 until n).foreach { _ => val s = bb.getInt; val i = bb.getLong; heap.enqueue((s, i)) }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HammingTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HammingTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}
