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

/** Bounded top-k aggregate over (double score, long id) pairs: keeps the
  * k LARGEST by (score desc, id asc) in a per-partition heap, merged
  * associatively — the double-scored sibling of [[HammingTopKAgg]] for
  * cosine/BM25-style similarity scores. With map-side partial
  * aggregation a per-group top-k scores every row in the scan stage but
  * shuffles only groups×k heap states — the grouped top-k shape that
  * replaces `row_number().over(Window.partitionBy(group))`, which at
  * low group cardinality degenerates to a full shuffle + sort of the
  * corpus on a handful of keys.
  *
  * Output: `array<struct<vec_id:long, score:double>>` sorted by
  * (score desc, vec_id asc) — best first.
  */
case class ScoreTopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // Orders by (-score, id): its max — the PQ head — is the WORST kept
  // pair (lowest score, then largest id), evicted when a better arrives.
  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (s, i) => (-s, i) }

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (double score, long id), got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Double, Long)] =
    scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)

  private def offer(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      pair: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(pair)
    else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
  }

  override def update(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      a: scala.collection.mutable.PriorityQueue[(Double, Long)],
      b: scala.collection.mutable.PriorityQueue[(Double, Long)])
      : scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sorted(ord) // ascending under ord = best first
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(i, s).asInstanceOf[Any]
    })
  }

  override def serialize(buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    (0 until n).foreach { _ => val s = bb.getDouble; val i = bb.getLong; heap.enqueue((s, i)) }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ScoreTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ScoreTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

/** [[HammingTopKAgg]] with the packed code carried as heap payload:
  * `array<struct<vec_id:long, score:int, code:array<long>>>`. Phase II of
  * a batched funnel reads the candidate codes straight out of the
  * aggregate's output — no join back to the codes relation, so the fused
  * multi-query funnel touches the hot tier exactly once.
  */
case class HammingTopKCodeAgg(
    score: Expression,
    id: Expression,
    code: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long])]] {

  require(k > 0, "k must be positive")

  private implicit val ord: Ordering[(Int, Long, Array[Long])] =
    Ordering.by(t => (t._1, t._2))

  override def children: Seq[Expression] = Seq(score, id, code)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("score", IntegerType, nullable = false),
    StructField("code", ArrayType(LongType, containsNull = false), nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk_code"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == IntegerType && id.dataType == LongType &&
        code.dataType.isInstanceOf[ArrayType] &&
        code.dataType.asInstanceOf[ArrayType].elementType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (int, long, array<long>), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long])] =
    scala.collection.mutable.PriorityQueue.empty[(Int, Long, Array[Long])]

  private def offer(
      buf: scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long])],
      t: (Int, Long, Array[Long])): Unit = {
    if (buf.size < k) buf.enqueue(t)
    else if (t._1 < buf.head._1 || (t._1 == buf.head._1 && t._2 < buf.head._2)) {
      buf.dequeue(); buf.enqueue(t)
    }
  }

  override def update(
      buf: scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long])],
      input: InternalRow): scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long])] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val si = s.asInstanceOf[Int]
      val ii = i.asInstanceOf[Long]
      // Evaluate (and copy) the payload ONLY when the heap will accept
      // this row: acceptances are ~k·ln(n/k) per partition, so the
      // payload column is touched for a vanishing fraction of scanned
      // rows instead of copied n times.
      if (buf.size < k || si < buf.head._1 || (si == buf.head._1 && ii < buf.head._2)) {
        val c = code.eval(input)
        if (c != null)
          // copy the code: the incoming ArrayData may be a reused buffer row
          offer(buf, (si, ii,
            c.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()))
      }
    }
    buf
  }

  override def merge(
      a: scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long])],
      b: scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long])])
      : scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long])] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long])]): Any = {
    val sorted = buf.toArray.sortBy(t => (t._1, t._2))
    new GenericArrayData(sorted.map { case (s, i, c) =>
      InternalRow(i, s, new GenericArrayData(c)).asInstanceOf[Any]
    })
  }

  override def serialize(buf: scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long])]): Array[Byte] = {
    val words = buf.iterator.map(_._3.length).sum
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16 + words * 8)
    bb.putInt(buf.size)
    buf.foreach { case (s, i, c) =>
      bb.putInt(s); bb.putLong(i); bb.putInt(c.length)
      c.foreach(bb.putLong)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long])] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val s = bb.getInt; val i = bb.getLong; val w = bb.getInt
      heap.enqueue((s, i, Array.fill(w)(bb.getLong)))
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HammingTopKCodeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HammingTopKCodeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), code = newChildren(2))
}

/** [[HammingTopKCodeAgg]] with BOTH per-candidate payloads the funnel's
  * later phases need — the packed code (phase II sign-dot) and the float
  * embedding (phase III int8 rescore):
  * `array<struct<vec_id:long, score:int, code:array<long>,
  * embedding:array<float>>>`.
  *
  * This exists so the SINGLE-QUERY Catalyst funnel can express phase I
  * as a bounded aggregation instead of a mid-plan `orderBy().limit()`:
  * the sort-limit formulation is only safe while the planner collapses
  * it to `TakeOrderedAndProject`, and that pattern BREAKS when adjacent
  * phases share a limit (binaryOversample=1 or int8Oversample=1) —
  * Catalyst eliminates the redundant inner sort, pushes the next
  * phase's scoring projection between the limit and the remaining sort,
  * and the planner falls back to a FULL range-sort exchange of the
  * whole relation (3.9 GB/query at 1M×1024-dim, measured; at 100 TB a
  * non-starter). A heap aggregate cannot be rewritten into a global
  * sort: the scan stage reduces to ≤k states per partition no matter
  * what the optimizer does around it. Payloads are evaluated only on
  * heap acceptance (~k·ln(n/k) rows/partition), so the embedding column
  * is copied a vanishing fraction of the scanned rows.
  */
case class HammingTopKCandAgg(
    score: Expression,
    id: Expression,
    code: Expression,
    emb: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long], Array[Float])]] {

  require(k > 0, "k must be positive")

  private implicit val ord: Ordering[(Int, Long, Array[Long], Array[Float])] =
    Ordering.by(t => (t._1, t._2))

  override def children: Seq[Expression] = Seq(score, id, code, emb)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("score", IntegerType, nullable = false),
    StructField("code", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk_cand"

  override def checkInputDataTypes(): TypeCheckResult = {
    def arrOf(e: Expression, t: DataType) = e.dataType match {
      case ArrayType(et, _) => et == t
      case _ => false
    }
    if (score.dataType == IntegerType && id.dataType == LongType &&
        arrOf(code, LongType) && arrOf(emb, FloatType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (int, long, array<long>, array<float>), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long], Array[Float])] =
    scala.collection.mutable.PriorityQueue.empty[(Int, Long, Array[Long], Array[Float])]

  private def offer(
      buf: scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long], Array[Float])],
      t: (Int, Long, Array[Long], Array[Float])): Unit = {
    if (buf.size < k) buf.enqueue(t)
    else if (t._1 < buf.head._1 || (t._1 == buf.head._1 && t._2 < buf.head._2)) {
      buf.dequeue(); buf.enqueue(t)
    }
  }

  override def update(
      buf: scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long], Array[Float])],
      input: InternalRow): scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long], Array[Float])] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val si = s.asInstanceOf[Int]
      val ii = i.asInstanceOf[Long]
      if (buf.size < k || si < buf.head._1 || (si == buf.head._1 && ii < buf.head._2)) {
        val c = code.eval(input)
        val e = emb.eval(input)
        if (c != null && e != null)
          offer(buf, (si, ii,
            c.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray(),
            e.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray()))
      }
    }
    buf
  }

  override def merge(
      a: scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long], Array[Float])],
      b: scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long], Array[Float])])
      : scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long], Array[Float])] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long], Array[Float])]): Any = {
    val sorted = buf.toArray.sortBy(t => (t._1, t._2))
    new GenericArrayData(sorted.map { case (s, i, c, e) =>
      InternalRow(i, s, new GenericArrayData(c), new GenericArrayData(e)).asInstanceOf[Any]
    })
  }

  override def serialize(buf: scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long], Array[Float])]): Array[Byte] = {
    val words = buf.iterator.map(_._3.length).sum
    val floats = buf.iterator.map(_._4.length).sum
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 20 + words * 8 + floats * 4)
    bb.putInt(buf.size)
    buf.foreach { case (s, i, c, e) =>
      bb.putInt(s); bb.putLong(i)
      bb.putInt(c.length); c.foreach(bb.putLong)
      bb.putInt(e.length); e.foreach(bb.putFloat)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Int, Long, Array[Long], Array[Float])] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val s = bb.getInt; val i = bb.getLong
      val w = bb.getInt; val c = Array.fill(w)(bb.getLong)
      val f = bb.getInt; val e = Array.fill(f)(bb.getFloat)
      heap.enqueue((s, i, c, e))
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HammingTopKCandAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HammingTopKCandAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), code = newChildren(2),
      emb = newChildren(3))
}
