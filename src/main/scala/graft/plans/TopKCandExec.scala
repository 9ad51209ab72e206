package graft.plans

import graft.functions.HammingTopKCandAgg
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, NamedExpression, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Planner strategy for the single-query funnel's Phase-I reduction:
  * the UNGROUPED `graft_topk_cand` aggregate over plain attribute
  * children plans as a hand-written primitive-heap physical operator
  * pair instead of `ObjectHashAggregateExec`.
  *
  * Why a custom `SparkPlan`: a `TypedImperativeAggregate` pays, per
  * scanned row, an interpreted `update()` call with boxed
  * `Expression.eval` results and a boxed-tuple priority queue — ~30 ms
  * per query on a 60k-row scan at toy dim, ~4% of the funnel at the
  * reference's 1M×1024 geometry (measured, ROADMAP round-11 notes).
  * The custom exec consumes the codegen'd child's unsafe rows directly
  * (`getInt`/`getLong` ordinal reads, no boxing), keeps the bounded
  * (score, id) heap in primitive parallel arrays, and touches the
  * code/embedding payload columns only on heap acceptance
  * (~k·ln(n/k) rows per partition). Per partition ONE binary state row
  * ships to a single-partition exchange (inserted by
  * `EnsureRequirements` — the final exec demands [[AllTuples]]), where
  * the states merge and emit the aggregate's array<struct> result row —
  * byte-compatible with [[HammingTopKCandAgg]]'s own serialization, so
  * the merge/eval logic is the aggregate's own (one code path to
  * trust).
  *
  * Scale shape is IDENTICAL to the aggregate it replaces: the scan
  * stage reduces to ≤k states per partition, nothing the optimizer does
  * can turn it into a global sort, and the shuffle carries P states of
  * ≤k candidates. Every other aggregate shape — grouped (the
  * multi-query funnel groups by qid), non-attribute children, distinct,
  * filtered — falls through to Spark's own planner unchanged.
  */
object TopKCandStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Aggregate(Nil, Seq(alias @ Alias(ae: AggregateExpression, _)), child, _)
        if ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty &&
          ae.aggregateFunction.isInstanceOf[HammingTopKCandAgg] &&
          ae.aggregateFunction.children.forall(_.isInstanceOf[Attribute]) =>
      val agg = ae.aggregateFunction.asInstanceOf[HammingTopKCandAgg]
      def ordOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
        child.output.indexWhere(_.exprId == e.asInstanceOf[Attribute].exprId)
      val (s, i, c, m) = (ordOf(agg.score), ordOf(agg.id), ordOf(agg.code), ordOf(agg.emb))
      if (s >= 0 && i >= 0 && c >= 0 && m >= 0)
        TopKCandFinalExec(agg, alias.toAttribute,
          TopKCandPartialExec(agg, s, i, c, m, planLater(child))) :: Nil
      else Nil
    case _ => Nil
  }
}

/** Per-partition bounded (score asc, id asc) heap over the child's
  * unsafe rows; emits ONE binary row per partition — the heap state in
  * [[HammingTopKCandAgg]]'s serialization format.
  */
case class TopKCandPartialExec(
    agg: HammingTopKCandAgg,
    scoreOrd: Int, idOrd: Int, codeOrd: Int, embOrd: Int,
    child: SparkPlan) extends UnaryExecNode {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("topk_state", BinaryType, nullable = false)())

  override protected def doExecute(): RDD[InternalRow] = {
    val k = agg.k
    val (sOrd, iOrd, cOrd, eOrd) = (scoreOrd, idOrd, codeOrd, embOrd)
    val aggB = agg // avoid capturing `this` (SparkPlan) in the closure
    child.execute().mapPartitions { it =>
      // parallel-array max-heap on (score, id): root = worst kept
      val hS = new Array[Int](k)
      val hId = new Array[Long](k)
      val hCode = new Array[Array[Long]](k)
      val hEmb = new Array[Array[Float]](k)
      var size = 0

      def swap(a: Int, b: Int): Unit = {
        val ts = hS(a); hS(a) = hS(b); hS(b) = ts
        val ti = hId(a); hId(a) = hId(b); hId(b) = ti
        val tc = hCode(a); hCode(a) = hCode(b); hCode(b) = tc
        val te = hEmb(a); hEmb(a) = hEmb(b); hEmb(b) = te
      }
      def gt(a: Int, bS: Int, bId: Long): Boolean =
        hS(a) > bS || (hS(a) == bS && hId(a) > bId)

      while (it.hasNext) {
        val row = it.next()
        if (!row.isNullAt(sOrd) && !row.isNullAt(iOrd)) {
          val s = row.getInt(sOrd)
          val id = row.getLong(iOrd)
          if (size < k || s < hS(0) || (s == hS(0) && id < hId(0))) {
            if (!row.isNullAt(cOrd) && !row.isNullAt(eOrd)) {
              // payload copy only on acceptance
              val code = row.getArray(cOrd).toLongArray()
              val emb = row.getArray(eOrd).toFloatArray()
              if (size < k) {
                hS(size) = s; hId(size) = id; hCode(size) = code; hEmb(size) = emb
                size += 1
                var j = size - 1
                while (j > 0 && gt(j, hS((j - 1) / 2), hId((j - 1) / 2))) {
                  swap(j, (j - 1) / 2); j = (j - 1) / 2
                }
              } else {
                hS(0) = s; hId(0) = id; hCode(0) = code; hEmb(0) = emb
                var j = 0
                var done = false
                while (!done) {
                  val l = 2 * j + 1; val r = l + 1; var mx = j
                  if (l < size && gt(l, hS(mx), hId(mx))) mx = l
                  if (r < size && gt(r, hS(mx), hId(mx))) mx = r
                  if (mx == j) done = true else { swap(j, mx); j = mx }
                }
              }
            }
          }
        }
      }
      // Ship the state in the aggregate's own wire format (its
      // deserialize/merge/eval run on the final side — one codec).
      val pq = aggB.createAggregationBuffer()
      var j = 0
      while (j < size) { pq.enqueue((hS(j), hId(j), hCode(j), hEmb(j))); j += 1 }
      val proj = UnsafeProjection.create(Array[DataType](BinaryType))
      Iterator.single(proj(InternalRow(aggB.serialize(pq))))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Merges the per-partition heap states (gathered by the AllTuples
  * exchange) through the aggregate's own deserialize/merge and emits
  * its eval row — exactly one output row, even over an empty child.
  */
case class TopKCandFinalExec(
    agg: HammingTopKCandAgg,
    resultAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override val output: Seq[Attribute] = Seq(resultAttr)

  override def requiredChildDistribution: Seq[Distribution] = AllTuples :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val aggB = agg
    child.execute().mapPartitions { it =>
      var buf = aggB.createAggregationBuffer()
      while (it.hasNext) {
        val bytes = it.next().getBinary(0)
        buf = aggB.merge(buf, aggB.deserialize(bytes))
      }
      val proj = UnsafeProjection.create(Array[DataType](aggB.dataType))
      Iterator.single(proj(InternalRow(aggB.eval(buf))))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
