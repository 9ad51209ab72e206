package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface physical-plan audit: every registered query's executed
  * plan is scanned for the operator shapes that silently stop scaling —
  * the regression net for the round-11 funnel finding, where an
  * optimizer rewrite (equal adjacent limits) turned a TakeOrdered
  * phase into a full range-sort exchange of the relation (3.9 GB/query
  * at 1M×1024) without any test noticing.
  *
  * Rules:
  *  - CartesianProduct: never.
  *  - BroadcastNestedLoopJoin: only for the documented tiny-side cross
  *    joins (single-row BM25 stats, the Q-row query batch, the
  *    per-group sketch matrix) — anything new must be justified here.
  *  - Exchange rangepartitioning: only TERMINAL (the deterministic
  *    final orderBy every oracle-compared query ends with. A range
  *    exchange BELOW a join/aggregate/generate/hash-exchange means a
  *    full sort of an interior relation — the funnel bug's signature).
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plan legitimately carries a BroadcastNestedLoopJoin:
    * a cross join against a broadcast relation of one (or #queries /
    * #groups) rows — the scalar-join pattern, constant-size at any
    * corpus scale.
    */
  private val bnljAllowed = Set(
    "t6_bm25",          // crossJoin(broadcast(stats)) — 1 row (n, total)
    "v10_hybrid_rrf",   // inherits t6's stats join
    "v8_multiquery_topk", // emb × broadcast(queries) — Q rows, the batched scan itself
    "s2_kmv_jaccard",   // sketch matrix — #langs rows per side, O(groups²) by design
  )

  test("no registered query plans a cartesian product, an unlisted nested-loop join, or a non-terminal range sort") {
    // Audit the CANONICAL plans: sibling suites memoize relations
    // (packed codes, simhash pair relations) whose displayed cached
    // build plans would otherwise leak their one-time sorts into this
    // scan and make the audit order-dependent.
    Graft.clearAllCaches(spark)
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      val lines = p.linesIterator.toVector
      val rangeIdx = lines.zipWithIndex.collect {
        case (l, i) if l.contains("Exchange rangepartitioning") => i }
      // anything above a range exchange that consumes bulk data means the
      // sort is interior, not the final presentation orderBy
      val interiorRange = rangeIdx.exists { i =>
        lines.take(i).exists(l =>
          l.contains("Join") || l.contains("HashAggregate") ||
            l.contains("Exchange hashpartitioning") || l.contains("Generate"))
      }
      Seq(
        Option.when(p.contains("CartesianProduct"))(s"$name: CartesianProduct"),
        Option.when(p.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))(
          s"$name: unlisted BroadcastNestedLoopJoin"),
        Option.when(interiorRange)(s"$name: interior range-sort exchange"),
      ).flatten
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
