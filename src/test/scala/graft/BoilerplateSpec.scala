package graft

import org.scalatest.funsuite.AnyFunSuite

/** d7 repeated-chunk (boilerplate) profile: exact semantics pinned on a
  * synthetic corpus with a planted boilerplate chunk (the fixture run
  * is oracle-gated instead — its near-duplicate documents carry
  * NATURAL repeated chunks, so a hand-computed expectation there would
  * just re-implement the operator).
  */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def uniq(doc: Long, n: Int): String =
    (0 until n).map(i => s"u${doc}x$i").mkString(" ")

  test("planted boilerplate flags on every carrier; unique and sub-window text never flags") {
    import spark.implicits._
    graft.functions.Kernels.install(spark)
    val plant = "terms of service all rights reserved legal footer" // 8 tokens
    val rows = Seq(
      // three carriers: plant + 8 unique tokens -> 2 chunks, 1 boiler
      (1L, s"$plant ${uniq(1, 8)}"),
      (2L, s"$plant ${uniq(2, 8)}"),
      (3L, s"$plant ${uniq(3, 8)}"),
      // a doc repeating the plant TWICE: df counts DISTINCT docs, both
      // of its chunk instances flag
      (4L, s"$plant $plant"),
      // unique 16-token doc: 2 chunks, 0 boiler
      (5L, uniq(5, 16)),
      // 20 tokens: the 4-token remainder is DROPPED (min-length rule)
      (6L, uniq(6, 20)),
      // sub-window doc: no row at all
      (7L, "too short to chunk")
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.boilerplateOver(rows, window = 8, dfMin = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((2L, 1L)), 2L -> ((2L, 1L)), 3L -> ((2L, 1L)),
      4L -> ((2L, 2L)),
      5L -> ((2L, 0L)), 6L -> ((2L, 0L))), s"got $got")

    // below the df threshold nothing flags: same corpus, dfMin above
    // the carrier count
    val none = graft.operators.Dedup.boilerplateOver(rows, window = 8, dfMin = 5)
      .collect().map(_.getLong(2)).sum
    assert(none == 0L, s"dfMin above the carrier count must flag nothing, got $none")
  }

  test("the flagged set rides a broadcast join — the chunk relation never shuffles on the chunk hash") {
    val plan = graft.operators.Dedup
      .boilerplateChunks(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"boilerplate flags must broadcast (hot-chunk skew guard):\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"an h-partitioned merge join re-creates the hot-chunk skew:\n$plan")
  }

  test("a flagged set over the gate falls back to a shuffle join with identical output") {
    import spark.implicits._
    graft.functions.Kernels.install(spark)
    // 40 documents sharing a planted chunk plus per-doc unique text:
    // the flagged set (1 row) "exceeds" a forced gate of 0, exercising
    // the exact over-threshold decision a template-heavy 100TB crawl
    // would hit with the default 4M-row ceiling (r15 verdict #3 — the
    // unguarded broadcast hint bypassed autoBroadcastJoinThreshold).
    val plant = "click here to accept cookies and continue reading"
    val rows = (0L until 40L)
      .map(i => (i, s"$plant ${uniq(i, 8)}")).toDF("doc_id", "text")
    // With auto-broadcast DISABLED, the plan shape shows exactly what
    // the OPERATOR decided: a planted hint still broadcasts; no hint
    // (over the gate) shuffles. At fixture scale Catalyst would
    // otherwise auto-broadcast the tiny un-hinted side and mask the
    // gate's decision. (At the real over-threshold scale the flagged
    // relation exceeds autoBroadcastJoinThreshold on size alone.)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val (broadcasted, fallback) =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val b = graft.operators.Dedup.boilerplateOver(rows, window = 8, dfMin = 3)
        val f = graft.operators.Dedup.boilerplateOver(rows, window = 8, dfMin = 3,
          broadcastMaxFlagged = 0L)
        val planB = b.queryExecution.executedPlan.toString
        val planF = f.queryExecution.executedPlan.toString
        assert(planB.contains("BroadcastHashJoin"), s"under the gate: broadcast\n$planB")
        assert(!planF.contains("BroadcastHashJoin"),
          s"over the gate no broadcast hint may survive:\n$planF")
        assert(planF.contains("SortMergeJoin") || planF.contains("ShuffledHashJoin"),
          s"over the gate: shuffle join on h expected\n$planF")
        (b, f)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    val a = broadcasted.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = fallback.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.sameElements(b), "gate regimes must agree on every row")
    assert(a.forall { case (_, n, boiler) => n == 2L && boiler == 1L },
      s"every doc: 2 chunks, 1 planted boiler — got ${a.take(3).mkString(",")}")
  }
}
