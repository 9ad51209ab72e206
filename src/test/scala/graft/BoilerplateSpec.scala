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
}
