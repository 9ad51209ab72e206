package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** d8 exact-substring dedup (Lee et al. 2022 ExactSubstr shape): exact
  * semantics pinned on a synthetic corpus with PLANTED duplicated spans
  * at different offsets — the fixture run is oracle-gated instead. The
  * hand-computed expectations cover: cross-document duplication at
  * unequal offsets, disjoint multi-span documents, within-document
  * repetition whose two regions are ADJACENT (and must merge into one
  * maximal region), sub-k documents, and the broadcast-gate fallback's
  * output equivalence.
  */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def uniq(doc: Long, n: Int): String =
    (0 until n).map(i => s"u${doc}x$i").mkString(" ")

  // two plants: 5 tokens and 4 tokens (k = 4 below)
  private val plantA = "p1 p2 p3 p4 p5"
  private val plantB = "bb1 bb2 bb3 bb4"

  private def corpus = {
    import spark.implicits._
    Seq(
      // plantA at offset 1, then 5 unique → dup k-gram starts {1,2},
      // one region [1,5]
      (1L, s"$plantA ${uniq(1, 5)}"),
      // plantA at offset 4 (3 unique first) → starts {4,5}, region [4,8]
      (2L, s"${uniq(2, 3)} $plantA ${uniq(2, 2).replace("u2", "v2")}"),
      // all-unique doc: no duplicated gram
      (3L, uniq(3, 8)),
      // sub-k doc: no grams at all, still a row with zeros
      (4L, "short doc"),
      // plantA + 3 unique + plantB → regions [1,5] and [9,12] (gap 3 > 1,
      // stays two spans)
      (5L, s"$plantA ${uniq(5, 3)} $plantB"),
      // plantB carrier → region [1,4]
      (6L, s"$plantB ${uniq(6, 6)}"),
      // plantA TWICE in one doc: regions [1,5] and [6,10] are ADJACENT
      // → must merge into ONE maximal region [1,10]
      (7L, s"$plantA $plantA")
    ).toDF("doc_id", "text")
  }

  test("planted duplicated spans profile exactly (offsets, multi-span, adjacency-merge, sub-k)") {
    graft.functions.Kernels.install(spark)
    val got = Dedup.substringDedupOver(corpus, k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = Map(
      1L -> ((10L, 1L, 5L)),
      2L -> ((10L, 1L, 5L)),
      3L -> ((8L, 0L, 0L)),
      4L -> ((2L, 0L, 0L)),
      5L -> ((12L, 2L, 9L)),
      6L -> ((10L, 1L, 4L)),
      7L -> ((10L, 1L, 10L)))
    assert(got == want, s"got $got")
  }

  test("forcing the shuffle-join fallback reproduces the broadcast-path output bit-for-bit") {
    graft.functions.Kernels.install(spark)
    val bcast = Dedup.substringDedupOver(corpus, k = 4).collect().toSeq
    val shuf = Dedup.substringDedupOver(corpus, k = 4, broadcastMaxFlagged = 0L)
      .collect().toSeq
    assert(bcast == shuf)
  }

  test("a longer k than any document yields all-zero profiles") {
    graft.functions.Kernels.install(spark)
    val got = Dedup.substringDedupOver(corpus, k = 64)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((0L, 0L)))
  }
}
