package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** t11 per-source quality aggregation: exact semantics pinned on a
  * synthetic corpus with hand-recomputed t2 composites — a high-quality
  * source (all-distinct long docs) must KEEP, a degenerate source
  * (stopword spam) must DROP, and a mixed source's exact-bp statistics
  * must equal the int64 round-half-up recomputation.
  */
class SourceQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The t2 composite in the operator's own int64 form. */
  private def qualityBp(text: String): Long = {
    val w = text.split(" ")
    val n = w.length.toLong
    val k = w.count(Set("the", "a")).toLong
    val d = w.distinct.length.toLong
    val qnum = 2L * math.min(50L, n) * n + 75L * (n - k) + 75L * d
    (20000L * qnum + 250L * n) / (500L * n)
  }

  private def avgBp(qs: Seq[Long]): Long =
    (2L * qs.sum + qs.size) / (2L * qs.size)
  private def shareBp(k: Long, n: Long): Long = (20000L * k + n) / (2L * n)

  test("keep/drop decisions and exact-bp stats match the recomputation") {
    import spark.implicits._
    graft.functions.Kernels.install(spark)
    val good = (0 until 4).map(i =>
      (i.toLong, (0 until 60).map(j => s"g${i}w$j").mkString(" "), "goodsrc"))
    val bad = (0 until 4).map(i =>
      (10L + i, Seq.fill(60)("the").mkString(" "), "badsrc"))
    // mixed: two good docs, two bad → avg straddles, low share = 5000bp
    val mixed = Seq(
      (20L, (0 until 60).map(j => s"m0w$j").mkString(" "), "mixsrc"),
      (21L, (0 until 60).map(j => s"m1w$j").mkString(" "), "mixsrc"),
      (22L, Seq.fill(60)("the").mkString(" "), "mixsrc"),
      (23L, Seq.fill(60)("a").mkString(" "), "mixsrc"))
    val rel = (good ++ bad ++ mixed).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceQualityOver(rel).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap

    def expect(texts: Seq[String]): (Long, Long, Long, Long, Boolean) = {
      val qs = texts.map(qualityBp)
      val a = avgBp(qs)
      val low = shareBp(qs.count(_ < TextAnalysis.SourceLowQualityBp), qs.size)
      (texts.size.toLong, texts.map(_.split(" ").length.toLong).sum, a, low,
        a >= TextAnalysis.SourceKeepMinAvgBp &&
          low <= TextAnalysis.SourceKeepMaxLowShareBp)
    }
    val wantGood = expect(good.map(_._2))
    val wantBad = expect(bad.map(_._2))
    val wantMix = expect(mixed.map(_._2))
    assert(got("goodsrc") == wantGood, s"goodsrc: got ${got("goodsrc")} want $wantGood")
    assert(got("badsrc") == wantBad, s"badsrc: got ${got("badsrc")} want $wantBad")
    assert(got("mixsrc") == wantMix, s"mixsrc: got ${got("mixsrc")} want $wantMix")
    // the thresholds must actually split this corpus
    assert(got("goodsrc")._5 && !got("badsrc")._5,
      "an all-distinct source must keep; a stopword-spam source must drop")
    assert(wantMix._4 == 5000L, "mixed source low share must be exactly 5000bp")
  }
}
