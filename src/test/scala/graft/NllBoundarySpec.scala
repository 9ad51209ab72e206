package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** t9/t10 quantize each per-token cost as `round(1e6·ln(ratio))` on BOTH
  * engines (Spark and the DuckDB oracle), each with its own libm. The
  * integer micro-nat sums are order-independent, but the per-token
  * rounding is not boundary-safe: if some `1e6·ln(ratio)` landed within
  * ~1 ulp of an exact x.5 boundary, a last-ulp libm disagreement would
  * flip one micro-nat and fail the driver hash with no code change
  * (r16 verdict item 4). This sweep enumerates the quantizer's FULL
  * input domain on every fixture SF — the ratios are drawn from the
  * bounded vocab models, so the domain is ≤ 2·(V+1) ratios per SF, not
  * per-corpus-token — and asserts every value keeps a ≥1e-6 margin from
  * the nearest .5 boundary (double ulp at the ~2e7 micro-nat magnitude
  * is ~4e-9, three orders finer). A failure means the fixture/vocab
  * combination became rounding-fragile and the quantizer needs a
  * boundary-guarded form before trusting cross-engine hashes.
  */
class NllBoundarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  /** Distance of 1e6·ln(ratio) from the nearest half-integer rounding
    * boundary.
    */
  private def boundaryMargin(ratio: Double): Double = {
    val v = 1000000.0 * math.log(ratio)
    val frac = v - math.floor(v)
    math.abs(frac - 0.5)
  }

  private def assertFar(ratios: Iterable[Double], what: String, sf: String): Unit = {
    val bad = ratios.map(r => (r, boundaryMargin(r))).filter(_._2 <= 1e-6)
    assert(bad.isEmpty,
      s"$sf $what: ${bad.size} quantizer inputs within 1e-6 of a .5 " +
        s"rounding boundary, first=${bad.headOption}")
  }

  for (sf <- sfDirs) {
    test(s"no micro-nat quantizer input is rounding-fragile at $sf") {
      assume(new java.io.File(s"$sf/documents.parquet").exists(), s"fixture $sf missing")
      val docs = spark.read.parquet(s"$sf/documents.parquet")

      // t9 + t10's unigram/backoff costs: ln(T/c) for c in the vocab
      // counts plus the OOV floor c=1
      val (t, uniVoc) = TextAnalysis.unigramModel(docs, TextAnalysis.UnigramVocab)
      val uniRatios = (uniVoc.map(_._2).toSet + 1L).map(c => t.toDouble / c)
      assertFar(uniRatios, s"unigram T/c (T=$t, ${uniRatios.size} distinct)", sf)

      // t10's conditional costs: ln(c1/c2) per bigram-vocab row (and its
      // own unigram model, identical in distribution to t9's — asserted
      // rather than assumed)
      val (t2, uniVoc2, biVoc) = TextAnalysis.bigramModel(docs, TextAnalysis.UnigramVocab)
      assert(t2 == t, "t10's token total must equal t9's")
      assert(uniVoc2.map(_._2).toSet == uniVoc.map(_._2).toSet,
        "t10's unigram count domain must equal t9's")
      val biRatios = biVoc.map(b => (b.c1, b.c2)).toSet
        .map((p: (Long, Long)) => p._1.toDouble / p._2)
      assertFar(biRatios, s"bigram c1/c2 (${biRatios.size} distinct)", sf)
    }
  }
}
