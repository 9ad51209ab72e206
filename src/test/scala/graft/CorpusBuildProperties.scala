package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Differential fuzz for `Pipeline.corpusBuildOver` — the composed
  * five-stage corpus build against an INDEPENDENT in-JVM model that
  * reimplements each stage from its definition (md5 keep-lowest-id
  * dedup, 3-gram contamination vs the eval source, basis-point mixture
  * rates over survivors, h60 content-hash downsample, 80/10/10 split).
  * The driver's DuckDB oracle gates the fixture corpus; this law covers
  * the edge shapes a fixture never hits: every doc a duplicate, whole
  * sources contaminated away, sources vanishing entirely (rates over a
  * smaller survivor set), sub-3-token docs (no shingles → never
  * contaminated), and cap boundaries.
  */
object CorpusBuildProperties extends Properties("graft.corpusBuild") {

  private lazy val spark = TestSpark.spark

  // each case runs the full composed plan: keep the count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // ---- independent model (no Spark, no engine code) ----
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** first 15 hex chars of md5 as a long — the h60 definition. */
  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  private def shingles3(text: String): Set[String] = {
    val w = text.split(" ", -1)
    if (w.length < 3) Set.empty
    else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  private case class Doc(id: Long, text: String, lang: String, source: String)

  private def model(docs: Seq[Doc], evalSource: String, capBp: Long)
      : Map[(String, String), (Long, Long)] = {
    // 1. exact dedup: keep lowest id per md5(text)
    val kept = docs.groupBy(d => md5hex(d.text)).values.map(_.minBy(_.id)).toSeq
    // 2. contamination: any shared 3-shingle with the eval source
    val evalSg = kept.filter(_.source == evalSource).flatMap(d => shingles3(d.text)).toSet
    val train = kept.filter(d => d.source != evalSource &&
      shingles3(d.text).intersect(evalSg).isEmpty)
    // 3. mixture rates over survivors, round-half-up basis points
    val bySrc = train.groupBy(_.source).view
      .mapValues(_.map(d => d.text.split(" ", -1).length.toLong).sum).toMap
    val t = bySrc.values.sum
    def keepRateBp(s: Long): Long = math.min(10000L, (2 * capBp * t + s) / (2 * s))
    val mixed = train.filter { d =>
      h60(d.text + "#mix") % 10000 < keepRateBp(bySrc(d.source))
    }
    // 4-5. split + recipe
    mixed.groupBy { d =>
      val b = h60(d.text) % 100
      (d.lang, if (b < 80) "train" else if (b < 90) "val" else "test")
    }.view.mapValues { ds =>
      (ds.size.toLong, ds.map(_.text.split(" ", -1).length.toLong).sum)
    }.toMap
  }

  // ---- generator: small corpora rich in duplicates and shared shingles ----
  private val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
  private val genDoc: Gen[(String, String, String)] = for {
    n <- Gen.frequency(1 -> Gen.chooseNum(1, 2), 5 -> Gen.chooseNum(3, 10))
    ws <- Gen.listOfN(n, Gen.oneOf(words))
    lang <- Gen.oneOf("en", "es")
    source <- Gen.oneOf("src0", "src1", "src2")
  } yield (ws.mkString(" "), lang, source)

  private val genCase: Gen[(List[(String, String, String)], Long)] = for {
    nDocs <- Gen.chooseNum(1, 60)
    docs <- Gen.listOfN(nDocs, genDoc)
    capBp <- Gen.oneOf(1000L, 4000L, 10000L)
  } yield (docs, capBp)

  property("composed plan == independent five-stage model, any corpus x cap") =
    forAll(genCase) { case (rows, capBp) =>
      import spark.implicits._
      graft.functions.Kernels.install(spark)
      val docs = rows.zipWithIndex
        .map { case ((text, lang, source), i) => (i.toLong, text, lang, source) }
      val df = docs.toDF("doc_id", "text", "lang", "source")
      val got = graft.operators.Pipeline.corpusBuildOver(df, "src0", capBp)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      val expected = model(
        docs.map { case (id, text, lang, source) => Doc(id, text, lang, source) },
        "src0", capBp)
      got == expected
    }

  /** d7's size gate swaps the physical join (broadcast vs shuffle on
    * the chunk hash) — the two regimes must agree on EVERY corpus, not
    * just the spec's planted fixture (r15 verdict #3's fix, fuzzed).
    */
  property("boilerplate gate regimes agree: broadcast == shuffle fallback, any corpus") =
    forAll(Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n,
      for {
        len <- Gen.frequency(1 -> Gen.chooseNum(1, 7), 4 -> Gen.chooseNum(8, 24))
        ws <- Gen.listOfN(len, Gen.oneOf(words))
      } yield ws.mkString(" ")))) { texts =>
      import spark.implicits._
      graft.functions.Kernels.install(spark)
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def run(gate: Long) = graft.operators.Dedup
        .boilerplateOver(df, window = 8, dfMin = 2, broadcastMaxFlagged = gate)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val out = run(Long.MaxValue) == run(0L)
      graft.operators.Dedup.clearCaches(spark) // release the flagged persists
      out
    }
}
