package graft

import graft.functions.Kernels
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S1 (KMV distinct sketch) and T7 (repetition filter): the sketch state
  * must be the exact k smallest distinct hashes regardless of layout or
  * duplication, degrade to an exact count below k, and estimate within
  * theory bounds above it; the repetition aggregate must equal a
  * driver-side recomputation from raw text.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def sketch(values: Seq[Long], k: Int, parts: Int = 4): Seq[Long] =
    values.toDF("v").repartition(parts)
      .agg(Kernels.kmvSketch(col("v"), k).as("sk"))
      .head().getSeq[Long](0)

  test("KMV state is the k smallest DISTINCT values sorted asc, duplication- and layout-independent") {
    val vals = Seq(5L, 3L, 9L, 3L, 7L, 1L, 9L, 11L, 2L, 5L)
    // distinct sorted: 1,2,3,5,7,9,11 → 4 smallest = 1,2,3,5
    assert(sketch(vals, k = 4) === Seq(1L, 2L, 3L, 5L))
    assert(sketch(vals, k = 4, parts = 1) === Seq(1L, 2L, 3L, 5L))
    assert(sketch(vals ++ vals ++ vals, k = 4, parts = 7) === Seq(1L, 2L, 3L, 5L))
  }

  test("below k the sketch IS the distinct set (exact path)") {
    assert(sketch(Seq(42L, 17L, 42L, 99L), k = 64) === Seq(17L, 42L, 99L))
  }

  test("estimate is within 5 RSE of truth on 10k uniform hashes") {
    val k = 64
    val n = 10000
    // h60 of distinct strings ~ uniform on [0, 2^60)
    val est = spark.range(n).select(Kernels.h60(concat(lit("kmv#"), col("id"))).as("h"))
      .agg(Kernels.kmvSketch(col("h"), k).as("sk"))
      .select(floor(lit((k - 1) * math.pow(2, 60)) / element_at(col("sk"), k)).cast("long"))
      .head().getLong(0)
    val rse = 1.0 / math.sqrt(k - 2)
    assert(math.abs(est - n) <= 5 * rse * n, s"estimate $est vs $n")
  }

  test("merged sketches equal the sketch of the union (mergeability)") {
    val a = Seq(10L, 20L, 30L, 40L, 50L, 60L)
    val b = Seq(15L, 20L, 35L, 40L, 55L, 70L)
    val k = 4
    val merged = (sketch(a, k) ++ sketch(b, k)).distinct.sorted.take(k)
    assert(merged === sketch(a ++ b, k))
  }

  test("s2 jaccard estimates track exact within sketch error") {
    val rows = graft.operators.Sketches.kmvJaccardLangs(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length === 10) // 5 langs → 10 ordered pairs
    rows.foreach { r =>
      val (ex, est) = (r.getAs[Long]("jaccard_bp"), r.getAs[Long]("jaccard_est_bp"))
      assert(est >= 0 && est <= 10000)
      // inclusion–exclusion compounds three ±12.7%-RSE estimates; allow a
      // generous absolute band (fixture jaccards are 300-1600 bp)
      assert(math.abs(est - ex) <= 2500, s"$r")
    }
  }

  test("kmv rejects non-literal or tiny k") {
    // tiny k: the KmvSketchAgg require(k >= 2) fires at build time
    intercept[Exception] {
      spark.range(5).agg(Kernels.kmvSketch(col("id"), 1)).head()
    }
    // non-literal k: Kernels.litInt rejects a column argument at function
    // build time (the heap arity must be fixed before execution)
    val err = intercept[Exception] {
      spark.range(5).selectExpr("graft_kmv(id, id)").head()
    }
    assert(err.getMessage.contains("must be a literal"), err.getMessage)
  }

  test("s1 query: estimates within 5 RSE, err_bp consistent, exact counts true") {
    val rows = graft.operators.Sketches.kmvDistinctShingles(spark, dir).collect()
    assert(rows.nonEmpty)
    val rse = 1.0 / math.sqrt(graft.operators.Sketches.KmvK - 2)
    rows.foreach { r =>
      val (ex, est, err) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_est"),
        r.getAs[Long]("err_bp"))
      assert(math.abs(est - ex) <= 5 * rse * ex, s"$r")
      assert(err === math.abs(est - ex) * 10000 / ex)
    }
    // truth: exact distinct shingles per lang recomputed independently
    val truth = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), explode(Kernels.shingles3(col("text"))).as("sg"))
      .groupBy("lang").agg(countDistinct("sg").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_exact")).toMap == truth)
  }

  test("sketch-only s1/s2 entry points reproduce the registered queries' estimates") {
    import graft.operators.Sketches
    // n_est from the sketch-only path ≡ the registered s1's n_est column
    val s1 = Sketches.kmvDistinctShingles(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_est")).toMap
    val s1sketch = Sketches.kmvDistinctShinglesSketch(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_est")).toMap
    assert(s1sketch == s1)
    // jaccard_est_bp from sketch algebra alone ≡ the registered s2 column
    val s2 = Sketches.kmvJaccardLangs(spark, dir).collect()
      .map(r => (r.getAs[String]("lang_a"), r.getAs[String]("lang_b")) ->
        r.getAs[Long]("jaccard_est_bp")).toMap
    val s2sketch = Sketches.kmvJaccardLangsSketch(spark, dir).collect()
      .map(r => (r.getAs[String]("lang_a"), r.getAs[String]("lang_b")) ->
        r.getAs[Long]("jaccard_est_bp")).toMap
    assert(s2sketch == s2)
  }

  test("kmvOverlapMatrix defines the overlap of empty sketches as 0 (no divide-by-zero)") {
    import graft.operators.Sketches
    // Two groups whose hash columns are entirely NULL keep nothing in
    // their sketches: est_u = 0 and the bp ratio must be 0, not an
    // ANSI divide-by-zero (or a silent NULL).
    val empty = Seq(("a", None: Option[Long]), ("b", None: Option[Long]))
      .toDF("lang", "h")
    val sk = Sketches.kmvDistinctSketch(empty, "lang", "h")
    val row = Sketches.kmvOverlapMatrix(sk).collect()
    assert(row.length === 1)
    assert(row.head.getAs[Long]("jaccard_est_bp") === 0L)
    assert(row.head.getAs[Long]("est_u") === 0L)
  }

  test("sketch-only plans have no exact side: no countDistinct shuffle, no raw self-join") {
    import graft.operators.Sketches
    // s1 sketch-only: exactly ONE aggregate pair (partial+final) over the
    // scan — the KMV heap — and no distinct-hash expansion.
    val p1 = Sketches.kmvDistinctShinglesSketch(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!p1.toLowerCase.contains("distinct"), s"exact side leaked into s1 sketch path:\n$p1")
    // s2 sketch-only: no distinct-hash set anywhere, and every join input
    // is an AGGREGATED per-group sketch relation — the raw (lang, hash)
    // rows never feed a join directly (the exact side's self-join shape).
    val s2df = Sketches.kmvJaccardLangsSketch(spark, dir)
    val p2 = s2df.queryExecution.optimizedPlan
    assert(!p2.toString.toLowerCase.contains("distinct"),
      s"exact side leaked into s2 sketch path:\n$p2")
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
    def hasAggBarrier(p: LogicalPlan): Boolean =
      p.isInstanceOf[Aggregate] || p.children.exists(hasAggBarrier)
    p2.collect { case j: Join => j }.foreach { j =>
      assert(j.children.forall(hasAggBarrier),
        s"join over un-aggregated raw data in s2 sketch path:\n$p2")
    }
  }

  test("t7 repetition aggregate equals a driver-side recomputation") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("text")))
    val perDoc = docs.map { case (lang, text) =>
      val counts = text.split(" ").groupBy(identity).map(_._2.length)
      val n = counts.sum.toLong
      val mx = counts.max.toLong
      val dup = counts.filter(_ >= 2).sum.toLong
      val topBp = (20000 * mx + n) / (2 * n)
      (lang, topBp, dup, n)
    }
    val expected = perDoc.groupBy(_._1).map { case (lang, rs) =>
      val nDocs = rs.length.toLong
      val nRep = rs.count(_._2 >= graft.operators.TextAnalysis.RepetitiveTopTokenBp).toLong
      val sbp = rs.map(_._2).sum
      val dups = rs.map(_._3).sum
      val toks = rs.map(_._4).sum
      lang -> (nDocs, nRep, (2 * sbp + nDocs) / (2 * nDocs),
        (20000 * dups + toks) / (2 * toks))
    }
    val got = graft.operators.TextAnalysis.repetitionFilter(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_repetitive"), r.getAs[Long]("avg_top_tok_bp"),
        r.getAs[Long]("dup_token_share_bp"))).toMap
    assert(got == expected)
    // the flag separates mass: both classes present at fixture scale
    val (totRep, totDocs) = (got.values.map(_._2).sum, got.values.map(_._1).sum)
    assert(totRep > 0 && totRep < totDocs)
  }
}
