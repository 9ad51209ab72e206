package graft.operators

import graft.functions.Kernels
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the bounded-state scale path for
  * corpus statistics a 100 TB pipeline cannot afford to compute exactly.
  *
  * S1 estimates per-language distinct shingle counts with a KMV sketch
  * ([[graft.functions.KmvSketchAgg]]): each map task contributes at most
  * k = [[KmvK]] longs per group, so the distinct count shuffles
  * O(langs·k) state where exact `countDistinct` shuffles every distinct
  * shingle hash. The query also computes the exact count — feasible at
  * fixture scale — so the driver-checked output carries the sketch, the
  * truth, and the error in one relation (and the oracle proves the SKETCH
  * itself, not just the estimate: the k smallest distinct md5 hashes are
  * a deterministic set, mirrored in SQL by `row_number() OVER (ORDER BY
  * hash) <= k`).
  *
  * Reference scope: no sketches exist in the reference (its only
  * aggregate is the exact count, `BinaryVectorDB/BinaryVectorDB.py:259`);
  * extension operator per SURVEY.md §2.3's scale-path family.
  */
object Sketches {

  /** Sketch size: RSE ~ 1/√(k−2) ≈ 12.7%. */
  val KmvK = 64

  /** 2^60 as an exact double (the h60 hash range). */
  private val HashRange = math.pow(2, 60)

  /** S1: per-language distinct 3-gram shingle count — exact vs KMV
    * estimate. Output: (lang, n_exact, n_est, err_bp) with err_bp the
    * absolute relative error in integer basis points.
    */
  def kmvDistinctShingles(spark: SparkSession, dir: String): DataFrame = {
    Kernels.install(spark)
    val h = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), explode(Kernels.shingles3(col("text"))).as("sg"))
      .select(col("lang"), Kernels.h60(col("sg")).as("h"))
    h.groupBy("lang")
      .agg(countDistinct(col("h")).as("n_exact"),
        Kernels.kmvSketch(col("h"), KmvK).as("sk"))
      .select(col("lang"), col("n_exact"),
        when(col("sk.n_kept") < KmvK, col("sk.n_kept").cast("long"))
          .otherwise(floor(lit((KmvK - 1) * HashRange) / col("sk.kth")).cast("long"))
          .as("n_est"))
      .withColumn("err_bp", expr("(abs(n_est - n_exact) * 10000) div n_exact"))
      .orderBy("lang")
  }

  val oracles: Map[String, String] = Map(
    // The estimator constant (k−1)·2^60 = 63·1152921504606846976 is exact
    // in a double (6-bit mantissa, base-2 exponent); kth→double rounds
    // identically in both engines, so the floored quotient matches.
    "s1_kmv_distinct" ->
      s"""WITH tok AS (SELECT doc_id, lang, string_split(text,' ') w FROM documents),
         |sh AS (SELECT lang,
         |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)]) s
         |  FROM tok),
         |h AS (SELECT DISTINCT lang,
         |  cast(concat('0x', substr(md5(u.sg), 1, 15)) as bigint) hv
         |  FROM sh, unnest(sh.s) u(sg)),
         |r AS (SELECT lang, hv,
         |  row_number() OVER (PARTITION BY lang ORDER BY hv) rn FROM h),
         |sk AS (SELECT lang, count(*)::INT n_kept, max(hv) kth
         |  FROM r WHERE rn <= $KmvK GROUP BY lang),
         |ex AS (SELECT lang, count(*)::BIGINT n_exact FROM h GROUP BY lang),
         |est AS (
         |  SELECT lang, n_exact,
         |    CASE WHEN sk.n_kept < $KmvK THEN sk.n_kept::BIGINT
         |         ELSE floor(${KmvK - 1}.0 * 1152921504606846976.0 / sk.kth)::BIGINT
         |    END AS n_est
         |  FROM ex JOIN sk USING (lang))
         |SELECT lang, n_exact, n_est,
         |  ((abs(n_est - n_exact) * 10000) // n_exact)::BIGINT AS err_bp
         |FROM est ORDER BY lang""".stripMargin,
  )
}
