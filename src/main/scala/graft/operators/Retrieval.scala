package graft.operators

import graft.functions.Kernels
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text retrieval: BM25 keyword scoring and hybrid (keyword + vector)
  * search fused by reciprocal-rank fusion — the standard serving pattern a
  * vector store grows into once users want lexical matches alongside
  * embedding similarity (the reference is embedding-only; this is the
  * natural extension of its search surface, SURVEY.md §2.3).
  *
  * Scale shape: document length is carried THROUGH the token explode into
  * the per-(doc, term) aggregate, so scoring never joins back to the
  * corpus — the only corpus-wide work is the one tokenize+filter scan (at
  * an index-backed deployment, the tf relation IS the inverted-index
  * postings for the query terms). The df and corpus-stats relations are
  * one row per term / one row total — broadcast by construction. Everything
  * downstream of the scan is proportional to matching postings, not corpus
  * size.
  *
  * Determinism: tf/df/dl/N are exact integers; the BM25 formula is written
  * with the same decimal literals in both engines so the doubles agree
  * bit-for-bit except for `ln` (≤ 1 ulp apart between libm and the JVM).
  * Two hardening steps make scores engine-independent: (1) the idf is
  * rounded to 9 dp immediately after the `ln`, collapsing the 1-ulp
  * divergence (a flip now needs the true idf within ~1e-16 of a 5e-10
  * boundary); (2) per-term contributions are converted to exact ×10^8
  * fixed-point BIGINTs before the per-doc sum, so Spark's partial-aggregate
  * summation order and DuckDB's sequential order produce the identical
  * integer. Final scores are that integer / 1e8 rounded to 4 dp with
  * doc_id tie-breaks, the same contract every cosine query in [[Search]]
  * uses.
  */
object Retrieval {

  /** Default query terms — high-df corpus keywords (the fixture text is
    * bag-of-keywords sentences; each term appears in most documents).
    */
  val DefaultTerms: Seq[String] = Seq("vector", "stream", "hash")

  /** BM25 with the standard Robertson/Lucene parameters k1=1.2, b=0.75,
    * idf = ln(1 + (N − df + ½)/(df + ½)). Returns the top-k documents by
    * rounded score (ties → doc_id asc): (doc_id, bm25).
    *
    * Shape (r17 optimization, guide §2.3/§2.4): a document's tokens all
    * sit in ONE array cell, so the per-(doc, term) frequency is a per-row
    * `size(filter(w, = term))` — the corpus is never exploded and never
    * shuffled on (doc_id, term) (the old plan's only corpus-sized
    * exchange). The global stats (N, total tokens) and the per-term
    * document frequencies collapse into ONE single-row aggregate that is
    * broadcast back; scoring is then a pure per-row map and the top-k a
    * TakeOrdered. Two corpus scans, ZERO corpus-sized exchanges.
    * Numerically identical to the explode form: the same idf/norm
    * doubles from the same integers, the same ×10^8 fixed-point per-term
    * contributions (a term absent from a doc contributes the same
    * nothing as its missing posting row did), docs matching no term are
    * filtered out exactly as they never had a posting.
    */
  def bm25TopK(spark: SparkSession, dir: String,
               rawTerms: Seq[String] = DefaultTerms, k: Int = 15): DataFrame = {
    require(rawTerms.nonEmpty, "bm25: at least one query term")
    // Distinct query terms (ADVICE r17): the in-row form scores one
    // tf/df column per terms INDEX, so a duplicated entry would
    // contribute twice where the old explode+groupBy(doc_id, term) form
    // counted each distinct term once. The declared query's list is
    // already distinct — this pins the semantics for other callers.
    val terms = rawTerms.distinct
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), Kernels.tokens(col("text")).as("w"))

    // Per-document features, computed in the row: length + one tf column
    // per query term (codegen'd array filter — no explode, no shuffle).
    val feat = d.select(
      col("doc_id") +: col("w") +: size(col("w")).as("dln") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("w"), x => x === lit(t))).cast("double").as(s"tf$i")
        }: _*)

    // ONE row: N, total tokens, and per-term document frequency — the
    // same exact integers the explode form aggregated, in one pass.
    val statsCols = count(lit(1)).cast("double").as("n") +:
      sum(col("dln")).cast("double").as("total") +:
      terms.indices.map(i =>
        sum((col(s"tf$i") > 0).cast("long")).cast("double").as(s"df$i"))
    val stats = feat.agg(statsCols.head, statsCols.tail: _*)

    // Per-term fixed-point contribution; tf = 0 contributes exactly 0,
    // as its absent posting row did in the explode form.
    def contribFp(i: Int): org.apache.spark.sql.Column = {
      val tf = col(s"tf$i")
      val idf = round(
        log(lit(1.0) + (col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5))), 9)
      val norm = tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dln").cast("double") / (col("total") / col("n")))
      round(idf * (tf * lit(2.2)) / norm * lit(1.0e8)).cast("long")
    }

    feat.crossJoin(broadcast(stats))
      // docs matching no query term never had a posting row. The match
      // test is arrays_overlap on the RAW token array — equivalent to
      // Σtfᵢ > 0, but cheap when predicate pushdown clones it below the
      // tf projection (an early-exit membership probe instead of three
      // re-evaluated size(filter(...)) counts; guide §4.4's duplicated-
      // evaluation trap, builtin edition).
      .filter(arrays_overlap(col("w"), array(terms.map(lit): _*)))
      .select(col("doc_id"),
        round(terms.indices.map(contribFp).reduce(_ + _) / lit(1.0e8), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Candidate-list size each retriever contributes to the fusion. */
  val FusionDepth = 20

  /** RRF fusion constant (Cormack et al.'s standard 60). */
  val RrfK = 60

  /** Hybrid search: BM25 top-[[FusionDepth]] and embedding-cosine
    * top-[[FusionDepth]] (query = vec_id 0's embedding, the same query
    * every v-query uses), fused by reciprocal-rank fusion
    * `Σ 1/(60 + rank)` over a full outer join of the two candidate lists.
    * Both rank computations are windows over ≤ [[FusionDepth]] rows (a
    * bounded single-partition sort, the same driver-merge contract as the
    * funnel's candidate phases). Output: top-k by rounded fused score.
    */
  def hybridRrf(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val textRanked = bm25TopK(spark, dir, DefaultTerms, FusionDepth)
      .withColumn("r_text",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id").asc)))
    val vecRanked = Search.knnCosine(spark, dir, queryVecId = 0, k = FusionDepth)
      .select(col("vec_id").as("doc_id"), col("score"))
      .withColumn("r_vec",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))

    def rrf(rank: Column): Column =
      coalesce(lit(1.0) / (lit(RrfK) + rank), lit(0.0))

    textRanked.join(vecRanked, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(rrf(col("r_text")) + rrf(col("r_vec")), 6))
      .select(col("doc_id"), col("r_text"), col("r_vec"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
  }

  private val termList = DefaultTerms.map(t => s"'$t'").mkString(", ")

  /** Shared BM25 CTE chain (scored top-20 list with ranks). */
  private val bm25Cte =
    s"""d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       |stats AS (SELECT count(*)::DOUBLE n, sum(len(w))::DOUBLE total FROM d),
       |tok AS (SELECT doc_id, len(w)::DOUBLE dl, unnest(w) term FROM d),
       |tf AS (SELECT doc_id, term, count(*)::DOUBLE tf, min(dl) dl
       |       FROM tok WHERE term IN ($termList) GROUP BY doc_id, term),
       |df AS (SELECT term, count(*)::DOUBLE df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT tf.doc_id,
       |    round(sum(round(round(ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5)), 9)
       |      * (tf.tf * 2.2)
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / (s.total / s.n)))
       |      * 100000000.0)::BIGINT)::BIGINT / 100000000.0, 4) AS bm25
       |  FROM tf JOIN df USING (term) CROSS JOIN stats s
       |  GROUP BY tf.doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "t6_bm25" ->
      s"""WITH $bm25Cte
         |SELECT doc_id, bm25 FROM scored
         |ORDER BY bm25 DESC, doc_id ASC LIMIT 15""".stripMargin,

    "v10_hybrid_rrf" ->
      s"""WITH $bm25Cte,
         |t20 AS (SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id ASC LIMIT 20),
         |tr AS (SELECT doc_id,
         |         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)::INT r_text FROM t20),
         |vs AS (SELECT vec_id AS doc_id,
         |  round(list_dot_product(embedding::DOUBLE[],
         |      (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]) /
         |    (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
         |     sqrt(list_dot_product((SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[],
         |                           (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]))), 4) AS score
         |  FROM embeddings),
         |v20 AS (SELECT doc_id, score FROM vs ORDER BY score DESC, doc_id ASC LIMIT 20),
         |vr AS (SELECT doc_id,
         |         row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT r_vec FROM v20)
         |SELECT coalesce(tr.doc_id, vr.doc_id) AS doc_id, tr.r_text, vr.r_vec,
         |  round(coalesce(1.0 / (60 + tr.r_text), 0.0)
         |      + coalesce(1.0 / (60 + vr.r_vec), 0.0), 6) AS rrf
         |FROM tr FULL OUTER JOIN vr ON tr.doc_id = vr.doc_id
         |ORDER BY rrf DESC, doc_id ASC LIMIT 10""".stripMargin,
  )
}
