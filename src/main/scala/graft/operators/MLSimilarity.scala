package graft.operators

import graft.functions.Kernels
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib-backed variants of the similarity operators — the unsupervised
  * scale path (BASELINE.json: "MLlib + DataFrame for batch index build").
  * Results depend on MLlib's iterative fitting, so these are smoke/
  * property-checked (rows-only driver check + specs) rather than
  * DuckDB-oracle-matched; the deterministic label-centroid IVF
  * ([[Search.ivfKnn]]) is the oracle-checked twin.
  */
object MLSimilarity {

  /** Fitted index: cell-partitioned layout on disk + centers driver-side,
    * built once per (session, dir, k) — queries only probe and scan.
    */
  private val kmCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int), (String, Array[Array[Double]])]

  /** Drop this session's memoized k-means index entries (the on-disk cell
    * layouts stay; the next query re-fits and rewrites — bench warm
    * passes absorb it).
    */
  def clearCaches(spark: SparkSession): Unit =
    kmCache.filterInPlace { case ((s, _, _), _) => s != spark }

  private def kmeansIndex(spark: SparkSession, dir: String, numCells: Int)
      : (String, Array[Array[Double]]) =
    kmCache.getOrElseUpdate((spark, dir, numCells), {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .withColumn("features", org.apache.spark.ml.functions.array_to_vector(
          col("embedding").cast("array<double>")))
      // A coarse quantizer converges in a few iterations; capping maxIter
      // keeps the one-time fit cheap relative to the scans it prunes.
      val model = new KMeans().setK(numCells).setSeed(42L).setMaxIter(5)
        .setFeaturesCol("features")
        .fit(emb)
      // Shared-FS location (never driver /tmp): executors must be able to
      // read the cell layout on a real cluster.
      val idx = graft.db.IndexStore.dirFor(spark, s"kmivf$numCells", dir)
      model.transform(emb).withColumnRenamed("prediction", "cell")
        .select("vec_id", "embedding", "cell")
        .repartition(col("cell"))
        .write.partitionBy("cell").mode("overwrite").parquet(s"$idx/cells")
      (idx, model.clusterCenters.map(_.toArray))
    })

  /** IVF with learned cells: k-means (fixed seed) fits the coarse
    * quantizer once into a persisted cell-partitioned layout; a query
    * probes the `nprobe` nearest centers driver-side and scans only the
    * probed cells' partitions (source-level pruning, like the
    * deterministic twin `Search.ivfKnn`).
    */
  def kmeansIvfKnn(spark: SparkSession, dir: String, queryVecId: Long = 0,
                   k: Int = 10, numCells: Int = 10, nprobe: Int = 2): DataFrame = {
    Kernels.install(spark)
    val (idx, centers) = kmeansIndex(spark, dir, numCells)

    val q = Search.queryVector(spark, dir, queryVecId)
    def cos(a: Array[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val probed = centers.zipWithIndex.sortBy { case (c, i) => (-cos(c, q), i) }
      .take(nprobe).map(_._2).toSeq

    spark.read.parquet(s"$idx/cells")
      .filter(col("cell").isin(probed: _*))
      .withColumn("score", round(Kernels.cosine(
        col("embedding").cast("array<double>"), typedlit(q)), 4))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
      .select("vec_id", "cell", "score")
  }

  /** The registered v7 form: full probe (nprobe = numCells). Because every
    * vector lives in exactly one cell, scanning all probed cells at
    * nprobe = numCells is EXACT top-k regardless of how the (iterative,
    * MLlib-internal) k-means assigned cells — which makes the learned-cell
    * path DuckDB-oracle-checkable: the oracle is plain exhaustive cosine
    * top-k. The cell-pruned serving configuration (nprobe < numCells) is
    * covered by MLSimilaritySpec's recall/subset properties.
    */
  def kmeansIvfKnnExact(spark: SparkSession, dir: String, queryVecId: Long = 0,
                        k: Int = 10, numCells: Int = 10): DataFrame =
    kmeansIvfKnn(spark, dir, queryVecId, k, numCells, nprobe = numCells)
      .select("vec_id", "score")

  val oracles: Map[String, String] = Map(
    // Exhaustive cosine top-k — the exact result the full-probe IVF must
    // reproduce (cell partitioning covers every vector exactly once).
    "v7_ivf_kmeans" ->
      """WITH qv AS (SELECT embedding e FROM embeddings WHERE vec_id = 0)
        |SELECT v.vec_id,
        |  round(list_dot_product(v.embedding::DOUBLE[], qv.e::DOUBLE[]) /
        |    (sqrt(list_dot_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(qv.e::DOUBLE[], qv.e::DOUBLE[]))), 4) AS score
        |FROM embeddings v, qv
        |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
  )
}
