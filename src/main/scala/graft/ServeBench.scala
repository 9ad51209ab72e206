package graft

import graft.db.VectorDB
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving-latency microbench at the `VectorDB` API level: per-query
  * `searchVector` latency with the default Catalyst phase-III path vs
  * the [[graft.db.PointLookupIndex]] serving path (`enableServing()`),
  * plus batched `searchMany` per-query cost. Usage:
  * `graft.ServeBench [nDocs]` (default 100k).
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-servebench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft-servebench").toString
    val db = VectorDB.openOrCreate(spark, dir)
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("synthetic document "), col("id"),
        lit(" topic "), col("id") % 97).as("text"))
    db.addDocuments(docs)

    val queries = (0 until 16).map { s =>
      (0 until 64).map(i => math.sin(i * 0.37 + s) / 8.0)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }

    // warm both paths
    db.searchVector(queries.head, k = 10).collect()
    val plain = queries.map(q => time(db.searchVector(q, k = 10).collect()))
    db.enableServing()
    db.searchVector(queries.head, k = 10).collect()
    val served = queries.map(q => time(db.searchVector(q, k = 10).collect()))
    val batch = time(db.searchMany(
      queries.zipWithIndex.map { case (q, i) => (i.toLong, q) }, k = 10).collect())

    println(f"""{"metric":"serve_latency","n":$n,"plain_ms":${median(plain)}%.1f,"serving_ms":${median(served)}%.1f,"batch16_per_query_ms":${batch / 16}%.1f,"unit":"ms"}""")
    spark.stop()
  }
}
