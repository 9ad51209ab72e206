package graft

import graft.db.VectorDB
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch index-build throughput — the north-star claim that batch
  * indexing fits Spark. Synthesizes N documents, bulk-loads them through
  * the full write path (embed → maxAbs calibration → Q1 pack + Q2 int8 →
  * two-tier parquet write), then measures warm search latency over the
  * built index. The reference's write path is bottlenecked by its embed
  * API (960 docs/request over HTTPS, `BinaryVectorDB.py:104-109`); here
  * embedding is local compute, so the measured rate is the engine's own.
  * Usage: graft.BuildBench [nDocs]
  */
object BuildBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-buildbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Long benches run hundreds of jobs in one JVM; shuffle files and
      // superseded cache blocks free only when the ContextCleaner sees
      // their references GC'd, and the default 30min periodic GC never
      // fires inside a bench run. A 60s floor keeps the on-disk footprint
      // bounded (the pre-fix 1M recall sweep accumulated 60+ GB of dead
      // shuffle files and filled the disk).
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Synthetic corpus: 12 pseudo-tokens per doc from a 500-word vocab.
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(i =>
        concat(lit("tok"), pmod(xxhash64(col("id"), lit(i)), lit(500)))): _*).as("text"))

    val dbDir = Graft.scratchDir("build") + "/db"
    val db = VectorDB.openOrCreate(spark, dbDir)

    val t0 = System.nanoTime()
    db.addDocuments(docs)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val rate = n / buildSec

    // Warm search over the built index (codes cached on first use).
    db.searchVector(Seq.fill(64)(0.1)).collect()
    val times = (1 to 5).map { i =>
      val t = System.nanoTime()
      db.search(s"tok${i * 37} tok${i * 91} tok${i * 13}", k = 10).collect()
      (System.nanoTime() - t) / 1e6
    }
    val medianMs = times.sorted.apply(times.size / 2)

    println(f"""{"metric":"index_build_docs_per_sec","value":$rate%.0f,"unit":"docs/sec","n":$n,"build_sec":$buildSec%.1f,"warm_search_ms":$medianMs%.1f}""")
    spark.stop()
  }
}
