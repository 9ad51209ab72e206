package graft

import graft.functions.Kernels
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase-I throughput microbench against the reference's headline number:
  * 24 ms to exhaustively hamming-scan 1M × 1024-bit binary embeddings
  * (BASELINE.md / reference README.md:14). Synthesizes N deterministic
  * 1024-bit codes (16 longs from xxhash64), caches them (the hot tier),
  * and times repeated top-100 scans. Usage: graft.ScanBench [nVectors]
  */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scanbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Kernels.install(spark)

    val codes = spark.range(n).select(col("id").as("doc_id"),
        transform(sequence(lit(0), lit(15)), i => xxhash64(col("id"), i)).as("code"))
      .persist(StorageLevel.MEMORY_ONLY)
    codes.count() // materialize the hot tier

    val q = codes.filter(col("doc_id") === n / 2)
      .head().getSeq[Long](1)
    val qLit = typedlit(q)

    def scanOnce(): Double = {
      val t0 = System.nanoTime()
      codes.select(col("doc_id"), Kernels.hamming(col("code"), qLit).as("d"))
        .orderBy(col("d").asc, col("doc_id").asc)
        .limit(100)
        .collect()
      (System.nanoTime() - t0) / 1e6
    }

    val times = (1 to 7).map(_ => scanOnce())
    val median = times.sorted.apply(times.size / 2)
    println(f"array_layout_runs_ms=${times.map(t => f"$t%.1f").mkString(",")}")

    // Flattened layout: 16 primitive long columns — no per-row array
    // object, columnar cache stays primitive, hamming is a codegen'd sum
    // of builtin bit_count(xor) terms.
    val flat = spark.range(n).select(col("id").as("doc_id") +:
        (0 until 16).map(i => xxhash64(col("id"), lit(i)).as(s"c$i")): _*)
      .persist(StorageLevel.MEMORY_ONLY)
    flat.count()
    val qf = flat.filter(col("doc_id") === n / 2).head()
    val hammingFlat = (0 until 16).map(i =>
      bit_count(col(s"c$i").bitwiseXOR(lit(qf.getLong(i + 1))))).reduce(_ + _)
    def scanFlat(): Double = {
      val t0 = System.nanoTime()
      flat.select(col("doc_id"), hammingFlat.as("d"))
        .orderBy(col("d").asc, col("doc_id").asc)
        .limit(100)
        .collect()
      (System.nanoTime() - t0) / 1e6
    }
    val ftimes = (1 to 7).map(_ => scanFlat())
    val fmedian = ftimes.sorted.apply(ftimes.size / 2)
    println(f"flat_layout_runs_ms=${ftimes.map(t => f"$t%.1f").mkString(",")}")

    // Prepared-plan execution floor: scanFlat re-analyzes/optimizes the
    // query each call; a serving layer reuses the resolved plan and pays
    // only execution (collect() re-runs the cached physical plan). The
    // gap between this and the numbers above is pure per-call planning.
    val preparedDf = flat.select(col("doc_id"), hammingFlat.as("d"))
      .orderBy(col("d").asc, col("doc_id").asc)
      .limit(100)
    preparedDf.collect()
    def scanPrepared(): Double = {
      val t0 = System.nanoTime()
      preparedDf.collect()
      (System.nanoTime() - t0) / 1e6
    }
    val ptimes = (1 to 7).map(_ => scanPrepared())
    val pmedian = ptimes.sorted.apply(ptimes.size / 2)
    println(f"prepared_flat_runs_ms=${ptimes.map(t => f"$t%.1f").mkString(",")}")

    // Concurrent queries: the engine's serving model amortizes fixed
    // job-scheduling overhead across in-flight queries (the reference
    // serves one query per 24 ms; Spark overlaps them).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val nConc = 16
    val t0 = System.nanoTime()
    val futs = (1 to nConc).map(_ => scala.concurrent.Future(scanFlat()))
    futs.foreach(f => scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
    val concPerQuery = (System.nanoTime() - t0) / 1e6 / nConc
    pool.shutdown()
    println(f"concurrent_per_query_ms=$concPerQuery%.1f")

    println(f"""{"metric":"phase1_scan_1m_ms","value":$fmedian%.1f,"unit":"ms","n":$n,"array_layout_ms":$median%.1f,"prepared_flat_ms":$pmedian%.1f,"concurrent_per_query_ms":$concPerQuery%.1f,"baseline_ms":24,"note":"reference README.md:14 - 1M x 1024-bit exhaustive hamming"}""")
    spark.stop()
  }
}
