package graft

import graft.db.VectorDB
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving-latency microbench at the `VectorDB` API level: per-query
  * `searchVector` latency with the default per-call Catalyst plans vs
  * the `enableServing()` regime (the whole funnel as ONE bare RDD job
  * over payload-carrying [[graft.db.PreparedScan]] blocks), plus
  * batched `searchMany` per-query cost. Usage:
  * `graft.ServeBench [nDocs] [dim]` (default 100k × 64; pass dim 1024
  * for the reference's native geometry — 16-long packed codes, 1 KB
  * int8 tier per row).
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val dim = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-servebench")
      .config("spark.sql.shuffle.partitions", cpus)
      // serving config: round-robin tasks across in-flight queries (see
      // ScanBench — FIFO makes queued point-lookup jobs wait out earlier
      // scans' remaining tasks). Needs BOTH the mode flag and the
      // allocation file: the default pool is internally FIFO without it.
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", Graft.fairDefaultPoolFile)
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

    val loadStart = Bench.loadAvg()
    val dir = Graft.scratchDir("servebench")
    val db = VectorDB.openOrCreate(spark, dir, model = s"graft-hash-$dim", dim = dim)
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("synthetic document "), col("id"),
        lit(" topic "), col("id") % 97).as("text"))
    db.addDocuments(docs, new graft.db.HashingEmbedder(dim))
    // Writeback settle between the ingest and every timed section: at
    // 1M×1024 the ingest leaves ~10 GB of parquet writeback draining
    // behind the timings, which contends for memory bandwidth exactly
    // where the phase-1 popcount scan lives (r15 verdict #5 — the
    // serving artifact must carry the settle protocol + its stamps).
    Bench.settleWriteback()

    val queries = (0 until 16).map { s =>
      (0 until dim).map(i => math.sin(i * 0.37 + s) / 8.0)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }

    // warm both paths
    db.searchVector(queries.head, k = 10).collect()
    val plain = queries.map(q => time(db.searchVector(q, k = 10).collect()))
    db.enableServing()
    // the serving build just materialized the packed tier — settle so
    // its allocation/GC churn doesn't bill the first served medians
    Bench.settleWriteback()
    db.searchVector(queries.head, k = 10).collect()
    val served = queries.map(q => time(db.searchVector(q, k = 10).collect()))
    // typed-result serving API: same one-job funnel, no per-query
    // DataFrame wrap (the reference returns a plain hit list too).
    // Per-phase timings ride along (the reference's INFO-logged phase
    // walls, BinaryVectorDB.py:216,232,250) — medians over the batch.
    db.searchHits(queries.head, k = 10)
    val hitsAndPhases = queries.map { q =>
      val ms = time(db.searchHits(q, k = 10))
      (ms, db.lastSearchTimings)
    }
    val hits = hitsAndPhases.map(_._1)
    val phases = hitsAndPhases.flatMap(_._2)
    val (p1, p2, p3) = (median(phases.map(_.phase1Ms)),
      median(phases.map(_.phase2Ms)), median(phases.map(_.phase3Ms)))
    // batched funnel: under serving this is ONE topBMany RDD job + one
    // indexed lookup for the whole 16-query batch (no per-batch Catalyst)
    val qBatch = queries.zipWithIndex.map { case (q, i) => (i.toLong, q) }
    db.searchMany(qBatch, k = 10).collect() // warm
    val batch = median((1 to 3).map(_ =>
      time(db.searchMany(qBatch, k = 10).collect())))

    // 16 independent in-flight searchVector calls (each pays its own
    // per-call planning — the API-level serving regime, unlike
    // ScanBench's prepared-plan pool); median of 3 rounds.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val concRounds = (1 to 3).map { _ =>
      time {
        val futs = queries.map(q =>
          scala.concurrent.Future(db.searchVector(q, k = 10).collect()))
        futs.foreach(f =>
          scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
      } / queries.size
    }
    val hitsConcRounds = (1 to 3).map { _ =>
      time {
        val futs = queries.map(q =>
          scala.concurrent.Future(db.searchHits(q, k = 10)))
        futs.foreach(f =>
          scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
      } / queries.size
    }
    pool.shutdown()

    // Filtered search via compiled selectors, both physical shapes on
    // the same 50%-selectivity predicate: the broadcast sorted array
    // and the file-backed sorted-run index (forced by maxBroadcast=1 —
    // the past-10M-ids scale path, benched here at small scale so the
    // run-probe overhead is visible if it exists). Build cost is the
    // one-off compile; hits cost is the steady-state filtered funnel.
    val selPred = col("doc_id") % 2 === 0
    // settle the heap before the tail section: the preceding rows left
    // collectable garbage whose GC otherwise lands inside these medians
    System.gc()
    var selBc: graft.db.DocSelector = null
    var selFb: graft.db.DocSelector = null
    val selBuildBc = time { selBc = db.selector(selPred) }
    val selBuildFb = time {
      selFb = db.selector(selPred, maxBroadcast = 1, runSize = 8192)
    }
    db.searchHits(queries.head, k = 10, sel = Some(selBc))
    val selHitsBc = queries.map(q =>
      time(db.searchHits(q, k = 10, sel = Some(selBc))))
    db.searchHits(queries.head, k = 10, sel = Some(selFb))
    val selHitsFb = queries.map(q =>
      time(db.searchHits(q, k = 10, sel = Some(selFb))))
    val selMatches = selBc.size
    selBc.release(); selFb.release()

    // Catalog reuse (selectorCached): cold pays the one-off compile;
    // warm is a map hit on the SAME released handle — the per-request
    // service loop the catalog exists for.
    val selCachedPred = col("doc_id") % 2 === 1
    val selCacheCold = time { db.selectorCached(selCachedPred).release() }
    val selCacheWarm = time { db.selectorCached(selCachedPred).release() }
    db.clearSelectorCache()

    // Same contamination stamps as the Bench line (r15 verdict #5): a
    // degraded-device or loaded-box draw must be self-identifying.
    println(f"""{"metric":"serve_latency","n":$n,"dim":$dim,"plain_ms":${median(plain)}%.1f,"serving_ms":${median(served)}%.1f,"hits_ms":${median(hits)}%.1f,"hits_phase1_ms":$p1%.2f,"hits_phase2_ms":$p2%.2f,"hits_phase3_ms":$p3%.2f,"batch16_per_query_ms":${batch / 16}%.1f,"concurrent_per_query_ms":${median(concRounds)}%.1f,"hits_concurrent_per_query_ms":${median(hitsConcRounds)}%.1f,"sel_matches":$selMatches,"sel_build_bc_ms":$selBuildBc%.1f,"sel_build_fb_ms":$selBuildFb%.1f,"sel_hits_bc_ms":${median(selHitsBc)}%.1f,"sel_hits_fb_ms":${median(selHitsFb)}%.1f,"sel_cache_cold_ms":$selCacheCold%.1f,"sel_cache_warm_ms":$selCacheWarm%.1f,"loadavg_start":$loadStart%.2f,"loadavg_end":${Bench.loadAvg()}%.2f,"cpu_probe_ms":${Bench.cpuProbe()}%.2f,"io_probe_ms":${Bench.ioProbe()}%.2f,"dirty_kb":${Bench.dirtyKb()},"unit":"ms"}""")
    spark.stop()
  }
}
