package graft

import graft.db.VectorDB
import graft.streaming.StreamingIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Long-horizon soak of the continuous-crawl loop
  * ([[StreamingIngest.continuousDedupedUpsert]]): drive N micro-batches
  * through the self-referential dedup-then-upsert path and record how
  * per-batch latency moves as the landed corpus grows N×.
  *
  * Two series, reported as first-quartile vs last-quartile medians:
  *  - `commit_ms` — [[VectorDB.addDocuments]] alone on a commit-only MOR
  *    DB fed the same batches (no dedup): isolates the MOR delta-commit
  *    cost, which must stay O(batch) — FLAT as the corpus grows (the
  *    reference's add-to-existing write path is the same contract,
  *    BinaryVectorDB/BinaryVectorDB.py:67-115).
  *  - `loop_ms` — the full streaming pass (incremental simhash dedup
  *    against everything landed so far + commit), run through ONE
  *    long-lived [[graft.streaming.StreamingIngest.CrawlLoop]] so the
  *    corpus-side simhash state carries across batches: per-batch text
  *    processing is O(batch); what grows with the corpus is only the
  *    banded join's scan of the ~24 B/doc state (parallelizes on a
  *    cluster) and its localCheckpoint fold.
  *
  * The first `warmup` batches are EXCLUDED from the first-quartile
  * window: JVM/codegen warmup inflates early samples, which would bias
  * the late/early ratio *downward* and flatter the flatness claim.
  *
  * Usage: graft.SoakBench [nBatches] [batchSize]
  */
object SoakBench {
  def main(args: Array[String]): Unit = {
    val nBatches = if (args.nonEmpty) args(0).toInt else 100
    val batchSize = if (args.length > 1) args(1).toInt else 200
    val warmup = 5
    require(nBatches >= 4 * warmup, s"need >= ${4 * warmup} batches for quartiles")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-soakbench")
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
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def freshDir(tag: String): String = {
      val d = java.nio.file.Files.createTempDirectory(s"graftsoak$tag").toFile
      d.delete(); d.getAbsolutePath
    }
    val loopDb = VectorDB.openOrCreate(spark, freshDir("loop"),
      storage = VectorDB.StorageMor)
    val commitDb = VectorDB.openOrCreate(spark, freshDir("commit"),
      storage = VectorDB.StorageMor)

    // pairwise-distinct token vocabularies — no accidental near-dups;
    // each batch re-sends the previous batch's last doc (an
    // at-least-once overlap the loop must self-match, not re-land).
    def text(id: Long): String = (0 until 12).map(j => s"w${id}x$j").mkString(" ")
    val compactEvery = 16

    // ONE long-lived CrawlLoop handle: the corpus-side simhash state
    // carries across the soak's waves exactly as it does across the
    // micro-batches of a single long-running stream — per-batch text
    // processing is O(batch), the state fold is a ~24 B/doc union.
    val loop = StreamingIngest.crawlLoop(loopDb, compactEvery = compactEvery)
    val loopMs = new Array[Double](nBatches)
    val commitMs = new Array[Double](nBatches)
    var pendingMax = 0
    // Pin a repeatable-read snapshot on the commit-only DB once warm
    // and hold it across every subsequent compaction: the soak then
    // exercises compaction-under-pins end to end — folds must proceed
    // (read amplification stays bounded for LIVE readers), the pinned
    // view must stay frozen, and the retained-generation count is the
    // disk overhead of the reader window plus the open pin.
    var pinned: graft.db.Snapshot = null
    var pinnedCount = -1L
    var retiredMax = 0
    // Same contract on the LOOP DB, whose folds are triggered by the
    // CrawlLoop's own compactEvery knob (not this harness): the
    // knob-driven auto-compaction must also proceed under an open pin
    // and leave the pinned view frozen.
    var loopPinned: graft.db.Snapshot = null
    var loopPinnedCount = -1L
    // Serve the commit-only DB throughout, with the INCREMENTAL refresh
    // on: every batch's first post-commit search pays the lazy refresh —
    // a chain extension (O(batch)) between folds, a full rebuild right
    // after each harness compaction. The soak records that series plus
    // the chain-depth ceiling (bounded by the compaction cadence).
    val qVec = {
      graft.functions.Kernels.install(spark)
      val e = new graft.db.HashingEmbedder()
      spark.range(1).select(
        e.embed(org.apache.spark.sql.functions.lit(text(0))).cast("array<double>"))
        .head().getSeq[Double](0)
    }
    val serveMs = new Array[Double](nBatches)
    var chainDepthMax = 0
    var serveRebuilds = 0
    var prevDepth = 0
    (0 until nBatches).foreach { b =>
      val fresh = (0 until batchSize).map(i => (b.toLong * batchSize + i,
        text(b.toLong * batchSize + i)))
      val replay =
        if (b > 0) Seq((b.toLong * batchSize - 1, text(b.toLong * batchSize - 1)))
        else Seq.empty
      val batch = fresh ++ replay

      val in = MemoryStream[(Long, String)]
      in.addData(batch: _*)
      val t0 = System.nanoTime()
      loop.stream(in.toDF().toDF("doc_id", "text")).stop()
      loopMs(b) = (System.nanoTime() - t0) / 1e6

      val t1 = System.nanoTime()
      commitDb.addDocuments(fresh.toDF("doc_id", "text"))
      commitMs(b) = (System.nanoTime() - t1) / 1e6
      if (b == warmup) {
        pinned = commitDb.snapshot()
        pinnedCount = pinned.count()
        loopPinned = loopDb.snapshot()
        loopPinnedCount = loopPinned.count()
        commitDb.incrementalServing().enableServing()
      }
      if (b >= warmup) {
        val t2 = System.nanoTime()
        commitDb.searchHits(qVec, k = 10)
        serveMs(b) = (System.nanoTime() - t2) / 1e6
        val depth = commitDb.servingChainForTest.map(_.depth).getOrElse(0)
        chainDepthMax = math.max(chainDepthMax, depth)
        if (depth < prevDepth) serveRebuilds += 1
        prevDepth = depth
      }
      if (loopPinned != null)
        require(loopPinned.count() == loopPinnedCount,
          s"loop pin moved under knob-triggered compaction: " +
            s"${loopPinned.count()} != $loopPinnedCount")
      if (commitDb.pendingDeltas() >= compactEvery) {
        commitDb.compact()
        if (pinned != null) {
          retiredMax = math.max(retiredMax, commitDb.retainedMorGenerations())
          require(pinned.count() == pinnedCount,
            s"pinned view moved under compaction: ${pinned.count()} != $pinnedCount")
        }
      }

      pendingMax = math.max(pendingMax, loopDb.pendingDeltas())
      if ((b + 1) % 10 == 0)
        println(f"[soak] batch ${b + 1}/$nBatches loop=${loopMs(b)}%.0fms " +
          f"commit=${commitMs(b)}%.0fms landed=${loopDb.count()}")
    }

    require(loopDb.count() == nBatches.toLong * batchSize,
      s"replay re-landed or a fresh doc was wrongly flagged: " +
        s"${loopDb.count()} != ${nBatches.toLong * batchSize}")
    require(pendingMax < compactEvery,
      s"compaction not bounding read amplification: $pendingMax deltas pending")

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    val q = (nBatches - warmup) / 4
    val commitQ1 = median(commitMs.slice(warmup, warmup + q).toSeq)
    val commitQ4 = median(commitMs.takeRight(q).toSeq)
    val loopQ1 = median(loopMs.slice(warmup, warmup + q).toSeq)
    val loopQ4 = median(loopMs.takeRight(q).toSeq)
    val commitRatio = commitQ4 / commitQ1
    val flat = commitRatio < 2.0

    val serveQ1 = median(serveMs.slice(warmup + 1, warmup + 1 + q).toSeq)
    val serveQ4 = median(serveMs.takeRight(q).toSeq)
    val serveRatio = serveQ4 / serveQ1

    val pinStable = pinned != null && pinned.count() == pinnedCount
    if (pinned != null) pinned.close()
    val loopPinStable = loopPinned != null && loopPinned.count() == loopPinnedCount
    if (loopPinned != null) loopPinned.close()
    commitDb.disableServing()
    val retiredAfterClose = commitDb.retainedMorGenerations()

    println(f"""{"metric":"soak_commit_flatness","n_batches":$nBatches,"batch_size":$batchSize,"commit_ms_q1_median":$commitQ1%.1f,"commit_ms_q4_median":$commitQ4%.1f,"commit_ratio":$commitRatio%.2f,"commit_flat":$flat,"loop_ms_q1_median":$loopQ1%.1f,"loop_ms_q4_median":$loopQ4%.1f,"serve_refresh_ms_q1_median":$serveQ1%.1f,"serve_refresh_ms_q4_median":$serveQ4%.1f,"serve_refresh_ratio":$serveRatio%.2f,"serve_chain_depth_max":$chainDepthMax,"serve_full_rebuilds":$serveRebuilds,"final_count":${loopDb.count()},"pending_deltas_max":$pendingMax,"pin_count":$pinnedCount,"pin_stable":$pinStable,"loop_pin_stable":$loopPinStable,"loop_compact_every":$compactEvery,"retained_gens_max":$retiredMax,"retained_gens_after_close":$retiredAfterClose,"unit":"ms","note":"MOR delta commits must stay O(batch) as the corpus grows (commit_ratio ~ 1); loop_ms includes the incremental dedup whose corpus side is a linear scan locally and parallelizes on a cluster; serve_refresh_ms is the first post-commit search on the served commit-only DB with incrementalServing on -- a chain extension per batch, a full rebuild after each compaction fold (serve_full_rebuilds counts them; chain depth stays bounded by the compaction cadence); the pin_ fields hold a repeatable-read snapshot open across every compaction -- folds proceed, the pinned view stays frozen, retained generations stay bounded (steady state 1 = the {current, previous} reader window) and pin-held file sets free at close"}""")
    spark.stop()
  }
}
