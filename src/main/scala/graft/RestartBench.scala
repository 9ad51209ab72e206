package graft

import graft.db.{IndexStrategies, VectorDB}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving-tier RESTART walls (MOR + incremental serving + NSW): what a
  * process that died and came back pays to serve again, at each rung of
  * the persistence ladder this engine builds —
  *
  *   - `cold_build`: the first serve-enable ever (codes⋈docs join +
  *     block assembly + per-block graph construction + `_nav`/`_blocks`
  *     persist) — the wall every restart paid before r13/r14;
  *   - `warm_same_version`: restart with NO commits while down — the
  *     current version's persisted blocks stream back, pure IO
  *     ([[graft.db.PreparedScan.loadPersisted]], r14);
  *   - `warm_chain_restart`: restart AFTER commits — the commit-time
  *     sweep retained the newest persisted build as a seed, and the
  *     fresh instance chain-extends it with just the missed commit
  *     windows (`VectorDB.tryWarmChainRestart`, r14) — block IO +
  *     O(missed batches);
  *   - `cold_restart_no_seed`: the same state with the seed deleted —
  *     the without-the-feature baseline the row above is measured
  *     against.
  *
  * Same-JVM fresh instances stand in for the restarted process (the
  * BlockCache reference counts hit zero on disable, so the loads are
  * real file reads; the OS page cache makes them a FAVORABLE bound vs a
  * true cold host — stated, not hidden).
  *
  * Usage: `graft.RestartBench [nDocs] [dim] [nQueries] [nBlocks]`
  * (default 4M × 1024 × 20 × 4 — the 4M true-geometry grid's shape).
  * Prints one JSON line.
  */
object RestartBench {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 4000000L
    val dim = if (args.length > 1) args(1).toInt else 1024
    val nQueries = if (args.length > 2) args(2).toInt else 20
    val nBlocks = if (args.length > 3) args(3).toInt else 4
    val clusters = 100
    val intrinsicDim = 8
    val sigma = 0.5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-restartbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", Graft.fairDefaultPoolFile)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    class SynthEmbedder(val dim: Int) extends graft.db.Embedder {
      override def embed(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
        val gen = RecallBench.pointGen(dim, clusters, intrinsicDim, sigma)
        val genUdf = udf { id: Long => gen(id)._1 }
        genUdf(text.cast("long")).cast("array<float>")
      }
    }
    val embedder = new SynthEmbedder(dim)

    def docsRange(lo: Long, hi: Long) =
      spark.range(lo, hi).select(col("id").as("doc_id"),
        col("id").cast("string").as("text")).repartition(nBlocks)
    val ingestChunk = 2000000L // caps the per-batch embed spill (GraphBench)

    val qGen = RecallBench.pointGen(dim, clusters, intrinsicDim, sigma)
    val qids = (0 until nQueries).map(i => i.toLong * (n / nQueries) + i)
    val queries = qids.map(id => id -> qGen(id)._1.map(_.toDouble).toSeq).toMap

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    /** (median hits wall, median Phase-I scan-job wall) — the delta is
      * the job floor + phases II/III + anything pathological (GC,
      * recompute), which is what separates a slow scan from a slow
      * everything-else when a restart row's queries read high.
      */
    def hitsMs(db: VectorDB): (Double, Double) = {
      db.searchHits(queries(qids.head), k = 10) // warm
      val (ts, p1s) = qids.map { q =>
        val ms = time(db.searchHits(queries(q), k = 10))
        (ms, db.lastSearchTimings.map(_.phase1Ms).getOrElse(-1.0))
      }.unzip
      (median(ts), median(p1s))
    }

    // SPARK_GRAFT_DROP_CACHES=1: drop the OS page cache before each
    // restart row (needs root; fails soft). Turns the stated
    // "favorable IO bound" caveat into a measured true-cold-host row:
    // block/nav reads then hit the device (~350 MB/s on this box's
    // virtio disk — dd-measured), not memory.
    val dropCaches = sys.env.get("SPARK_GRAFT_DROP_CACHES").contains("1")
    var cachesDropped = true
    def maybeDropCaches(): Unit = if (dropCaches) {
      try {
        // sync FIRST: drop_caches only evicts CLEAN pages, and the
        // block/nav/manifest files a restart row is about to re-read
        // were written moments ago — without the sync their dirty pages
        // survive the drop and the row stamps page_cache_dropped:true
        // while actually reading from memory (ADVICE r14).
        new ProcessBuilder("sync").start().waitFor()
        val p = java.nio.file.Paths.get("/proc/sys/vm/drop_caches")
        java.nio.file.Files.write(p, "3\n".getBytes)
      } catch {
        case scala.util.control.NonFatal(e) =>
          cachesDropped = false
          System.err.println(s"[restartbench] drop_caches failed " +
            s"(rows stay page-cache-warm): $e")
      }
    }

    val dir = Graft.scratchDir("restart") + "/db"
    IndexStrategies.register(new IndexStrategies.Nsw()) // defaults, auto pool
    def open(): VectorDB = VectorDB.openOrCreate(spark, dir,
      model = s"graft-synth-$dim", dim = dim,
      storage = VectorDB.StorageMor, index = VectorDB.IndexNsw)
      .incrementalServing(absorbDepth = 0)

    val db1 = open()
    val ingestT0 = System.nanoTime()
    var lo = 0L
    while (lo < n) {
      db1.addDocuments(docsRange(lo, math.min(lo + ingestChunk, n)), embedder)
      lo += ingestChunk
    }
    val ingestS = (System.nanoTime() - ingestT0) / 1e9

    val rows = scala.collection.mutable.ArrayBuffer.empty[String]

    // ---- cold_build: the first serve-enable (includes persist) ----
    val coldMs = time(db1.enableServing(blocks = nBlocks))
    val (coldHits, coldP1) = hitsMs(db1)
    db1.disableServing()
    rows += f"""{"config":"cold_build","serve_ms":$coldMs%.0f,"hits_ms":$coldHits%.1f,"phase1_ms":$coldP1%.1f}"""
    println(rows.last)

    // ---- warm_same_version: restart, nothing committed while down ----
    maybeDropCaches()
    val db2 = open()
    val warmMs = time(db2.enableServing(blocks = nBlocks))
    val (warmHits, warmP1) = hitsMs(db2)
    val warmDepth = db2.servingInfo().chainDepth
    db2.disableServing()
    rows += f"""{"config":"warm_same_version","serve_ms":$warmMs%.0f,""" +
      f""""hits_ms":$warmHits%.1f,"phase1_ms":$warmP1%.1f,"chain_depth":$warmDepth}"""
    println(rows.last)

    // ---- the missed window: commits with nothing resident ----
    val missedBatches = 3
    val batchRows = 2000L
    (0 until missedBatches).foreach { b =>
      val base = n + b * batchRows
      db1.addDocuments(docsRange(base, base + batchRows), embedder)
    }

    // ---- warm_chain_restart: fresh instance over the moved folder ----
    maybeDropCaches()
    val db3 = open()
    val restartMs = time(db3.enableServing(blocks = nBlocks))
    val (restartHits, restartP1) = hitsMs(db3)
    val info = db3.servingInfo()
    val (seedMs, extendMs) = db3.lastWarmRestartTimings.getOrElse((-1.0, -1.0))
    db3.disableServing()
    rows += f"""{"config":"warm_chain_restart","serve_ms":$restartMs%.0f,""" +
      f""""hits_ms":$restartHits%.1f,"phase1_ms":$restartP1%.1f,""" +
      f""""seed_load_ms":$seedMs%.0f,"extend_ms":$extendMs%.0f,""" +
      f""""chain_depth":${info.chainDepth},""" +
      f""""missed_batches":$missedBatches,"missed_rows":${missedBatches * batchRows}}"""
    println(rows.last)

    // ---- cold_restart_no_seed: same state, feature's artifacts gone ----
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    Seq("_blocks", "_nav").foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$d"), true))
    maybeDropCaches()
    val db4 = open()
    val coldRestartMs = time(db4.enableServing(blocks = nBlocks))
    val (coldRestartHits, coldRestartP1) = hitsMs(db4)
    db4.disableServing()
    rows += f"""{"config":"cold_restart_no_seed","serve_ms":$coldRestartMs%.0f,""" +
      f""""hits_ms":$coldRestartHits%.1f,"phase1_ms":$coldRestartP1%.1f}"""
    println(rows.last)

    println(
      f"""{"metric":"serving_restart","n":$n,"dim":$dim,"n_blocks":$nBlocks,""" +
        f""""n_queries":$nQueries,"ingest_s":$ingestS%.1f,""" +
        s""""page_cache_dropped":${dropCaches && cachesDropped},""" +
        s""""rows":[${rows.mkString(",")}],""" +
        """"note":"restart walls of the MOR+incremental+NSW serving tier. """ +
        """cold_build = first serve-enable (join + assembly + graph build + persist); """ +
        """warm_same_version = pure-IO reload of the current version's _blocks/_nav; """ +
        """warm_chain_restart = seed reload + ONE chain layer holding the missed """ +
        """commit windows (chain_depth must read 1); cold_restart_no_seed = the """ +
        """same state without the retained seed, i.e. the pre-r14 wall. Fresh """ +
        """same-JVM instances stand in for the restarted process; unless """ +
        """page_cache_dropped is true (SPARK_GRAFT_DROP_CACHES=1, root), the OS """ +
        """page cache makes the warm rows a favorable IO bound vs a true cold host."}""")

    spark.stop()
  }
}
