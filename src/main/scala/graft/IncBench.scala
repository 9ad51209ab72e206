package graft

import graft.db.{IndexStrategies, VectorDB}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Commit-to-serve latency under a commit stream: full serving rebuild
  * per commit vs the incremental chain refresh
  * ([[graft.db.VectorDB.incrementalServing]]), at the geometry the
  * feature exists for — MOR storage + an `nsw` index, where a full
  * refresh rebuilds every per-block graph (O(table), the dominant cost)
  * while the chain builds graphs over the commit window only
  * (O(batch)).
  *
  * Each cycle commits a mixed batch (appends + upserts + tombstones),
  * then times the FIRST search after the commit — that wall IS the
  * refresh cost (lazy rebuild/extension) plus one query — and a steady
  * search after it. The incremental row also reports the end-of-run
  * chain depth and the top-10 overlap vs the full-rebuild config on the
  * same queries (both serve the same ef; overlap isolates what chaining
  * changes, recall itself is GraphBench's job).
  *
  * Usage: `graft.IncBench [nDocs] [dim] [nBlocks] [commits] [batch]`
  * (default 500k × 1024 × 2 × 6 × 2000).
  */
object IncBench {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 500000L
    val dim = if (args.length > 1) args(1).toInt else 1024
    val nBlocks = if (args.length > 2) args(2).toInt else 2
    val commits = if (args.length > 3) args(3).toInt else 6
    val batch = if (args.length > 4) args(4).toLong else 2000L
    val clusters = 100
    val intrinsicDim = 8
    val sigma = 0.5
    val nQueries = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-incbench")
      .config("spark.sql.shuffle.partitions", cpus)
      // FAIR + the allocation file, like every serving bench: the
      // background absorb flatten then runs in the low-weight
      // graft-background pool and foreground commits/searches keep
      // ~8/9 of the task slots (the r12 commit-wall contention fix).
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
    val emb = new SynthEmbedder(dim)

    val docs = spark.range(n).select(col("id").as("doc_id"),
      col("id").cast("string").as("text")).repartition(nBlocks)
    val qGen = RecallBench.pointGen(dim, clusters, intrinsicDim, sigma)
    val qids = (0 until nQueries).map(i => i.toLong * (n / nQueries) + i)
    val queries = qids.map(id => id -> qGen(id)._1.map(_.toDouble).toSeq).toMap

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }

    /** Cycle c's mixed batch: `batch` fresh ids, batch/10 upserts of
      * existing ids, batch/20 tombstones — deterministic, disjoint
      * across cycles.
      */
    def commitCycle(db: VectorDB, c: Int): Unit = {
      val lo = n + c * batch
      val fresh = spark.range(lo, lo + batch)
        .select(col("id").as("doc_id"), col("id").cast("string").as("text"))
      val up = spark.range(c * (batch / 10), (c + 1) * (batch / 10))
        .select(col("id").as("doc_id"),
          (col("id") + 7L).cast("string").as("text"))
      db.addDocuments(fresh.unionByName(up).repartition(1), emb)
      val delLo = n / 2 + c * (batch / 20)
      db.removeDocs((delLo until delLo + batch / 20).toSeq)
    }

    // 0 = auto (cores-aware, NswNavBuilder.autoThreads); env overrides.
    val buildThreads = sys.env.get("SPARK_GRAFT_GRAPH_BUILD_THREADS")
      .map(_.toInt).getOrElse(0)
    IndexStrategies.register(new IndexStrategies.Nsw(16, 128, 96, buildThreads))

    def run(tag: String, incremental: Boolean, absorbDepth: Int = 0):
        (String, Map[Long, Set[Long]]) = {
      val db = VectorDB.openOrCreate(spark,
        Graft.scratchDir(s"inc-$tag") + "/db",
        model = s"graft-synth-$dim", dim = dim,
        storage = VectorDB.StorageMor, index = VectorDB.IndexNsw)
      if (incremental)
        db.incrementalServing(maxChurnFraction = 0.25, absorbDepth = absorbDepth)
      val ingestT0 = System.nanoTime()
      db.addDocuments(docs, emb)
      val ingestS = (System.nanoTime() - ingestT0) / 1e9
      val serveBuildMs = time(db.enableServing(blocks = nBlocks))
      db.searchHits(queries(qids.head), k = 10) // warm

      val refreshMs = (0 until commits).map { c =>
        val commitMs = time(commitCycle(db, c))
        val firstSearchMs = time(db.searchHits(queries(qids.head), k = 10))
        db.lastExtendTimings.foreach { case (tk, wb) =>
          println(f"[incbench] $tag cycle $c extend: touched=$tk%.0fms window=$wb%.0fms")
        }
        (commitMs, firstSearchMs)
      }
      val depthPre = db.servingChainForTest.map(_.depth).getOrElse(-1)
      // With absorption on, the background flatten is racing the commit
      // loop: poll with real searches until the chain swaps to the
      // absorbed (depth-0) tier, so steady_search measures the regime
      // the feature delivers, and absorb_wait_ms the off-path cost.
      val absorbWaitMs = if (absorbDepth > 0 && depthPre >= absorbDepth) {
        val t0 = System.nanoTime()
        val deadline = System.currentTimeMillis() + 120000
        while (db.servingChainForTest.exists(_.depth > 0) &&
               System.currentTimeMillis() < deadline) {
          db.searchHits(queries(qids.head), k = 10)
          Thread.sleep(100)
        }
        (System.nanoTime() - t0) / 1e6
      } else -1.0
      val steadyMs = median(qids.map(q =>
        time(db.searchHits(queries(q), k = 10))))
      val results = qids.map(q =>
        q -> db.searchHits(queries(q), k = 10).map(_.docId).toSet).toMap
      val depth = db.servingChainForTest.map(_.depth).getOrElse(-1)
      db.disableServing()
      val row = f"""{"config":"$tag","ingest_s":$ingestS%.1f,""" +
        f""""serve_build_ms":$serveBuildMs%.0f,""" +
        s""""commit_ms":[${refreshMs.map(r => f"${r._1}%.0f").mkString(",")}],""" +
        s""""refresh_ms":[${refreshMs.map(r => f"${r._2}%.0f").mkString(",")}],""" +
        f""""refresh_ms_median":${median(refreshMs.map(_._2))}%.0f,""" +
        f""""absorb_wait_ms":$absorbWaitMs%.0f,""" +
        f""""steady_search_ms":$steadyMs%.1f,""" +
        f""""chain_depth_pre_absorb":$depthPre,"chain_depth":$depth}"""
      println(row)
      (row, results)
    }

    val (fullRow, fullResults) = run("full", incremental = false)
    val (incRow, incResults) = run("inc", incremental = true)
    val (absRow, absResults) =
      run("inc_absorb", incremental = true,
        absorbDepth = VectorDB.IncServingAbsorbDepth)
    IndexStrategies.register(new IndexStrategies.Nsw()) // restore defaults

    val overlap = qids.map(q =>
      fullResults(q).intersect(incResults(q)).size / 10.0).sum / nQueries
    val overlapAbs = qids.map(q =>
      fullResults(q).intersect(absResults(q)).size / 10.0).sum / nQueries

    println(s"""{"metric":"incremental_serving","n":$n,"dim":$dim,""" +
      s""""n_blocks":$nBlocks,"commits":$commits,"batch":$batch,""" +
      s""""overlap_at10":${f"$overlap%.3f"},""" +
      s""""overlap_at10_absorb":${f"$overlapAbs%.3f"},""" +
      s""""rows":[$fullRow,$incRow,$absRow],""" +
      """"note":"refresh_ms is the FIRST search wall after each mixed commit (appends+upserts+deletes) — the lazy serving refresh (full rebuild of block arrays + per-block NSW graphs, vs one O(batch) chain extension) plus a single query. steady_search_ms is the post-refresh median query wall — the chain's read-side price (extra micro-block tasks + shadowing-map probes) shows up here; for inc_absorb it is measured AFTER the background flatten is adopted (absorb_wait_ms = wall from last commit to adoption, all of it off the query path — queries keep serving the chain meanwhile). overlap_at10 compares configs' top-10 at the same efSearch: all serve the same approximate graph contract, chaining/absorption must not change what is served."}""")
    spark.stop()
  }
}
