package graft

import graft.db.VectorDB
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Steady-state bench of the transactional storage path (round-11
  * verdict item 1): the driver-gate query `x1_pinned_compaction`
  * rebuilds its scratch DB inside every timed rep, so its bench line is
  * ~90% ingest and useless as a regression signal for the thing it
  * guards — pinning, MOR commits, compaction-under-pin, pin-close GC.
  *
  * Here the corpus is built ONCE, then `reps` steady-state cycles run
  * against it, each timed per phase:
  *  - `pin_ms`     — open a MOR snapshot pin + read its count;
  *  - `commit_ms`  — upsert a fresh batch + delete the previous rep's
  *    batch (the bounded-churn regime: corpus size is flat);
  *  - `compact_ms` — fold pending deltas under the open pin (a fresh
  *    base generation per rep; pin-aware GC retains the pinned set);
  *  - `pinned_ms`  — re-read the pin AFTER the commits + fold (the
  *    repeatable-read guarantee is what makes this number exist);
  *  - `close_ms`   — close the pin (unpin + retired-generation GC).
  *
  * Flatness is the claim under test: every phase is O(batch) or
  * O(corpus/partitions), none should trend with rep index. Reported as
  * first-quartile vs last-quartile medians (warmup excluded), plus the
  * invariant checks (pin count frozen, live count flat, retained
  * generations bounded) — a silent correctness break fails the bench.
  *
  * Usage: graft.TxBench [reps] [batchSize]
  */
object TxBench {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 40
    val batchSize = if (args.length > 1) args(1).toInt else 2000
    val warmup = 4
    require(reps >= 4 * warmup, s"need >= ${4 * warmup} reps for quartiles")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-txbench")
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

    def freshDir(): String = {
      val d = java.nio.file.Files.createTempDirectory("grafttx").toFile
      d.delete(); d.getAbsolutePath
    }

    // ---- build once (untimed): the corpus the cycles churn against ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.cache()
    val corpusN = corpus.count()
    val db = VectorDB.openOrCreate(spark, freshDir(), storage = VectorDB.StorageMor)
    db.addDocuments(corpus)
    db.compact() // start from a folded base: rep 1 sees steady state
    // churn batches live ABOVE the fixture id range so upsert = insert
    val idBase = 1L + corpus.agg(max("doc_id")).head().getLong(0)

    def batchDf(rep: Int) = {
      import spark.implicits._
      val lo = idBase + rep.toLong * batchSize
      (0 until batchSize)
        .map(i => (lo + i, s"churn doc ${lo + i} payload for rep $rep"))
        .toDF("doc_id", "text")
    }

    val pinMs, commitMs, compactMs, pinnedMs, closeMs =
      scala.collection.mutable.ArrayBuffer.empty[Double]
    var pinViolations = 0
    var liveViolations = 0
    var retainedMax = 0

    def timed[A](buf: scala.collection.mutable.ArrayBuffer[Double])(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      buf += (System.nanoTime() - t0) / 1e6
      a
    }

    (0 until reps).foreach { rep =>
      val (snap, pinned0) = timed(pinMs) { val s = db.snapshot(); (s, s.count()) }
      timed(commitMs) {
        db.addDocuments(batchDf(rep))
        if (rep > 0) {
          val lo = idBase + (rep - 1).toLong * batchSize
          db.removeDocs((0 until batchSize).map(lo + _.toLong))
        }
      }
      timed(compactMs) { db.compact() }
      val pinned1 = timed(pinnedMs) { snap.count() }
      if (pinned1 != pinned0) pinViolations += 1
      timed(closeMs) { snap.close() }
      if (db.count() != corpusN + batchSize) liveViolations += 1
      retainedMax = math.max(retainedMax, db.retainedMorGenerations())
    }

    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) -1
      else if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def r1(x: Double): Double = math.round(x * 10) / 10.0
    // first vs last quartile AFTER warmup: the flatness (no-trend) signal
    def quartiles(xs: Seq[Double]): (Double, Double, Double) = {
      val body = xs.drop(warmup)
      val q = math.max(1, body.length / 4)
      val early = med(body.take(q))
      val late = med(body.takeRight(q))
      (r1(early), r1(late), if (early > 0) r1(late / early) else -1)
    }
    val series = Seq(
      "pin" -> pinMs, "commit" -> commitMs, "compact" -> compactMs,
      "pinned_read" -> pinnedMs, "close" -> closeMs)
    val fields = series.flatMap { case (name, buf) =>
      val (e, l, ratio) = quartiles(buf.toSeq)
      Seq(s""""${name}_ms_early":$e""", s""""${name}_ms_late":$l""",
        s""""${name}_ratio":$ratio""")
    }
    val ok = pinViolations == 0 && liveViolations == 0
    println(
      s"""{"metric":"tx_steady_state","value":${r1(med(compactMs.toSeq.drop(warmup)))},""" +
        s""""unit":"ms","reps":$reps,"batch_size":$batchSize,"corpus":$corpusN,""" +
        fields.mkString(",") + "," +
        s""""retained_gens_max":$retainedMax,"pin_violations":$pinViolations,""" +
        s""""live_violations":$liveViolations,"ok":$ok,"sf":"$sfDir"}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
