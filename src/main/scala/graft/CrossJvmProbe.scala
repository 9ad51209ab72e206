package graft

import graft.db.VectorDB
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Second-JVM driver for CrossJvmSpec: the multi-process claims —
  * writer-lease fencing, selector-manifest adoption, marker-based
  * snapshot freshness — are exercised against a REAL separate JVM
  * here, not an in-process simulation (the specs' `forgetForTest`
  * shape). Each command prints exactly one machine-parsed `PROBE:`
  * line on stdout; Spark logs go to stderr.
  *
  * Usage: graft.CrossJvmProbe <cmd> <folder> [args…]
  *  - count                 → `PROBE: COUNT <n>`
  *  - commit <fromId> <n>   → upsert n synthetic docs; `PROBE: COMMIT_OK <liveCount>`
  *                            or `PROBE: COMMIT_FENCED` when the folder
  *                            is leased by another writer
  *  - adopt <needle>        → compile a cached file-backed selector for
  *                            `doc contains <needle>`;
  *                            `PROBE: ADOPT <size> adopted=<bool>`
  *                            (adopted = reused this folder's persisted
  *                            manifest instead of compiling)
  *  - watch <ms> <maxN>     → poll `count()` with a 1 ms marker poll for
  *                            `ms` milliseconds while ANOTHER process
  *                            commits — hammers the `_snapshot` and
  *                            `_committed` reads against their
  *                            rename-swapped writes. Drops a
  *                            `_probe_watching` file when the watch
  *                            begins (the spec's start gate).
  *                            `PROBE: WATCH ok=<bool> distinct=<k> last=<n>`
  *                            (ok = counts stayed monotonic, ≤ maxN,
  *                            and no read ever threw)
  *  - warmserve <query>     → enable incremental serving in THIS fresh
  *                            JVM (the restarted process) and report
  *                            how the tier came up:
  *                            `PROBE: WARMSERVE loads=<l> saves=<s>
  *                            depth=<d> ids=<csv>` (loads>0 + saves=0 +
  *                            depth=1 = a warm chain restart from the
  *                            retained seed, no cold rebuild)
  */
object CrossJvmProbe {
  def main(args: Array[String]): Unit = {
    val cmd = args(0)
    val folder = args(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-crossjvm-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val db = VectorDB.openOrCreate(spark, folder)
    cmd match {
      case "count" =>
        println(s"PROBE: COUNT ${db.count()}")
      case "commit" =>
        val from = args(2).toLong
        val n = args(3).toInt
        val batch = (from until from + n)
          .map(i => (i, s"probe doc $i from the second jvm"))
          .toDF("doc_id", "text")
        try {
          db.addDocuments(batch)
          println(s"PROBE: COMMIT_OK ${db.count()}")
        } catch {
          case e: IllegalStateException if e.getMessage.contains("leased") =>
            println("PROBE: COMMIT_FENCED")
        }
      case "adopt" =>
        val sel = db.selectorCached(col("doc").contains(args(2)),
          maxBroadcast = 0, runSize = 4)
        val adopted = sel.idSet match {
          case r: graft.db.RunIdSet => !r.owned
          case _ => false
        }
        println(s"PROBE: ADOPT ${sel.size} adopted=$adopted")
        sel.release()
      case "watch" =>
        val ms = args(2).toLong
        val maxN = args(3).toLong
        db.pollMarkerEvery(1)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(folder, "_probe_watching"),
          "watching".getBytes("UTF-8"))
        val deadline = System.currentTimeMillis() + ms
        var last = -1L
        var distinct = 0
        var ok = true
        var err: String = null
        while (System.currentTimeMillis() < deadline && ok) {
          try {
            val c = db.count()
            if (c < last || c > maxN) { ok = false; err = s"count $c after $last (max $maxN)" }
            if (c != last) distinct += 1
            last = c
          } catch {
            case scala.util.control.NonFatal(e) =>
              ok = false; err = s"${e.getClass.getSimpleName}: ${e.getMessage}"
          }
          Thread.sleep(2)
        }
        if (err != null) System.err.println(s"[watch] $err")
        println(s"PROBE: WATCH ok=$ok distinct=$distinct last=$last")
      case "warmserve" =>
        // The REAL restarted process of the warm-restart story
        // (WarmRestartSpec simulates it with same-JVM fresh instances;
        // this closes the gap): enable serving in a JVM whose
        // BlockCache is genuinely empty and report how the tier came
        // up — block loads (seed streamed from disk), block saves
        // (0 = no cold rebuild persisted), the chain depth (1 = the
        // missed windows landed as one extension layer), and the
        // top-k ids for the caller's exactness check.
        val query = args(2)
        db.incrementalServing(absorbDepth = 0)
        val loads0 = graft.db.BlockStore.loadsForTest.get()
        val saves0 = graft.db.BlockStore.savesForTest.get()
        db.enableServing()
        val info = db.servingInfo()
        val ids = db.search(query, 10).collect()
          .map(_.getAs[Long]("doc_id")).mkString(",")
        val loads = graft.db.BlockStore.loadsForTest.get() - loads0
        val saves = graft.db.BlockStore.savesForTest.get() - saves0
        db.disableServing()
        println(s"PROBE: WARMSERVE loads=$loads saves=$saves " +
          s"depth=${info.chainDepth} ids=$ids")
      case other =>
        throw new IllegalArgumentException(s"unknown probe command: $other")
    }
    spark.stop()
  }
}
