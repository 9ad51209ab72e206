package graft.operators

import graft.db.VectorDB
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-gate face of the engine's transactional storage layer:
  * exercises pin → concurrent commits → delete → compaction-under-pin →
  * pin close END TO END per round, with a plain-SQL oracle over the
  * fixture — so a regression in snapshot pinning, MOR retirement, or
  * retired-generation GC fails the correctness gate, not just a unit
  * spec. (The reference has no transactional surface at all; this
  * guards capabilities the engine adds on top — `MorTable`,
  * `VectorDB.snapshot`, retire-mode `compact`.)
  */
object Transactional {

  /** `x1_pinned_compaction`: land the `doc_id % 3 == 0` slice of
    * `documents` in a merge-on-read DB, pin a snapshot, then — with the
    * pin open — upsert the `% 3 == 1` slice, delete the `% 9 == 0`
    * rows, and compact. Deterministic outputs the oracle recomputes
    * from the parquet alone:
    *  - `pinned_count`: the pin must answer |%3==0| after the commits;
    *  - `pinned_after_compact`: and STILL after the fold (its file set
    *    is retained by pin-aware GC, never deleted under it);
    *  - `live_count`: |%3∈{0,1}| − |%9==0| (the fold is
    *    read-equivalent);
    *  - `live_after_close`: unchanged once the pin closes and its
    *    retained files are reclaimed.
    */
  def pinnedCompaction(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val first = docs.filter(col("doc_id") % 3 === 0)
    val second = docs.filter(col("doc_id") % 3 === 1)

    val scratch = scratchDir(spark)
    val db = VectorDB.openOrCreate(spark, s"$scratch/db",
      storage = VectorDB.StorageMor)
    val snap =
      try { db.addDocuments(first); db.snapshot() }
      catch { case t: Throwable => deleteScratch(spark, scratch); throw t }
    try {
      db.addDocuments(second)
      val dels = first.filter(col("doc_id") % 9 === 0)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      if (dels.nonEmpty) db.removeDocs(dels)
      val pinnedPre = snap.count()
      db.compact() // under the open pin: fold proceeds, pin retained
      val rows = Seq(
        ("live_count", db.count()),
        ("pinned_after_compact", snap.count()),
        ("pinned_count", pinnedPre))
      snap.close()
      val after = ("live_after_close", db.count())
      // The counts above are already materialized Longs, so the
      // returned frame is a LocalRelation — safe to delete the scratch
      // DB underneath it.
      spark.createDataFrame(rows :+ after).toDF("metric", "value")
        .orderBy("metric")
    } finally {
      snap.close() // idempotent
      deleteScratch(spark, scratch)
    }
  }

  /** Unique per-run scratch root for the temporary MOR DB, on a
    * filesystem EXECUTORS can reach (a driver-local `java.io.tmpdir`
    * only works in local mode): `graft.scratch.dir` if set (shared FS
    * on a real cluster), else the session's warehouse dir. Deleted in
    * the operator's `finally` — earlier rounds leaked one full DB copy
    * per correctness-gate run (ADVICE r10).
    */
  private def scratchDir(spark: SparkSession): String = {
    val root = spark.conf.getOption("graft.scratch.dir")
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir"))
    s"$root/graft-tx-${java.util.UUID.randomUUID()}"
  }

  private def deleteScratch(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try fs.delete(p, true)
    catch { case scala.util.control.NonFatal(_) => () }
  }

  val oracles: Map[String, String] = Map(
    "x1_pinned_compaction" ->
      """SELECT * FROM (
        |  SELECT 'live_count' AS metric,
        |         CAST((SELECT count(*) FROM documents WHERE doc_id % 3 <= 1)
        |            - (SELECT count(*) FROM documents WHERE doc_id % 9 = 0)
        |           AS BIGINT) AS value
        |  UNION ALL
        |  SELECT 'live_after_close',
        |         CAST((SELECT count(*) FROM documents WHERE doc_id % 3 <= 1)
        |            - (SELECT count(*) FROM documents WHERE doc_id % 9 = 0)
        |           AS BIGINT)
        |  UNION ALL
        |  SELECT 'pinned_count',
        |         CAST((SELECT count(*) FROM documents WHERE doc_id % 3 = 0) AS BIGINT)
        |  UNION ALL
        |  SELECT 'pinned_after_compact',
        |         CAST((SELECT count(*) FROM documents WHERE doc_id % 3 = 0) AS BIGINT)
        |) ORDER BY metric""".stripMargin)
}
