package graft.db

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge-on-read keyed table: the O(batch) upsert path that replaces the
  * facade's default copy-on-write snapshot at scale (the "100 TB
  * divergence point" of ARCHITECTURE.md, now implemented).
  *
  * Layout (Delta/Iceberg-style, minimal):
  * {{{
  * dir/
  *   base.parquet          — compacted rows, version 0
  *   delta_vNNNNNN.parquet — one append per commit: upserted rows and/or
  *                           delete markers (_deleted = true)
  * }}}
  *
  * Writes append a delta file — cost proportional to the batch, never the
  * table. Reads merge by last-writer-wins: every row carries its commit
  * version `_v`; a per-key window keeps the highest version and drops it
  * if it is a delete marker. Read amplification grows with delta count
  * and is bounded by [[compact]], which folds everything back into
  * `base.parquet` (the amortized rewrite).
  *
  * Concurrency: single-writer (like the reference — multi-process safety
  * is explicitly out of scope there too, `README.md:174`); versions are
  * allocated from the directory listing.
  */
class MorTable(spark: SparkSession, dir: String, keyCol: String) {

  private def fs: FileSystem =
    FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def basePath = new Path(s"$dir/base.parquet")
  private def oldPath = new Path(s"$dir/base.parquet.old")
  private def tmpPath = new Path(s"$dir/base.parquet.compacting")

  /** Heal an interrupted [[compact]] swap. The swap renames the live base
    * ASIDE (never deletes it) before renaming the fresh snapshot in, so
    * every crash point leaves a recoverable state:
    *  - `base.old` + no `base` → swap interrupted mid-rename: restore the
    *    aside copy (deltas are untouched, so nothing is lost).
    *  - `base.old` + `base`    → swap completed but cleanup didn't: the
    *    aside copy is stale, drop it.
    *  - leftover `*.compacting` → incomplete snapshot write: drop it (the
    *    deltas it would have folded are still present).
    * Re-merging deltas already folded into a fresh base is idempotent
    * (last-writer-wins on `_v`), so a crash before delta cleanup is safe.
    */
  private def recover(): Unit = {
    if (fs.exists(oldPath)) {
      if (fs.exists(basePath)) fs.delete(oldPath, true)
      else fs.rename(oldPath, basePath)
    }
    if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
  }

  private def deltaPaths(): Seq[(Int, Path)] = {
    val d = new Path(dir)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).map(_.getPath).toSeq
      .filter(_.getName.startsWith("delta_v"))
      .map(p => (p.getName.stripPrefix("delta_v").stripSuffix(".parquet").toInt, p))
      .sortBy(_._1)
  }

  private def nextVersion(): Int = deltaPaths().lastOption.map(_._1 + 1).getOrElse(1)

  def exists: Boolean = {
    recover()
    fs.exists(basePath) || deltaPaths().nonEmpty
  }

  /** The merged current snapshot (no `_v`/`_deleted` internals). */
  def read(): DataFrame = readAt(Int.MaxValue)

  /** The merged snapshot AS OF commit version `maxV` — the repeatable
    * MOR read: deltas are append-only, so the view at a pinned ceiling
    * is stable under any number of later upserts/deletes. The ONLY
    * operation that could invalidate it is [[compact]] (it folds and
    * deletes the pinned files), so the facade refuses compaction while
    * pins are open.
    */
  def readAt(maxV: Int): DataFrame = {
    recover()
    val parts =
      (if (fs.exists(basePath))
        Seq(spark.read.parquet(basePath.toString)
          .withColumn("_v", lit(0)).withColumn("_deleted", lit(false)))
      else Seq.empty) ++
      deltaPaths().filter(_._1 <= maxV).map { case (v, p) =>
        val df = spark.read.parquet(p.toString)
        (if (df.columns.contains("_deleted")) df
         else df.withColumn("_deleted", lit(false)))
          .withColumn("_v", lit(v))
      }
    require(parts.nonEmpty, s"MOR table $dir is empty at version $maxV")
    val all = parts.reduce(_ unionByName (_, allowMissingColumns = true))
    val w = Window.partitionBy(keyCol).orderBy(col("_v").desc)
    all
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col("_deleted"))
      .drop("_rn", "_v", "_deleted")
  }

  /** Highest committed delta version (0 = base only) — the ceiling a
    * repeatable read pins.
    */
  def versionCeiling(): Int = deltaPaths().lastOption.map(_._1).getOrElse(0)

  /** Append-only upsert: writes ONLY the batch (last-writer-wins replaces
    * any older rows with the same key at read time). Keys must be unique
    * within a batch.
    */
  def upsert(rows: DataFrame): Unit = {
    val v = nextVersion()
    rows.withColumn("_deleted", lit(false))
      .write.mode("errorifexists").parquet(s"$dir/delta_v$v.parquet")
  }

  /** Append-only delete: writes key-only tombstone markers. */
  def delete(ids: DataFrame, template: DataFrame): Unit = {
    val v = nextVersion()
    val nullCols = template.schema.fields.filter(_.name != keyCol).map(f =>
      lit(null).cast(f.dataType).as(f.name))
    ids.select((col(keyCol) +: nullCols.toSeq) :+ lit(true).as("_deleted"): _*)
      .write.mode("errorifexists").parquet(s"$dir/delta_v$v.parquet")
  }

  /** Fold base + deltas into a fresh base (bounds read amplification).
    * The merged snapshot is materialized to a temp dir first, then
    * swapped in via rename-aside (base → base.old, tmp → base, delete
    * old + deltas) so no crash point can make version-0 rows
    * unreachable — [[recover]] heals every intermediate state.
    */
  def compact(): Unit = {
    recover()
    val deltas = deltaPaths()
    if (deltas.isEmpty) return
    read().sortWithinPartitions(keyCol).write.mode("overwrite").parquet(tmpPath.toString)
    if (fs.exists(basePath)) fs.rename(basePath, oldPath)
    fs.rename(tmpPath, basePath)
    fs.delete(oldPath, true)
    deltas.foreach { case (_, p) => fs.delete(p, true) }
  }

  /** Number of pending delta files (read-amplification indicator). */
  def deltaCount(): Int = deltaPaths().size
}
