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
  *   base.parquet          — compacted rows; its `_graft_ceiling` file
  *                           records the fold ceiling G (all rows with
  *                           commit version <= G live here)
  *   delta_vNNNNNN.parquet — one append per commit: upserted rows and/or
  *                           delete markers (_deleted = true); versions
  *                           are MONOTONIC across compactions
  *   _retired/rG/          — a pre-compaction file set (base + deltas)
  *                           retired at fold ceiling G because an open
  *                           snapshot pin still reads it; GC'd when the
  *                           last such pin closes
  * }}}
  *
  * Writes append a delta file — cost proportional to the batch, never the
  * table. Reads merge by last-writer-wins: every row carries its commit
  * version `_v`; a per-key window keeps the highest version and drops it
  * if it is a delete marker. Read amplification grows with delta count
  * and is bounded by [[compact]], which folds everything back into
  * `base.parquet` (the amortized rewrite).
  *
  * Pinned reads vs compaction: a repeatable-read pin records a commit
  * ceiling c; [[readAt]] merges only files with version <= c — stable by
  * append-only-ness. Compaction would fold (and previously refused under
  * pins, since deleting the pinned files breaks them); with
  * `compact(retire = true)` the folded file set is instead MOVED intact
  * into `_retired/r<G>` and [[readAt]] routes a ceiling c < G to the
  * smallest retired generation >= c — the copy-on-write versioned-
  * generation pattern applied to the MOR file sets, so compaction
  * proceeds under pins and disk is bounded by the open-pin set
  * ([[gcRetired]]).
  *
  * Concurrency: single-writer (like the reference — multi-process safety
  * is explicitly out of scope there too, `README.md:174`); versions are
  * allocated from the directory listing plus the base's fold ceiling.
  */
class MorTable(spark: SparkSession, dir: String, keyCol: String) {

  private def fs: FileSystem =
    FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def basePath = new Path(s"$dir/base.parquet")
  private def oldPath = new Path(s"$dir/base.parquet.old")
  private def tmpPath = new Path(s"$dir/base.parquet.compacting")
  private def retiredRoot = new Path(s"$dir/_retired")

  /** Heal an interrupted [[compact]] swap. Both swap shapes rename the
    * live base ASIDE (never delete it) before renaming the fresh
    * snapshot in, so every crash point leaves a recoverable state.
    *
    * Delete-mode (`base.old`) crumbs:
    *  - `base.old` + no `base` → swap interrupted mid-rename: restore the
    *    aside copy (deltas are untouched, so nothing is lost).
    *  - `base.old` + `base`    → swap completed but cleanup didn't: the
    *    aside copy is stale, drop it.
    * Retire-mode (`_retired/rG.tmp`) crumbs — the fresh snapshot
    * (`*.compacting`) is the commit marker:
    *  - `rG.tmp` + `*.compacting` → the swap did NOT land: roll BACK —
    *    move the retired files home and drop the unfinished snapshot.
    *  - `rG.tmp` + no `*.compacting` → the swap landed: roll FORWARD —
    *    finalize the retirement rename.
    * A leftover `*.compacting` alone is an incomplete snapshot write:
    * drop it (the deltas it would have folded are still present).
    * Re-merging deltas already folded into a fresh base is idempotent
    * (last-writer-wins on `_v`), so a crash before delta cleanup is safe.
    */
  private def recover(): Unit = {
    if (fs.exists(oldPath)) {
      if (fs.exists(basePath)) fs.delete(oldPath, true)
      else fs.rename(oldPath, basePath)
    }
    if (fs.exists(retiredRoot)) {
      fs.listStatus(retiredRoot).map(_.getPath)
        .filter(_.getName.endsWith(".tmp")).foreach { rt =>
          if (fs.exists(tmpPath)) {
            fs.listStatus(rt).foreach(st =>
              fs.rename(st.getPath, new Path(dir, st.getPath.getName)))
            fs.delete(rt, true)
          } else {
            fs.rename(rt, new Path(retiredRoot, rt.getName.stripSuffix(".tmp")))
          }
        }
    }
    if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
  }

  private def deltaPathsIn(d: Path): Seq[(Int, Path)] = {
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).map(_.getPath).toSeq
      .filter(_.getName.startsWith("delta_v"))
      .map(p => (p.getName.stripPrefix("delta_v").stripSuffix(".parquet").toInt, p))
      .sortBy(_._1)
  }

  private def deltaPaths(): Seq[(Int, Path)] = deltaPathsIn(new Path(dir))

  /** Fold ceiling of the base under `d` (0 when no base / legacy base):
    * every row in that base has commit version <= this. Stored INSIDE
    * the base directory (`_graft_ceiling` — parquet readers ignore
    * underscore files), so it travels atomically with the base swap.
    */
  private def ceilingOf(d: Path): Int = {
    val p = new Path(d, "base.parquet/_graft_ceiling")
    if (!fs.exists(p)) 0
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
      finally in.close()
    }
  }

  private def writeCeiling(baseDir: Path, v: Int): Unit = {
    val out = fs.create(new Path(baseDir, "_graft_ceiling"), true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Fold ceiling of the LIVE base (0 = none/legacy). */
  def foldCeiling(): Int = ceilingOf(new Path(dir))

  /** Monotonic across compactions: a fresh fold's base remembers its
    * ceiling, so post-compaction deltas continue counting upward and a
    * pinned pre-compaction ceiling can never collide with them.
    */
  private def nextVersion(): Int =
    math.max(foldCeiling(), deltaPaths().lastOption.map(_._1).getOrElse(0)) + 1

  def exists: Boolean = {
    recover()
    fs.exists(basePath) || deltaPaths().nonEmpty
  }

  /** True when a folded base exists (committed by construction). */
  def hasBase: Boolean = {
    recover()
    fs.exists(basePath)
  }

  /** The merged current snapshot (no `_v`/`_deleted` internals). */
  def read(): DataFrame = readAt(Int.MaxValue)

  /** The merged snapshot AS OF commit version `maxV` — the repeatable
    * MOR read: deltas are append-only, so the view at a pinned ceiling
    * is stable under any number of later upserts/deletes. A ceiling
    * predating the live base's fold (maxV < [[foldCeiling]]) resolves
    * to the retired generation that still holds its file set (written
    * by `compact(retire = true)`); the pin therefore survives
    * compaction, at the cost of the retired copy on disk until the pin
    * closes.
    */
  def readAt(maxV: Int): DataFrame = {
    recover()
    val g = foldCeiling()
    if (maxV >= g) readFrom(new Path(dir), maxV)
    else {
      // The live base folded past this ceiling; the pre-fold file set
      // was retired. Route to the smallest retired generation covering
      // it (its own base's ceiling is <= maxV by construction: a pin
      // can only predate folds that happened after it was taken).
      val gen = retiredGenerations().sorted.find(_ >= maxV).getOrElse(
        throw new IllegalStateException(
          s"MOR table $dir has no file set covering pinned version $maxV " +
            s"(live base folded at $g and no retired generation covers it); " +
            "was the pin released and its files GC'd?"))
      readFrom(new Path(retiredRoot, s"r$gen"), maxV)
    }
  }

  /** Merge plan, sized for a base that dwarfs the deltas (the regime
    * compaction maintains): last-writer-wins is resolved by a window
    * over the DELTAS ONLY — the bounded small side — and the base
    * contributes via one LEFT ANTI join against the delta keys, which
    * Catalyst broadcasts at realistic delta sizes. The base is
    * therefore never shuffled by a merged read; the earlier shape (one
    * window over base ∪ deltas) re-shuffled the ENTIRE table per read,
    * which at 100 TB would make every post-commit first read a
    * full-table exchange. Tombstoned keys fall out on both sides: the
    * anti join removes them from the base, the `!_deleted` filter from
    * the resolved deltas. MorPlan assertion lives in MorVectorDBSpec.
    */
  private def readFrom(d: Path, maxV: Int): DataFrame = {
    val base = new Path(d, "base.parquet")
    val baseDf =
      if (fs.exists(base)) Some(spark.read.parquet(base.toString)) else None
    val deltaDfs = deltaPathsIn(d).filter(_._1 <= maxV).map { case (v, p) =>
      val df = spark.read.parquet(p.toString)
      (if (df.columns.contains("_deleted")) df
       else df.withColumn("_deleted", lit(false)))
        .withColumn("_v", lit(v))
    }
    require(baseDf.nonEmpty || deltaDfs.nonEmpty,
      s"MOR table $d is empty at version $maxV")
    if (deltaDfs.isEmpty) return baseDf.get
    val allDeltas = deltaDfs
      .reduce(_ unionByName (_, allowMissingColumns = true))
    val w = Window.partitionBy(keyCol).orderBy(col("_v").desc)
    val resolved = allDeltas
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col("_deleted"))
      .drop("_rn", "_v", "_deleted")
    baseDf match {
      case None => resolved
      case Some(b) =>
        // no distinct on the keys: LEFT ANTI tolerates duplicates, and
        // a distinct would add the one shuffle this plan exists to avoid
        b.join(allDeltas.select(keyCol), Seq(keyCol), "left_anti")
          .unionByName(resolved.select(b.columns.map(col).toSeq: _*))
    }
  }

  /** Highest committed version (0 = empty/legacy base only) — the
    * ceiling a repeatable read pins. Monotonic across compactions.
    */
  def versionCeiling(): Int =
    math.max(foldCeiling(), deltaPaths().lastOption.map(_._1).getOrElse(0))

  /** Append-only upsert: writes ONLY the batch (last-writer-wins replaces
    * any older rows with the same key at read time). Keys must be unique
    * within a batch. Returns the delta's commit version — the facade
    * records it in the folder's `_committed` ceilings AFTER both tiers
    * land, which is what makes the commit visible (see
    * [[graft.db.VectorDB]]'s MOR commit protocol).
    */
  def upsert(rows: DataFrame): Int = {
    val v = nextVersion()
    rows.withColumn("_deleted", lit(false))
      .write.mode("errorifexists").parquet(s"$dir/delta_v$v.parquet")
    v
  }

  /** Append-only delete: writes key-only tombstone markers. Returns the
    * delta's commit version (see [[upsert]]).
    */
  def delete(ids: DataFrame, template: DataFrame): Int = {
    val v = nextVersion()
    val nullCols = template.schema.fields.filter(_.name != keyCol).map(f =>
      lit(null).cast(f.dataType).as(f.name))
    ids.select((col(keyCol) +: nullCols.toSeq) :+ lit(true).as("_deleted"): _*)
      .write.mode("errorifexists").parquet(s"$dir/delta_v$v.parquet")
    v
  }

  /** Delete every delta above `ceiling` — orphans of a commit that
    * never reached its `_committed` flip (a crash or a fenced writer
    * between the two tiers' writes). Called by the facade at commit
    * start, so an orphan can never be folded in once a later ceiling
    * passes its version. Readers never saw the orphans (ceiling-gated
    * reads), so this is garbage collection, not data loss.
    */
  def truncateAbove(ceiling: Int): Unit =
    deltaPaths().filter(_._1 > ceiling).foreach { case (_, p) =>
      fs.delete(p, true)
    }

  /** Fold base + deltas into a fresh base (bounds read amplification).
    * The merged snapshot is materialized to a temp dir first — stamped
    * with its fold ceiling — then swapped in so no crash point can make
    * version-0 rows unreachable; [[recover]] heals every intermediate
    * state of either shape.
    *
    * `retire = false`: the folded base + deltas are deleted (no pinned
    * reader needs them). `retire = true`: they are MOVED intact into
    * `_retired/r<ceiling>/`, where [[readAt]] finds them for pins whose
    * ceiling predates this fold; [[gcRetired]] deletes the generation
    * when no pin needs it.
    */
  def compact(retire: Boolean = false): Unit = {
    recover()
    val deltas = deltaPaths()
    if (deltas.isEmpty) return
    val newCeil = versionCeiling()
    read().sortWithinPartitions(keyCol).write.mode("overwrite").parquet(tmpPath.toString)
    writeCeiling(tmpPath, newCeil)
    if (retire) {
      val rTmp = new Path(retiredRoot, s"r$newCeil.tmp")
      fs.mkdirs(rTmp)
      deltas.foreach { case (_, p) => fs.rename(p, new Path(rTmp, p.getName)) }
      if (fs.exists(basePath)) fs.rename(basePath, new Path(rTmp, basePath.getName))
      fs.rename(tmpPath, basePath) // the retire commit point
      fs.rename(rTmp, new Path(retiredRoot, s"r$newCeil"))
    } else {
      if (fs.exists(basePath)) fs.rename(basePath, oldPath)
      fs.rename(tmpPath, basePath)
      fs.delete(oldPath, true)
      deltas.foreach { case (_, p) => fs.delete(p, true) }
    }
  }

  /** Retired generation ceilings currently on disk (unsorted). */
  def retiredGenerations(): Seq[Int] = {
    if (!fs.exists(retiredRoot)) Seq.empty
    else fs.listStatus(retiredRoot).map(_.getPath.getName).toSeq
      .filter(n => n.startsWith("r") && !n.endsWith(".tmp"))
      .map(_.stripPrefix("r").toInt)
  }

  /** Delete every retired generation no open pin resolves to. A pin
    * with ceiling c (below the live fold ceiling) reads the smallest
    * retired generation >= c; any generation that is nobody's
    * resolution target is unreachable and freed. Pins at or above the
    * live fold ceiling read the live file set and keep nothing retired.
    */
  def gcRetired(pinnedCeilings: Set[Int]): Unit = {
    recover()
    val gens = retiredGenerations().sorted
    if (gens.isEmpty) return
    val g = foldCeiling()
    val needed = pinnedCeilings.filter(_ < g)
      .flatMap(c => gens.find(_ >= c))
    gens.filterNot(needed).foreach(gen =>
      fs.delete(new Path(retiredRoot, s"r$gen"), true))
    if (fs.exists(retiredRoot) && fs.listStatus(retiredRoot).isEmpty)
      fs.delete(retiredRoot, true)
  }

  /** Number of pending delta files (read-amplification indicator). */
  def deltaCount(): Int = deltaPaths().size
}
