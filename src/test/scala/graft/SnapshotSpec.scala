package graft

import graft.db.VectorDB
import org.scalatest.funsuite.AnyFunSuite

/** Versioned copy-on-write snapshots: a commit writes NEW
  * `codes-<id>.parquet`/`docs-<id>.parquet` dirs and flips the
  * `_snapshot` marker — never deleting the files a concurrent reader
  * may be mid-scan on. The previous generation survives one more
  * commit; [[VectorDB.snapshot]] pins a generation for repeatable
  * reads until closed, and commit-time GC bounds disk to
  * {current, previous} ∪ pins.
  */
class SnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftdb").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def fixture(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"document number $i topic ${i % 9}"))
      .toDF("doc_id", "text")

  private def snapshotDirs(dir: String): Seq[String] =
    new java.io.File(dir).listFiles().map(_.getName).toSeq
      .filter(n => n.matches("(codes|docs)(-[0-9a-f-]+)?\\.parquet"))

  test("a pre-commit reader survives the commit (previous generation retained)") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir)
    db.addDocuments(fixture(0 until 100))
    // capture the CURRENT tier DataFrame, as a concurrent reader would
    val preCommitCodes = db.codes
    db.addDocuments(fixture(100 until 130))
    // the old files must still be readable: this re-executes the old plan
    assert(preCommitCodes.count() == 100,
      "pre-commit snapshot must stay intact through the commit")
    assert(db.count() == 130)
  }

  test("snapshot() pins a generation across multiple commits; close() releases it") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir)
    db.addDocuments(fixture(0 until 60))
    val snap = db.snapshot()
    assert(snap.count() == 60)

    db.addDocuments(fixture(60 until 70))
    db.addDocuments(fixture(70 until 80))
    db.removeDocs(Seq(5L))
    // three commits later the pinned generation still answers the same
    assert(snap.count() == 60)
    assert(snap.codes.select("doc_id").collect().map(_.getLong(0)).toSet ==
      (0L until 60L).toSet)
    assert(snap.docs.count() == 60)
    assert(db.count() == 79)

    // pinned generation's files + {current, previous} = 3 generations
    assert(snapshotDirs(dir).size == 6,
      s"expected pinned+current+previous generations on disk: ${snapshotDirs(dir)}")

    snap.close()
    // idempotent close; reads now refuse
    snap.close()
    intercept[IllegalArgumentException] { snap.codes }

    // the next commit GCs the unpinned old generation
    db.addDocuments(fixture(500 until 505))
    assert(snapshotDirs(dir).size == 4,
      s"after close + commit only current+previous remain: ${snapshotDirs(dir)}")
  }

  test("unpinned generations are bounded to current + previous") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir)
    db.addDocuments(fixture(0 until 30))
    db.addDocuments(fixture(30 until 40))
    db.addDocuments(fixture(40 until 50))
    db.addDocuments(fixture(50 until 60))
    assert(snapshotDirs(dir).size == 4,
      s"disk must hold exactly current+previous generations: ${snapshotDirs(dir)}")
    assert(db.count() == 60)
    // reopen resolves to the marked current generation
    val db2 = VectorDB.openOrCreate(spark, dir)
    assert(db2.count() == 60)
  }

  test("snapshot of a folder still on the legacy unversioned layout reads it") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir)
    db.addDocuments(fixture(0 until 25))
    // first generation IS versioned under the new scheme; what matters:
    // snapshot() resolves whatever layout is current
    val snap = db.snapshot()
    assert(snap.count() == 25)
    snap.close()
  }

  test("merge-on-read snapshot: stable under commits AND under compaction") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir,
      storage = VectorDB.StorageMor)
    db.addDocuments(fixture(0 until 30))
    val snap = db.snapshot()
    assert(snap.count() == 30)

    // append-only deltas: later upserts/deletes leave the pinned
    // ceiling's merged view untouched
    db.addDocuments(fixture(30 until 40))
    db.removeDocs(Seq(2L, 4L))
    assert(snap.count() == 30)
    assert(snap.codes.select("doc_id").collect().map(_.getLong(0)).toSet ==
      (0L until 30L).toSet)
    assert(db.count() == 38)

    // compaction under the open pin: the fold proceeds (no pending
    // deltas afterwards), while the pin's pre-fold file set — here the
    // delta range (0, pinCeiling] — is RETAINED in place for it
    db.compact()
    assert(db.pendingDeltas() == 0, "compaction must fold under an open pin")
    assert(db.count() == 38)
    assert(snap.count() == 30, "pinned view must survive the fold")
    assert(snap.codes.select("doc_id").collect().map(_.getLong(0)).toSet ==
      (0L until 30L).toSet)
    val pinDelta = new java.io.File(s"$dir/codes.mor/delta_v1.parquet")
    assert(pinDelta.exists,
      "the pinned ceiling's file set must be retained through the fold")

    // the pin survives further commits AND a second fold
    db.addDocuments(fixture(40 until 45))
    db.compact()
    assert(snap.count() == 30, "pinned view must survive a second fold")
    assert(pinDelta.exists)

    // after the last pin closes, the second fold's window (its folded
    // deltas) is all that stays retained — the pin's range is reclaimed
    snap.close()
    assert(!pinDelta.exists,
      "a closed pin's retained file set must be reclaimed")
    assert(db.count() == 43)

    // MOR time travel stays out of scope (ceilings, not generations)
    intercept[IllegalArgumentException] { db.snapshotAt("mor-1") }
  }

  test("MOR versions stay monotonic across compaction (no ceiling collision)") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)
    db.addDocuments(fixture(0 until 10)) // v1
    db.addDocuments(fixture(10 until 20)) // v2
    db.compact() // fold ceiling 2
    assert(db.retainedMorGenerations() == 0,
      "the first fold has no past generation to retain")
    // a pin taken now must not be confused by post-fold delta numbering
    val snap = db.snapshot()
    db.addDocuments(fixture(20 until 30)) // must be v3, not v1
    assert(snap.count() == 20,
      "post-compaction deltas must version ABOVE the fold ceiling")
    assert(db.count() == 30)
    snap.close()
  }

  test("empty-db snapshot yields empty tiers, not an error") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    val snap = db.snapshot()
    assert(snap.count() == 0)
    assert(snap.docs.count() == 0)
    snap.close()
  }

  test("keepGenerations deepens the time-travel window; snapshotAt reads each") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir).keepGenerations(4)
    db.addDocuments(fixture(0 until 10))   // gen 1: 10 rows
    db.addDocuments(fixture(10 until 25))  // gen 2: 25
    db.addDocuments(fixture(25 until 45))  // gen 3: 45
    db.addDocuments(fixture(45 until 70))  // gen 4: 70
    db.addDocuments(fixture(70 until 100)) // gen 5: 100 — gen 1 GC'd
    val gens = db.generations()
    assert(gens.size == 4, s"window of 4: $gens")
    assert(snapshotDirs(dir).size == 8)

    // each retained generation answers with its own historical count
    val counts = gens.map { v =>
      val s = db.snapshotAt(v)
      try s.count() finally s.close()
    }
    assert(counts == Seq(25L, 45L, 70L, 100L),
      s"generations must read their own history: $counts")

    // the GC'd generation is not a valid target
    val e = intercept[IllegalArgumentException] { db.snapshotAt("no-such-version") }
    assert(e.getMessage.contains("not retained"))
  }

  test("a pin outlives the keepGenerations window until closed") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir) // default window: 2
    db.addDocuments(fixture(0 until 40))
    val pinned = db.snapshot()
    db.addDocuments(fixture(40 until 50))
    db.addDocuments(fixture(50 until 60))
    db.addDocuments(fixture(60 until 70))
    // pinned gen + current + previous
    assert(snapshotDirs(dir).size == 6, s"${snapshotDirs(dir)}")
    assert(pinned.count() == 40)
    // the pinned version stays listed while pinned
    assert(db.generations().contains(pinned.version))
    pinned.close()
    db.addDocuments(fixture(70 until 75))
    assert(snapshotDirs(dir).size == 4)
    assert(!db.generations().contains(pinned.version))
  }

  test("the live view moves while a pinned snapshot stays put") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir)
    db.addDocuments(fixture(0 until 120))
    val snap = db.snapshot()
    db.addDocuments(fixture(1000 until 1100)) // supersede
    assert(db.count() == 220, "live view must include the new commit")
    assert(snap.codes.select("doc_id").collect().map(_.getLong(0)).toSet ==
      (0L until 120L).toSet,
      "pinned snapshot must still list exactly the pre-commit ids")
    snap.close()
  }
}
