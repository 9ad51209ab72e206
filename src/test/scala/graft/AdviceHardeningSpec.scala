package graft

import graft.db.{MorTable, SelectorCatalog, VectorDB}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-11 hardening fixes:
  *  - a MOR pin closed by a NON-lease-holder must not GC retained
  *    generations (another process's pins are invisible to this JVM's
  *    registry — deletion is the writer's job);
  *  - an in-flight cataloged selector build registers its run dir so a
  *    concurrent commit's orphan sweep cannot delete it mid-build;
  *  - a corrupt legacy `_graft_ceiling` file degrades to ceiling 0
  *    instead of failing every read;
  *  - `Transactional.pinnedCompaction` removes its scratch DB.
  */
class AdviceHardeningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftadvice").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def fixture(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"document number $i")).toDF("doc_id", "text")

  test("closing a MOR pin under a foreign writer lease skips retired-generation GC") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)
    db.addDocuments(fixture(0 until 6))
    db.compact() // generation A
    val snap = db.snapshot() // pin resolves to A
    db.addDocuments(fixture(6 until 12))
    db.compact() // generation B
    db.addDocuments(fixture(12 until 18))
    db.compact() // generation C — pin-aware GC keeps {C, B, pin→A}
    assert(db.retainedMorGenerations() == 2,
      "three generations must be retained while the pin holds the oldest")

    // a LIVE lease held by some other process: this JVM may not delete
    java.nio.file.Files.write(
      new java.io.File(dir, "_lease").toPath,
      s"some-other-writer\n${System.currentTimeMillis() + 60000}".getBytes("UTF-8"))
    snap.close()
    assert(db.retainedMorGenerations() == 2,
      "a non-holder's pin close must leave retained generations for the writer")
    // the pin itself IS released — only the deletion was skipped
    // (the writer's own compact()/pin close reclaims)
    java.nio.file.Files.delete(new java.io.File(dir, "_lease").toPath)
    db.compact() // leaseless again: writer-side GC reclaims to {C, B}
    assert(db.retainedMorGenerations() == 1)
    assert(db.count() == 18)
  }

  test("leaseless pin close still GCs (single-process mode unchanged)") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)
    db.addDocuments(fixture(0 until 6))
    db.compact()
    val snap = db.snapshot()
    db.addDocuments(fixture(6 until 12))
    db.compact()
    db.addDocuments(fixture(12 until 18))
    db.compact()
    assert(db.retainedMorGenerations() == 2)
    snap.close()
    assert(db.retainedMorGenerations() == 1,
      "with no lease file the in-JVM registry is the whole pin population")
  }

  test("the lease HOLDER's own pin close still GCs") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)
    db.addDocuments(fixture(0 until 6))
    db.compact()
    val lease = db.acquireWriterLease()
    try {
      val snap = db.snapshot()
      db.addDocuments(fixture(6 until 12))
      db.compact()
      db.addDocuments(fixture(12 until 18))
      db.compact()
      assert(db.retainedMorGenerations() == 2)
      snap.close()
      assert(db.retainedMorGenerations() == 1)
    } finally lease.close()
  }

  test("in-flight selector build dirs are visible to the orphan sweep's live set") {
    val dir = "file:/tmp/somedb/_selectors/sel-inflight-test"
    SelectorCatalog.registerBuilding(dir)
    try assert(SelectorCatalog.liveRunDirsFor("file:/tmp/somedb").contains(dir),
      "a registered in-flight build dir must be protected from the sweep")
    finally SelectorCatalog.doneBuilding(dir)
    assert(!SelectorCatalog.liveRunDirsFor("file:/tmp/somedb").contains(dir))
  }

  test("a corrupt legacy _graft_ceiling degrades to ceiling 0, not a read failure") {
    val dir = freshDir() + "/t"
    val t = new MorTable(spark, dir, "doc_id")
    t.upsert(fixture(0 until 5))
    t.compact()
    // devolve the versioned base into the LEGACY layout with a corrupt
    // ceiling file
    val base = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("base_v")).head
    val legacy = new java.io.File(dir, "base.parquet")
    assert(base.renameTo(legacy))
    java.nio.file.Files.write(
      new java.io.File(legacy, "_graft_ceiling").toPath,
      "not-a-number".getBytes("UTF-8"))
    assert(t.read().count() == 5, "corrupt ceiling must not fail the read")
  }

  test("pinnedCompaction deletes its scratch DB; the memoized base doesn't accumulate") {
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    // twice: the second run must reuse the memoized base, not grow one
    (0 until 2).foreach { _ =>
      val out = graft.operators.Transactional
        .pinnedCompaction(spark, "/root/testdata/sf0.001")
      assert(out.count() == 4)
    }
    val all = Option(wh.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("graft-tx-"))
    // the per-run clone must be gone; the JVM-lifetime memoized base
    // (deleted by the shutdown hook) is the one allowed survivor
    val (bases, clones) = all.partition(_.getName.startsWith("graft-tx-base-"))
    assert(clones.isEmpty,
      s"scratch DBs must be deleted: ${clones.map(_.getName).mkString(",")}")
    // one base per variant (x1, x2) is the memo working as designed;
    // two for the SAME variant means the memo failed to dedupe
    val x1Bases = bases.count(_.getName.startsWith("graft-tx-base-x1-"))
    assert(x1Bases <= 1,
      s"the memoized x1 base must not accumulate: ${bases.map(_.getName).mkString(",")}")
  }
}
