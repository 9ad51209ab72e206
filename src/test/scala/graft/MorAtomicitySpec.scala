package graft

import graft.db.{MorTable, VectorDB}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-tier atomicity of merge-on-read commits: a commit touches TWO
  * tables (codes + docs), and its visibility is the `_committed`
  * ceilings flip AFTER both tiers' deltas land — the MOR analogue of
  * the copy-on-write marker flip. A delta that reached disk without
  * reaching `_committed` (a crash or a fenced writer between the two
  * writes) must be INVISIBLE to every reader and TRUNCATED by the next
  * commit, never folded in.
  */
class MorAtomicitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftdb").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def fixture(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"document number $i")).toDF("doc_id", "text")

  /** Plant an orphan delta in the codes tier ONLY — the on-disk state a
    * crash between the codes write and the `_committed` flip leaves.
    */
  private def plantOrphan(dir: String, id: Long): java.io.File = {
    val codesDir = s"$dir/codes.mor"
    val existing = new java.io.File(codesDir).listFiles()
      .filter(_.getName.startsWith("delta_v")).map(_.getName).sorted
    val template = spark.read.parquet(s"$codesDir/${existing.head}")
      .drop("_deleted").limit(1).withColumn("doc_id", lit(id))
    val v = new MorTable(spark, codesDir, "doc_id").upsert(template)
    new java.io.File(codesDir, s"delta_v$v.parquet")
  }

  test("an uncommitted delta is invisible to readers and truncated by the next commit") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)
    db.addDocuments(fixture(0 until 10))
    assert(db.count() == 10)

    val orphanFile = plantOrphan(dir, 999L)
    assert(orphanFile.exists)

    // a FRESH handle (no warm caches) must not see the torn row — its
    // codes tier would have no matching docs payload
    val db2 = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)
    assert(db2.count() == 10, "uncommitted delta leaked into a read")
    assert(!db2.codes.select("doc_id").collect().map(_.getLong(0)).contains(999L))

    // the next commit truncates the orphan BEFORE writing (its version
    // slot is reused by the real commit) and the table stays consistent
    db2.addDocuments(fixture(500 until 501))
    assert(db2.count() == 11)
    val ids = db2.codes.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(500L) && !ids.contains(999L),
      "orphan must be truncated, not resurrected by the advancing ceiling")

    // compaction also refuses to fold debris: plant again, compact, gone
    plantOrphan(dir, 998L)
    db2.compact()
    assert(db2.count() == 11)
    assert(!db2.codes.select("doc_id").collect().map(_.getLong(0)).contains(998L),
      "compaction must truncate orphans before folding")
  }

  test("a torn FIRST commit reads as an empty table, not an error") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)
    // simulate: codes delta written, docs delta + _committed never were
    new MorTable(spark, s"$dir/codes.mor", "doc_id")
      .upsert(Seq((1L, Seq(0L, 0L))).toDF("doc_id", "code"))
    assert(db.count() == 0, "torn first commit must read as empty")
    val db2 = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)
    assert(db2.count() == 0)
    // and a real first commit recovers the folder
    db2.addDocuments(fixture(0 until 5))
    assert(db2.count() == 5)
  }
}
