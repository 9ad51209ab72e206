package graft

import graft.db.{BlockCache, VectorDB}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The SHARED prepared-block cache: every [[VectorDB]] instance over the
  * same folder in one application serves from ONE refcounted block set
  * ([[graft.db.BlockCache]]) instead of each pinning its own copy — and
  * a commit through ANY instance moves the folder's snapshot version, so
  * the other instances re-acquire fresh blocks on their next search
  * rather than serving a stale snapshot forever. These specs pin:
  * identity (same blocks object), accounting (refcounts, entry counts,
  * release-at-zero), freshness (cross-instance commits observed), and
  * parity (all sharers answer identically).
  */
class SharedBlocksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftdb").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def fixture(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"document number $i about topic ${i % 11}"))
      .toDF("doc_id", "text")

  private def asComparable(rows: Array[Row]): Seq[Seq[Any]] =
    rows.toSeq.map(_.toSeq)

  private val qv = (0 until 64).map(i => math.cos(i * 1.1 + 0.3) / 7.0)

  test("two instances over one folder share ONE block set") {
    val dir = freshDir()
    val db1 = VectorDB.openOrCreate(spark, dir)
    db1.addDocuments(fixture(0 until 150))
    db1.enableServing()
    val db2 = VectorDB.openOrCreate(spark, dir)
    db2.enableServing()

    val key = db1.blockCacheKey
    assert(db2.blockCacheKey == key, "same folder must map to one cache key")
    assert(BlockCache.liveEntriesFor(key.folder) == 1,
      "a second instance must reuse the first's blocks, not build its own")
    assert(db1.preparedForTest.get eq db2.preparedForTest.get,
      "both instances must hold the SAME PreparedScan object")
    val v = db1.preparedVersionForTest.get
    assert(BlockCache.refsFor(key, v) == 2)

    // parity: both sharers answer identically
    val h1 = db1.searchHits(qv, k = 7)
    val h2 = db2.searchHits(qv, k = 7)
    assert(h1 == h2, "sharers must answer identically from the shared blocks")

    db1.disableServing()
    assert(BlockCache.refsFor(key, v) == 1)
    // db2 still serves fine after db1 let go
    assert(db2.searchHits(qv, k = 7) == h2)
    db2.disableServing()
    assert(BlockCache.liveEntriesFor(key.folder) == 0,
      "last release must free the blocks")
  }

  test("a commit through one instance refreshes the other's serving view") {
    val dir = freshDir()
    val db1 = VectorDB.openOrCreate(spark, dir)
    db1.addDocuments(fixture(0 until 120))
    db1.enableServing()
    val db2 = VectorDB.openOrCreate(spark, dir)
    db2.enableServing()
    val key = db1.blockCacheKey
    val vOld = db1.preparedVersionForTest.get

    // db2 commits; db1 must see the new rows on its NEXT search
    db2.addDocuments(fixture(1000 until 1010))
    val exhaustive1 = db1.searchHits(qv, k = 200,
      binaryOversample = 200, int8Oversample = 200)
    assert(exhaustive1.map(_.docId).toSet.contains(1005L),
      "instance 1 kept serving the pre-commit snapshot after instance 2 committed")
    assert(db1.preparedVersionForTest.get != vOld)

    // db2 re-acquires the same NEW entry: back to one shared set
    db2.searchHits(qv, k = 5)
    assert(BlockCache.liveEntriesFor(key.folder) == 1,
      "stale blocks must be gone and both instances on the new snapshot")
    assert(db1.preparedForTest.get eq db2.preparedForTest.get)

    // parity holds on the new snapshot
    assert(db1.searchHits(qv, k = 9) == db2.searchHits(qv, k = 9))

    // and the refreshing instance's Catalyst tier moved too
    assert(db1.count() == 130)
    db1.disableServing(); db2.disableServing()
  }

  test("cross-instance freshness holds under merge-on-read storage") {
    val dir = freshDir()
    val db1 = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)
    db1.addDocuments(fixture(0 until 80))
    db1.enableServing()
    val db2 = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)
    db2.enableServing()
    assert(BlockCache.liveEntriesFor(db1.blockCacheKey.folder) == 1)

    db2.removeDocs(Seq(3L, 7L))
    val ids = db1.searchHits(qv, k = 100, binaryOversample = 100,
      int8Oversample = 100).map(_.docId).toSet
    assert(!ids.contains(3L) && !ids.contains(7L),
      "instance 1 still serves rows instance 2 deleted")
    assert(ids.size == 78)

    db2.compact()
    val afterCompact = db1.searchHits(qv, k = 100, binaryOversample = 100,
      int8Oversample = 100).map(_.docId).toSet
    assert(afterCompact == ids, "compaction must not change results")
    db1.disableServing(); db2.disableServing()
  }

  test("the version marker makes reopen-in-a-new-handle see the latest snapshot") {
    val dir = freshDir()
    val db1 = VectorDB.openOrCreate(spark, dir)
    db1.addDocuments(fixture(0 until 50))
    // no serving anywhere yet; commit again so a marker exists
    db1.addDocuments(fixture(50 until 60))
    val marker = new java.io.File(s"$dir/_snapshot")
    assert(marker.exists, "commits must write the _snapshot version marker")

    val db2 = VectorDB.openOrCreate(spark, dir)
    db2.enableServing()
    assert(db2.searchHits(qv, k = 100, binaryOversample = 100,
      int8Oversample = 100).map(_.docId).toSet == (0L until 60L).toSet)
    db2.disableServing()
  }

  test("pollMarkerEvery adopts a commit made outside this JVM's version map") {
    val dir = freshDir()
    val db1 = VectorDB.openOrCreate(spark, dir)
    db1.addDocuments(fixture(0 until 70))
    db1.enableServing()
    val key = db1.blockCacheKey
    val vOld = db1.preparedVersionForTest.get
    val staleIds = db1.searchHits(qv, k = 200, binaryOversample = 200,
      int8Oversample = 200).map(_.docId).toSet

    // another handle commits (marker moves on disk), then we rewind the
    // in-JVM version map — exactly the state a commit from a DIFFERENT
    // JVM leaves behind: disk new, this JVM's map old
    val writer = VectorDB.openOrCreate(spark, dir)
    writer.addDocuments(fixture(2000 until 2005))
    BlockCache.forceVersionForTest(key, vOld)

    // without polling, db1 keeps serving the old snapshot (stale map)
    assert(db1.searchHits(qv, k = 200, binaryOversample = 200,
      int8Oversample = 200).map(_.docId).toSet == staleIds,
      "sanity: stale map must keep the old snapshot visible")

    // with polling, the next search past the interval adopts the marker
    db1.pollMarkerEvery(1)
    Thread.sleep(10)
    val freshIds = db1.searchHits(qv, k = 200, binaryOversample = 200,
      int8Oversample = 200).map(_.docId).toSet
    assert(freshIds.contains(2003L),
      "polling must surface the externally committed snapshot")
    assert(freshIds.size == 75)
    db1.disableServing()
  }

  test("serving results stay identical to the Catalyst path across a shared refresh") {
    val dir = freshDir()
    val db1 = VectorDB.openOrCreate(spark, dir)
    db1.addDocuments(fixture(0 until 90))
    db1.enableServing()
    val db2 = VectorDB.openOrCreate(spark, dir)
    db2.addDocuments(fixture(500 until 505)) // db2 never serving: pure Catalyst
    val served = asComparable(db1.searchVector(qv, k = 8).collect())
    db2.disableServing() // no-op; db2 was never serving
    val catalyst = asComparable(db2.searchVector(qv, k = 8).collect())
    assert(served == catalyst,
      "post-refresh served results must equal the Catalyst path on the same snapshot")
    db1.disableServing()
  }
}
