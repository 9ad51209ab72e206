package graft

import graft.db.{BlockStore, VectorDB}
import org.scalatest.funsuite.AnyFunSuite

/** Warm RESTART of the serving tier across process boundaries (MOR +
  * incremental serving + a nav strategy): the commit-time sweep
  * retains the newest complete persisted build (`_blocks`/`_nav`) as a
  * SEED even with no live pin, and a fresh instance whose current
  * version has no persisted blocks chain-extends that seed with the
  * missed commit windows (`VectorDB.tryWarmChainRestart`) instead of
  * paying the full cold codes⋈docs + graph build.
  *
  * The contract under test:
  *   - writer commits with no serving resident do NOT delete the seed;
  *   - a fresh instance warm-restarts: block IO happens (loads grow),
  *     no new full build persists (saves flat), the chain is depth 1,
  *     and every result — including upserts and tombstones committed
  *     in the missed window — is exactly the Catalyst twin's;
  *   - a compaction folds the windows a chain would read, so it
  *     invalidates the seed: the sweep deletes it and the next
  *     serve-enable goes cold (and persists fresh under the new
  *     version).
  */
class WarmRestartSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftwarm").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val corpus = (1L to 400L).map(i =>
    (i, s"tok${i % 13} tok${i % 7} tok${i % 31} tok${i % 3}")).toSeq

  private def hits(db: VectorDB, q: String, k: Int = 10): Seq[(Long, Int, Double, String)] =
    db.search(q, k).collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Int]("score_hamming"), r.getAs[Double]("score_cossim"),
      r.getAs[String]("doc"))).toSeq

  private def blockDirs(dir: String): Set[String] = {
    val root = new java.io.File(dir, "_blocks")
    if (!root.exists) Set.empty else root.listFiles.map(_.getName).toSet
  }

  private def navDirs(dir: String): Set[String] = {
    val root = new java.io.File(dir, "_nav")
    if (!root.exists) Set.empty else root.listFiles.map(_.getName).toSet
  }

  /** Build + persist a served base at version 1, then drop serving so
    * nothing pins it — the restart precondition.
    */
  private def seededDb(dir: String): VectorDB = {
    val db = VectorDB.openOrCreate(spark, dir,
      storage = VectorDB.StorageMor, index = VectorDB.IndexNsw)
      .blockPersistence(0L).incrementalServing(absorbDepth = 0)
    db.addDocuments(corpus.toDF("doc_id", "text"))
    db.enableServing()
    assert(hits(db, "tok1 tok5").nonEmpty)
    db.disableServing()
    db
  }

  test("writer commits with no serving resident retain the persisted seed") {
    val dir = freshDir()
    val db = seededDb(dir)
    val v1 = blockDirs(dir)
    assert(v1.size == 1, s"one persisted build expected, got $v1")

    // Two commits with nothing resident: the old sweep would delete
    // the unpinned non-current dirs at each installVersion.
    db.addDocuments(Seq((9001L, "tok1 tok5 tok9")).toDF("doc_id", "text"))
    db.addDocuments(Seq((9002L, "tok2 tok6 tok9")).toDF("doc_id", "text"))

    assert(blockDirs(dir) == v1,
      s"the newest persisted build is the warm-restart seed and must " +
        s"survive commits, got ${blockDirs(dir)}")
    assert(navDirs(dir) == v1, s"_nav must track _blocks: ${navDirs(dir)}")
  }

  test("a fresh instance warm-restarts from the seed: block IO + one chain layer, no cold rebuild, results exact") {
    val dir = freshDir()
    val db1 = seededDb(dir)
    // The missed window: adds, an upsert of a live id, and a tombstone
    // — the shadowing map must mask all of it through the loaded base.
    db1.addDocuments(Seq((9001L, "tok1 tok5 tok9"),
      (9002L, "tok2 tok6 tok9")).toDF("doc_id", "text"))
    db1.addDocuments(Seq((1L, "tok12 tok4 tok30 tok2")).toDF("doc_id", "text"))
    db1.removeDocs(Seq(2L))

    // A fresh instance over the folder = the restarted process: the
    // seed's blocks are NOT resident (disableServing dropped the last
    // reference), and the current version has no persisted dir.
    val db2 = VectorDB.openOrCreate(spark, dir,
      storage = VectorDB.StorageMor, index = VectorDB.IndexNsw)
      .blockPersistence(0L).incrementalServing(absorbDepth = 0)
    val loads0 = BlockStore.loadsForTest.get()
    val saves0 = BlockStore.savesForTest.get()
    db2.enableServing()
    try {
      assert(BlockStore.loadsForTest.get() > loads0,
        "the restart must stream the seed's packed blocks back from disk")
      assert(BlockStore.savesForTest.get() == saves0,
        "a warm chain restart must not pay (or persist) a full rebuild")
      val info = db2.servingInfo()
      assert(info.resident && info.chainDepth == 1,
        s"the missed window must land as ONE chain layer, got $info")

      // Exactness: the Catalyst path at the same snapshot is the oracle.
      val twin = VectorDB.openOrCreate(spark, dir,
        storage = VectorDB.StorageMor, index = VectorDB.IndexNsw)
      for (q <- Seq("tok1 tok5", "tok2 tok6 tok9", "tok12 tok4 tok30 tok2"))
        assert(hits(db2, q, 15) == hits(twin, q, 15), s"query '$q' diverged")
      val served = hits(db2, "tok12 tok4 tok30 tok2", 400)
      assert(served.exists(_._1 == 1L), "the upserted row must serve")
      assert(!served.exists(h => h._1 == 1L && h._4.startsWith("tok1 ")),
        "the upsert must shadow the seed's old row")
      assert(!served.exists(_._1 == 2L), "the tombstoned id must not serve")
    } finally db2.disableServing()
  }

  test("a compaction invalidates the seed: swept, and the next serve-enable goes cold") {
    val dir = freshDir()
    val db = seededDb(dir)
    db.addDocuments(Seq((9001L, "tok1 tok5 tok9")).toDF("doc_id", "text"))
    assert(blockDirs(dir).size == 1, "seed retained before the fold")

    db.compact() // folds the windows a chain would read
    assert(blockDirs(dir).isEmpty,
      s"a folded seed is dead weight and must be swept, got ${blockDirs(dir)}")

    val saves0 = BlockStore.savesForTest.get()
    db.enableServing()
    try {
      assert(BlockStore.savesForTest.get() > saves0,
        "no usable seed after a fold: the build must go cold and persist fresh")
      assert(hits(db, "tok1 tok5").nonEmpty)
    } finally db.disableServing()
  }
}
