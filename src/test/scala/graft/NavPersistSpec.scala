package graft

import graft.db.{NavStore, VectorDB}
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot-versioned persistence of per-block NSW graphs
  * ([[graft.db.NavStore]] — the engine analogue of the reference's
  * `faiss.write_index_binary`, `BinaryVectorDB.py:172`):
  *   - a full serve-build writes `_nav/<version>/block-*.nav`;
  *   - re-enabling serving at the same snapshot LOADS the graphs
  *     (no rebuild) and serves identical results;
  *   - a corrupt file is rejected and the block rebuilds, still
  *     correct;
  *   - a commit sweeps stale version dirs and the next build persists
  *     under the new version.
  */
class NavPersistSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftnavp").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val corpus = (1L to 600L).map(i =>
    (i, s"tok${i % 13} tok${i % 7} tok${i % 31} tok${i % 3}")).toSeq

  private def hits(db: VectorDB, q: String, k: Int = 10): Seq[(Long, Int)] =
    db.search(q, k).collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Int]("score_hamming"))).toSeq

  private def navFiles(dir: String): Seq[java.io.File] = {
    val root = new java.io.File(dir, "_nav")
    if (!root.exists) Seq.empty
    else root.listFiles.toSeq.flatMap(_.listFiles.toSeq)
      .filter(_.getName.endsWith(".nav"))
  }

  test("serve-build persists per-block graphs; re-enable reloads them with identical results") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, index = VectorDB.IndexNsw)
    db.addDocuments(corpus.toDF("doc_id", "text"))

    val saves0 = NavStore.savesForTest.get()
    db.enableServing()
    try {
      assert(NavStore.savesForTest.get() > saves0,
        "the first serve-build must persist its block graphs")
      assert(navFiles(dir).nonEmpty, "_nav/<version>/block-*.nav must exist")
      val before = Seq("tok1 tok5", "tok12 tok2 tok30", "tok4").map(hits(db, _))

      db.disableServing()
      val loads0 = NavStore.loadsForTest.get()
      val saves1 = NavStore.savesForTest.get()
      db.enableServing()
      assert(NavStore.loadsForTest.get() > loads0,
        "re-enabling at the same snapshot must LOAD the persisted graphs")
      assert(NavStore.savesForTest.get() == saves1,
        "a fully loaded serve-build must not re-persist anything")
      val after = Seq("tok1 tok5", "tok12 tok2 tok30", "tok4").map(hits(db, _))
      assert(after == before, "reloaded graphs must serve identical results")
    } finally db.disableServing()
  }

  test("a corrupt nav file is rejected and the block rebuilds, still correct") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, index = VectorDB.IndexNsw)
    db.addDocuments(corpus.toDF("doc_id", "text"))
    db.enableServing()
    val before = hits(db, "tok1 tok5")
    db.disableServing()

    val files = navFiles(dir)
    assert(files.nonEmpty)
    // truncate one file mid-body and flip another's header
    val f0 = files.head
    val raw = java.nio.file.Files.readAllBytes(f0.toPath)
    java.nio.file.Files.write(f0.toPath, raw.take(raw.length / 2))
    new java.io.File(f0.getParentFile, "." + f0.getName + ".crc").delete()

    val loads0 = NavStore.loadsForTest.get()
    val saves0 = NavStore.savesForTest.get()
    db.enableServing()
    try {
      assert(hits(db, "tok1 tok5") == before,
        "a rebuilt block must serve the same results")
      assert(NavStore.savesForTest.get() > saves0,
        "the rejected block must rebuild and re-persist")
      // the other blocks still load (more than zero loads if >1 block)
      assert(NavStore.loadsForTest.get() >= loads0)
    } finally db.disableServing()
  }

  test("a commit sweeps stale version dirs; the next build persists under the new version") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, index = VectorDB.IndexNsw)
    db.addDocuments(corpus.toDF("doc_id", "text"))
    db.enableServing()
    val v1Dirs = new java.io.File(dir, "_nav").listFiles.map(_.getName).toSet
    assert(v1Dirs.size == 1)

    db.addDocuments(Seq((9001L, "tok1 tok5 tok9")).toDF("doc_id", "text"))
    // the commit swept the old version's graphs; the serving rebuild
    // (lazy, on next search) persists under the new version
    val h = hits(db, "tok1 tok5")
    assert(h.nonEmpty)
    try {
      val v2Dirs = new java.io.File(dir, "_nav").listFiles.map(_.getName).toSet
      assert(v2Dirs.size == 1, s"stale _nav dirs must be swept, got $v2Dirs")
      assert(v2Dirs != v1Dirs, "the new build must key by the new snapshot")
      assert(navFiles(dir).nonEmpty)
    } finally db.disableServing()
  }
}
