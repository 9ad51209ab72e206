package graft

import graft.db.{BlockStore, NavStore, VectorDB}
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot-versioned persistence of the packed serving-block arrays
  * ([[graft.db.BlockStore]] — `_blocks/<version>/block-*.blk`, the
  * sibling of `_nav`): with both stores fresh, a warm `enableServing`
  * at an unchanged snapshot is pure IO — no codes⋈docs join, no block
  * assembly, no graph build (the r13 47–74 s warm wall at 4M-row
  * blocks).
  *
  * Contract under test:
  *   - a full serve-build under a nav strategy persists its blocks and
  *     (only once all landed) a manifest;
  *   - re-enabling at the same snapshot LOADS the blocks (counter-
  *     verified) and serves IDENTICAL results — including the exact
  *     funnel's scores, which touch every persisted field (ids, words,
  *     int8 payload bytes, docs);
  *   - a corrupt block file fails its CRC and the whole warm path
  *     falls back to the cold build, still correct;
  *   - a missing manifest (or one built under a different block-count
  *     pin) gates the warm path off;
  *   - a commit sweeps stale `_blocks` version dirs.
  */
class BlockPersistSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftblkp").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val corpus = (1L to 600L).map(i =>
    (i, s"tok${i % 13} tok${i % 7} tok${i % 31} tok${i % 3}")).toSeq

  /** Full funnel rows: doc_id + hamming + cosine + the doc payload —
    * every field the persisted blocks carry feeds one of these.
    */
  private def hits(db: VectorDB, q: String, k: Int = 10): Seq[(Long, Int, Double, String)] =
    db.search(q, k).collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Int]("score_hamming"), r.getAs[Double]("score_cossim"),
      r.getAs[String]("doc"))).toSeq

  private def blockFiles(dir: String): Seq[java.io.File] = {
    val root = new java.io.File(dir, "_blocks")
    if (!root.exists) Seq.empty
    else root.listFiles.toSeq.flatMap(_.listFiles.toSeq)
      .filter(_.getName.endsWith(".blk"))
  }

  private def manifestFiles(dir: String): Seq[java.io.File] = {
    val root = new java.io.File(dir, "_blocks")
    if (!root.exists) Seq.empty
    else root.listFiles.toSeq.flatMap(_.listFiles.toSeq)
      .filter(_.getName == "_manifest")
  }

  test("serve-build persists blocks + manifest; re-enable loads them, identical results, no join") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, index = VectorDB.IndexNsw)
      .blockPersistence(0L)
    db.addDocuments(corpus.toDF("doc_id", "text"))

    val saves0 = BlockStore.savesForTest.get()
    db.enableServing()
    try {
      assert(BlockStore.savesForTest.get() > saves0,
        "the first serve-build must persist its packed blocks")
      assert(blockFiles(dir).nonEmpty, "_blocks/<version>/block-*.blk must exist")
      assert(manifestFiles(dir).size == 1,
        "a complete build must write exactly one manifest")
      val before = Seq("tok1 tok5", "tok12 tok2 tok30", "tok4").map(hits(db, _))

      db.disableServing()
      val loads0 = BlockStore.loadsForTest.get()
      val saves1 = BlockStore.savesForTest.get()
      val navLoads0 = NavStore.loadsForTest.get()
      db.enableServing()
      assert(BlockStore.loadsForTest.get() > loads0,
        "re-enabling at the same snapshot must LOAD the persisted blocks")
      assert(BlockStore.savesForTest.get() == saves1,
        "a fully loaded serve-build must not re-persist anything")
      assert(NavStore.loadsForTest.get() > navLoads0,
        "the warm path must reattach the persisted navs too")
      val after = Seq("tok1 tok5", "tok12 tok2 tok30", "tok4").map(hits(db, _))
      assert(after == before,
        "loaded blocks must serve identical results (ids, scores, docs)")
    } finally db.disableServing()
  }

  test("a corrupt block file fails its CRC; the warm path falls back to a cold build, still correct") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, index = VectorDB.IndexNsw)
      .blockPersistence(0L)
    db.addDocuments(corpus.toDF("doc_id", "text"))
    db.enableServing()
    val before = hits(db, "tok1 tok5")
    db.disableServing()

    val files = blockFiles(dir)
    assert(files.nonEmpty)
    // flip one mid-body byte: structurally plausible, CRC-invalid
    val f0 = files.head
    val raw = java.nio.file.Files.readAllBytes(f0.toPath)
    raw(raw.length / 2) = (raw(raw.length / 2) ^ 0x5a).toByte
    java.nio.file.Files.write(f0.toPath, raw)
    new java.io.File(f0.getParentFile, "." + f0.getName + ".crc").delete()

    val saves0 = BlockStore.savesForTest.get()
    db.enableServing()
    try {
      assert(hits(db, "tok1 tok5") == before,
        "the fallback cold build must serve the same results")
      assert(BlockStore.savesForTest.get() > saves0,
        "the cold fallback must re-persist fresh blocks")
    } finally db.disableServing()
  }

  test("no manifest (or a different block-count pin) gates the warm path off") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, index = VectorDB.IndexNsw)
      .blockPersistence(0L)
    db.addDocuments(corpus.toDF("doc_id", "text"))
    db.enableServing(blocks = 2)
    val before = hits(db, "tok1 tok5")
    db.disableServing()
    assert(manifestFiles(dir).size == 1)

    // Different pin: the manifest's requestedBlocks mismatches — cold.
    val loads0 = BlockStore.loadsForTest.get()
    db.enableServing(blocks = 1)
    assert(BlockStore.loadsForTest.get() == loads0,
      "a different enableServing(blocks) pin must not adopt the old layout")
    assert(hits(db, "tok1 tok5") == before)
    db.disableServing()

    // Deleted manifest: block files alone must not be trusted.
    manifestFiles(dir).foreach(_.delete())
    val loads1 = BlockStore.loadsForTest.get()
    db.enableServing(blocks = 2)
    try {
      assert(BlockStore.loadsForTest.get() == loads1,
        "no manifest means the build went cold")
      assert(hits(db, "tok1 tok5") == before)
    } finally db.disableServing()
  }

  test("the commit-time sweep defers dirs a live scan still pins; the writer re-sweeps on release") {
    // A warm-loaded scan's partitions recompute from their _blocks
    // files, so the commit must NOT delete a version's dirs while some
    // holder still serves it — a storage-loss recompute would die on
    // the deleted path (BlockLoadFailed) with no fallback. A second
    // instance over the same folder shares the v1 blocks through
    // BlockCache and keeps serving its snapshot across the writer's
    // commit; only after it releases may the writer finish the sweep.
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, index = VectorDB.IndexNsw)
      .blockPersistence(0L)
    db.addDocuments(corpus.toDF("doc_id", "text"))
    db.enableServing()
    val db2 = VectorDB.openOrCreate(spark, dir, index = VectorDB.IndexNsw)
      .blockPersistence(0L)
    db2.enableServing()
    assert(db2.search("tok1 tok5", 5).collect().nonEmpty) // pin v1 on db2
    val v1Dirs = new java.io.File(dir, "_blocks").listFiles.map(_.getName).toSet
    assert(v1Dirs.size == 1)

    db.addDocuments(Seq((9001L, "tok1 tok5 tok9")).toDF("doc_id", "text"))
    // After the commit, db2 still pins the v1 scan, so its dirs must
    // survive the sweep (the writer's own ref was dropped at commit).
    val postCommit = new java.io.File(dir, "_blocks").listFiles.map(_.getName).toSet
    assert(postCommit == v1Dirs,
      s"a pinned version's _blocks dir must be deferred, not swept: $postCommit")

    db2.disableServing() // last holder of v1 releases
    // The writer's next serving refresh finishes the deferred sweep.
    assert(hits(db, "tok1 tok5").nonEmpty)
    try {
      val afterRefresh = new java.io.File(dir, "_blocks").listFiles.map(_.getName).toSet
      assert(afterRefresh.size == 1 && afterRefresh != v1Dirs,
        s"the deferred dir must be swept once released, got $afterRefresh")
      val navAfter = new java.io.File(dir, "_nav").listFiles.map(_.getName).toSet
      assert(navAfter == afterRefresh, s"_nav must track _blocks: $navAfter")
    } finally db.disableServing()
  }

  test("a commit sweeps stale _blocks version dirs; the next build persists under the new version") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, index = VectorDB.IndexNsw)
      .blockPersistence(0L)
    db.addDocuments(corpus.toDF("doc_id", "text"))
    db.enableServing()
    val v1Dirs = new java.io.File(dir, "_blocks").listFiles.map(_.getName).toSet
    assert(v1Dirs.size == 1)

    db.addDocuments(Seq((9001L, "tok1 tok5 tok9")).toDF("doc_id", "text"))
    val h = hits(db, "tok1 tok5")
    assert(h.nonEmpty)
    try {
      val v2Dirs = new java.io.File(dir, "_blocks").listFiles.map(_.getName).toSet
      assert(v2Dirs.size == 1, s"stale _blocks dirs must be swept, got $v2Dirs")
      assert(v2Dirs != v1Dirs, "the new build must key by the new snapshot")
      assert(blockFiles(dir).nonEmpty)
    } finally db.disableServing()
  }
}
