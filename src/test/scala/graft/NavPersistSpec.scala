package graft

import graft.db.{NavStore, NswNav, NswNavBuilder, VectorDB}
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

  test("nav codec: identity-order fast path and permuted-order remap both restore the topology") {
    // The codec has two load branches: the identity fast path (warm
    // serve-builds — the block arrays come from the same persisted
    // build, so the save-time row order matches and the remap is
    // skipped) and the remap (nav file fresh, block arrays re-assembled
    // by the join in run-dependent order). Both must restore the SAME
    // logical graph: each id keeps exactly its saved neighbor-id list.
    val n = 3000
    val nWords = 4
    val rnd = new scala.util.Random(7)
    val ids = Array.tabulate(n)(i => (i * 37 + 11).toLong)
    val words = Array.fill(n * nWords)(rnd.nextLong())
    val builder = new NswNavBuilder(8, 32, 64, buildThreads = 1)
    val nav = builder.build(ids, words, nWords).asInstanceOf[NswNav]
    val bos = new java.io.ByteArrayOutputStream()
    assert(builder.saveNav(nav, new java.io.DataOutputStream(bos)))
    val bytes = bos.toByteArray

    def load(withIds: Array[Long], withWords: Array[Long]): Option[NswNav] =
      builder.loadNav(withIds, withWords, nWords,
        new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes)))
        .map(_.asInstanceOf[NswNav])

    def topology(nv: NswNav, navIds: Array[Long]): Map[Long, Seq[Long]] = {
      val (nbs, deg, maxDeg) = nv.adjacencyView
      navIds.indices.map { r =>
        navIds(r) -> (0 until deg(r)).map(j => navIds(nbs(r * maxDeg + j)))
          .sorted.toSeq
      }.toMap
    }
    val want = topology(nav, ids)

    val same = load(ids, words)
    assert(same.isDefined, "identity order must load")
    assert(topology(same.get, ids) == want)

    val perm = rnd.shuffle((0 until n).toVector).toArray
    val pIds = Array.tabulate(n)(i => ids(perm(i)))
    val pWords = new Array[Long](n * nWords)
    perm.indices.foreach(i =>
      System.arraycopy(words, perm(i) * nWords, pWords, i * nWords, nWords))
    val moved = load(pIds, pWords)
    assert(moved.isDefined, "permuted order must load via the remap")
    assert(topology(moved.get, pIds) == want,
      "the remap must preserve every id's neighbor-id list")

    val alien = ids.clone(); alien(0) += 1
    assert(load(alien, words).isEmpty, "a foreign id set must reject")
  }

  test("nav codec v2 persists the sampled hierarchy; loads adopt it, identity and remapped") {
    // Above UpperMinRows the builder attaches a sampled upper layer;
    // v2 rides it in the file so a warm load skips the deterministic
    // rebuild (the dominant CPU of a nav load after the identity fast
    // path). Both load branches must carry an upper whose entry
    // selection reproduces the saved graph's search results id-for-id.
    val n = 10000
    val nWords = 4
    assert(n >= graft.db.NswNavBuilder.UpperMinRows)
    val rnd = new scala.util.Random(11)
    val ids = Array.tabulate(n)(i => (i * 13 + 5).toLong)
    val words = Array.fill(n * nWords)(rnd.nextLong())
    val builder = new NswNavBuilder(8, 32, 64, buildThreads = 1)
    val nav = builder.build(ids, words, nWords).asInstanceOf[NswNav]
    assert(nav.upperView._1 != null, "the build must attach an upper at this size")
    val bos = new java.io.ByteArrayOutputStream()
    assert(builder.saveNav(nav, new java.io.DataOutputStream(bos)))
    val bytes = bos.toByteArray

    def load(withIds: Array[Long], withWords: Array[Long]): NswNav =
      builder.loadNav(withIds, withWords, nWords,
        new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes)))
        .map(_.asInstanceOf[NswNav])
        .getOrElse(fail("v2 file must load"))

    def topIds(nv: NswNav, navIds: Array[Long], q: Array[Long]): Seq[Long] =
      nv.topPacked(q, 10, _ => true).map(p => navIds((p & 0xffffffffL).toInt)).toSeq

    val queries = (0 until 5).map(_ => Array.fill(nWords)(rnd.nextLong()))

    val same = load(ids, words)
    assert(same.upperView._1 != null, "identity load must adopt the persisted upper")
    queries.foreach(q => assert(topIds(same, ids, q) == topIds(nav, ids, q),
      "identity load must reproduce the saved graph's results exactly"))

    val perm = rnd.shuffle((0 until n).toVector).toArray
    val pIds = Array.tabulate(n)(i => ids(perm(i)))
    val pWords = new Array[Long](n * nWords)
    perm.indices.foreach(i =>
      System.arraycopy(words, perm(i) * nWords, pWords, i * nWords, nWords))
    val moved = load(pIds, pWords)
    assert(moved.upperView._1 != null, "remapped load must adopt the persisted upper")
    // Partial-width results are entry-dependent and the STRIDE entries
    // are row-index-based, so a permuted block legitimately starts
    // elsewhere; the invariant that survives any row order is the
    // EXACTNESS contract — at b >= n the remapped graph must reproduce
    // brute force, which the saved graph's full-width results also are.
    queries.foreach { q =>
      assert(moved.topPacked(q, n, _ => true)
          .map(p => pIds((p & 0xffffffffL).toInt)).toSeq ==
        nav.topPacked(q, n, _ => true)
          .map(p => ids((p & 0xffffffffL).toInt)).toSeq,
        "the remapped load must stay exact at full width")
    }
  }
}
