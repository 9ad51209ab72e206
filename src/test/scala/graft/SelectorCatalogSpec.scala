package graft

import graft.db.{RunIdSet, SelectorCatalog, VectorDB}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The JVM-wide selector catalog ([[VectorDB.selectorCached]]): repeated
  * compiles of one (folder, snapshot, predicate) share ONE compiled
  * handle; entries stay warm at refcount zero (the skipped rebuild) and
  * free when a commit supersedes their snapshot — immediately if
  * unreferenced, at last release if held. Results through a cached
  * handle must be identical to an uncached [[VectorDB.selector]].
  */
class SelectorCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftdb").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def fixture(n: Int, from: Int = 0): org.apache.spark.sql.DataFrame =
    (from until (from + n)).map(i => (i.toLong,
      s"document number $i about topic ${i % 13}")).toDF("doc_id", "text")

  private val qv = (0 until 64).map(i => math.sin(i * 1.3 + 0.5) / 8.0)
  private val pred = col("doc").contains(" topic 5")

  test("same predicate returns the same handle; warm at zero refs; rebuild skipped") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(200))
    val folder = db.blockCacheKey.folder
    assert(SelectorCatalog.liveFor(folder) == 0)

    val s1 = db.selectorCached(pred)
    val s2 = db.selectorCached(pred)
    assert(s1 eq s2, "second compile of the same predicate must be a cache hit")
    assert(s1.isCached && SelectorCatalog.liveFor(folder) == 1)
    assert(SelectorCatalog.refsFor(s1.catalogKey.get) == 2)

    s1.release()
    assert(SelectorCatalog.refsFor(s2.catalogKey.get) == 1)
    s2.release()
    // zero refs, version still current: the entry stays WARM …
    assert(SelectorCatalog.liveFor(folder) == 1)
    // … so a later compile is the same object again (no Catalyst rebuild)
    val s3 = db.selectorCached(pred)
    assert(s3 eq s1)
    s3.release()
    db.clearSelectorCache()
    assert(SelectorCatalog.liveFor(folder) == 0)
  }

  test("distinct predicates and distinct shape knobs key apart") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(150))
    val folder = db.blockCacheKey.folder
    val a = db.selectorCached(pred)
    val b = db.selectorCached(col("doc").contains(" topic 6"))
    val c = db.selectorCached(pred, maxBroadcast = 0, runSize = 4)
    assert((a ne b) && (a ne c))
    assert(SelectorCatalog.liveFor(folder) == 3)
    assert(!a.isFileBacked && c.isFileBacked)
    Seq(a, b, c).foreach(_.release())
    db.clearSelectorCache()
    assert(SelectorCatalog.liveFor(folder) == 0)
  }

  test("a commit supersedes warm entries; the recompile sees the new snapshot") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(200))
    val folder = db.blockCacheKey.folder
    val before = db.selectorCached(pred)
    val sizeBefore = before.size
    before.release() // warm
    assert(SelectorCatalog.liveFor(folder) == 1)

    db.addDocuments(fixture(100, from = 200)) // commit → supersede
    assert(SelectorCatalog.liveFor(folder) == 0,
      "unreferenced stale entry must free at commit")

    val after = db.selectorCached(pred)
    assert(after ne before)
    assert(after.size > sizeBefore,
      "recompiled selector must reflect the post-commit match set")
    after.release()
    db.clearSelectorCache()
  }

  test("a handle held across a commit keeps its ids until its last release") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(200))
    val folder = db.blockCacheKey.folder
    val held = db.selectorCached(pred)
    val sizeAtCompile = held.size
    db.addDocuments(fixture(100, from = 200))
    // stale but held: still resident, still probes its frozen id set
    assert(SelectorCatalog.liveFor(folder) == 1)
    assert(held.size == sizeAtCompile)
    val probe = held.idSet.probe()
    val frozenIds = db.docs.filter(pred).filter(col("doc_id") < 200)
      .select("doc_id").collect().map(_.getLong(0))
    assert(frozenIds.nonEmpty && frozenIds.forall(probe.contains))
    held.release()
    assert(SelectorCatalog.liveFor(folder) == 0,
      "stale entry must free at last release")
  }

  test("file-backed cached selector: run files live while warm, deleted on supersede") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(150))
    val sel = db.selectorCached(pred, maxBroadcast = 0, runSize = 4)
    assert(sel.isFileBacked)
    val runDir = new java.io.File(
      new java.net.URI(sel.idSet.asInstanceOf[RunIdSet].dir).getPath)
    assert(runDir.exists)
    sel.release()
    assert(runDir.exists, "warm file-backed entry keeps its run files")
    db.addDocuments(fixture(50, from = 150))
    assert(!runDir.exists, "superseded unreferenced entry deletes its run files")
    db.clearSelectorCache()
  }

  test("a fresh JVM adopts a persisted file-backed selector instead of recompiling") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(200))
    val folder = db.blockCacheKey.folder

    val built = db.selectorCached(pred, maxBroadcast = 0, runSize = 4)
    assert(built.isFileBacked)
    val builtDir = built.idSet.asInstanceOf[RunIdSet].dir
    assert(new java.io.File(new java.net.URI(builtDir).getPath, "manifest").exists,
      "cataloged file-backed selector must persist its manifest")
    val expectIds = db.docs.filter(pred).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    built.release()

    // simulate a fresh JVM: empty catalog, files still on the shared FS
    SelectorCatalog.forgetForTest(folder)
    val adopted = db.selectorCached(pred, maxBroadcast = 0, runSize = 4)
    assert(adopted ne built)
    assert(adopted.isFileBacked &&
      adopted.idSet.asInstanceOf[RunIdSet].dir == builtDir,
      "adoption must reuse the SAME run files, not write new ones")
    assert(!adopted.idSet.asInstanceOf[RunIdSet].owned)
    assert(adopted.size == built.size)
    val probe = adopted.idSet.probe()
    assert(expectIds.forall(probe.contains) &&
      !probe.contains(-1L) && !probe.contains(1000000L))

    // an adopted handle must NOT delete the owner's files: release is
    // a catalog decrement, the dir stays for the rest of the fleet
    adopted.release()
    assert(new java.io.File(new java.net.URI(builtDir).getPath).exists,
      "adopted release must leave the building JVM's run files in place")

    // a commit supersedes the manifest; the WRITER's orphan sweep then
    // reclaims the dir (no live in-JVM entry backs it — the builder
    // was 'a dead JVM' here), and the recompile must not adopt it
    db.addDocuments(fixture(20, from = 200))
    assert(SelectorCatalog.liveFor(folder) == 0)
    assert(!new java.io.File(new java.net.URI(builtDir).getPath).exists,
      "the writer's commit must sweep orphaned superseded selector dirs")
    val fresh = db.selectorCached(pred, maxBroadcast = 0, runSize = 4)
    assert(fresh.idSet.asInstanceOf[RunIdSet].dir != builtDir,
      "a superseded manifest must not be adopted under the new snapshot")
    assert(fresh.size > built.size)
    // a held selector's files survive the sweep until its last release
    db.addDocuments(fixture(10, from = 220))
    val freshDirPath = new java.io.File(
      new java.net.URI(fresh.idSet.asInstanceOf[RunIdSet].dir).getPath)
    assert(freshDirPath.exists,
      "held superseded selector must keep its files through the sweep")
    fresh.release()
    assert(!freshDirPath.exists, "freed at last release")
    db.clearSelectorCache()
  }

  test("manifests are portable: a moved/replicated folder adopts its own copies") {
    val dir1 = freshDir()
    val db1 = VectorDB.openOrCreate(spark, dir1)
    db1.addDocuments(fixture(150))
    val sel1 = db1.selectorCached(pred, maxBroadcast = 0, runSize = 4)
    val expect = db1.docs.filter(pred).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    sel1.release() // warm entry: files + manifest stay on disk
    SelectorCatalog.forgetForTest(db1.blockCacheKey.folder)

    // replicate the WHOLE folder to a new path (rsync-style move)
    val dir2 = freshDir()
    def copyTree(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs()
        src.listFiles().foreach(f => copyTree(f, new java.io.File(dst, f.getName)))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath)
    }
    copyTree(new java.io.File(dir1), new java.io.File(dir2))

    val db2 = VectorDB.openOrCreate(spark, dir2)
    val adopted = db2.selectorCached(pred, maxBroadcast = 0, runSize = 4)
    assert(adopted.isFileBacked && !adopted.idSet.asInstanceOf[RunIdSet].owned,
      "the replica must adopt, not recompile")
    assert(adopted.idSet.asInstanceOf[RunIdSet].dir.startsWith(dir2),
      "adoption must resolve runs under the REPLICA's path")
    val probe = adopted.idSet.probe()
    assert(expect.nonEmpty && expect.forall(probe.contains))
    adopted.release()
    db2.clearSelectorCache()
    db1.clearSelectorCache()
  }

  test("concurrent acquires: one compile per key, parallel across keys") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(300))
    val folder = db.blockCacheKey.folder
    val preds = (0 until 4).map(t => col("doc").contains(s" topic $t"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(
        java.util.concurrent.Executors.newFixedThreadPool(16))
    // 16 threads × 4 distinct predicates, 4 racing threads per predicate
    val got = Await.result(
      Future.sequence((0 until 16).map(i =>
        Future(db.selectorCached(preds(i % 4))))), Duration.Inf)
    // each predicate resolved to exactly ONE shared handle…
    val byPred = got.grouped(4).toSeq.transpose
    preds.indices.foreach { p =>
      val handles = got.zipWithIndex.collect { case (s, i) if i % 4 == p => s }
      assert(handles.forall(_ eq handles.head),
        s"predicate $p produced ${handles.map(System.identityHashCode).distinct.size} handles")
      assert(SelectorCatalog.refsFor(handles.head.catalogKey.get) == 4)
    }
    assert(byPred.size == 4 && SelectorCatalog.liveFor(folder) == 4)
    got.foreach(_.release())
    db.clearSelectorCache()
    assert(SelectorCatalog.liveFor(folder) == 0)
  }

  test("a failed compile is not cached; the next acquire retries") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(50))
    val folder = db.blockCacheKey.folder
    val bad = col("no_such_column") === 1
    intercept[Exception] { db.selectorCached(bad) }
    assert(SelectorCatalog.liveFor(folder) == 0,
      "a failed compile must not leave a poisoned entry")
    val ok = db.selectorCached(pred)
    assert(ok.size > 0)
    ok.release()
    db.clearSelectorCache()
  }

  test("filtered search through a cached selector == through an uncached one") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(260))
    db.enableServing()
    val plain = db.selector(pred)
    val cached = db.selectorCached(pred)
    val viaPlain = db.searchVectorWhere(qv, plain, 6, 8, 3, Int.MaxValue)
      .collect().toSeq.map(_.toSeq)
    val viaCached = db.searchVectorWhere(qv, cached, 6, 8, 3, Int.MaxValue)
      .collect().toSeq.map(_.toSeq)
    assert(viaCached == viaPlain)
    plain.release()
    cached.release()
    db.disableServing()
    db.clearSelectorCache()
  }
}
