package graft

import graft.db.VectorDB
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The selector SCALE PATH: past `maxBroadcast` matches,
  * [[VectorDB.selector]] materializes the sorted ids as range-partitioned
  * binary run files on the shared FS instead of one broadcast array; the
  * scan probes a (min, max, path) manifest and lazily loads only the runs
  * it touches. Exact-membership semantics must be INDISTINGUISHABLE from
  * the broadcast shape — every spec here pins the file-backed selector
  * against the broadcast selector and the predicate (Catalyst) path on
  * identical inputs, across layouts, entry points, and run boundaries.
  */
class LargeSelectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftdb").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def fixture(n: Int): org.apache.spark.sql.DataFrame =
    (0 until n).map(i => (i.toLong,
      s"document number $i about topic ${i % 7} tail ${"z" * (i % 5)}"))
      .toDF("doc_id", "text")

  private def asComparable(rows: Array[Row]): Seq[Seq[Any]] =
    rows.toSeq.map(_.toSeq)

  private val qv = (0 until 64).map(i => math.sin(i * 1.7 + 0.2) / 6.0)
  // matches ~1/7 of the corpus — plenty past a tiny maxBroadcast
  private val pred = col("doc").contains(" topic 3 ")

  test("past maxBroadcast the selector goes file-backed; sizes agree") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(280))
    val small = db.selector(pred)
    val big = db.selector(pred, maxBroadcast = 3, runSize = 11)
    assert(!small.isFileBacked)
    assert(big.isFileBacked, "forcing maxBroadcast below the match count " +
      "must produce the file-backed shape")
    assert(big.size == small.size)
    assert(big.size > 3)
    small.release(); big.release()
  }

  test("file-backed membership is exact at run boundaries") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(300))
    val matching = db.docs.filter(pred).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val sel = db.selector(pred, maxBroadcast = 0, runSize = 7)
    assert(sel.isFileBacked)
    // probe through the same interface the scan uses
    val probe = sel.idSet.probe()
    matching.foreach(id => assert(probe.contains(id), s"member $id missed"))
    // every non-member in range, including each run-boundary neighbor
    val members = matching.toSet
    (matching.min - 2 to matching.max + 2)
      .filterNot(members.contains)
      .foreach(id => assert(!probe.contains(id), s"non-member $id leaked in"))
    sel.release()
  }

  test("file-backed selector == broadcast selector == predicate path (flat, served)") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(300))
    val viaPred = asComparable(db.searchVectorWhere(qv, pred, k = 9,
      binaryOversample = 6, int8Oversample = 2).collect())
    db.enableServing()
    val bc = db.selector(pred)
    val fb = db.selector(pred, maxBroadcast = 1, runSize = 13)
    val viaBc = asComparable(db.searchVectorWhere(qv, bc, 9, 6, 2,
      Int.MaxValue).collect())
    val viaFb = asComparable(db.searchVectorWhere(qv, fb, 9, 6, 2,
      Int.MaxValue).collect())
    assert(viaBc == viaPred)
    assert(viaFb == viaPred,
      s"file-backed selector diverged:\n$viaFb\nvs\n$viaPred")
    bc.release(); fb.release()
    db.disableServing()
  }

  test("file-backed selector under IVF probing and searchMany batches") {
    val db = VectorDB.openOrCreate(spark, freshDir(),
      index = VectorDB.IndexIvf, ivfCells = 8)
    db.addDocuments(fixture(300))
    db.enableServing()
    val bc = db.selector(pred)
    val fb = db.selector(pred, maxBroadcast = 1, runSize = 10)
    val viaBc = asComparable(db.searchVectorWhere(qv, bc, 5, 6, 2, 4).collect())
    val viaFb = asComparable(db.searchVectorWhere(qv, fb, 5, 6, 2, 4).collect())
    assert(viaFb == viaBc, s"IVF file-backed diverged:\n$viaFb\nvs\n$viaBc")

    val queries = Seq(
      1L -> (0 until 64).map(i => math.cos(i * 0.9) / 4.0),
      2L -> (0 until 64).map(i => math.sin(i * 2.3) / 4.0))
    val manyBc = asComparable(db.searchMany(queries, k = 4, sel = Some(bc)).collect())
    val manyFb = asComparable(db.searchMany(queries, k = 4, sel = Some(fb)).collect())
    assert(manyFb == manyBc, "batched file-backed selector diverged")
    bc.release(); fb.release()
    db.disableServing()
  }

  test("file-backed selector in searchRadius == broadcast == catalyst") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(250))
    val bcCold = db.selector(pred)
    val coldRadius = db.searchRadius(qv, radius = 40, sel = Some(bcCold))
    db.enableServing()
    val bc = db.selector(pred)
    val fb = db.selector(pred, maxBroadcast = 2, runSize = 9)
    val servedBc = db.searchRadius(qv, radius = 40, sel = Some(bc))
    val servedFb = db.searchRadius(qv, radius = 40, sel = Some(fb))
    assert(servedBc == coldRadius)
    assert(servedFb == coldRadius,
      s"file-backed range search diverged:\n$servedFb\nvs\n$coldRadius")
    assert(servedFb.nonEmpty, "radius fixture should match something")
    bcCold.release(); bc.release(); fb.release()
    db.disableServing()
  }

  test("release() deletes the run files; empty match set stays correct") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir)
    db.addDocuments(fixture(120))
    val fb = db.selector(pred, maxBroadcast = 0, runSize = 8)
    assert(fb.isFileBacked)
    val selRoot = new java.io.File(s"$dir/_selectors")
    assert(selRoot.exists && selRoot.listFiles().nonEmpty)
    fb.release()
    assert(selRoot.listFiles() == null || selRoot.listFiles().isEmpty,
      "release() must delete the selector's run directory")

    // empty matches: maxBroadcast = 0 but 0 <= 0, so this stays broadcast —
    // the file path is never built for nothing
    val none = db.selector(col("doc").contains("nothing matches this"),
      maxBroadcast = 0, runSize = 8)
    assert(!none.isFileBacked && none.size == 0)
    db.enableServing()
    assert(db.searchHits(qv, k = 5, sel = Some(none)).isEmpty)
    none.release()
    db.disableServing()
  }
}
