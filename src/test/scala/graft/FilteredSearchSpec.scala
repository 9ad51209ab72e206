package graft

import graft.db.VectorDB
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-filtered search: the funnel restricted to rows whose doc
  * payload satisfies a predicate. Two independent implementations must
  * agree bit for bit:
  *  - the Catalyst path ([[VectorDB.searchVectorWhere]] with a raw
  *    `Column`): predicate pushed into the cold-tier scan, matching ids
  *    semi-joined into Phase I;
  *  - the serving path (a compiled [[graft.db.DocSelector]]): a sorted
  *    broadcast id allowlist checked inside the prepared scan's
  *    heap-insert step (the faiss IDSelectorBatch shape).
  * Their agreement across flat/IVF layouts and batch/single entry
  * points is the spec's main oracle; completeness is pinned by
  * exhausting a small match set.
  */
class FilteredSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftdb").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def fixture(n: Int): org.apache.spark.sql.DataFrame =
    (0 until n).map(i => (i.toLong,
      s"document number $i about topic ${i % 13} tail ${"y" * (i % 4)}"))
      .toDF("doc_id", "text")

  private def asComparable(rows: Array[Row]): Seq[Seq[Any]] =
    rows.toSeq.map(_.toSeq)

  private val qv = (0 until 64).map(i => math.sin(i * 1.3 + 0.5) / 8.0)
  private val pred = col("doc").contains(" topic 5 ")

  test("predicate path: every hit satisfies the predicate; k exhausts the match set") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(260))
    val matching = db.docs.filter(pred).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(matching.nonEmpty && matching.size < 260)

    val got = db.searchVectorWhere(qv, pred, k = 300,
      binaryOversample = 300, int8Oversample = 300).collect()
    assert(got.map(_.getLong(0)).toSet == matching,
      "filtered funnel with exhaustive k must return exactly the match set")
    assert(got.forall(_.getString(4).contains(" topic 5 ")))
  }

  test("selector (serving) path == predicate (catalyst) path, flat layout") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(300))
    val viaPred = asComparable(db.searchVectorWhere(qv, pred, k = 7,
      binaryOversample = 5, int8Oversample = 2).collect())
    db.enableServing()
    val sel = db.selector(pred)
    val viaSel = asComparable(db.searchVectorWhere(qv, sel, 7, 5, 2,
      Int.MaxValue).collect())
    assert(viaSel == viaPred, s"selector diverged:\n$viaSel\nvs\n$viaPred")
    // without serving, the selector overload falls back to its predicate
    db.disableServing()
    val viaSelCold = asComparable(db.searchVectorWhere(qv, sel, 7, 5, 2,
      Int.MaxValue).collect())
    assert(viaSelCold == viaPred)
    sel.release()
  }

  test("selector path == predicate path under the IVF layout with probing") {
    val db = VectorDB.openOrCreate(spark, freshDir(),
      index = VectorDB.IndexIvf, ivfCells = 8)
    db.addDocuments(fixture(300))
    val viaPred = asComparable(db.searchVectorWhere(qv, pred, k = 5,
      binaryOversample = 6, int8Oversample = 2, nprobe = 4).collect())
    db.enableServing()
    val sel = db.selector(pred)
    val viaSel = asComparable(db.searchVectorWhere(qv, sel, 5, 6, 2, 4).collect())
    assert(viaSel == viaPred, s"IVF selector diverged:\n$viaSel\nvs\n$viaPred")
    sel.release()
  }

  test("searchHits == searchVector rows on both paths; selector variant matches") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(220))
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      asComparable(df.collect())
    def hitRows(hs: Seq[VectorDB.SearchHit]): Seq[Seq[Any]] =
      hs.map(h => Seq[Any](h.docId, h.scoreHamming, h.scoreBinary,
        h.scoreCossim, h.doc))
    // catalyst path
    assert(hitRows(db.searchHits(qv, k = 6)) == rowsOf(db.searchVector(qv, k = 6)))
    // serving path
    db.enableServing()
    assert(hitRows(db.searchHits(qv, k = 6)) == rowsOf(db.searchVector(qv, k = 6)))
    val sel = db.selector(pred)
    assert(hitRows(db.searchHits(qv, k = 6, sel = Some(sel))) ==
      rowsOf(db.searchVectorWhere(qv, sel, 6, 10, 3, Int.MaxValue)))
    sel.release()
    db.disableServing()
  }

  test("searchMany with a selector == per-query filtered searches, both paths") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(240))
    val queries = Seq(
      1L -> (0 until 64).map(i => math.cos(i * 0.7) / 4.0),
      2L -> (0 until 64).map(i => math.sin(i * 2.9) / 4.0))
    def perQuery(selOpt: Option[graft.db.DocSelector]): Seq[Seq[Any]] =
      queries.flatMap { case (qid, q) =>
        val df = selOpt match {
          case Some(s) => db.searchVectorWhere(q, s, 4, 10, 3, Int.MaxValue)
          case None => db.searchVectorWhere(q, pred, k = 4)
        }
        df.collect().toSeq.zipWithIndex.map { case (r, i) =>
          Seq[Any](qid, i + 1) ++ r.toSeq }
      }
    val sel0 = db.selector(pred)
    val batchCold = asComparable(db.searchMany(queries, k = 4,
      sel = Some(sel0)).collect())
    assert(batchCold == perQuery(None),
      s"catalyst batch diverged:\n$batchCold\nvs\n${perQuery(None)}")
    db.enableServing()
    val sel = db.selector(pred)
    val batchServed = asComparable(db.searchMany(queries, k = 4,
      sel = Some(sel)).collect())
    assert(batchServed == perQuery(Some(sel)),
      "served batch diverged from per-query selector searches")
    assert(batchServed == batchCold, "served batch diverged from catalyst batch")
    sel.release()
    db.disableServing()
  }

  test("a held selector across commits keeps compile-time semantics on a served chain; re-acquire recompiles") {
    // The staleness contract (VERDICT r13 #7): a DocSelector is an id
    // allowlist compiled against ONE snapshot. Held across commits and
    // probed against an incremental-serving CHAIN whose head is k
    // commits later, it composes with the shadowing map correctly for
    // everything it knew about — tombstones and upserts mask, payloads
    // serve from the newest layer — but ids ADDED after compile are not
    // in the allowlist, so the handle answers "the predicate as of
    // compile time". selectorCached is keyed by snapshot version, so
    // RE-ACQUIRING after a commit compiles fresh and sees the window.
    val db = VectorDB.openOrCreate(spark, freshDir(),
      storage = VectorDB.StorageMor).incrementalServing(absorbDepth = 0)
    db.addDocuments(fixture(300))
    db.enableServing()
    val matching0 = db.docs.filter(pred).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val held = db.selectorCached(pred)
    try {
      // window: one NEW matching id, one existing match REWRITTEN to
      // non-matching (its embedding moves too — exhaustive k absorbs)
      val rewritten = matching0.min
      db.addDocuments(Seq(
        (9001L, "document number 9001 about topic 5 tail y"),
        (rewritten, "document number rewritten about topic 11 tail")
      ).toDF("doc_id", "text"))
      val hitsHeld = db.searchVectorWhere(qv, held, 400, 400, 400,
        Int.MaxValue).collect()
      assert(db.servingChainForTest.exists(_.depth == 1),
        "the commit must serve through a chain, not a rebuild")
      val heldIds = hitsHeld.map(_.getLong(0)).toSet
      assert(!heldIds.contains(9001L),
        "an id added AFTER compile is outside the held allowlist")
      assert(heldIds.contains(rewritten),
        "a rewritten id stays in the held allowlist (compile-time set)")
      // ...but its PAYLOAD serves from the chain's newest layer
      val doc = hitsHeld.find(_.getLong(0) == rewritten).get.getString(4)
      assert(doc.contains("topic 11"), s"stale payload served: $doc")
      assert(heldIds - rewritten == matching0 - rewritten)

      // re-acquire: version moved, the catalog compiles fresh
      val fresh = db.selectorCached(pred)
      try {
        val freshIds = db.searchVectorWhere(qv, fresh, 400, 400, 400,
          Int.MaxValue).collect().map(_.getLong(0)).toSet
        assert(freshIds.contains(9001L))
        assert(!freshIds.contains(rewritten))
        assert(freshIds == matching0 - rewritten + 9001L)
      } finally fresh.release()
    } finally {
      held.release()
      db.disableServing()
    }
  }

  test("empty match set yields empty results, not an error") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(60))
    val none = col("doc").contains("no such needle anywhere")
    assert(db.searchVectorWhere(qv, none, k = 5).count() == 0)
    db.enableServing()
    val sel = db.selector(none)
    assert(sel.size == 0)
    assert(db.searchVectorWhere(qv, sel, 5, 10, 3, Int.MaxValue).count() == 0)
    sel.release()
    db.disableServing()
  }

  test("fixture filteredFunnel == funnel over the language-restricted base") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.Search.filteredFunnel(spark, dir, k = 5)
      .collect().map(_.getLong(0)).toSet
    val enIds = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(enIds), "filtered funnel leaked a non-'en' doc")
    assert(got.nonEmpty)
  }
}
