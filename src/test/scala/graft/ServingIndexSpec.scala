package graft

import graft.db.VectorDB
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Parity spec for the RAM-resident serving path: with
  * [[VectorDB.enableServing]] the whole funnel runs as one bare RDD job
  * over the payload-carrying [[graft.db.PreparedScan]] blocks (phases
  * II/III driver-side) and must produce BIT-IDENTICAL results to the
  * default Catalyst plan over the parquet tiers — same ids, same
  * ranks, same double scores (the driver-side mirrors replicate the
  * kernels' left-to-right double accumulation exactly).
  */
class ServingIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftdb").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def fixture(n: Int): org.apache.spark.sql.DataFrame =
    (0 until n).map(i => (i.toLong, s"document number $i about topic ${i % 7} " +
      s"with extra words ${"x" * (i % 5)}")).toDF("doc_id", "text")

  private def asComparable(rows: Array[Row]): Seq[Seq[Any]] =
    rows.toSeq.map(_.toSeq)

  test("searchVector: serving path == catalyst path, bit-identical") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(200))
    val q = db.search("topic 3 document", k = 1).head() // any anchor query
    assert(q.getAs[Long]("doc_id") >= 0)

    val qv = (0 until 64).map(i => math.sin(i * 1.7) / 8.0)
    val plain = asComparable(db.searchVector(qv, k = 7, binaryOversample = 4,
      int8Oversample = 2).collect())
    db.enableServing()
    val served = asComparable(db.searchVector(qv, k = 7, binaryOversample = 4,
      int8Oversample = 2).collect())
    assert(served == plain, s"serving path diverged:\n$served\nvs\n$plain")
  }

  test("per-phase SearchTimings: recorded on both paths, phases sum to ~the call wall") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(300))
    val qv = (0 until 64).map(i => math.cos(i * 1.1) / 6.0)
    assert(db.lastSearchTimings.isEmpty, "timings before any search")

    // Catalyst path: phases I+II fused into one job (phase2Ms == 0 by
    // construction), phase III stamped by the searchHits materialization.
    db.searchHits(qv, k = 5)
    val t0 = System.nanoTime()
    db.searchHits(qv, k = 5)
    val catalystWallMs = (System.nanoTime() - t0) / 1e6
    val ct = db.lastSearchTimings.get
    assert(ct.phase1Ms > 0 && ct.phase2Ms == 0.0 && ct.phase3Ms > 0, ct)
    assert(ct.totalMs <= catalystWallMs * 1.05 + 2,
      s"phases exceed the measured wall: $ct vs $catalystWallMs ms")
    // Floor at 0.2: the wall also contains unmeasured plan
    // analysis/packQuery work, which can stretch under CI load.
    assert(ct.totalMs >= catalystWallMs * 0.2,
      s"phases cover too little of the wall: $ct vs $catalystWallMs ms")

    // Serving path: all three phases measured individually.
    db.enableServing()
    db.searchHits(qv, k = 5) // warm the prepared blocks
    val t1 = System.nanoTime()
    db.searchHits(qv, k = 5)
    val servedWallMs = (System.nanoTime() - t1) / 1e6
    val st = db.lastSearchTimings.get
    assert(st.phase1Ms > 0 && st.phase2Ms >= 0 && st.phase3Ms >= 0, st)
    assert(st.totalMs <= servedWallMs * 1.05 + 2,
      s"phases exceed the measured wall: $st vs $servedWallMs ms")
    assert(st.totalMs >= servedWallMs * 0.3,
      s"phases cover too little of the wall: $st vs $servedWallMs ms")

    // Batched paths record one timings value for the whole batch, on
    // both the serving (topBMany) and Catalyst (fused I+II + stamped
    // phase III) paths.
    val batch = Seq(1L -> qv, 2L -> (0 until 64).map(i => math.sin(i * 0.7) / 5.0))
    db.searchManyHits(batch, k = 3)
    val bt = db.lastSearchTimings.get
    assert(bt.phase1Ms > 0 && bt.phase2Ms >= 0 && bt.phase3Ms >= 0, bt)
    db.disableServing()
    db.searchManyHits(batch, k = 3)
    val ct2 = db.lastSearchTimings.get
    assert(ct2.phase1Ms > 0 && ct2.phase2Ms == 0.0 && ct2.phase3Ms > 0, ct2)
  }

  test("concurrent searchHits on one served instance: every thread gets the single-thread answer") {
    // The multi-tenant serving contract: ONE VectorDB instance per JVM,
    // shared across request threads (each session/instance would
    // otherwise build its own prepared blocks — double memory). Pins
    // that 8 threads hammering the same served instance each get
    // exactly the single-thread result, and each thread reads its OWN
    // per-call timings (lastSearchTimings is thread-local).
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(400))
    db.enableServing()
    val queries = (0 until 8).map(s => (0 until 64).map(i => math.sin(i * 0.31 + s) / 7.0))
    val expected = queries.map(q => db.searchHits(q, k = 5))

    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futs = queries.zipWithIndex.map { case (q, i) =>
        scala.concurrent.Future {
          val hits = db.searchHits(q, k = 5)
          (i, hits, db.lastSearchTimings)
        }
      }
      val results = futs.map(f =>
        scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
      results.foreach { case (i, hits, timings) =>
        assert(hits == expected(i), s"thread for query $i diverged")
        assert(timings.exists(t => t.phase1Ms > 0), s"query $i missing its thread's timings")
      }
    } finally pool.shutdown()
    db.disableServing()
  }

  test("searchMany: serving path == catalyst path for a 3-query batch") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(150))
    val queries = Seq(
      10L -> (0 until 64).map(i => math.cos(i * 0.9) / 4.0),
      11L -> (0 until 64).map(i => math.sin(i * 2.3) / 4.0),
      12L -> (0 until 64).map(i => (if (i % 3 == 0) 1.0 else -0.5) / 4.0))
    val plain = asComparable(db.searchMany(queries, k = 5).collect())
    db.enableServing()
    val served = asComparable(db.searchMany(queries, k = 5).collect())
    assert(served == plain, s"serving batch diverged:\n$served\nvs\n$plain")
    db.disableServing()
    val plainAgain = asComparable(db.searchMany(queries, k = 5).collect())
    assert(plainAgain == plain)
  }

  private def manyHitRows(
      out: IndexedSeq[(Long, IndexedSeq[VectorDB.SearchHit])]): Seq[Seq[Any]] =
    out.flatMap { case (qid, hits) =>
      hits.zipWithIndex.map { case (h, i) =>
        Seq[Any](qid, i + 1, h.docId, h.scoreHamming, h.scoreBinary,
          h.scoreCossim, h.doc)
      }
    // searchManyHits preserves input order while searchMany sorts output by
    // qid asc — sort here so the parity asserts don't depend on the test's
    // query literals happening to be listed in ascending qid order.
    }.sortBy(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Int]))

  test("searchManyHits == searchMany row-for-row on both paths, incl. selector") {
    import org.apache.spark.sql.functions.col
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(240))
    val queries = Seq(
      7L -> (0 until 64).map(i => math.cos(i * 1.3) / 4.0),
      8L -> (0 until 64).map(i => math.sin(i * 0.4) / 4.0),
      9L -> (0 until 64).map(i => (if (i % 2 == 0) 0.8 else -1.0) / 4.0))
    // Catalyst path (positional row decode of the collected searchMany)
    val plainDf = asComparable(db.searchMany(queries, k = 5).collect())
    assert(manyHitRows(db.searchManyHits(queries, k = 5)) == plainDf,
      "catalyst searchManyHits diverged from searchMany")
    // serving path
    db.enableServing()
    assert(manyHitRows(db.searchManyHits(queries, k = 5)) ==
      asComparable(db.searchMany(queries, k = 5).collect()),
      "served searchManyHits diverged from searchMany")
    // with a compiled selector on both paths
    val sel = db.selector(col("doc").contains("topic 3"))
    val servedSel = manyHitRows(db.searchManyHits(queries, k = 5, sel = Some(sel)))
    assert(servedSel ==
      asComparable(db.searchMany(queries, k = 5, sel = Some(sel)).collect()))
    db.disableServing()
    assert(manyHitRows(db.searchManyHits(queries, k = 5, sel = Some(sel))) ==
      servedSel, "selector results diverged across paths")
    sel.release()
  }

  test("searchManyHits parity holds under IVF probing on both paths") {
    val db = VectorDB.openOrCreate(spark, freshDir(),
      index = VectorDB.IndexIvf, ivfCells = 8)
    db.addDocuments(fixture(300))
    val queries = Seq(
      1L -> (0 until 64).map(i => math.sin(i * 2.1) / 4.0),
      2L -> (0 until 64).map(i => math.cos(i * 0.6) / 4.0))
    val plain = manyHitRows(db.searchManyHits(queries, k = 4, nprobe = 3))
    assert(plain ==
      asComparable(db.searchMany(queries, k = 4, nprobe = 3).collect()))
    db.enableServing()
    val served = manyHitRows(db.searchManyHits(queries, k = 4, nprobe = 3))
    assert(served ==
      asComparable(db.searchMany(queries, k = 4, nprobe = 3).collect()))
    assert(served == plain, "IVF probed batch diverged across paths")
    db.disableServing()
  }

  test("serving index survives a commit: invalidated and rebuilt with fresh data") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    db.addDocuments(fixture(60))
    db.enableServing()
    val qv = (0 until 64).map(i => math.sin(i * 1.1) / 8.0)
    db.searchVector(qv, k = 3).collect() // build + use index
    // commit new docs: index must drop and rebuild; new doc findable
    db.addDocuments(Seq((999L, "a completely different document about zebras"))
      .toDF("doc_id", "text"))
    val hit = db.search("different document zebras", k = 1).head()
    assert(hit.getAs[Long]("doc_id") == 999L)
    // and parity still holds post-rebuild
    val served = asComparable(db.searchVector(qv, k = 5).collect())
    db.disableServing()
    val plain = asComparable(db.searchVector(qv, k = 5).collect())
    assert(served == plain)
  }
}
