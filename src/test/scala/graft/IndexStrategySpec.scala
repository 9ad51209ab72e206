package graft

import graft.db.VectorDB
import org.scalatest.funsuite.AnyFunSuite

/** Facade-level index strategy (the reference's `index_type` knob,
  * `BinaryVectorDB.py:17`): the same corpus under `flat` and `ivf` must
  * return identical search results at full probe, and the ivf snapshot
  * must actually be cell-partitioned on disk.
  */
class IndexStrategySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftidx").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val corpus = (1L to 200L).map(i =>
    (i, s"tok${i % 13} tok${i % 7} tok${i % 31} tok${i % 3}")).toSeq

  test("flat and ivf strategies return identical results on the same corpus") {
    val flat = VectorDB.openOrCreate(spark, freshDir())
    val ivf = VectorDB.openOrCreate(spark, freshDir(), index = VectorDB.IndexIvf)
    flat.addDocuments(corpus.toDF("doc_id", "text"))
    ivf.addDocuments(corpus.toDF("doc_id", "text"))

    Seq("tok1 tok5", "tok12 tok2 tok30").foreach { q =>
      val a = flat.search(q, k = 5).collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Double]("score_cossim"))).toSeq
      val b = ivf.search(q, k = 5).collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Double]("score_cossim"))).toSeq
      assert(a == b, s"query '$q'")
    }

    // The ivf hot tier is physically cell-partitioned.
    val cellDirs = new java.io.File(ivf.currentCodesPathForTest)
      .listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)

    // Strategy survives reopen; probing is rejected on a flat index.
    assert(VectorDB.openOrCreate(spark, ivf.folder).index == VectorDB.IndexIvf)
    intercept[IllegalArgumentException] { flat.search("tok1", nprobe = 2) }
  }

  test("probe-limited ivf search returns k results from the probed cells only") {
    val ivf = VectorDB.openOrCreate(spark, freshDir(), index = VectorDB.IndexIvf)
    ivf.addDocuments(corpus.toDF("doc_id", "text"))
    val full = ivf.search("tok4 tok9", k = 5).collect().map(_.getAs[Long]("doc_id")).toSet
    val pruned = ivf.search("tok4 tok9", k = 5, nprobe = 4).collect()
    assert(pruned.length == 5)
    // Probing the nearest cells first keeps most of the exact top-k.
    assert(pruned.map(_.getAs[Long]("doc_id")).count(full) >= 3)
  }

  test("batched searchMany on ivf: full probe equals flat; probe-union prunes") {
    val flat = VectorDB.openOrCreate(spark, freshDir())
    val ivf = VectorDB.openOrCreate(spark, freshDir(), index = VectorDB.IndexIvf)
    flat.addDocuments(corpus.toDF("doc_id", "text"))
    ivf.addDocuments(corpus.toDF("doc_id", "text"))

    val emb = new graft.db.HashingEmbedder()
    val queries = Seq("tok1 tok5", "tok12 tok2").zipWithIndex.map { case (t, i) =>
      (i.toLong, spark.range(1).select(
        emb.embed(org.apache.spark.sql.functions.lit(t)).cast("array<double>"))
        .head().getSeq[Double](0))
    }
    def rows(db: VectorDB, np: Int) =
      db.searchMany(queries, k = 5, nprobe = np).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"), r.getAs[Long]("doc_id"))).toSeq

    assert(rows(ivf, Int.MaxValue) == rows(flat, Int.MaxValue))
    // Probe-limited batch still returns k results per query.
    val pruned = rows(ivf, 4)
    assert(pruned.length == queries.size * 5)
    // Per-query cell mask: batched pruned results equal searchVector with
    // the same nprobe — reproducible regardless of batch composition.
    queries.foreach { case (qid, qv) =>
      val single = ivf.searchVector(qv, k = 5, nprobe = 4).collect()
        .map(_.getAs[Long]("doc_id")).toSeq
      val batched = pruned.filter(_._1 == qid).sortBy(_._2).map(_._3)
      assert(batched == single, s"query $qid diverges from searchVector at nprobe=4")
    }
    intercept[IllegalArgumentException] { flat.searchMany(queries, nprobe = 2) }
  }

  test("configurable cell geometry: 64 cells keep flat == ivf(full probe) parity") {
    val flat = VectorDB.openOrCreate(spark, freshDir())
    val ivf = VectorDB.openOrCreate(spark, freshDir(),
      index = VectorDB.IndexIvf, ivfCells = 64)
    flat.addDocuments(corpus.toDF("doc_id", "text"))
    ivf.addDocuments(corpus.toDF("doc_id", "text"))
    assert(ivf.ivfCells == 64)

    Seq("tok1 tok5", "tok12 tok2 tok30", "tok4 tok9").foreach { q =>
      val a = flat.search(q, k = 5).collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Double]("score_cossim"))).toSeq
      val b = ivf.search(q, k = 5).collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Double]("score_cossim"))).toSeq
      assert(a == b, s"query '$q'")
    }
    // probe-limited search over the finer geometry still returns k rows
    assert(ivf.search("tok4 tok9", k = 5, nprobe = 8).collect().length == 5)

    // geometry survives reopen; a contradictory reopen is rejected
    assert(VectorDB.openOrCreate(spark, ivf.folder).ivfCells == 64)
    intercept[IllegalArgumentException] {
      VectorDB.openOrCreate(spark, ivf.folder, index = VectorDB.IndexIvf, ivfCells = 8)
    }
    // invalid geometries are rejected up front
    intercept[IllegalArgumentException] {
      VectorDB.openOrCreate(spark, freshDir(), index = VectorDB.IndexIvf, ivfCells = 48)
    }
  }

  test("a registered custom strategy runs through openOrCreate (pluggable seam)") {
    import org.apache.spark.sql.functions._
    // Test-only strategy: stripe rows across cells by a hash of the
    // first code word; probe order is fixed. Exercises the seam the
    // reference's `index_type` constructor offers (any faiss binary
    // index object) without faking a real ANN structure.
    object Stripe extends graft.db.IndexStrategy {
      val name = "stripe-test"
      val partitioned = true
      override def cellColumn(ctx: graft.db.IndexStrategy.Context,
                              codeArray: org.apache.spark.sql.Column,
                              packedCodes: org.apache.spark.sql.DataFrame,
                              nRows: Long): org.apache.spark.sql.Column =
        pmod(hash(element_at(codeArray, 1)), lit(ctx.cells)).cast("int")
      override def probeOrder(ctx: graft.db.IndexStrategy.Context,
                              qWords: Seq[Long]): IndexedSeq[Int] =
        0 until ctx.cells
    }
    graft.db.IndexStrategies.register(Stripe)

    val flat = VectorDB.openOrCreate(spark, freshDir())
    val striped = VectorDB.openOrCreate(spark, freshDir(), index = "stripe-test")
    flat.addDocuments(corpus.toDF("doc_id", "text"))
    striped.addDocuments(corpus.toDF("doc_id", "text"))

    // full-probe parity with flat, like any partitioned strategy
    Seq("tok1 tok5", "tok12 tok2 tok30").foreach { q =>
      assert(striped.search(q, k = 5).collect().map(_.getLong(0)).toSeq ==
        flat.search(q, k = 5).collect().map(_.getLong(0)).toSeq, s"query '$q'")
    }
    // physically cell-partitioned on disk, exactly like ivf
    assert(new java.io.File(striped.currentCodesPathForTest)
      .listFiles().exists(_.getName.startsWith("cell=")))
    // probe-limited search accepted (partitioned strategy ⇒ nprobe valid)
    assert(striped.search("tok1 tok5", k = 5,
      nprobe = striped.ivfCells).collect().length == 5)
    // the stored name reopens through the registry…
    assert(VectorDB.openOrCreate(spark, striped.folder).index == "stripe-test")
    // …and an unregistered name is rejected up front
    intercept[IllegalArgumentException] {
      VectorDB.openOrCreate(spark, freshDir(), index = "no-such-strategy")
    }
  }

  test("ivf composes with the flat code layout and with MOR storage") {
    // ivf + flat layout: cell derives from the c0 primitive column.
    val a = VectorDB.openOrCreate(spark, freshDir(),
      index = VectorDB.IndexIvf, layout = VectorDB.LayoutFlat)
    a.addDocuments(corpus.toDF("doc_id", "text"))
    val hitsA = a.search("tok3 tok11", k = 3).collect()
    assert(hitsA.length == 3)
    assert(new java.io.File(a.currentCodesPathForTest)
      .listFiles().exists(_.getName.startsWith("cell=")))

    // ivf + MOR storage: the cell column rides through delta commits;
    // probing filters it as an ordinary column (file-level pruning is the
    // cow-snapshot property).
    val b = VectorDB.openOrCreate(spark, freshDir(),
      index = VectorDB.IndexIvf, storage = VectorDB.StorageMor)
    b.addDocuments(corpus.take(100).toDF("doc_id", "text"))
    b.addDocuments(corpus.drop(100).toDF("doc_id", "text"))
    assert(b.pendingDeltas() == 2)
    val full = b.search("tok3 tok11", k = 3).collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(full.length == 3)
    b.compact()
    assert(b.search("tok3 tok11", k = 3).collect()
      .map(_.getAs[Long]("doc_id")).toSeq == full)
    assert(b.search("tok3 tok11", k = 3, nprobe = 4).collect().length == 3)
  }
}
