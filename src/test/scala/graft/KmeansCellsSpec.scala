package graft

import graft.db.{IvfCentroids, VectorDB}
import org.scalatest.funsuite.AnyFunSuite

/** The learned IVF cell assignment (round-11: k-majority centroids
  * replace the sign-code prefix as the default serving quantizer).
  * Covers what IndexStrategySpec (which now runs kmeans by default)
  * does not: config round-trip + pre-knob folder compat, centroid
  * persistence and cross-batch assignment stability, probed ≡ full
  * parity at nprobe = cells, and the balance claim itself — on codes
  * whose sign bits are heavily biased, learned cells stay bounded
  * where prefix cells collapse.
  */
class KmeansCellsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftkm").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val corpus = (1L to 300L).map(i =>
    (i, s"tok${i % 13} tok${i % 7} tok${i % 31} tok${i % 3}")).toSeq

  test("new ivf folders default to kmeans, persist it, and learn centroids on first ingest") {
    val db = VectorDB.openOrCreate(spark, freshDir(), index = VectorDB.IndexIvf)
    assert(db.ivfAssign == VectorDB.IvfAssignKmeans)
    db.addDocuments(corpus.toDF("doc_id", "text"))
    assert(new java.io.File(db.folder, "_centroids").isFile,
      "first ingest must persist the learned model")
    val reopened = VectorDB.openOrCreate(spark, db.folder)
    assert(reopened.ivfAssign == VectorDB.IvfAssignKmeans)
    // contradictory reopen is a rebuild, not a reopen
    intercept[IllegalArgumentException] {
      VectorDB.openOrCreate(spark, db.folder,
        index = VectorDB.IndexIvf, ivfAssign = VectorDB.IvfAssignPrefix)
    }
  }

  test("a pre-knob config (no ivf_assign field) opens as prefix — stored cells stay valid") {
    val dir = freshDir()
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, "config.json").toPath,
      ("""{"version": "1.0", "model": "graft-hash-64", "dim": 64, """ +
        """"storage": "cow", "layout": "array", "index": "ivf", """ +
        """"ivf_cells": 16}""").getBytes("UTF-8"))
    val db = VectorDB.openOrCreate(spark, dir)
    assert(db.ivfAssign == VectorDB.IvfAssignPrefix)
    db.addDocuments(corpus.take(50).toDF("doc_id", "text"))
    assert(!new java.io.File(dir, "_centroids").isFile,
      "prefix assignment must not learn centroids")
    assert(db.search("tok1 tok5", k = 3).collect().length == 3)
  }

  test("explicit prefix assignment still works end-to-end and matches flat results") {
    val flat = VectorDB.openOrCreate(spark, freshDir())
    val pre = VectorDB.openOrCreate(spark, freshDir(),
      index = VectorDB.IndexIvf, ivfAssign = VectorDB.IvfAssignPrefix)
    flat.addDocuments(corpus.toDF("doc_id", "text"))
    pre.addDocuments(corpus.toDF("doc_id", "text"))
    Seq("tok1 tok5", "tok12 tok2 tok30").foreach { q =>
      assert(pre.search(q, k = 5).collect().map(_.getLong(0)).toSeq ==
        flat.search(q, k = 5).collect().map(_.getLong(0)).toSeq, s"query '$q'")
    }
  }

  test("probed == full at nprobe = cells; assignments stable across MOR batches") {
    val db = VectorDB.openOrCreate(spark, freshDir(),
      index = VectorDB.IndexIvf, storage = VectorDB.StorageMor)
    db.addDocuments(corpus.take(150).toDF("doc_id", "text"))
    db.addDocuments(corpus.drop(150).toDF("doc_id", "text"))
    val full = db.search("tok4 tok9", k = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val probedAll = db.search("tok4 tok9", k = 5, nprobe = db.ivfCells).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(probedAll == full, "nprobe = cells must reproduce the full scan exactly")

    // identical text → identical code → identical cell, across batches
    // (both batches assigned by the SAME persisted centroids)
    val cells = db.codes
      .join(corpus.toDF("doc_id", "text"), "doc_id")
      .select("text", "cell").distinct()
      .groupBy("text").count().filter($"count" > 1).count()
    assert(cells == 0, "same text must land in the same cell in every batch")
  }

  test("reopened instance probes in the same learned order") {
    val db = VectorDB.openOrCreate(spark, freshDir(), index = VectorDB.IndexIvf)
    db.addDocuments(corpus.toDF("doc_id", "text"))
    val a = db.search("tok4 tok9", k = 5, nprobe = 4).collect()
      .map(_.getLong(0)).toSeq
    val db2 = VectorDB.openOrCreate(spark, db.folder)
    val b = db2.search("tok4 tok9", k = 5, nprobe = 4).collect()
      .map(_.getLong(0)).toSeq
    assert(a == b, "probe order must come from the persisted model, not the session")
  }

  test("learn is deterministic and balances sign-biased codes where prefix collapses") {
    // Codes drawn from 4 clusters whose sign patterns all START with the
    // same prefix bits (biased first dims — the IVFBENCH_r10 watch
    // item): every row lands in ONE prefix cell, while learned cells
    // recover the clusters.
    val rnd = new scala.util.Random(7)
    val nWords = 2
    val cells = 4
    val clusterBases = Array(
      Array(0xF000000000000000L, 0x0123456789ABCDEFL),
      Array(0xF0000000FFFF0000L, 0xFEDCBA9876543210L),
      Array(0xF00000FF00FF00FFL, 0x0F0F0F0F0F0F0F0FL),
      Array(0xF0FFFF000000FFFFL, 0xAAAAAAAA55555555L))
    val sample = Array.tabulate(2000) { i =>
      val base = clusterBases(i % cells)
      // flip ~3 random low bits per word — tight clusters, top 4 bits
      // (the prefix at ivfCells=16 would read them) NEVER flip
      base.map(w => w ^ (1L << rnd.nextInt(32)) ^ (1L << rnd.nextInt(32)))
    }
    val m1 = IvfCentroids.learn(sample, cells, nWords)
    val m2 = IvfCentroids.learn(sample.map(_.clone()), cells, nWords)
    assert(m1.words.toSeq == m2.words.toSeq, "learning must be deterministic")

    val sizes = Array.fill(cells)(0)
    sample.foreach(c => sizes(m1.assign(c)) += 1)
    val sorted = sizes.sorted
    val median = sorted(cells / 2).toDouble
    assert(sizes.min > 0, s"no learned cell may be empty: ${sizes.toSeq}")
    assert(sizes.max / median <= 2.0,
      s"learned cells must stay balanced on sign-biased codes: ${sizes.toSeq}")

    // the prefix quantizer puts EVERYTHING in one cell here (top 4 bits
    // are constant across all clusters) — the imbalance being fixed
    val prefixCells = sample.map(c => ((c(0) >>> 60) & 15L).toInt).distinct
    assert(prefixCells.length == 1, "fixture must actually be prefix-degenerate")

    // probe order: each cluster's own centroid ranks first for its members
    val hit = sample.take(200).count(c => m1.probeOrder(c).head == m1.assign(c))
    assert(hit == 200, "nearest centroid must lead the probe order")
  }
}
