package graft

import graft.db.VectorDB
import org.scalatest.funsuite.AnyFunSuite

/** Stress the read-committed contract under REAL concurrency: four
  * reader threads run served funnel searches nonstop while a writer
  * thread lands merge-on-read commits and periodic compactions on the
  * same instance. Every search must return internally consistent hits
  * — k rows, each with its payload present (a torn read would surface
  * a code row whose docs-tier counterpart is missing) — across block
  * refreshes, delta merges, and folds. This is the multi-tenant
  * serving contract (thread-safe concurrent serving, round 10)
  * composed with the commit/compaction machinery of this round.
  */
class ConcurrentReadWriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftdb").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def fixture(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"document number $i topic ${i % 11} payload"))
      .toDF("doc_id", "text")

  test("served searches stay consistent under concurrent commits and compaction") {
    val db = VectorDB.openOrCreate(spark, freshDir(),
      storage = VectorDB.StorageMor)
    db.addDocuments(fixture(0 until 400))
    db.enableServing()

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val searchesDone = new java.util.concurrent.atomic.AtomicInteger(0)

    val readers = (1 to 4).map { t =>
      new Thread(() => {
        val qv = (0 until 64).map(i => math.sin(i * 0.7 + t) / 6.0)
        try {
          while (!stop.get()) {
            val hits = db.searchHits(qv, k = 5)
            if (hits.size != 5)
              failures.add(s"reader $t: got ${hits.size} hits, wanted 5")
            hits.foreach { h =>
              if (h.doc == null || !h.doc.contains("payload"))
                failures.add(s"reader $t: torn hit ${h.docId} payload='${h.doc}'")
            }
            searchesDone.incrementAndGet()
          }
        } catch {
          case e: Throwable => failures.add(s"reader $t: ${e.getMessage}")
        }
      }, s"graft-reader-$t")
    }
    readers.foreach(_.start())

    try {
      // 12 commits + 3 compactions while the readers hammer the index
      (0 until 12).foreach { i =>
        db.addDocuments(fixture((400 + i * 25) until (400 + (i + 1) * 25)))
        if ((i + 1) % 4 == 0) db.compact()
      }
    } finally {
      stop.set(true)
      readers.foreach(_.join(30000))
    }

    assert(failures.isEmpty,
      s"${failures.size} inconsistencies, first: ${failures.peek()}")
    assert(searchesDone.get() > 20,
      s"readers only completed ${searchesDone.get()} searches — not a real stress")
    assert(db.count() == 700)
    db.disableServing()
  }

  test("incremental chain refresh stays consistent under concurrent commits, deletes, compaction") {
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)
      .incrementalServing(maxChurnFraction = 1.0)
    db.addDocuments(fixture(0 until 400))
    db.enableServing()

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val searchesDone = new java.util.concurrent.atomic.AtomicInteger(0)
    val depthMax = new java.util.concurrent.atomic.AtomicInteger(0)

    val readers = (1 to 4).map { t =>
      new Thread(() => {
        val qv = (0 until 64).map(i => math.sin(i * 0.9 + t) / 6.0)
        try {
          while (!stop.get()) {
            val hits = db.searchHits(qv, k = 5)
            if (hits.size != 5)
              failures.add(s"reader $t: got ${hits.size} hits, wanted 5")
            hits.foreach { h =>
              if (h.doc == null || !h.doc.contains("payload"))
                failures.add(s"reader $t: torn hit ${h.docId} payload='${h.doc}'")
            }
            db.servingChainForTest.foreach(c =>
              depthMax.getAndAccumulate(c.depth, math.max))
            searchesDone.incrementAndGet()
          }
        } catch {
          case e: Throwable => failures.add(s"reader $t: ${e.getMessage}")
        }
      }, s"graft-inc-reader-$t")
    }
    readers.foreach(_.start())

    try {
      // commits with overwrites AND deletes, folds interleaved: the
      // readers' lazy refreshes race the writer into chain extensions,
      // retirements, and stash replacement — every search must still be
      // whole (the masking map and its layers flip atomically with the
      // prepared reference).
      (0 until 10).foreach { i =>
        db.addDocuments(fixture((400 + i * 20) until (400 + (i + 1) * 20)))
        if (i % 3 == 1) db.removeDocs(Seq((i * 7).toLong, (i * 7 + 1).toLong))
        if ((i + 1) % 5 == 0) db.compact()
      }
    } finally {
      stop.set(true)
      readers.foreach(_.join(30000))
    }

    assert(failures.isEmpty,
      s"${failures.size} inconsistencies, first: ${failures.peek()}")
    assert(searchesDone.get() > 20,
      s"readers only completed ${searchesDone.get()} searches — not a real stress")
    assert(depthMax.get() >= 1,
      "no reader ever observed an extended chain — the stress never hit the incremental path")
    // Settled state: the served view must equal the Catalyst twin's.
    val twin = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)
    val qv = (0 until 64).map(i => math.sin(i * 0.9 + 1) / 6.0)
    val served = db.searchHits(qv, k = 10).map(h => (h.docId, h.scoreHamming))
    val exact = twin.searchVector(qv, 10).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("score_hamming"))).toSeq
    assert(served == exact, "settled chain diverged from the Catalyst twin")
    db.disableServing()
  }
}
