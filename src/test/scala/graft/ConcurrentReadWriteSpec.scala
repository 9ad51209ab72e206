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
}
