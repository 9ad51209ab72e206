package graft

import graft.db.VectorDB
import org.scalatest.funsuite.AnyFunSuite

/** The opt-in advisory single-writer lease: once any writer holds a
  * fresh lease on a folder, commits from everyone else fail fast —
  * including a former holder whose expired lease was stolen (fencing).
  * No lease file anywhere = the reference's unguarded behavior (the
  * whole rest of the suite runs leaseless).
  */
class WriterLeaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftdb").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def fixture(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"document number $i")).toDF("doc_id", "text")

  test("the lease is exclusive while fresh; non-holders' commits are refused") {
    val dir = freshDir()
    val writer = VectorDB.openOrCreate(spark, dir)
    writer.addDocuments(fixture(0 until 10)) // leaseless commits still work
    val lease = writer.acquireWriterLease()

    val other = VectorDB.openOrCreate(spark, dir)
    val e1 = intercept[IllegalStateException] { other.acquireWriterLease() }
    assert(e1.getMessage.contains("leased"))
    val e2 = intercept[IllegalStateException] {
      other.addDocuments(fixture(10 until 20))
    }
    assert(e2.getMessage.contains("leased"))
    intercept[IllegalStateException] { other.removeDocs(Seq(1L)) }

    // the holder commits freely
    writer.addDocuments(fixture(10 until 20))
    assert(writer.count() == 20)

    lease.close()
    // released: the other instance can take over and commit
    val l2 = other.acquireWriterLease()
    other.addDocuments(fixture(20 until 25))
    assert(other.count() == 25)
    l2.close()
  }

  test("an expired lease is stolen; the fenced loser's commits fail") {
    val dir = freshDir()
    val a = VectorDB.openOrCreate(spark, dir)
    a.addDocuments(fixture(0 until 5))
    val leaseA = a.acquireWriterLease(ttlMs = 60000)

    // simulate writer A dying mid-lease: stop its heartbeat, then age
    // the lease past expiry on disk
    leaseA.lost = true // halt renewals without deleting the file
    val b = VectorDB.openOrCreate(spark, dir)
    a.asInstanceOf[AnyRef] // (a stays 'alive' as the fenced loser)
    // age: rewrite with a past expiry under A's id. The raw rewrite
    // staleness-breaks Hadoop's checksum sidecar — remove it, because
    // an UNREADABLE lease now correctly reads as held-by-unknown and
    // this test needs a READABLE expired lease (the dead-writer case).
    val leaseFile = new java.io.File(dir, "_lease")
    val id = scala.io.Source.fromFile(leaseFile).getLines().next()
    java.nio.file.Files.write(leaseFile.toPath,
      s"$id\n${System.currentTimeMillis() - 1}".getBytes("UTF-8"))
    new java.io.File(dir, "._lease.crc").delete()

    val leaseB = b.acquireWriterLease()
    b.addDocuments(fixture(5 until 10))
    assert(b.count() == 10)

    // A is fenced: its lease belongs to B now
    val e = intercept[IllegalStateException] { a.addDocuments(fixture(90 until 95)) }
    assert(e.getMessage.contains("fenced") || e.getMessage.contains("lost"))
    leaseB.close()
    leaseA.close() // idempotent / must not delete B's released state wrongly
  }

  test("a lease-guarded crawl loop fences other writers and releases at close") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = freshDir()
    val db = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)
    db.addDocuments(fixture(0 until 10))
    val loop = graft.streaming.StreamingIngest.crawlLoop(db).withWriterLease()

    // the loop's OWN db commits through the lease it holds
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    in.addData((100L, "w100a w100b w100c"), (101L, "w101a w101b w101c"))
    loop.stream(in.toDF().toDF("doc_id", "text")).stop()
    assert(db.count() == 12)

    // any other writer over the folder is fenced while the loop runs
    val other = VectorDB.openOrCreate(spark, dir, storage = VectorDB.StorageMor)
    intercept[IllegalStateException] { other.addDocuments(fixture(50 until 55)) }
    intercept[IllegalStateException] { other.acquireWriterLease() }

    loop.close() // releases the lease with the state
    other.addDocuments(fixture(50 until 55))
    assert(other.count() == 17)
  }

  test("the heartbeat keeps a short-ttl lease alive") {
    val dir = freshDir()
    val writer = VectorDB.openOrCreate(spark, dir)
    writer.addDocuments(fixture(0 until 5))
    val lease = writer.acquireWriterLease(ttlMs = 600)
    Thread.sleep(1500) // several ttl windows: without renewal this expires
    val other = VectorDB.openOrCreate(spark, dir)
    val e = intercept[IllegalStateException] { other.acquireWriterLease() }
    assert(e.getMessage.contains("leased"),
      "heartbeat must have renewed the lease across multiple ttl windows")
    writer.addDocuments(fixture(5 until 10))
    assert(writer.count() == 10)
    lease.close()
    assert(!new java.io.File(dir, "_lease").exists,
      "close must remove the holder's lease file")
  }
}
