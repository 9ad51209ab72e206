package graft

import graft.db.VectorDB
import org.scalatest.funsuite.AnyFunSuite

/** Regression hammer for the r12 torn-read lease steal: a heartbeat
  * renewing every ttl/3 used to rewrite `_lease` IN PLACE, so a racing
  * `acquireWriterLease` could catch the file mid-write, read it as
  * absent, and steal a live lease. With rename-swapped writes and
  * torn-reads-as-held, NO attempt may ever succeed while the holder
  * lives, no matter how often it renews.
  */
class WriterLeaseHammerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftdb").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("no acquire ever steals a live, actively-renewing lease") {
    val dir = freshDir()
    val writer = VectorDB.openOrCreate(spark, dir)
    writer.addDocuments(
      (0 until 8).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text"))
    // ttl 600 ms → heartbeat rewrites the lease file every ~200 ms;
    // every renewal used to be a steal window.
    val lease = writer.acquireWriterLease(ttlMs = 600)

    val contenders = Array.fill(4)(VectorDB.openOrCreate(spark, dir))
    val steals = new java.util.concurrent.atomic.AtomicInteger(0)
    val oddities = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        val db = contenders(t % contenders.length)
        var i = 0
        while (i < 30) {
          try {
            val stolen = db.acquireWriterLease(ttlMs = 600)
            steals.incrementAndGet()
            stolen.close()
          } catch {
            case e: IllegalStateException
                if e.getMessage.contains("leased") ||
                   e.getMessage.contains("unreadable") ||
                   e.getMessage.contains("could not be read") ||
                   e.getMessage.contains("already holds") => () // expected
            case scala.util.control.NonFatal(e) =>
              oddities.add(s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
          i += 1
          Thread.sleep(5)
        }
      }, s"lease-hammer-$t")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(threads.forall(!_.isAlive), "hammer threads must finish")

    assert(steals.get() == 0,
      s"${steals.get()} acquire(s) stole a live heartbeating lease")
    assert(oddities.isEmpty, s"unexpected failures: $oddities")
    assert(!lease.lost, "the rightful holder must never observe a fence")
    // the holder is still THE writer: its commits go through
    writer.addDocuments(Seq((100L, "still mine")).toDF("doc_id", "text"))
    assert(writer.count() == 9)
    lease.close()
    assert(!new java.io.File(dir, "_lease").exists)
  }
}
