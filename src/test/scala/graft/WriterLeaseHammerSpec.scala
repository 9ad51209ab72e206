package graft

import graft.db.VectorDB
import org.scalatest.funsuite.AnyFunSuite

/** Regression hammer for the r12 torn-read lease steal: a heartbeat
  * renewing every ttl/3 used to rewrite `_lease` IN PLACE, so a racing
  * `acquireWriterLease` could catch the file mid-write, read it as
  * absent, and steal a LIVE lease — observable as an acquire that
  * succeeded after reading ABSENCE nobody created. With rename-swapped
  * writes and torn-reads-as-held that class is gone by construction;
  * this spec hammers acquire against a fast-renewing holder and fails
  * if any steal OBSERVED absence (`WriterLease.tookOver == None`)
  * while the holder lived and never deleted its file.
  *
  * A steal that observed a readable EXPIRED lease is the by-design
  * dead-writer takeover — the heartbeat genuinely stalled past ttl
  * (GC pause, CPU-starved box: it happens under parallel test load) —
  * and ends the hammer early rather than failing it: mutual exclusion
  * was never violated.
  */
class WriterLeaseHammerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftdb").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("no acquire ever steals a FRESHLY-RENEWED lease") {
    val dir = freshDir()
    val ttl = 900L
    val writer = VectorDB.openOrCreate(spark, dir)
    writer.addDocuments(
      (0 until 8).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text"))
    // ttl 900 ms → the heartbeat rewrites the lease file every ~300 ms;
    // every renewal used to be a steal window.
    val lease = writer.acquireWriterLease(ttlMs = ttl)

    val contenders = Array.fill(4)(VectorDB.openOrCreate(spark, dir))
    val freshSteals = new java.util.concurrent.atomic.AtomicInteger(0)
    val anySteal = new java.util.concurrent.atomic.AtomicBoolean(false)
    val oddities = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        val db = contenders(t % contenders.length)
        // Run for a minimum ITERATION count and a minimum RENEWAL count:
        // 40 × 5 ms ≈ 200 ms of hammering can finish before the first
        // ~300 ms heartbeat fires, and a hammer that never overlapped a
        // renewal proves nothing about the torn-swap window.
        var i = 0
        val deadline = System.currentTimeMillis() + 30000
        while ((i < 40 || (lease.renewals < 2 &&
                 System.currentTimeMillis() < deadline)) && !anySteal.get()) {
          try {
            val stolen = db.acquireWriterLease(ttlMs = ttl)
            // Stolen. `tookOver` says what the acquire OBSERVED:
            // a readable expired lease = the heartbeat genuinely
            // stalled past ttl (GC pause / CPU-starved box — happens
            // under parallel test load) and this is the by-design
            // dead-writer takeover; stop hammering, the rightful
            // holder is fenced now. ABSENCE (None) while the holder
            // lives and never deleted = fabricated absence, i.e. the
            // r12 torn-read regression — fail.
            // Only the FIRST steal classifies the run: after it closes
            // (deleting the file), later in-flight acquires observe a
            // legitimate absence.
            val first = anySteal.compareAndSet(false, true)
            if (first && stolen.tookOver.isEmpty) freshSteals.incrementAndGet()
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

    assert(freshSteals.get() == 0,
      s"${freshSteals.get()} acquire(s) observed a live lease as ABSENT " +
        "(the torn-read race is back)")
    assert(oddities.isEmpty, s"unexpected failures: $oddities")
    // A legitimate expiry takeover can end the hammer before the first
    // renewal; only the steal-free run must prove it overlapped renewals.
    assert(anySteal.get() || lease.renewals > 0,
      "the hammer must overlap actual renewals")

    if (!anySteal.get()) {
      // common case (no scheduler stall): the holder is still THE writer
      assert(!lease.lost, "the rightful holder must never observe a fence")
      writer.addDocuments(Seq((100L, "still mine")).toDF("doc_id", "text"))
      assert(writer.count() == 9)
      lease.close()
      assert(!new java.io.File(dir, "_lease").exists)
    } else lease.close() // fenced by a legitimate expiry takeover
  }
}
