package graft

import graft.db.VectorDB
import graft.streaming.StreamingIngest
import org.scalatest.funsuite.AnyFunSuite

/** E8 specs: batch/stream equivalence of the windowed aggregation, and
  * foreachBatch index upsert into a VectorDB.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming hourly counts equal the batch aggregation (sf0.001 replay)") {
    val dir = "/root/testdata/sf0.001"
    val q = StreamingIngest.runHourlyToMemory(spark, dir, "hourly_stream")
    try {
      // the memory sink registers in the scoped events-reader session
      val streamed = graft.operators.Events.eventsSession(spark).table("hourly_stream")
        .orderBy("hour_epoch", "event_type")
        .collect().map(_.toSeq).toSeq
      val batch = graft.operators.Events.hourly(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming dedup emits exactly one row per key (batch-equivalent replay)") {
    val dir = "/root/testdata/sf0.001"
    val src = StreamingIngest.eventsStream(spark, dir)
    val q = StreamingIngest.dedupWithinWatermark(src)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    try {
      val streamed = src.sparkSession.table("dedup_stream")
        .select("user_id", "event_type").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val batch = graft.operators.Events.eventsSession(spark).read
        .parquet(s"$dir/events.parquet")
        .select("user_id", "event_type").distinct().collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(streamed.nonEmpty)
      // dropDuplicatesWithinWatermark only guarantees dedup for duplicates
      // arriving within the watermark delay; global uniqueness below holds
      // because the single-file fixture replays as ONE micro-batch under
      // AvailableNow — pin that precondition so a fixture/trigger change
      // fails here instead of silently weakening the assertion.
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches == 1,
        s"fixture no longer replays in one micro-batch (saw $dataBatches)")
      assert(streamed.length === streamed.distinct.length, "no key emitted twice")
      assert(streamed.toSet === batch.toSet)
    } finally q.stop()
  }

  test("flatMapGroupsWithState session counts equal the batch sessionization") {
    val dir = "/root/testdata/sf0.001"
    // stateTtl = None: AvailableNow replays must not wait on TTL timers.
    val src = StreamingIngest.eventsStream(spark, dir)
    val q = StreamingIngest.statefulSessionCounts(src, stateTtl = None)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stateful_sessions")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    try {
      // Keep each user's last emitted row (cumulative state).
      val streamed = src.sparkSession.table("stateful_sessions")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("n_sessions").as("n_sessions"),
          org.apache.spark.sql.functions.max("n_events").as("n_events"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val batch = graft.operators.Events.sessionize(spark, dir)
        .collect().map(r => (r.getAs[Long]("user_id"),
          (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events")))).toMap
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("idle state expires and is re-created without double-counting sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")

    // Tiny processing-time TTL so idleness between micro-batches evicts.
    val sessions = StreamingIngest.statefulSessionCounts(
      events, gapSeconds = 1800, stateTtl = Some("50 milliseconds"))
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("ttl_sessions")
      .trigger(Trigger.ProcessingTime(10)).start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // processAllAvailable never returns under ProcessingTimeTimeout (the
    // engine always has a potential timer batch pending) — poll the sink.
    def awaitRows(pred: => Boolean, what: String): Unit = {
      val end = System.currentTimeMillis + 30000
      while (!pred && System.currentTimeMillis < end) Thread.sleep(50)
      assert(pred, s"timed out waiting for $what")
    }
    // Sink row order across batches is not contractual: sort lifetime
    // snapshots by event count (lifetime 1 has 2 events, lifetime 2 has 1).
    def user1Rows() = spark.table("ttl_sessions")
      .filter($"user_id" === 1L)
      .collect().map(r => (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events")))
      .toSeq.sortBy(-_._2)
    try {
      // Lifetime 1: two events 10s apart -> 1 session, 2 events.
      input.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:10"), 1L))
      awaitRows(user1Rows() == Seq((1L, 2L)), "lifetime-1 snapshot")
      // Idle past the 50 ms TTL: the engine keeps running timer batches,
      // so user 1's state is evicted without any new data arriving.
      Thread.sleep(1000)
      // Lifetime 2: user 1 returns past the session gap. Fresh state must
      // count exactly ONE new session (not resume at 2, not skip to 0).
      input.addData((ts("2024-01-01 12:00:00"), 1L))
      awaitRows(user1Rows().length == 2, "lifetime-2 snapshot")

      val user1 = user1Rows()
      assert(user1 == Seq((1L, 2L), (1L, 1L)),
        s"expected lifetime snapshots (1,2) then fresh (1,1), got $user1")
      // Total sessions across lifetimes == the batch answer over all
      // events (2 sessions): eviction at >= gap idle loses no boundary.
      assert(user1.map(_._1).sum == 2L)
    } finally q.stop()
  }

  test("watermark drops late data in append mode (controlled micro-batches)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val agg = StreamingIngest.hourlyCounts(events)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_data")
      .trigger(Trigger.ProcessingTime(0)).start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      // Batch 1: events in hour 10; watermark (max ts − 10 min) still in hour 10.
      input.addData((ts("2024-01-01 10:05:00"), "a", 1.0), (ts("2024-01-01 10:50:00"), "a", 2.0))
      q.processAllAvailable()
      // Batch 2: jump to hour 13 — watermark passes end of hour 10+10min,
      // so hour 10's window finalizes and is emitted.
      input.addData((ts("2024-01-01 13:30:00"), "a", 3.0))
      q.processAllAvailable()
      val afterFinalize = spark.table("late_data").collect()
      assert(afterFinalize.length == 1, afterFinalize.mkString(","))
      assert(afterFinalize.head.getAs[Long]("n") == 2) // both hour-10 events

      // Batch 3: a LATE hour-10 event far behind the watermark — dropped,
      // the finalized window is never re-emitted or corrected.
      input.addData((ts("2024-01-01 10:10:00"), "a", 99.0))
      q.processAllAvailable()
      val afterLate = spark.table("late_data").collect()
      assert(afterLate.length == 1, "late event must not reopen the finalized window")
      assert(afterLate.head.getAs[Long]("n") == 2)
    } finally q.stop()
  }

  test("foreachBatch streaming upsert maintains the vector index") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdbs").toFile
    tmp.delete()
    val db = VectorDB.openOrCreate(spark, tmp.getAbsolutePath)

    // Stream the documents fixture in as (doc_id, text) micro-batches.
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val docsStream = spark.readStream.schema(schema)
      .parquet(s"$dir/documents.*")
      .select($"doc_id", $"text")
    val q = StreamingIngest.indexUpsert(db, docsStream)
    q.stop()

    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(db.count() == n)
    // and the index is queryable
    assert(db.search("the fast key order sort table", k = 3).count() == 3)
  }

  test("deduped streaming upsert skips docs that near-duplicate the landed corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdbd").toFile
    tmp.delete()
    val db = VectorDB.openOrCreate(spark, tmp.getAbsolutePath)

    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val split = docs.count() * 4 / 5
    val corpus = docs.filter($"doc_id" < split).select($"doc_id", $"text")

    // Stream only the "new crawl" slice; the file source re-reads the
    // whole fixture, so filter inside the stream.
    val schema = docs.schema
    val docsStream = spark.readStream.schema(schema)
      .parquet(s"$dir/documents.*")
      .filter($"doc_id" >= split)
      .select($"doc_id", $"text")
    StreamingIngest.dedupedIndexUpsert(db, corpus, docsStream).stop()

    // Stream result must equal the batch API on the same slice: every
    // batch doc lands except those flagged against the corpus.
    val batch = docs.filter($"doc_id" >= split).select($"doc_id", $"text")
    val flagged = graft.operators.Dedup
      .incrementalSimhashDedup(corpus, batch, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.nonEmpty, "fixture should flag some cross-boundary near-dups")
    assert(db.count() == batch.count() - flagged.size)
  }

  test("continuous crawl loop: each micro-batch dedups against everything landed so far") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graftcc").toFile
    tmp.delete()
    val db = VectorDB.openOrCreate(spark, tmp.getAbsolutePath,
      storage = VectorDB.StorageMor)

    // each run = one AvailableNow pass over a fresh memory stream
    def run(docs: (Long, String)*): Unit = {
      val in = MemoryStream[(Long, String)]
      in.addData(docs: _*)
      StreamingIngest.continuousDedupedUpsert(
        db, in.toDF().toDF("doc_id", "text")).stop()
    }

    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tB = "red orange yellow green blue indigo violet crimson amber teal"
    val tC = "north south east west compass bearing heading azimuth route map"

    // empty DB: nothing to dedup against, both land
    run(1L -> tA, 2L -> tB)
    assert(db.count() == 2)

    // 3 duplicates a doc landed by a PREVIOUS micro-batch -> skipped;
    // 4 is fresh -> lands
    run(3L -> tA, 4L -> tC)
    assert(db.count() == 3)
    val landed = db.docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(landed == Set(1L, 2L, 4L), s"got $landed")

    // 5 duplicates a doc THIS STREAM's loop landed (4, not in any frozen
    // snapshot a caller could have passed) -> skipped: the corpus side is
    // genuinely self-referential
    run(5L -> tC)
    assert(db.count() == 3)

    // replay idempotence: a re-delivered doc is hamming-0 against its own
    // landed copy and is skipped, not double-indexed
    run(1L -> tA)
    assert(db.count() == 3)

    // and the surviving index serves queries
    assert(db.search("north south east west", k = 2).count() == 2)
  }

  test("crawl loop handle: cross-batch simhash state equals the stateless per-call loop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def freshDb() = {
      val tmp = java.nio.file.Files.createTempDirectory("graftcls").toFile
      tmp.delete()
      VectorDB.openOrCreate(spark, tmp.getAbsolutePath, storage = VectorDB.StorageMor)
    }
    val statefulDb = freshDb()
    val statelessDb = freshDb()
    // ONE handle for the stateful side: its corpus-side simhash state is
    // derived once and folded forward; the stateless side re-derives the
    // corpus from the DB on every call. Landed sets must be identical.
    val loop = StreamingIngest.crawlLoop(statefulDb)

    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tB = "red orange yellow green blue indigo violet crimson amber teal"
    val tC = "north south east west compass bearing heading azimuth route map"
    val tD = "quark lepton boson hadron meson photon gluon neutrino spin charm"
    val waves = Seq(
      Seq(1L -> tA, 2L -> tB), // empty state: both land
      Seq(3L -> tA, 4L -> tC), // 3 dups wave-1's landed doc; 4 fresh
      Seq(5L -> tC), // dups a doc the STATE folded in (4), not the initial corpus
      Seq(1L -> tA), // replay: self-match via state, not re-land
      Seq(2L -> tD), // UPSERT: doc 2's content replaced — old tB sim must leave the state
      Seq(6L -> tB), // near-dups doc 2's REPLACED content: must land (corpus no longer holds tB)
      Seq(7L -> tD)) // near-dups doc 2's CURRENT content: must be flagged

    waves.foreach { docs =>
      val inS = MemoryStream[(Long, String)]
      inS.addData(docs: _*)
      loop.stream(inS.toDF().toDF("doc_id", "text")).stop()
      val inP = MemoryStream[(Long, String)]
      inP.addData(docs: _*)
      StreamingIngest.continuousDedupedUpsert(
        statelessDb, inP.toDF().toDF("doc_id", "text")).stop()
      val got = statefulDb.docs.select("doc_id").collect().map(_.getLong(0)).toSet
      val want = statelessDb.docs.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == want, s"stateful loop diverged after wave $docs")
    }
    assert(statefulDb.docs.select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 4L, 6L))
    loop.close()
  }

  test("crawl loop with a reliable checkpoint dir: same results, state on shared FS") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graftrcp").toFile
    tmp.delete()
    val ckpt = java.nio.file.Files.createTempDirectory("graftckpt").toFile
    val db = VectorDB.openOrCreate(spark, tmp.getAbsolutePath,
      storage = VectorDB.StorageMor)
    val loop = StreamingIngest.crawlLoop(db,
      checkpointDir = Some(ckpt.getAbsolutePath))
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tC = "north south east west compass bearing heading azimuth route map"
    def run(docs: (Long, String)*): Unit = {
      val in = MemoryStream[(Long, String)]
      in.addData(docs: _*)
      loop.stream(in.toDF().toDF("doc_id", "text")).stop()
    }
    run(1L -> tA)
    run(2L -> tA, 3L -> tC) // 2 dups state-held doc 1; 3 lands
    assert(db.docs.select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 3L))
    // the state generations really went to the reliable dir
    def files(d: java.io.File): Seq[java.io.File] = {
      val xs = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      xs.filter(_.isFile) ++ xs.filter(_.isDirectory).flatMap(files)
    }
    assert(files(ckpt).nonEmpty, "no reliable checkpoint files written")
    loop.close()
  }

  test("crawl loop in ONE long-running query: state hands across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graftlrq").toFile
    tmp.delete()
    val db = VectorDB.openOrCreate(spark, tmp.getAbsolutePath,
      storage = VectorDB.StorageMor)
    val loop = StreamingIngest.crawlLoop(db)

    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tB = "red orange yellow green blue indigo violet crimson amber teal"
    // one query, ProcessingTime trigger; micro-batches driven explicitly
    // via processAllAvailable between addData calls
    val in = MemoryStream[(Long, String)]
    val q = loop.start(in.toDF().toDF("doc_id", "text"), Trigger.ProcessingTime(0))
    try {
      in.addData(1L -> tA, 2L -> tB)
      q.processAllAvailable()
      assert(db.count() == 2)
      // second micro-batch of the SAME query: 3 dups a doc the FIRST
      // micro-batch landed — the state must have handed forward
      in.addData(3L -> tA,
        4L -> "quasar pulsar nebula galaxy comet meteor asteroid nova dwarf cluster")
      q.processAllAvailable()
      val landed = db.docs.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(!landed.contains(3L), "state did not hand across micro-batches")
      assert(landed.contains(4L))
      // third micro-batch: replay of 1 self-matches via state
      in.addData(1L -> tA)
      q.processAllAvailable()
      assert(db.count() == landed.size)
    } finally {
      q.stop()
      loop.close()
    }
  }

  test("continuous crawl loop soak: read amplification stays bounded as the corpus grows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graftccs").toFile
    tmp.delete()
    val db = VectorDB.openOrCreate(spark, tmp.getAbsolutePath,
      storage = VectorDB.StorageMor)

    // 10 micro-batches of 5 pairwise-distinct docs each (disjoint token
    // vocabularies — no accidental near-dups); every batch also re-sends
    // one doc from the previous batch (an at-least-once overlap). The
    // compaction threshold must keep pending deltas bounded the whole
    // run — MOR read amplification cannot grow with corpus age — and the
    // replayed doc must self-match (hamming 0) instead of re-landing.
    def text(id: Long): String =
      (0 until 10).map(j => s"w${id}x$j").mkString(" ")
    (0 until 10).foreach { b =>
      val fresh = (0 until 5).map(i => (b * 5L + i, text(b * 5L + i)))
      val replay = if (b > 0) Seq((b * 5L - 1, text(b * 5L - 1))) else Seq.empty
      val in = MemoryStream[(Long, String)]
      in.addData(fresh ++ replay: _*)
      StreamingIngest.continuousDedupedUpsert(
        db, in.toDF().toDF("doc_id", "text"), compactEvery = 4).stop()
      assert(db.pendingDeltas() < 4,
        s"batch $b left ${db.pendingDeltas()} deltas pending — compaction not bounding")
      assert(db.count() == (b + 1) * 5L,
        s"batch $b: expected ${(b + 1) * 5} docs, got ${db.count()} — " +
          "replay re-landed or a fresh doc was wrongly flagged")
    }
    assert(db.search(text(0), k = 3).count() == 3)
  }

  test("streaming upsert into MOR storage: delta commits with bounded compaction") {
    val tmp = java.nio.file.Files.createTempDirectory("graftmors").toFile
    tmp.delete()
    val db = VectorDB.openOrCreate(spark, tmp.getAbsolutePath,
      storage = VectorDB.StorageMor)

    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    // maxFilesPerTrigger is irrelevant for one fixture file; drive three
    // batches by restarting AvailableNow over overlapping selections.
    val base = spark.readStream.schema(schema).parquet(s"$dir/documents.*")
    StreamingIngest.indexUpsert(db, base.select($"doc_id", $"text"), compactEvery = 1).stop()
    assert(db.pendingDeltas() == 0, "compaction threshold 1 must fold immediately")
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(db.count() == n)

    // Second replay = full upsert of the same ids: still n docs (idempotent).
    StreamingIngest.indexUpsert(db, base.select($"doc_id", $"text"), compactEvery = 100).stop()
    assert(db.count() == n)
    assert(db.pendingDeltas() == 1, "below threshold: delta left pending")
    assert(db.search("the fast key order sort table", k = 3).count() == 3)
  }

  test("crawl loop auto-compaction triggers under an open pin; pinned view stays frozen") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graftdbapc").toFile
    tmp.delete()
    val db = VectorDB.openOrCreate(spark, tmp.getAbsolutePath,
      storage = VectorDB.StorageMor)
    def text(id: Long): String = (0 until 10).map(j => s"t${id}w$j").mkString(" ")

    // knob low enough that the soak below MUST fold several times
    val loop = StreamingIngest.crawlLoop(db, compactEvery = 3)
    def sendBatch(b: Int): Unit = {
      val in = MemoryStream[(Long, String)]
      in.addData((0 until 5).map(i => (b * 5L + i, text(b * 5L + i))): _*)
      loop.stream(in.toDF().toDF("doc_id", "text")).stop()
    }

    sendBatch(0)
    val pin = db.snapshot()
    val pinned = pin.count()
    assert(pinned == 5)
    var pendingMax = 0
    var folds = 0
    (1 until 10).foreach { b =>
      val before = db.pendingDeltas()
      sendBatch(b)
      if (db.pendingDeltas() < before) folds += 1
      pendingMax = math.max(pendingMax, db.pendingDeltas())
      assert(pin.count() == pinned,
        s"pinned view moved under knob-triggered compaction at batch $b")
    }
    assert(folds >= 2, s"compactEvery=3 must have folded several times, saw $folds")
    assert(pendingMax < 3 + 1,
      s"auto-compaction must bound pending deltas near the knob: $pendingMax")
    assert(db.count() == 50)
    pin.close()
    loop.close()
    // pin-retained generations free at close; the {current, previous}
    // reader window remains
    assert(db.retainedMorGenerations() <= 1)
  }
}
