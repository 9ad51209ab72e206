package graft

import graft.db.VectorDB
import graft.streaming.StreamingIngest
import org.apache.spark.sql.SparkSession

/** End-to-end usage demo of the library surface (the reference's
  * `examples/create_new_db.py` + `search_in_db.py` flows, offline):
  * build a DB from the documents fixture, run a text search through the
  * three-phase funnel, stream the events fixture into an hourly
  * aggregate. Usage: graft.Demo <sfDir> <dbDir>
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val dbDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graftdb").toString + "/db"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Build: create-or-open, bulk-load the corpus (upsert semantics).
    val db = VectorDB.openOrCreate(spark, dbDir)
    db.addDocuments(
      spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text"))
    println(s"indexed ${db.count()} documents into $dbDir")

    // Query: text → hashing embedder → 3-phase funnel.
    val query = "spark group query row data filter"
    println(s"search: '$query'")
    db.search(query, k = 5).show(5, 60)
    // Per-phase wall times — the reference prints the same three numbers
    // from its INFO logs (examples/search_in_db.py:21-23). Driven through
    // searchHits, which stamps phase III at materialization (the
    // DataFrame form above leaves phase III to the caller's action).
    val demoEmb = new graft.db.HashingEmbedder()
    val qv = spark.range(1)
      .select(demoEmb.embed(org.apache.spark.sql.functions.lit(query)).cast("array<double>"))
      .head().getSeq[Double](0)
    db.searchHits(qv, k = 5)
    db.lastSearchTimings.foreach(t => println(
      f"phases: I ${t.phase1Ms}%.1f ms, II ${t.phase2Ms}%.1f ms, " +
        f"III ${t.phase3Ms}%.1f ms (total ${t.totalMs}%.1f ms)"))

    // Batched serving: one scan of the hot tier answers a query batch
    // (any k/oversample) via the bounded-heap aggregate.
    val emb = new graft.db.HashingEmbedder()
    val batch = Seq("spark data rows", "stream window count").zipWithIndex.map {
      case (t, i) => (i.toLong, spark.range(1)
        .select(emb.embed(org.apache.spark.sql.functions.lit(t)).cast("array<double>"))
        .head().getSeq[Double](0))
    }
    println("batched searchMany (k=3):")
    db.searchMany(batch, k = 3).show(6, 40)

    // Filtered search: compile a cold-tier predicate once, reuse the
    // allowlist across queries (broadcast ≤10M matches; a file-backed
    // sorted-run index beyond — same results either way).
    val sel = db.selector(org.apache.spark.sql.functions.col("doc")
      .contains("data"))
    println(s"filtered search (predicate matches ${sel.size} docs):")
    db.searchVectorWhere(qv, sel).show(3, 60)
    sel.release()

    // Cataloged selectors: repeat compiles of one predicate are a
    // JVM-wide cache hit (warm entries persist at zero refs; commits
    // invalidate; file-backed compiles persist a manifest other JVMs
    // adopt without recompiling).
    val cachedPred = org.apache.spark.sql.functions.col("doc").contains("data")
    val t0 = System.nanoTime(); db.selectorCached(cachedPred).release()
    val cold = (System.nanoTime() - t0) / 1e6
    val t1 = System.nanoTime(); db.selectorCached(cachedPred).release()
    val warm = (System.nanoTime() - t1) / 1e6
    println(f"cataloged selector: cold compile $cold%.1f ms, warm reuse $warm%.1f ms")
    db.clearSelectorCache()

    // Transactional reads: pin the current snapshot, commit on top of
    // it, and show the pin still answering from its generation while
    // the live view moved (copy-on-write generations + GC; time travel
    // via keepGenerations/generations/snapshotAt).
    val snap = db.snapshot()
    db.addDocuments(spark.createDataFrame(
      Seq((9000001L, "freshly committed row after the pin"))).toDF("doc_id", "text"))
    println(s"pinned snapshot: ${snap.count()} docs; live view: ${db.count()} " +
      s"(generations retained: ${db.generations().size})")
    snap.close()

    // Merge-on-read + compaction under a pin: folds proceed with the
    // snapshot open (the pre-fold generation is retained in place for
    // the pin and the in-flight reader window; reclaimed after close).
    val mor = VectorDB.openOrCreate(spark, s"$dbDir-mor",
      storage = VectorDB.StorageMor)
    mor.addDocuments(spark.createDataFrame(
      (1L to 40L).map(i => (i, s"mor doc $i"))).toDF("doc_id", "text"))
    val morPin = mor.snapshot()
    mor.addDocuments(spark.createDataFrame(
      (41L to 60L).map(i => (i, s"mor doc $i"))).toDF("doc_id", "text"))
    mor.compact()
    println(s"mor compaction under an open pin: pin=${morPin.count()} " +
      s"live=${mor.count()} pendingDeltas=${mor.pendingDeltas()} " +
      s"retainedGenerations=${mor.retainedMorGenerations()}")
    morPin.close()
    println(s"after pin close: retainedGenerations=${mor.retainedMorGenerations()}")

    // IVF strategy: same API, cell-partitioned hot tier; nprobe trades
    // scan fraction for recall (all cells ≡ flat, exactly).
    val ivf = VectorDB.openOrCreate(spark, s"$dbDir-ivf", index = VectorDB.IndexIvf)
    ivf.addDocuments(
      spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text"))
    println("ivf strategy, nprobe=4:")
    ivf.search(query, k = 3, nprobe = 4).show(3, 60)

    // Pipeline composition: near-dup clusters + leakage-proof split.
    println("duplicate clusters (connected components over SimHash pairs):")
    graft.operators.Pipeline.dedupClusters(spark, sfDir).show(5)
    println("content-hash train/val/test split:")
    graft.operators.Pipeline.hashSplit(spark, sfDir).show(6)

    // Streaming: replay events into hourly windows. The memory sink
    // registers in the events-reader session clone's catalog (isolated
    // temp views — see Events.eventsSession), so resolve it there.
    val q = StreamingIngest.runHourlyToMemory(spark, sfDir, "demo_hourly")
    println("first 5 streamed hourly windows:")
    graft.operators.Events.eventsSession(spark)
      .table("demo_hourly").orderBy("hour_epoch", "event_type").show(5)
    q.stop()

    // Continuous crawl: stream a "new crawl" slice into the SAME db,
    // each micro-batch near-dedup-checked against everything already
    // landed (the corpus is re-derived from the db itself per batch).
    val before = db.count()
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val crawl = spark.readStream.schema(schema)
      .parquet(s"$sfDir/documents.*")
      .select("doc_id", "text")
      .withColumn("doc_id", org.apache.spark.sql.functions.expr("doc_id + 1000000"))
    StreamingIngest.continuousDedupedUpsert(db, crawl).stop()
    println(s"continuous crawl upsert: $before docs before, ${db.count()} after " +
      "(re-crawled near-duplicates of the landed corpus were skipped)")
    spark.stop()
  }
}
