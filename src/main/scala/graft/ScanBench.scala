package graft

import graft.functions.Kernels
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase-I and full-funnel throughput microbench against the reference's
  * headline numbers: 24 ms to exhaustively hamming-scan 1M × 1024-bit
  * binary embeddings, 28 ms for the 3-phase binary+int8 funnel
  * (BASELINE.md / reference README.md:14-15). Synthesizes N
  * deterministic 1024-bit codes (16 longs from xxhash64) plus int8
  * payloads, caches them (hot tier + point-lookup index), and times
  * repeated queries. Usage: graft.ScanBench [nVectors]
  *
  * Memory: the funnel section keeps ~1.4 KB/row resident (code tier +
  * int8 point-lookup index) — size the heap accordingly, e.g.
  * `SPARK_DRIVER_MEM=24g` for N = 4M (scripts/run.sh defaults to 8 GiB,
  * which fits N = 1M). Don't oversize: a 48g G1 heap at N = 4M measured
  * bimodal 12-22 s full-GC pauses that a 24g heap avoids entirely.
  */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    // Section gate (round-11: the 16M variance investigation needs many
    // bare-scan-only runs): "bare" = array/flat/prepared/concurrent
    // Phase-I scans; "funnel" = the three-phase rows; "float" = the
    // 460 ms row. Default all; skipped sections print -1.
    val sections = sys.env.getOrElse("SPARK_GRAFT_SCAN_SECTIONS", "bare,funnel,float")
      .split(",").map(_.trim).toSet
    // In-RUN writeback settle (r14 verdict item 2): this bench's OWN
    // ingest/cache phases write gigabytes, and a timing loop that starts
    // while the kernel is still flushing them reads 1.2-5x slow with
    // nothing wrong in the scan (r14b's 49.1 ms bare scan under its own
    // 22.1 ms funnel; the r15 first draws reproduced it at will on a
    // degraded device). Settle before EVERY timed loop, not just at
    // process start - the script-level settle cannot see mid-run dirt.
    def settle(): Unit = {
      val d = Bench.settleWriteback()
      System.err.println(s"[scanbench] settled Dirty=${d}kB loadavg=" +
        java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // Ambient-load stamps (round-11 root-cause of the 16M variance:
    // slow runs are UNIFORMLY slow across every section with tight
    // within-run rounds — co-located load, not GC; see ARCHITECTURE).
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val loadStart = loadAvg()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scanbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      // FAIR round-robins tasks across in-flight queries — the serving
      // config: under FIFO a queued lookup job waits out every earlier
      // scan's remaining tasks, inflating funnel tail latency. The mode
      // flag alone is NOT enough — the default pool is internally FIFO
      // unless the allocation file flips it (see Graft.fairDefaultPoolFile).
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", Graft.fairDefaultPoolFile)
      .config("spark.ui.enabled", "false")
      // Long benches run hundreds of jobs in one JVM; shuffle files and
      // superseded cache blocks free only when the ContextCleaner sees
      // their references GC'd, and the default 30min periodic GC never
      // fires inside a bench run. A 60s floor keeps the on-disk footprint
      // bounded (the pre-fix 1M recall sweep accumulated 60+ GB of dead
      // shuffle files and filled the disk).
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Kernels.install(spark)

    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val nConc = 16
    // Median of 3 concurrency rounds: a single 16-query batch is one
    // ~0.5 s wall sample — any box-load blip lands on it whole.
    def concurrentRound[A](work: Seq[() => A]): Double = {
      val t0 = System.nanoTime()
      val futs = work.map(w => scala.concurrent.Future(w()))
      futs.foreach(f =>
        scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
      (System.nanoTime() - t0) / 1e6 / work.size
    }

    var median = -1.0
    var fmedian = -1.0
    var pmedian = -1.0
    var concPerQuery = -1.0
    if (sections("bare")) {
      val codes = spark.range(n).select(col("id").as("doc_id"),
          transform(sequence(lit(0), lit(15)), i => xxhash64(col("id"), i)).as("code"))
        .persist(StorageLevel.MEMORY_ONLY)
      codes.count() // materialize the hot tier

      val q = codes.filter(col("doc_id") === n / 2)
        .head().getSeq[Long](1)
      val qLit = typedlit(q)

      def scanOnce(): Double = {
        val t0 = System.nanoTime()
        codes.select(col("doc_id"), Kernels.hamming(col("code"), qLit).as("d"))
          .orderBy(col("d").asc, col("doc_id").asc)
          .limit(100)
          .collect()
        (System.nanoTime() - t0) / 1e6
      }

      settle()
      val times = (1 to 7).map(_ => scanOnce())
      median = times.sorted.apply(times.size / 2)
      println(f"array_layout_runs_ms=${times.map(t => f"$t%.1f").mkString(",")}")

      // Flattened layout: 16 primitive long columns — no per-row array
      // object, columnar cache stays primitive, hamming is a codegen'd sum
      // of builtin bit_count(xor) terms.
      val flat = spark.range(n).select(col("id").as("doc_id") +:
          (0 until 16).map(i => xxhash64(col("id"), lit(i)).as(s"c$i")): _*)
        .persist(StorageLevel.MEMORY_ONLY)
      flat.count()
      val qf = flat.filter(col("doc_id") === n / 2).head()
      val hammingFlat = (0 until 16).map(i =>
        bit_count(col(s"c$i").bitwiseXOR(lit(qf.getLong(i + 1))))).reduce(_ + _)
      def scanFlat(): Double = {
        val t0 = System.nanoTime()
        flat.select(col("doc_id"), hammingFlat.as("d"))
          .orderBy(col("d").asc, col("doc_id").asc)
          .limit(100)
          .collect()
        (System.nanoTime() - t0) / 1e6
      }
      settle()
      val ftimes = (1 to 7).map(_ => scanFlat())
      fmedian = ftimes.sorted.apply(ftimes.size / 2)
      println(f"flat_layout_runs_ms=${ftimes.map(t => f"$t%.1f").mkString(",")}")

      // Prepared-SERVING floor: the shipped serving layer
      // ([[graft.db.PreparedScan]] — the same blocks `enableServing()`
      // builds) scans per-partition primitive arrays with bounded heaps in
      // one bare RDD job: no per-call Catalyst work of any kind. The gap
      // between this and `flat_layout_runs_ms` is per-call planning plus
      // columnar-cache materialization; this is the regime the reference's
      // published numbers assume (its faiss index is always RAM-resident).
      val psFlat = graft.db.PreparedScan.build(flat, 16,
        isFlat = true, isIvf = false)
      val qWordsFlat = Array.tabulate(16)(i => qf.getLong(i + 1))
      def scanPrepared(): Double = {
        val t0 = System.nanoTime()
        val top = psFlat.topB(qWordsFlat, 100)
        require(top.length == 100)
        (System.nanoTime() - t0) / 1e6
      }
      scanPrepared() // warm the block cache path once, outside the window
      settle()
      val ptimes = (1 to 7).map(_ => scanPrepared())
      pmedian = ptimes.sorted.apply(ptimes.size / 2)
      println(f"prepared_flat_runs_ms=${ptimes.map(t => f"$t%.1f").mkString(",")}")

      // Concurrent queries: the engine's serving model amortizes fixed
      // job-scheduling overhead across in-flight queries (the reference
      // serves one query per 24 ms; Spark overlaps them). Each in-flight
      // slot is a DISTINCT query vector against the SAME shipped
      // PreparedScan blocks — the serving layer benched exactly where it
      // ships; FAIR scheduling round-robins the in-flight scan jobs.
      val scanSlots = (0 until nConc).map { s =>
        val seed = (n / 2 + s * 1000 + 1) % n
        val qRow = flat.filter(col("doc_id") === seed).head()
        Array.tabulate(16)(i => qRow.getLong(i + 1))
      }
      scanSlots.foreach(q => psFlat.topB(q, 100)) // warm outside the window
      settle()
      val concRounds = (1 to 3).map(_ =>
        concurrentRound(scanSlots.map(q => () => psFlat.topB(q, 100))))
      concPerQuery = concRounds.sorted.apply(concRounds.size / 2)
      println(f"concurrent_rounds_ms=${concRounds.map(t => f"$t%.1f").mkString(",")}")
      println(f"concurrent_per_query_ms=$concPerQuery%.1f")
      psFlat.unpersist()
      flat.unpersist(); codes.unpersist()
    }

    var funMedian = -1.0
    var fpMedian = -1.0
    var funConc = -1.0
    var floatMedian = -1.0
    if (sections("funnel")) {
    // ---- Full three-phase funnel at the same scale --------------------------
    // The reference's SECOND headline: 28 ms for the binary+int8 funnel at
    // 1M x 1024-bit (README.md:15 / BASELINE.md). Same N, real payloads:
    // deterministic floats in (-1,1), codes = packBits(floats) as 16
    // primitive longs, int8 = quantize(floats, maxAbs=1) as 1024 bytes —
    // one cached two-tier relation (columnar cache reads only the scanned
    // columns, so Phase I still touches just doc_id + c0..c15).
    val dims = 1024
    val embV = transform(sequence(lit(0), lit(dims - 1)),
      i => (xxhash64(col("doc_id"), i) % 1000).cast("double") / lit(1000.0))
    val packed = Kernels.packBits(embV)
    // Both tiers are materialized to parquet and read back before
    // caching: the synthesized projections are enormous expression trees
    // (16 × packBits(transform(1024)) and 128 × 8 packed int8 terms), and
    // a cached relation KEEPS its child plan — every per-query filter
    // would drag ~10k Catalyst nodes through analysis/optimization
    // (measured ~600 ms/query). A parquet round-trip gives the cache a
    // clean file-scan child, so per-query planning is milliseconds.
    // Shared-FS location (session warehouse via IndexStore), not driver
    // /tmp — the same bench then runs unchanged on a real cluster's FS.
    val benchDir = graft.db.IndexStore.dirFor(spark, "scanbench", s"n=$n")

    // Hot tier: codes only, default 10k-row cache batches (scan-optimal).
    spark.range(n).select(col("id").as("doc_id"))
      .select(col("doc_id") +:
        (0 until 16).map(i => element_at(packed, i + 1).as(s"c$i")): _*)
      .write.mode("overwrite").parquet(s"$benchDir/hot")
    val tier = spark.read.parquet(s"$benchDir/hot").persist(StorageLevel.MEMORY_ONLY)
    tier.count()
    // Cold tier: codes + int8 payload packed into 128 LONG columns (8
    // int8 dims per word). ALL-PRIMITIVE on purpose: a BinaryType column
    // disables the vectorized cached reader, and the row-based fallback
    // must materialize every column of every row to advance its
    // variable-length cursors — a 100-id lookup then costs a full 1 GB
    // payload extraction (~250 ms measured). With primitive columns the
    // vectorized reader scans just the doc_id vector and touches payload
    // vectors only for the ~100 matching rows.
    def int8At(j: Int) = {
      val x = (xxhash64(col("doc_id"), lit(j)) % 1000).cast("double") / lit(1000.0)
      // exact mirror of Kernels.int8 with maxAbs = 1.0
      least(lit(127.0), greatest(lit(-127.0), floor(x * lit(127.0) + lit(0.5)))).cast("long")
    }
    val int8Words = (0 until 128).map { w =>
      (0 until 8).map(p => shiftleft(int8At(8 * w + p).bitwiseAND(lit(255L)), 8 * p))
        .reduce(_.bitwiseOR(_)).as(s"i$w")
    }
    spark.range(n).select(col("id").as("doc_id"))
      .select(col("doc_id") +:
        ((0 until 16).map(i => element_at(packed, i + 1).as(s"c$i")) ++ int8Words): _*)
      .write.mode("overwrite").parquet(s"$benchDir/cold")

    // Point-lookup index over the cold tier: per-partition sorted arrays
    // (ids, codes, int8 bytes), queried by a bare RDD job doing binary
    // search — the Spark-native analogue of the reference's positional
    // numpy/RocksDB candidate reads. A DataFrame isin-lookup on this
    // tier bottoms out at 50-300 ms/query in per-call Catalyst planning,
    // codegen and columnar row materialization; the indexed RDD job has
    // none of those and pays only the ~10 ms job floor. Partitioning
    // stays the scan's natural ~100 MB grain: coarser (e.g. 2×~570 MB)
    // was measured 4× WORSE — a partition that can't unroll into the
    // MEMORY_ONLY store is silently dropped and recomputed (parquet
    // re-read + sort) on every lookup.
    val coldIdx = spark.read.parquet(s"$benchDir/cold").rdd.mapPartitions { it =>
      val rows = it.toArray
      val order = rows.map(_.getLong(0)).zipWithIndex.sortBy(_._1).map(_._2)
      val ids = order.map(rows(_).getLong(0))
      val codes = order.map { o => val r = rows(o); Array.tabulate(16)(i => r.getLong(i + 1)) }
      val bytes = order.map { o =>
        val r = rows(o)
        Array.tabulate(1024) { j =>
          ((r.getLong(17 + (j >> 3)) >>> (8 * (j & 7))) & 0xffL).toByte
        }
      }
      Iterator.single((ids, codes, bytes))
    }.persist(StorageLevel.MEMORY_ONLY)
    coldIdx.count()

    def lookup(q: Array[Long]): Array[(Long, Array[Long], Array[Byte])] =
      spark.sparkContext.runJob(coldIdx,
        (it: Iterator[(Array[Long], Array[Array[Long]], Array[Array[Byte]])]) => {
          if (!it.hasNext) Array.empty[(Long, Array[Long], Array[Byte])]
          else {
            val (ids, codes, bytes) = it.next()
            q.flatMap { target =>
              val i = java.util.Arrays.binarySearch(ids, target)
              if (i >= 0) Some((target, codes(i), bytes(i))) else None
            }
          }
        }).flatten

    def qvFor(seed: Long): IndexedSeq[Double] =
      spark.range(1).select(transform(sequence(lit(0), lit(dims - 1)),
          i => (xxhash64(lit(seed), i) % 1000).cast("double") / lit(1000.0)))
        .head().getSeq[Double](0).toIndexedSeq
    def hammingFor(qWords: Seq[Long]) = (0 until 16).map(i =>
      bit_count(col(s"c$i").bitwiseXOR(lit(qWords(i))))).reduce(_ + _).cast("int")

    // Job 1 is the PURE Phase-I scan shape — (doc_id, h) only, so the
    // top-k heap carries 16-byte rows exactly like the measured scan.
    // Job 2 is the indexed point lookup above (~100 KB to the driver).
    // Phases II+III then run driver-side over the ≤100 candidates —
    // exactly where the reference runs them (its Python layer holds the
    // candidate lists, BinaryVectorDB.py:236); ~130k flops, microseconds.
    def funnelCore(qv: IndexedSeq[Double],
                   p1Rows: () => Array[org.apache.spark.sql.Row]): Double = {
      val t0 = System.nanoTime()
      val p1 = p1Rows()
      val ids = p1.map(_.getLong(0))
      val rows = lookup(ids)
      val hById = p1.map(r => r.getLong(0) -> r.getInt(1)).toMap
      // Phase II: ⟨float, ±1⟩ rescore of 100, keep 30.
      def signDot(code: Array[Long]): Double = {
        var s = 0.0
        var j = 0
        while (j < dims) {
          val bit = (code(j >> 6) >>> (63 - (j & 63))) & 1L
          s += (if (bit == 1L) qv(j) else -qv(j))
          j += 1
        }
        s
      }
      val p2 = rows.map { case (id, code, bytes) =>
        (id, signDot(code), bytes)
      }.sortBy(t => (-t._2, t._1)).take(30)
      // Phase III: ⟨float, int8⟩ rescore of 30, keep 10.
      val p3 = p2.map { case (id, sb, bytes) =>
        var dot = 0.0; var nrm = 0.0; var j = 0
        while (j < dims) {
          dot += qv(j) * bytes(j); nrm += bytes(j).toDouble * bytes(j); j += 1
        }
        (id, hById(id), sb, dot / math.sqrt(nrm))
      }.sortBy(t => (-t._4, t._1)).take(10)
      require(p3.length == 10)
      (System.nanoTime() - t0) / 1e6
    }

    val qv0 = qvFor(n / 2)
    val qWords0 = graft.operators.Search.packQuery(qv0)
    def funnelFresh(): Double = funnelCore(qv0, () =>
      tier.select(col("doc_id"), hammingFor(qWords0).as("h"))
        .orderBy(col("h").asc, col("doc_id").asc).limit(100)
        .collect())

    settle()
    val funTimes = (1 to 7).map(_ => funnelFresh())
    funMedian = funTimes.sorted.apply(funTimes.size / 2)
    println(f"funnel_runs_ms=${funTimes.map(t => f"$t%.1f").mkString(",")}")
    // the served funnel below carries payloads IN its blocks — the
    // point-lookup tier is only the fresh row's phase III; release it
    // before the serving rows so its ~1 KB/row doesn't inflate GC there
    coldIdx.unpersist()

    // Serving pool for the funnel: the SHIPPED serving funnel end to end
    // — ONE bare RDD job over payload-carrying PreparedScan blocks
    // (bounded heaps; each hit returns its code words AND int8 bytes
    // in-band), then phases II/III driver-side: sign-dot keep 30, int8
    // rescore keep 10. This is exactly `enableServing()`'s searchVector
    // shape — zero second job, zero Catalyst; `funnel_runs_ms` above
    // keeps the fresh-Catalyst-plan cost visible for contrast.
    val psTier = graft.db.PreparedScan.build(
      spark.range(n).select(col("id").as("doc_id") +:
        ((0 until 16).map(i => element_at(packed, i + 1).as(s"c$i")) :+
          Kernels.int8(embV, lit(1.0)).as("emb_int8")): _*),
      16, isFlat = true, isIvf = false, withBytes = true)
    def funnelServed(qv: IndexedSeq[Double], qWords: Array[Long]): Double = {
      val t0 = System.nanoTime()
      val top = psTier.topB(qWords, 100)
      def signDot(code: Array[Long]): Double = {
        var s = 0.0
        var j = 0
        while (j < dims) {
          val bit = (code(j >> 6) >>> (63 - (j & 63))) & 1L
          s += (if (bit == 1L) qv(j) else -qv(j))
          j += 1
        }
        s
      }
      val p2 = top.map(h => (h, signDot(h.words)))
        .sortBy { case (h, sb) => (-sb, h.id) }.take(30)
      val p3 = p2.map { case (h, sb) =>
        val bytes = h.bytes
        var dot = 0.0; var nrm = 0.0; var j = 0
        while (j < dims) {
          dot += qv(j) * bytes(j); nrm += bytes(j).toDouble * bytes(j); j += 1
        }
        (h.id, h.hamming, sb, dot / math.sqrt(nrm))
      }.sortBy(t => (-t._4, t._1)).take(10)
      require(p3.length == 10)
      (System.nanoTime() - t0) / 1e6
    }
    val funnelSlots = (0 until nConc).map { s =>
      val qv = qvFor((n / 2 + s * 1000 + 1) % n)
      (qv, graft.operators.Search.packQuery(qv).toArray)
    }
    funnelSlots.foreach { case (qv, qw) => funnelServed(qv, qw) } // warm
    settle()
    val fpTimes = (1 to 7).map(_ =>
      funnelServed(funnelSlots.head._1, funnelSlots.head._2))
    fpMedian = fpTimes.sorted.apply(fpTimes.size / 2)
    println(f"funnel_prepared_runs_ms=${fpTimes.map(t => f"$t%.1f").mkString(",")}")

    settle()
    val funConcRounds = (1 to 3).map(_ => concurrentRound(
      funnelSlots.map { case (qv, qw) => () => funnelServed(qv, qw) }))
    funConc = funConcRounds.sorted.apply(funConcRounds.size / 2)
    psTier.unpersist()
    println(f"funnel_concurrent_rounds_ms=${funConcRounds.map(t => f"$t%.1f").mkString(",")}")
    println(f"funnel_concurrent_per_query_ms=$funConc%.1f")
    tier.unpersist()
    coldIdx.unpersist()
    } // sections("funnel")
    pool.shutdown()

    // ---- Exhaustive float32 brute force: the 460 ms row -------------------
    // The reference's headline table leads with brute-force float32 at
    // 1M × 1024 dims (README.md:13, 460 ms/query) — the number its 24/28 ms
    // binary rows are sold against. Same N here, array<float> tier
    // (4 B/dim, ~4.1 GB at 1M), ranked by the codegen'd dot kernel. The
    // synthesized vectors are L2-NORMALIZED AT BUILD (the form embedding
    // APIs ship), so ranking by dot IS exact cosine — the scan pays dot
    // only, the same per-row cost the reference's float row pays.
    // Only measured at the baseline's own 1M scale: the float tier is the
    // 32×-bigger representation whose cost the funnel exists to avoid, and
    // at 16M it alone would out-size the funnel-tier heap budget.
    if (sections("float") && n <= 1000000L) {
        val dims = 1024
        def qvFor(seed: Long): IndexedSeq[Double] =
          spark.range(1).select(transform(sequence(lit(0), lit(dims - 1)),
              i => (xxhash64(lit(seed), i) % 1000).cast("double") / lit(1000.0)))
            .head().getSeq[Double](0).toIndexedSeq
        val qv0 = qvFor(n / 2)
        // built with a typed map, NOT a row-norm Column inside the
        // transform lambda: a per-row scalar referenced from a
        // higher-order function is re-evaluated PER ELEMENT (no CSE
        // across the lambda boundary), which turns the one-time build
        // into ~dims² work per row — measured in the thousands of
        // seconds at 1M×1024. The build is fixture setup, not the
        // measured scan (which reads the persisted tier), but it must
        // stay O(dims)/row.
        import spark.implicits._
        val fvec = spark.range(n).select(col("id").as("doc_id"),
            transform(sequence(lit(0), lit(dims - 1)),
              i => (xxhash64(col("id"), i) % 1000).cast("double") / lit(1000.0))
              .as("raw"))
          .as[(Long, Array[Double])]
          .map { case (id, xs) =>
            val nrm = math.sqrt(xs.map(x => x * x).sum)
            (id, xs.map(x => (x / nrm).toFloat))
          }
          .toDF("doc_id", "emb")
          .persist(StorageLevel.MEMORY_ONLY)
        fvec.count()
        val qn = math.sqrt(qv0.map(x => x * x).sum)
        val qe = typedlit(qv0.map(x => (x / qn).toFloat))
        def scanFloat(): Double = {
          val t0 = System.nanoTime()
          fvec.select(col("doc_id"), Kernels.dot(col("emb"), qe).as("s"))
            .orderBy(col("s").desc, col("doc_id").asc)
            .limit(10)
            .collect()
          (System.nanoTime() - t0) / 1e6
        }
        settle()
        val fl = (1 to 7).map(_ => scanFloat())
        println(f"float_scan_runs_ms=${fl.map(t => f"$t%.1f").mkString(",")}")
        fvec.unpersist()
        floatMedian = fl.sorted.apply(fl.size / 2)
      }

    println(f"""{"metric":"phase1_scan_1m_ms","value":$fmedian%.1f,"unit":"ms","n":$n,"array_layout_ms":$median%.1f,"prepared_flat_ms":$pmedian%.1f,"concurrent_per_query_ms":$concPerQuery%.1f,"baseline_ms":24,"funnel_1m_ms":$funMedian%.1f,"funnel_prepared_1m_ms":$fpMedian%.1f,"funnel_concurrent_per_query_ms":$funConc%.1f,"funnel_baseline_ms":28,"float_scan_1m_ms":$floatMedian%.1f,"float_baseline_ms":460,"loadavg_start":${(math.round(loadStart * 100) / 100.0).toString},"loadavg_end":${(math.round(loadAvg() * 100) / 100.0).toString},"note":"reference README.md:13-15 - 1M x 1024-bit exhaustive hamming scan, 3-phase funnel, and float32 brute force (float row measured at 1M only, -1 elsewhere); prepared/concurrent modes bench the shipped graft.db.PreparedScan serving layer (bare RDD block scans, distinct query vectors per slot)"}""")
    spark.stop()
  }
}
