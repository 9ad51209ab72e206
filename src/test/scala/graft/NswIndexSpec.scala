package graft

import graft.db.{DocSelector, HashingEmbedder, IndexStrategies, NswNavBuilder, VectorDB}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The `nsw` index strategy (per-serving-block navigable-small-world
  * graphs — the engine-side analogue of constructing the reference with
  * `faiss.IndexBinaryHNSW`, `BinaryVectorDB.py:17`):
  *   - without serving it is exactly `flat` (the Catalyst path never
  *     consults the navigator);
  *   - under serving with `efSearch` ≥ block rows the graph search is
  *     exhaustive (connected graph, no early stop) and therefore EXACT —
  *     including under a compiled selector;
  *   - at the default width it is approximate with high overlap vs the
  *     exact top-k;
  *   - commits rebuild the per-block graphs with the serving blocks.
  */
class NswIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftnsw").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val corpus = (1L to 300L).map(i =>
    (i, s"tok${i % 13} tok${i % 7} tok${i % 31} tok${i % 3}")).toSeq

  private def hits(db: VectorDB, q: String, k: Int = 10): Seq[(Long, Int, Double)] =
    db.search(q, k).collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Int]("score_hamming"), r.getAs[Double]("score_cossim"))).toSeq

  test("without serving, nsw equals flat exactly and the config round-trips") {
    val flat = VectorDB.openOrCreate(spark, freshDir())
    val nsw = VectorDB.openOrCreate(spark, freshDir(), index = VectorDB.IndexNsw)
    flat.addDocuments(corpus.toDF("doc_id", "text"))
    nsw.addDocuments(corpus.toDF("doc_id", "text"))

    Seq("tok1 tok5", "tok12 tok2 tok30", "tok4").foreach { q =>
      assert(hits(nsw, q) == hits(flat, q), s"query '$q'")
    }
    assert(VectorDB.openOrCreate(spark, nsw.folder).index == VectorDB.IndexNsw)
    // nprobe is a cell-partitioned-index parameter.
    intercept[IllegalArgumentException] { nsw.search("tok1", nprobe = 2) }
  }

  test("served nsw with efSearch >= block rows is exact, selectors included") {
    // Exhaustive width: the graph is connected, so ef >= n visits every
    // row and the result heap is the linear scan's heap bit for bit.
    IndexStrategies.register(new IndexStrategies.Nsw(
      m = 6, efConstruction = 24, efSearch = 1 << 20))
    try {
      val flat = VectorDB.openOrCreate(spark, freshDir())
      val nsw = VectorDB.openOrCreate(spark, freshDir(), index = VectorDB.IndexNsw)
      flat.addDocuments(corpus.toDF("doc_id", "text"))
      nsw.addDocuments(corpus.toDF("doc_id", "text"))
      nsw.enableServing()
      try {
        Seq("tok1 tok5", "tok12 tok2 tok30").foreach { q =>
          assert(hits(nsw, q) == hits(flat, q), s"query '$q'")
        }
        // Filtered: admitted-only results still exact at full width.
        val sel: DocSelector = nsw.selector(col("doc_id") % 3 === 0)
        val selFlat = flat.searchVectorWhere(
          qVec("tok1 tok5"), col("doc_id") % 3 === 0, 10, 10, 3, Int.MaxValue)
          .collect().map(_.getAs[Long]("doc_id")).toSeq
        val selNsw = nsw.searchVectorWhere(qVec("tok1 tok5"), sel, 10, 10, 3,
          Int.MaxValue).collect().map(_.getAs[Long]("doc_id")).toSeq
        assert(selNsw == selFlat)
        sel.release()
      } finally nsw.disableServing()
    } finally IndexStrategies.register(new IndexStrategies.Nsw())
  }

  test("build repair: near-inbound invariant holds and default-width recall stays >= 0.99 on the clustered manifold") {
    // Deterministic regression pin for the round-12 plateau fix
    // (NAVMISS_r12): a single-threaded build on the RecallBench
    // manifold must leave (a) every row with at least one inbound edge
    // among its out-neighbors' adjacency — the discoverability
    // guarantee whose absence sealed the hermit/undiscoverable rows —
    // and (b) recall@10 >= 0.99 at the DEFAULT beam width, where the
    // pre-fix builder plateaued at ~0.975 regardless of ef.
    val n = 20000
    val dim = 256
    val nWords = dim / 64
    val gen = RecallBench.pointGen(dim, 20, 8, 0.5)
    val words = new Array[Long](n * nWords)
    for (r <- 0 until n) {
      val v = gen(r.toLong)._1
      for (w <- 0 until nWords) {
        var acc = 0L
        for (b <- 0 until 64) if (v(w * 64 + b) > 0) acc |= (1L << (63 - b))
        words(r * nWords + w) = acc
      }
    }
    val ids = Array.tabulate(n)(_.toLong)
    val nav = new NswNavBuilder(16, 128, 100)
      .build(ids, words, nWords).asInstanceOf[graft.db.NswNav]

    val (adjN, adjD, adjMax) = nav.adjacencyView
    var noNearInbound = 0
    for (r <- 0 until n) {
      val deg = adjD(r)
      val hasInbound = (0 until deg).exists { j =>
        val nb = adjN(r * adjMax + j)
        (0 until adjD(nb)).exists(k => adjN(nb * adjMax + k) == r)
      }
      if (!hasInbound && deg > 0) noNearInbound += 1
    }
    assert(noNearInbound == 0,
      s"$noNearInbound rows lost their guaranteed near-inbound edge")

    def ham(row: Int, q: Array[Long]): Int =
      (0 until nWords).map(w =>
        java.lang.Long.bitCount(words(row * nWords + w) ^ q(w))).sum
    var hits = 0
    val qRows = (0 until 20).map(i => i * (n / 20) + i)
    qRows.foreach { qr =>
      val q = java.util.Arrays.copyOfRange(words, qr * nWords, (qr + 1) * nWords)
      val exact = (0 until n).map(r => (ham(r, q).toLong << 32) | r.toLong)
        .sorted.take(10).map(p => (p & 0xffffffffL).toInt).toSet
      val got = nav.topPacked(q, 10, _ => true)
        .map(p => (p & 0xffffffffL).toInt).toSet
      hits += exact.intersect(got).size
    }
    val recall = hits / (20 * 10.0)
    assert(recall >= 0.99, s"default-width recall@10 $recall < 0.99")
  }

  test("enableServing(blocks) pins the serving-block count without changing results") {
    // Round-12 audit finding: serving blocks followed the codes-join-docs
    // shuffle width, NOT the snapshot layout — the sizing warning caught
    // bench tiers labeled "4 blocks of 1M" actually serving 16 shuffle
    // blocks of 250k. The pin coalesces the fused source; results must
    // be bit-identical (blocks only change WHERE rows sit).
    val base = VectorDB.openOrCreate(spark, freshDir())
    base.addDocuments(corpus.toDF("doc_id", "text"))
    base.enableServing()
    val defaultBlocks = try {
      val info = base.servingInfo()
      assert(info.resident && info.blocks >= 1)
      (Seq("tok1 tok5", "tok4").map(q => hits(base, q)), info.blocks)
    } finally base.disableServing()

    val pinned = VectorDB.openOrCreate(spark, freshDir())
    pinned.addDocuments(corpus.toDF("doc_id", "text"))
    pinned.enableServing(blocks = 2)
    try {
      assert(pinned.servingInfo().blocks == 2)
      assert(Seq("tok1 tok5", "tok4").map(q => hits(pinned, q)) ==
        defaultBlocks._1)
    } finally pinned.disableServing()

    intercept[IllegalArgumentException] { pinned.enableServing(blocks = -1) }
  }

  test("serving build warns loudly when nsw blocks sit below the crossover") {
    // The GRAPHBENCH sizing rule as the loud default (r11 verdict task
    // 2): a graph strategy on tiny blocks is pure build overhead — the
    // serving build must still BUILD (correctness unchanged) but flag it.
    val nsw = VectorDB.openOrCreate(spark, freshDir(), index = VectorDB.IndexNsw)
    nsw.addDocuments(corpus.toDF("doc_id", "text"))
    assert(nsw.servingSizingWarning.isEmpty, "no warning before serving builds")
    nsw.enableServing()
    try {
      hits(nsw, "tok1 tok5")
      val warn = nsw.servingSizingWarning
      assert(warn.isDefined, "300 rows/block is far below the 1M crossover")
      assert(warn.get.contains("rows/block"))
      assert(warn.get.contains("nsw"))
    } finally nsw.disableServing()

    // A flat tier of the same size: no graph build, no warning.
    val flat = VectorDB.openOrCreate(spark, freshDir())
    flat.addDocuments(corpus.toDF("doc_id", "text"))
    flat.enableServing()
    try {
      hits(flat, "tok1 tok5")
      assert(flat.servingSizingWarning.isEmpty)
    } finally flat.disableServing()
  }

  test("served nsw at the default width keeps high overlap with the exact top-k") {
    // One block much larger than the search width, rich 1024-bit codes:
    // the approximate regime. Default ef=96 over a 1500-row block.
    val emb = new HashingEmbedder(1024)
    val big = (1L to 1500L).map(i =>
      (i, s"w${i % 97} w${i % 41} w${i % 13} w${i % 7} w${i % 3} w${i % 59}"))
    val flat = VectorDB.openOrCreate(spark, freshDir(), dim = 1024)
    val nsw = VectorDB.openOrCreate(spark, freshDir(), dim = 1024,
      index = VectorDB.IndexNsw)
    flat.addDocuments(big.toDF("doc_id", "text").repartition(1), emb)
    nsw.addDocuments(big.toDF("doc_id", "text").repartition(1), emb)
    nsw.enableServing()
    try {
      val queries = Seq("w1 w40 w12", "w96 w2 w58", "w7 w13 w41")
      val overlaps = queries.map { q =>
        val exact = flat.search(q, k = 10, embedder = emb)
          .collect().map(_.getAs[Long]("doc_id")).toSet
        val approx = nsw.search(q, k = 10, embedder = emb)
          .collect().map(_.getAs[Long]("doc_id")).toSet
        assert(approx.size == 10)
        (approx & exact).size
      }
      // Graph search is approximate; require strong but not perfect
      // retention (the recorded bench tracks the real recall curve).
      assert(overlaps.sum >= queries.size * 10 * 7 / 10,
        s"overlap@10 too low: $overlaps")
    } finally nsw.disableServing()
  }

  test("a commit rebuilds the per-block graphs with the serving blocks") {
    val nsw = VectorDB.openOrCreate(spark, freshDir(), index = VectorDB.IndexNsw)
    nsw.addDocuments(corpus.toDF("doc_id", "text"))
    nsw.enableServing()
    try {
      val before = hits(nsw, "tok1 tok5")
      nsw.addDocuments(Seq((9001L, "tok1 tok5 tok1 tok5")).toDF("doc_id", "text"))
      val after = hits(nsw, "tok1 tok5")
      assert(after != before)
      assert(after.exists(_._1 == 9001L),
        "the just-committed near-exact match must surface through the rebuilt graph")
    } finally nsw.disableServing()
  }

  test("hierarchical regime (block above UpperMinRows): upper layer engages, exact at full width, recall >= stride-only") {
    val rnd = new scala.util.Random(7)
    val n = NswNavBuilder.UpperMinRows + 4000 // 12192 rows: one upper layer
    val nWords = 8
    // Clustered codes (one of 40 centers, 8-24 flipped bits per row so
    // distances are mostly DISTINCT — near-duplicate ties would turn
    // recall@10 into an id-tiebreak lottery): the regime where entry
    // quality matters — random-uniform codes have no navigable
    // structure to exploit.
    val centers = Array.fill(40 * nWords)(rnd.nextLong())
    val words = new Array[Long](n * nWords)
    (0 until n).foreach { r =>
      val c = rnd.nextInt(40)
      (0 until nWords).foreach(w => words(r * nWords + w) = centers(c * nWords + w))
      val flips = 8 + rnd.nextInt(17)
      (0 until flips).foreach { _ =>
        val b = rnd.nextInt(64 * nWords)
        words(r * nWords + (b >> 6)) ^= (1L << (b & 63))
      }
    }
    val ids = Array.tabulate(n)(_.toLong)
    def ham(row: Int, q: Array[Long]): Int = (0 until nWords).map(w =>
      java.lang.Long.bitCount(words(row * nWords + w) ^ q(w))).sum

    val hier = new NswNavBuilder(m = 8, efConstruction = 48, efSearch = 48,
      hierarchy = true).build(ids, words, nWords).asInstanceOf[graft.db.NswNav]
    val flatNav = new NswNavBuilder(m = 8, efConstruction = 48, efSearch = 48,
      hierarchy = false).build(ids, words, nWords)

    val queries = (0 until 20).map { _ =>
      val base = rnd.nextInt(n) * nWords
      val q = Array.tabulate(nWords)(w => words(base + w))
      (0 until 3).foreach { _ =>
        val b = rnd.nextInt(64 * nWords)
        q(b >> 6) ^= (1L << (b & 63))
      }
      q
    }
    def recall(nav: graft.db.BlockNav): Double = queries.map { q =>
      val brute = (0 until n).map(r => (ham(r, q), ids(r)))
        .sortBy(identity).take(10).map(_._2).toSet
      val got = nav.topPacked(q, 10, _ => true)
        .map(p => ids((p & 0xffffffffL).toInt)).toSet
      (got & brute).size / 10.0
    }.sum / queries.size
    val rHier = recall(hier)
    val rFlat = recall(flatNav)
    assert(rHier >= rFlat - 0.02,
      s"upper-layer seeding must not lose recall: hier=$rHier stride=$rFlat")
    assert(rHier >= 0.8, s"hierarchical recall too low: $rHier")

    // Exhaustive width stays exact with the upper layer in play.
    val exactNav = new NswNavBuilder(m = 8, efConstruction = 48, efSearch = n,
      hierarchy = true).build(ids, words, nWords)
    val q = queries.head
    val brute7 = (0 until n).map(r => (ham(r, q), ids(r))).sortBy(identity).take(7)
    val got7 = exactNav.topPacked(q, 7, _ => true)
      .map(p => ((p >>> 32).toInt, ids((p & 0xffffffffL).toInt))).toSeq
    assert(got7 == brute7)
  }

  test("NswNav unit: exhaustive width reproduces brute force on random codes") {
    val rnd = new scala.util.Random(42)
    val n = 500
    val nWords = 2
    val ids = Array.tabulate(n)(i => (n - i).toLong) // ids NOT in row order
    val words = Array.fill(n * nWords)(rnd.nextLong())
    val nav = new NswNavBuilder(m = 5, efConstruction = 20, efSearch = n)
      .build(ids, words, nWords)
    val q = Array.fill(nWords)(rnd.nextLong())
    def ham(row: Int): Int = (0 until nWords).map(w =>
      java.lang.Long.bitCount(words(row * nWords + w) ^ q(w))).sum
    val brute = (0 until n).map(r => (ham(r), ids(r), r))
      .sortBy(t => (t._1, t._2)).take(7)
    val got = nav.topPacked(q, 7, _ => true).map { p =>
      val r = (p & 0xffffffffL).toInt
      ((p >>> 32).toInt, ids(r), r)
    }.toSeq
    assert(got == brute)
    // Admit filter: only even ids may enter the results.
    val bruteEven = (0 until n).filter(r => ids(r) % 2 == 0)
      .map(r => (ham(r), ids(r))).sortBy(identity).take(7)
    val gotEven = nav.topPacked(q, 7, r => ids(r) % 2 == 0).map { p =>
      ((p >>> 32).toInt, ids((p & 0xffffffffL).toInt))
    }.toSeq
    assert(gotEven == bruteEven)
  }

  test("nsw over merge-on-read storage: graphs rebuild across delta commits") {
    val nsw = VectorDB.openOrCreate(spark, freshDir(),
      storage = VectorDB.StorageMor, index = VectorDB.IndexNsw)
    val flat = VectorDB.openOrCreate(spark, freshDir(),
      storage = VectorDB.StorageMor)
    nsw.addDocuments(corpus.toDF("doc_id", "text"))
    flat.addDocuments(corpus.toDF("doc_id", "text"))
    nsw.enableServing()
    try {
      // delta commit (append) + tombstone, then search through the
      // rebuilt graphs over the merged view
      val extra = Seq((8001L, "tok1 tok5 tok1"), (8002L, "tok9 tok4")).toDF("doc_id", "text")
      nsw.addDocuments(extra); flat.addDocuments(extra)
      nsw.removeDocs(Seq(7L)); flat.removeDocs(Seq(7L))
      val a = hits(nsw, "tok1 tok5")
      assert(a.exists(_._1 == 8001L))
      assert(!a.exists(_._1 == 7L))
      // without serving both are exact — serving must agree on content
      // here because blocks are small relative to b (exhaustive regime)
      assert(a == hits(flat, "tok1 tok5"))
    } finally nsw.disableServing()
  }

  test("ivf_nsw composes cell probing with per-block graphs") {
    IndexStrategies.register(new IndexStrategies.IvfNsw(
      m = 6, efConstruction = 24, efSearch = 1 << 20))
    try {
      val flat = VectorDB.openOrCreate(spark, freshDir())
      val comp = VectorDB.openOrCreate(spark, freshDir(),
        index = VectorDB.IndexIvfNsw)
      flat.addDocuments(corpus.toDF("doc_id", "text"))
      comp.addDocuments(corpus.toDF("doc_id", "text"))
      // cell-partitioned on disk, like plain ivf
      val cellDirs = new java.io.File(comp.currentCodesPathForTest)
        .listFiles().filter(_.getName.startsWith("cell="))
      assert(cellDirs.nonEmpty)
      comp.enableServing()
      try {
        // exhaustive width + full probe = exact, flat-identical
        assert(hits(comp, "tok1 tok5") == hits(flat, "tok1 tok5"))
        // probe-limited search returns k rows from the probed cells
        val pruned = comp.search("tok4 tok9", k = 5, nprobe = 4).collect()
        assert(pruned.length == 5)
      } finally comp.disableServing()
      assert(VectorDB.openOrCreate(spark, comp.folder).index ==
        VectorDB.IndexIvfNsw)
    } finally IndexStrategies.register(new IndexStrategies.IvfNsw())
  }

  test("auto buildThreads policy: bounded, fair-shared, entitlement-capped on declared executors") {
    import graft.db.NswNavBuilder
    spark.sparkContext // ensure a live SparkEnv (local master, no declared cores)
    // local / undeclared mode: bounded by [1, MaxAutoThreads], and the
    // per-build slice never grows as more builds share the JVM
    val slices = (1 to 64).map(NswNavBuilder.autoThreads)
    assert(slices.forall(t => t >= 1 && t <= NswNavBuilder.MaxAutoThreads))
    assert(slices.zip(slices.tail).forall { case (a, b) => a >= b },
      s"slice must be non-increasing in active builds: $slices")
    // enough concurrent builds always degenerate to 1 thread each
    assert(NswNavBuilder.autoThreads(1024) == 1)
    // the explicit knob still wins: a 1-thread builder never registers
    // as an auto build
    val before = NswNavBuilder.autoActiveForTest
    val n = 3000 // above the 2048 single-thread floor
    val words = Array.tabulate(n)(i => i.toLong * 0x9e3779b97f4a7c15L)
    val ids = Array.tabulate(n)(_.toLong)
    new NswNavBuilder(4, 8, 16, buildThreads = 1).build(ids, words, 1)
    assert(NswNavBuilder.autoActiveForTest == before)
    // and an auto builder unregisters when its insert phase ends
    new NswNavBuilder(4, 8, 16).build(ids, words, 1)
    assert(NswNavBuilder.autoActiveForTest == before)
  }

  private def qVec(text: String): Seq[Double] = {
    val emb = new HashingEmbedder()
    spark.range(1).select(
      emb.embed(org.apache.spark.sql.functions.lit(text)).cast("array<double>"))
      .head().getSeq[Double](0)
  }
}
