package graft

import graft.db.{NswNav, NswNavBuilder}

/** Miss diagnosis for the NSW recall plateau on the REAL GraphBench
  * manifold ([[RecallBench.pointGen]] — 100 clusters, intrinsic dim 8,
  * sigma 0.5 on the unit sphere, sign-binarized), at the 1M-rows-per-
  * block geometry where the 0.975 plateau lives. Round 12's
  * reachability repair proved the plateau is NOT severed rows (recall
  * unchanged with repair on, GRAPHBENCH_r12_4m), so this probe
  * classifies every miss the beam makes:
  *
  *  - `tie`: the missed row's hamming equals the worst returned
  *    hamming — a (hamming, id) boundary swap, zero semantic distance;
  *  - `same_cluster`: missed row shares the query's nearest cluster —
  *    the beam failed INSIDE the right region (graph quality);
  *  - `cross_cluster`: missed row lives in another cluster — the beam
  *    never crossed the boundary (connectivity / seeding).
  *
  * Plain JVM (no Spark): per-block navigators are partition-local, so
  * one block here IS what each executor runs.
  *
  * Usage: `graft.NavMissProbe [n] [dim] [nQueries] [efCsv]`
  * (default 1000000 1024 50 100,192,384,768).
  */
object NavMissProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000000
    val dim = if (args.length > 1) args(1).toInt else 1024
    val nQueries = if (args.length > 2) args(2).toInt else 50
    val efGrid = (if (args.length > 3) args(3) else "100,192,384,768")
      .split(",").map(_.trim.toInt).toSeq
    val nWords = dim / 64
    val gen = RecallBench.pointGen(dim, 100, 8, 0.5)

    // corpus codes: sign-binarize the float points, MSB-first like Q1
    val words = new Array[Long](n * nWords)
    val clusterOf = new Array[Int](n)
    val t0 = System.nanoTime()
    val threads = Runtime.getRuntime.availableProcessors().min(16)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val futs = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var r = t
            while (r < n) {
              val (v, cl) = gen(r.toLong)
              clusterOf(r) = cl
              var w = 0
              while (w < nWords) {
                var acc = 0L
                var b = 0
                while (b < 64) {
                  if (v(w * 64 + b) > 0) acc |= (1L << (63 - b))
                  b += 1
                }
                words(r * nWords + w) = acc
                w += 1
              }
              r += threads
            }
          }
        })
      }
      futs.foreach(_.get())
    } finally pool.shutdown()
    println(f"[navmiss] corpus built ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val ids = Array.tabulate(n)(_.toLong)
    // GraphBench queries are actual corpus rows: qids spread over the id
    // range (i * n/nQueries + i)
    val qRows = (0 until nQueries).map(i => i * (n / nQueries) + i)

    def ham(row: Int, q: Array[Long]): Int = {
      val base = row * nWords
      var acc = 0
      var w = 0
      while (w < nWords) {
        acc += java.lang.Long.bitCount(words(base + w) ^ q(w)); w += 1
      }
      acc
    }
    /** exact top-k rows by (hamming, id) */
    def exact(q: Array[Long], k: Int): Array[Long] = {
      val all = new Array[Long](n)
      var i = 0
      while (i < n) { all(i) = (ham(i, q).toLong << 32) | i.toLong; i += 1 }
      java.util.Arrays.sort(all)
      all.take(k)
    }

    val efRows = efGrid.map { ef =>
      val tb = System.nanoTime()
      val nav = new NswNavBuilder(16, 128, ef, buildThreads = threads)
        .build(ids, words, nWords).asInstanceOf[NswNav]
      val buildS = (System.nanoTime() - tb) / 1e9
      var hit10 = 0; var tie = 0; var sameCl = 0; var crossCl = 0
      val missDetail = new scala.collection.mutable.ArrayBuffer[String]()
      // in-degree over the whole graph (miss hypothesis: reachable but
      // UNDISCOVERABLE rows have abnormally low in-degree, so no
      // expanded node ever evaluates them)
      val (adjN, adjD, adjMax) = nav.adjacencyView
      val inDeg = new Array[Int](n)
      locally {
        var r = 0
        while (r < n) {
          val base = r * adjMax
          var j = 0
          while (j < adjD(r)) { inDeg(adjN(base + j)) += 1; j += 1 }
          r += 1
        }
      }
      val inDegHist = inDeg.groupBy(d => math.min(d, 10)).map {
        case (d, a) => d -> a.length
      }.toSeq.sortBy(_._1)
        .map { case (d, c) => s""""${if (d == 10) "10+" else d.toString}":$c""" }
        .mkString("{", ",", "}")
      // post-build invariant check: rows with NO back-edge from any
      // out-neighbor (the builder's near-inbound pass should leave 0
      // unless later forceLinks clobbered the forced edges)
      var noNearInbound = 0
      locally {
        var r = 0
        while (r < n) {
          val base = r * adjMax
          val deg = adjD(r)
          var has = false
          var j = 0
          while (!has && j < deg) {
            val nb = adjN(base + j)
            val nbase = nb * adjMax
            var k = 0
            while (!has && k < adjD(nb)) {
              if (adjN(nbase + k) == r) has = true
              k += 1
            }
            j += 1
          }
          if (!has && deg > 0) noNearInbound += 1
          r += 1
        }
      }
      qRows.foreach { qr =>
        val q = java.util.Arrays.copyOfRange(words, qr * nWords, (qr + 1) * nWords)
        val ex10 = exact(q, 10)
        val got = nav.topPacked(q, 100, _ => true).take(10)
        val gotRows = got.map(p => (p & 0xffffffffL).toInt).toSet
        val worstGotH = if (got.isEmpty) Int.MaxValue else (got.last >>> 32).toInt
        ex10.foreach { p =>
          val er = (p & 0xffffffffL).toInt
          val eh = (p >>> 32).toInt
          if (gotRows.contains(er)) hit10 += 1
          else {
            val kind =
              if (eh >= worstGotH) { tie += 1; "tie" }
              else if (clusterOf(er) == clusterOf(qr)) { sameCl += 1; "same_cluster" }
              else { crossCl += 1; "cross_cluster" }
            if (missDetail.size < 30) {
              // who points at the miss row, and how close are those
              // sources to the QUERY (discoverability = some source
              // must be expanded, which needs it within the beam's
              // evaluated bound)
              var minSrcQ = Int.MaxValue
              var srcSameCl = 0
              var nSrc = 0
              var sr = 0
              while (sr < n) {
                val sb = sr * adjMax
                var sj = 0
                var points = false
                while (!points && sj < adjD(sr)) {
                  if (adjN(sb + sj) == er) points = true
                  sj += 1
                }
                if (points) {
                  nSrc += 1
                  val d = ham(sr, q)
                  if (d < minSrcQ) minSrcQ = d
                  if (clusterOf(sr) == clusterOf(qr)) srcSameCl += 1
                }
                sr += 1
              }
              missDetail += s"""{"q_row":$qr,"q_cluster":${clusterOf(qr)},""" +
                s""""miss_row":$er,"miss_cluster":${clusterOf(er)},""" +
                s""""miss_hamming":$eh,"worst_returned_hamming":$worstGotH,""" +
                s""""miss_in_degree":${inDeg(er)},"miss_out_degree":${adjD(er)},""" +
                s""""n_sources":$nSrc,"min_source_query_hamming":$minSrcQ,""" +
                s""""sources_same_cluster":$srcSameCl,""" +
                s""""kind":"$kind"}"""
            }
          }
        }
      }
      val denom = (nQueries * 10).toDouble
      val row = f"""{"ef_search":$ef,"build_s":$buildS%.1f,""" +
        f""""recall_at10":${hit10 / denom}%.4f,""" +
        f""""recall_tie_adjusted":${(hit10 + tie) / denom}%.4f,""" +
        s""""miss_tie":$tie,"miss_same_cluster":$sameCl,""" +
        s""""miss_cross_cluster":$crossCl,""" +
        s""""in_degree_hist":$inDegHist,"rows_without_near_inbound":$noNearInbound,""" +
        s""""miss_detail":${missDetail.mkString("[", ",", "]")}}"""
      println(row)
      row
    }

    println(s"""{"metric":"nav_miss_probe","n":$n,"dim":$dim,""" +
      s""""n_queries":$nQueries,"rows":${efRows.mkString("[", ",", "]")},""" +
      """"note":"Phase-I-only recall@10 vs exact (hamming, id) top-10 on the GraphBench pointGen manifold at the 1M-row-block geometry, one plain-JVM block = one executor partition. tie = missed row's hamming equals the worst returned hamming (boundary swap, zero semantic cost; the funnel's float rescore can still order them differently, which is what GRAPHBENCH's end-to-end recall sees). same/cross_cluster classify the real beam failures."}""")
  }
}
