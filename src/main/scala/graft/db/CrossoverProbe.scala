package graft.db

import graft.RecallBench

/** Per-block crossover measurement behind `VectorDB.NavCrossoverRows`
  * (the serving build's sizing warning): the REAL linear kernel
  * ([[PreparedScan.scanBlock]] — bounded heap + early-exit word walk)
  * vs the REAL graph navigator ([[NswNav.topPacked]]) on one block of
  * the GraphBench manifold, across block sizes. Plain JVM: one block
  * here IS one executor partition's Phase-I work — Spark's job floor
  * and driver merge are identical for both paths, so the per-block
  * kernel walls are exactly what separates them at scale.
  *
  * Usage: `graft.db.CrossoverProbe [dim] [sizesCsv] [nQueries] [threads]`
  * (default 1024, 250k/1M/2M/4M/8M, 50, min(cores,16)).
  */
object CrossoverProbe {
  def main(args: Array[String]): Unit = {
    val dim = if (args.nonEmpty) args(0).toInt else 1024
    val sizes = (if (args.length > 1) args(1)
      else "250000,1000000,2000000,4000000,8000000")
      .split(",").map(_.trim.toInt).toSeq
    val nQueries = if (args.length > 2) args(2).toInt else 50
    val threads = if (args.length > 3) args(3).toInt
      else Runtime.getRuntime.availableProcessors().min(16)
    val nMax = sizes.max
    val nWords = dim / 64
    val gen = RecallBench.pointGen(dim, 100, 8, 0.5)

    // corpus codes at the max size once; smaller sizes are prefixes
    val words = new Array[Long](nMax * nWords)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val futs = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var r = t
            while (r < nMax) {
              val v = gen(r.toLong)._1
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
    System.err.println(s"[crossover] corpus built ($nMax x $dim)")

    val b = 100 // k=10 at the default binaryOversample=10
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val rows = sizes.map { n =>
      val ids = Array.tabulate(n)(_.toLong)
      val w = java.util.Arrays.copyOfRange(words, 0, n * nWords)
      val blk = PreparedScan.Block.bare(ids, w, Array.emptyIntArray,
        Array.emptyIntArray)
      val qRows = (0 until nQueries).map(i => i * (n / nQueries) + i)
      def q(row: Int): Array[Long] =
        java.util.Arrays.copyOfRange(w, row * nWords, (row + 1) * nWords)

      // linear: warm once, then median wall
      PreparedScan.scanBlock(blk, q(qRows.head), nWords, b, null)
      val linWalls = qRows.map { r =>
        val t0 = System.nanoTime()
        PreparedScan.scanBlock(blk, q(r), nWords, b, null)
        (System.nanoTime() - t0) / 1e6
      }
      val linTop = qRows.map(r => PreparedScan.scanBlock(blk, q(r), nWords, b, null)
        .take(10).map(_.id).toSet)

      // graph: threaded build (the deployment shape at these sizes),
      // default query width ef=100
      val tb = System.nanoTime()
      val nav = new NswNavBuilder(16, 128, 100, buildThreads = threads)
        .build(ids, w, nWords)
      val buildS = (System.nanoTime() - tb) / 1e9
      nav.topPacked(q(qRows.head), b, _ => true)
      val navWalls = qRows.map { r =>
        val t0 = System.nanoTime()
        nav.topPacked(q(r), b, _ => true)
        (System.nanoTime() - t0) / 1e6
      }
      var hits = 0
      qRows.zipWithIndex.foreach { case (r, i) =>
        val got = nav.topPacked(q(r), b, _ => true).take(10)
          .map(p => ids((p & 0xffffffffL).toInt)).toSet
        hits += got.intersect(linTop(i)).size
      }
      val row = f"""{"rows":$n,"linear_ms":${median(linWalls)}%.2f,""" +
        f""""nsw_ms":${median(navWalls)}%.2f,""" +
        f""""speedup":${median(linWalls) / math.max(median(navWalls), 1e-9)}%.2f,""" +
        f""""build_s":$buildS%.1f,""" +
        f""""recall_at10":${hits / (nQueries * 10.0)}%.4f}"""
      System.err.println(s"[crossover] $row")
      row
    }

    println(s"""{"metric":"block_crossover","dim":$dim,"b":$b,""" +
      s""""n_queries":$nQueries,"build_threads":$threads,""" +
      s""""rows":${rows.mkString("[", ",", "]")},""" +
      """"note":"Per-block Phase-I kernel walls, plain JVM, one thread per query: PreparedScan.scanBlock (the real linear bounded-heap early-exit kernel) vs NswNav.topPacked at the default width (ef=100, m=16, efC=128, threaded build) on the GraphBench manifold. One block = one executor partition; job floor and driver merge are identical for both paths, so these walls are the quantity VectorDB.NavCrossoverRows (the serving build's sizing warning) gates on. recall_at10 is graph vs the linear scan's exact top-10."}""")
  }
}
