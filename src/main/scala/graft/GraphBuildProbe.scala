package graft

import graft.db.NswNavBuilder

/** Micro-probe for the per-block NSW graph build in isolation — no
  * Spark, no join, no block arrays: random packed codes in a plain
  * JVM, one `NswNavBuilder.build` wall per thread count. Separates the
  * graph construction's thread scaling from the serve-enable wall
  * GraphBench measures (which folds in the codes⋈docs join, array
  * building, and persist).
  *
  * Usage: `graft.GraphBuildProbe [n] [nWords] [threadList]`
  * (default 1000000 16 1,4,8,16).
  *
  * Recorded (GRAPHBUILD_r11.json, 1M×1024 spread clusters — E[intra]
  * ≈ 224 bits, much harder than the serving bench's tight manifold):
  * 679 s single-threaded → 138/66/32 s at 4/8/16 threads. The
  * super-linear scaling is real and explained: concurrent inserts beam
  * against a less-complete graph (in-flight rows below them are not
  * yet linked), so the parallel build does LESS total work — the same
  * reason its output graph is run-dependent. Build cost is strongly
  * DATA-dependent: the tight bench manifold builds ~8 s/1M-row block
  * where this spread set needs 11 min.
  */
object GraphBuildProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000000
    val nWords = if (args.length > 1) args(1).toInt else 16
    val threads = (if (args.length > 2) args(2) else "1,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val rnd = new java.util.Random(42)
    val ids = Array.tabulate(n)(_.toLong)
    // Clustered codes (100 centers, sparse flips) — the structure real
    // embedding corpora have and the regime the serving bench uses.
    // Uniform-random codes are NSW's worst case (distances concentrate,
    // the beam prunes nothing) and measure pathology, not the engine.
    val centers = Array.fill(100 * nWords)(rnd.nextLong())
    val words = new Array[Long](n * nWords)
    var r = 0
    while (r < n) {
      val c = rnd.nextInt(100) * nWords
      var w = 0
      while (w < nWords) {
        words(r * nWords + w) =
          centers(c + w) ^ (rnd.nextLong() & rnd.nextLong() & rnd.nextLong())
        w += 1
      }
      r += 1
    }
    // small warmup build to JIT the hot paths
    new NswNavBuilder(8, 32, 96, 1).build(ids.take(20000),
      java.util.Arrays.copyOf(words, 20000 * nWords), nWords)
    val rows = threads.map { t =>
      val t0 = System.nanoTime()
      new NswNavBuilder(16, 128, 96, t).build(ids, words, nWords)
      val s = (System.nanoTime() - t0) / 1e9
      val row = f"""{"threads":$t,"build_s":$s%.1f}"""
      println(row)
      row
    }
    println(s"""{"metric":"graph_build_probe","n":$n,"n_words":$nWords,""" +
      s""""rows":${rows.mkString("[", ",", "]")}}""")
  }
}
