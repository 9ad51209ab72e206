package graft

import graft.db.{NswNav, NswNavBuilder}

/** Root-cause probe for the r11 NSW recall plateau (GRAPHBENCH_r11_4m:
  * 0.975–0.98, entry-independent, persisting at ef 768): measures the
  * STRUCTURALLY unreachable row fraction of a built graph (rows with no
  * directed path from the stride entries — what adjacency pruning
  * severs) and A/Bs recall with the r12 build-time reachability repair
  * off vs on. No Spark: plain-JVM block build, exactly what runs per
  * executor partition.
  *
  * Usage: `graft.OrphanProbe [n] [nWords] [flipWords] [threads]`
  * (default 200000 16 3 1). `flipWords` controls cluster tightness —
  * higher = more spread = harder graph.
  */
object OrphanProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val nWords = if (args.length > 1) args(1).toInt else 16
    val flips = if (args.length > 2) args(2).toInt else 3
    val threads = if (args.length > 3) args(3).toInt else 1
    val rnd = new java.util.Random(42)
    val ids = Array.tabulate(n)(_.toLong)
    // Clustered codes, GraphBuildProbe's manifold shape: 100 centers,
    // sparse per-row flips (AND of `flips` random longs ≈ 64/2^flips
    // expected flipped bits per word).
    val centers = Array.fill(100 * nWords)(rnd.nextLong())
    val words = new Array[Long](n * nWords)
    var r = 0
    while (r < n) {
      val c = rnd.nextInt(100) * nWords
      var w = 0
      while (w < nWords) {
        var mask = rnd.nextLong()
        var f = 1
        while (f < flips) { mask &= rnd.nextLong(); f += 1 }
        words(r * nWords + w) = centers(c + w) ^ mask
        w += 1
      }
      r += 1
    }

    val nQueries = 50
    val qs = Array.tabulate(nQueries) { qi =>
      val src = (qi.toLong * (n / nQueries)).toInt
      val q = java.util.Arrays.copyOfRange(words, src * nWords, (src + 1) * nWords)
      var w = 0
      while (w < nWords) { // light perturbation off a real row
        var mask = rnd.nextLong()
        var f = 0
        while (f < flips + 1) { mask &= rnd.nextLong(); f += 1 }
        q(w) ^= mask
        w += 1
      }
      q
    }

    def ham(row: Int, q: Array[Long]): Int = {
      val base = row * nWords
      var acc = 0
      var w = 0
      while (w < nWords) {
        acc += java.lang.Long.bitCount(words(base + w) ^ q(w)); w += 1
      }
      acc
    }
    /** Exact top-10 (hamming, id) by linear scan. */
    def exact(q: Array[Long]): Set[Long] = {
      val all = new Array[Long](n)
      var i = 0
      while (i < n) { all(i) = (ham(i, q).toLong << 32) | i.toLong; i += 1 }
      java.util.Arrays.sort(all)
      all.take(10).map(_ & 0xffffffffL).toSet
    }
    val truth = qs.map(exact)

    val rows = Seq(false, true).map { repair =>
      val t0 = System.nanoTime()
      val nav = new NswNavBuilder(16, 128, 96, threads, hierarchy = true,
        repair = repair).build(ids, words, nWords).asInstanceOf[NswNav]
      val buildS = (System.nanoTime() - t0) / 1e9
      val unreachable = nav.unreachableCount
      val (init, residual) = nav.repairStats
      val recalls = Seq(100, 192, 384).map { ef =>
        val rec = qs.zipWithIndex.map { case (q, qi) =>
          val got = nav.topPacked(q, ef, _ => true).take(10)
            .map(_ & 0xffffffffL).toSet
          got.intersect(truth(qi)).size / 10.0
        }.sum / nQueries
        ef -> rec
      }
      val recStr = recalls.map { case (ef, rec) =>
        f""""recall_ef$ef":$rec%.4f""" }.mkString(",")
      val row = f"""{"repair":$repair,"build_s":$buildS%.1f,""" +
        f""""unreachable":$unreachable,"orphans_initial":$init,""" +
        f""""orphans_residual":$residual,$recStr}"""
      println(row)
      row
    }
    println(s"""{"metric":"orphan_probe","n":$n,"n_words":$nWords,""" +
      s""""flip_words":$flips,"threads":$threads,"n_queries":$nQueries,""" +
      s""""rows":${rows.mkString("[", ",", "]")},""" +
      """"note":"unreachable = rows with no directed path from the stride entries (BFS over the built adjacency); repair=false is the pre-r12 build. If recall_ef* climbs to ~1.0 when repair flips on and unreachable drops to 0, the r11 plateau was severed rows, not beam width."}""")
  }
}
