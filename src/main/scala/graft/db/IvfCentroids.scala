package graft.db

import org.apache.hadoop.fs.{FileSystem, Path}

/** Learned IVF coarse quantizer over packed binary codes: k-majority
  * clustering in hamming space (the binary analogue of the k-means
  * coarse quantizer faiss's `IndexBinaryIVF` trains — centroid bit =
  * majority vote of member bits). Replaces the round-10 sign-code
  * PREFIX quantizer as the default serving cell assignment: prefix
  * cells track the sign distribution of the first log2(cells) dims, so
  * biased real-world embeddings skew cell sizes and degrade probe
  * pruning (IVFBENCH_r10 note / round-10 verdict item 2); learned
  * centroids adapt to the data manifold and keep the max/median
  * cell-size ratio bounded on skewed inputs (IVFBENCH_r11 records the
  * grid).
  *
  * The model is learned ONCE from a sample of the first ingested batch,
  * persisted to `folder/_centroids`, and never relearned — the per-row
  * `cell` column is baked into the stored tiers, so a centroid change
  * would orphan every existing assignment. Deterministic: fixed seed,
  * fixed iteration count, ties broken by index.
  */
private[graft] object IvfCentroids {

  /** cells × nWords centroid words, row-major. */
  final case class Model(cells: Int, nWords: Int, words: Array[Long]) {
    require(words.length == cells * nWords,
      s"centroid model shape mismatch: ${words.length} words for " +
        s"$cells cells x $nWords")

    /** Nearest-centroid cell of one packed code (hamming, tie → lower
      * cell index). O(cells · nWords) popcounts.
      */
    def assign(code: Array[Long]): Int = {
      var best = 0
      var bestD = Int.MaxValue
      var c = 0
      while (c < cells) {
        var d = 0
        var w = 0
        val off = c * nWords
        while (w < nWords && d < bestD) {
          d += java.lang.Long.bitCount(code(w) ^ words(off + w))
          w += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    /** Cells by ascending hamming distance of `q` to each centroid
      * (tie → lower index) — the probe order for a query.
      */
    def probeOrder(q: Array[Long]): IndexedSeq[Int] =
      (0 until cells).sortBy { c =>
        var d = 0
        var w = 0
        val off = c * nWords
        while (w < nWords) {
          d += java.lang.Long.bitCount(q(w) ^ words(off + w))
          w += 1
        }
        (d, c)
      }
  }

  /** k-majority over a driver-side sample (bounded: the caller samples
    * ≤ ~64k codes — 8 MB at 1024 bits). Init = evenly spaced distinct
    * sample codes (deterministic spread without a seed-sensitive
    * kmeans++); then `iters` rounds of assign + per-bit majority vote.
    * An empty cluster is re-seeded with the member farthest from its
    * centroid in the largest cluster (classic k-means empty-cluster
    * fix, deterministic).
    */
  def learn(sample: Array[Array[Long]], cells: Int, nWords: Int,
            iters: Int = 8): Model = {
    require(sample.nonEmpty, "cannot learn centroids from an empty sample")
    val n = sample.length
    // distinct init candidates, evenly spaced over the (arbitrary but
    // deterministic) sample order; wrap with bit-perturbed copies when
    // the sample has fewer distinct codes than cells
    val distinct = scala.collection.mutable.LinkedHashSet.empty[Seq[Long]]
    sample.foreach(c => distinct += c.toSeq)
    val base = distinct.toIndexedSeq
    val cent = Array.ofDim[Long](cells * nWords)
    var c = 0
    while (c < cells) {
      val src =
        if (c < base.length) base((c.toLong * base.length / cells).toInt % base.length).toArray
        else {
          // fewer distinct codes than cells: flip one deterministic bit
          // per extra centroid so init centroids stay distinct
          val copy = base(c % base.length).toArray
          copy(0) ^= (1L << (c % 64))
          copy
        }
      System.arraycopy(src, 0, cent, c * nWords, nWords)
      c += 1
    }

    val assignBuf = new Array[Int](n)
    val model = Model(cells, nWords, cent)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < n) { assignBuf(i) = model.assign(sample(i)); i += 1 }
      // per-cell, per-bit vote counts
      val counts = Array.ofDim[Int](cells, nWords * 64)
      val sizes = new Array[Int](cells)
      i = 0
      while (i < n) {
        val cell = assignBuf(i)
        sizes(cell) += 1
        val code = sample(i)
        var w = 0
        while (w < nWords) {
          var word = code(w)
          while (word != 0L) {
            val b = java.lang.Long.numberOfTrailingZeros(word)
            counts(cell)(w * 64 + b) += 1
            word &= word - 1
          }
          w += 1
        }
        i += 1
      }
      c = 0
      while (c < cells) {
        if (sizes(c) == 0) {
          // re-seed: farthest member of the largest cluster
          var bigC = 0
          var bigN = -1
          var cc = 0
          while (cc < cells) {
            if (sizes(cc) > bigN) { bigN = sizes(cc); bigC = cc }; cc += 1
          }
          var far = -1
          var farD = -1
          i = 0
          while (i < n) {
            if (assignBuf(i) == bigC) {
              var d = 0
              var w = 0
              while (w < nWords) {
                d += java.lang.Long.bitCount(sample(i)(w) ^ cent(bigC * nWords + w))
                w += 1
              }
              if (d > farD) { farD = d; far = i }
            }
            i += 1
          }
          if (far >= 0) System.arraycopy(sample(far), 0, cent, c * nWords, nWords)
        } else {
          val half = sizes(c)
          var w = 0
          while (w < nWords) {
            var word = 0L
            var b = 0
            while (b < 64) {
              // strict majority keeps ties at 0 — deterministic
              if (2 * counts(c)(w * 64 + b) > half) word |= (1L << b)
              b += 1
            }
            cent(c * nWords + w) = word
            w += 1
          }
        }
        c += 1
      }
      it += 1
    }
    model
  }

  private def path(folder: String) = new Path(s"$folder/_centroids")

  /** Persist (format 1): header line `1 <cells> <nWords>`, then one
    * line of space-separated words per centroid. Written BEFORE the
    * first snapshot commit that uses it — a crash in between leaves an
    * orphan model the next ingest adopts (same deterministic
    * assignment, nothing torn).
    */
  def write(fs: FileSystem, folder: String, m: Model): Unit = {
    val sb = new StringBuilder(s"1 ${m.cells} ${m.nWords}\n")
    var c = 0
    while (c < m.cells) {
      val off = c * m.nWords
      sb.append((0 until m.nWords).map(w => m.words(off + w)).mkString(" "))
      sb.append('\n')
      c += 1
    }
    val out = fs.create(path(folder), true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
  }

  def read(fs: FileSystem, folder: String): Option[Model] = {
    val p = path(folder)
    if (!fs.exists(p)) None
    else try {
      val in = fs.open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      val Array(fmt, cells, nWords) = lines.head.trim.split(' ').map(_.toInt)
      require(fmt == 1, s"unknown centroid format $fmt")
      val words = lines.tail.take(cells)
        .flatMap(_.trim.split(' ').map(_.toLong)).toArray
      Some(Model(cells, nWords, words))
    } catch {
      case scala.util.control.NonFatal(e) =>
        throw new IllegalStateException(
          s"corrupt centroid model at $p — the cell assignments of " +
            "existing rows are unrecoverable without it", e)
    }
  }
}
