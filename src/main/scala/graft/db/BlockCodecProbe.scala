package graft.db

/** Locate the warm-reload wall: is [[BlockStore.tryLoadBlock]]
  * device-bound or DECODE-bound? The GRAPHBENCH warm rows read block
  * files written minutes earlier on a 125 GB box — guest page cache
  * serves them, so their ~300 MB/s effective rate is a statement about
  * the DECODE path (stream stack, CRC, per-doc framing, allocation),
  * not the disk. This probe measures save + cache-hot load of one
  * synthetic block at the true serving geometry and prints per-section
  * walls, next to a raw cached read of the same file as the ceiling.
  *
  * Usage: graft.db.BlockCodecProbe [rows] [nWords] [byteLen] (default
  * 2M × 16 × 1028 — half a GRAPHBENCH 4M-row block, ~2.3 GB).
  * Plain JVM, no Spark. Prints one JSON line.
  */
object BlockCodecProbe {

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toInt else 2000000
    val nWords = if (args.length > 1) args(1).toInt else 16
    val byteLen = if (args.length > 2) args(2).toInt else 1028
    val rnd = new java.util.Random(42)

    val ids = Array.tabulate(rows)(_.toLong)
    val words = new Array[Long](rows * nWords)
    var i = 0
    while (i < words.length) { words(i) = rnd.nextLong(); i += 1 }
    val rowsPerChunk = math.max(1,
      (PreparedScan.Block.PayloadChunkBytes / byteLen).toInt)
    val nChunks = (rows + rowsPerChunk - 1) / rowsPerChunk
    val bytes = Array.tabulate(nChunks) { c =>
      val n = math.min(rowsPerChunk, rows - c * rowsPerChunk)
      val a = new Array[Byte](n * byteLen)
      rnd.nextBytes(a)
      a
    }
    val docs = Array.tabulate(rows)(r => s"doc $r synthetic text payload")
    val blk = PreparedScan.Block(ids, words, Array.empty[Int],
      Array.empty[Int], bytes, byteLen, rowsPerChunk, docs)

    val dir = java.nio.file.Files.createTempDirectory("graftcodec")
    val store = new BlockStore(dir.toUri.toString, Array.empty, nWords,
      isIvf = false, withBytes = true, withDoc = true,
      requestedBlocks = 1, isMor = false)

    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val saveS = sec(store.trySaveBlock(0, blk))
    val f = new java.io.File(dir.toFile, "block-0.blk")
    val fileMb = f.length / 1e6

    // raw cached read ceiling: stream the file through a plain
    // FileInputStream with the same 1 MB buffering, no decode
    val rawS = sec {
      val in = new java.io.BufferedInputStream(
        new java.io.FileInputStream(f), 1 << 20)
      val buf = new Array[Byte](1 << 20)
      while (in.read(buf) >= 0) {}
      in.close()
    }
    // + CRC over every byte (the integrity floor any load must pay)
    val crcS = sec {
      val crc = new java.util.zip.CRC32()
      val in = new java.io.BufferedInputStream(
        new java.io.FileInputStream(f), 1 << 20)
      val buf = new Array[Byte](1 << 20)
      var n = in.read(buf)
      while (n >= 0) { crc.update(buf, 0, n); n = in.read(buf) }
      in.close()
    }

    // the real load, thrice (all cache-hot; take the min)
    var loaded: PreparedScan.Block = null
    val loads = (1 to 3).map(_ => sec {
      loaded = store.tryLoadBlock(0).getOrElse(sys.error("load failed"))
    })
    val loadS = loads.min
    require(java.util.Arrays.equals(loaded.ids, ids) &&
      java.util.Arrays.equals(loaded.words, words) &&
      loaded.docs(rows - 1) == docs(rows - 1), "roundtrip mismatch")

    // ---- nav codec at the same geometry (synthetic valid adjacency:
    // the codec cost is framing + CRC + remap, independent of graph
    // quality; a REAL 2M-row build would take minutes and measure
    // construction, not the codec) ----
    val m = 16
    val maxDeg = 2 * m
    val neighbors = new Array[Int](rows * maxDeg)
    i = 0
    while (i < neighbors.length) { neighbors(i) = rnd.nextInt(rows); i += 1 }
    val degree = Array.fill(rows)(maxDeg)
    // Attach a synthetic upper layer shaped like a real build's (1/256
    // stride sample, full degree): without it the loader falls into
    // the buildUpper REBUILD branch and the probe measures graph
    // construction, not the v2 codec's persisted-hierarchy path.
    val upper =
      if (rows < NswNavBuilder.UpperMinRows) null
      else {
        val upN = rows / NswNavBuilder.UpperFraction
        val stride = rows / upN
        val upMap = Array.tabulate(upN)(j => j * stride)
        val upIds = upMap.map(ids)
        val upWords = new Array[Long](upN * nWords)
        upMap.indices.foreach(j =>
          System.arraycopy(words, upMap(j) * nWords, upWords, j * nWords, nWords))
        val upNb = Array.fill(upN * maxDeg)(rnd.nextInt(upN))
        (new NswNav(upIds, upWords, nWords, upNb, Array.fill(upN)(maxDeg),
          maxDeg, NswNavBuilder.UpperEfSearch), upMap)
      }
    val nav =
      if (upper == null) new NswNav(ids, words, nWords, neighbors, degree, maxDeg, 96)
      else new NswNav(ids, words, nWords, neighbors, degree, maxDeg, 96,
        upper._1, upper._2)
    val navBuilder = new NswNavBuilder(m, 128, 96)
    val navStore = new NavStore(dir.toUri.toString, Array.empty, navBuilder)
    val navSaveS = sec(navStore.trySave(0, nav))
    val navFile = new java.io.File(dir.toFile, "block-0.nav")
    val navMb = navFile.length / 1e6
    val navLoads = (1 to 3).map(_ => sec {
      require(navStore.tryLoad(0, ids, words, nWords).isDefined,
        "nav load failed")
    })
    val navLoadS = navLoads.min

    println(
      f"""{"metric":"block_codec","rows":$rows,"n_words":$nWords,""" +
        f""""byte_len":$byteLen,"file_mb":$fileMb%.0f,""" +
        f""""save_s":$saveS%.2f,"raw_read_s":$rawS%.2f,""" +
        f""""raw_crc_read_s":$crcS%.2f,"load_s":$loadS%.2f,""" +
        f""""load_runs_s":[${loads.map(s => f"$s%.2f").mkString(",")}],""" +
        f""""load_mb_s":${fileMb / loadS}%.0f,""" +
        f""""raw_mb_s":${fileMb / rawS}%.0f,""" +
        f""""nav_file_mb":$navMb%.0f,"nav_save_s":$navSaveS%.2f,""" +
        f""""nav_load_s":$navLoadS%.2f,""" +
        f""""nav_load_runs_s":[${navLoads.map(s => f"$s%.2f").mkString(",")}],""" +
        f""""nav_load_mb_s":${navMb / navLoadS}%.0f,""" +
        """"note":"cache-hot decode walls of BlockStore.tryLoadBlock and NavStore.tryLoad (synthetic full-degree adjacency, includes id remap + upper-layer rebuild) vs the raw buffered-read ceiling and the CRC-everything floor; the gap between load_s and raw_crc_read_s is framing + allocation + stream-stack overhead."}""")

    java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => p.toFile.delete())
  }
}
