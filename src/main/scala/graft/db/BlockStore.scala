package graft.db

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Executor-side persistence for the packed serving-block arrays
  * themselves — ids, flattened code words, IVF cells, chunked int8
  * payloads, doc payloads — written per (snapshot version, block)
  * under `<folder>/_blocks/<version>/`, the sibling of [[NavStore]]'s
  * `_nav/<version>/`.
  *
  * Why: nav persistence (r13) removed the GRAPH rebuild from a warm
  * `enableServing`, but the serve-build still paid the codes⋈docs join
  * plus the row-by-row block assembly and id remap — measured 47–74 s
  * at 4M-row blocks, i.e. the whole remaining wall (GRAPHBENCH_r13_8m
  * warm rows; the nav reload itself is seconds). With the block arrays
  * persisted, a warm serve-build at an unchanged snapshot is pure IO:
  * each task streams its block file back (CRC-checked), reattaches the
  * persisted nav, and pins the block — no join, no shuffle, no Row
  * materialization. The engine analogue of the reference memory-mapping
  * its packed faiss index back instead of re-adding every vector
  * (`BinaryVectorDB.py:129-140,172`).
  *
  * Format (v2, EXTENT-based): a fixed CRC'd header, then the arrays
  * laid out as independent ≤[[BlockStore.ExtentBytes]] extents each
  * carrying its own CRC32, then a footer table of extent descriptors
  * and a fixed trailer pointing at it. v1 streamed one sequential body
  * under a single trailing CRC — simple, but it forced a WARM load to
  * be one thread per block, and profiling (BlockCodecProbe + a section
  * probe) showed the warm wall is NOT the device: it is first-touch
  * allocation + decode of multi-GB arrays on a single thread while the
  * rest of the machine idles (2 blocks = 2 live tasks in the
  * few-big-blocks serving regime). Extents make the load
  * embarrassingly parallel — [[tryLoadBlock]] fans the extent list out
  * over a pool sized by the same cores-entitlement policy as the NSW
  * build ([[NswNavBuilder.autoThreads]]): each worker opens its own
  * stream, seeks to its extent, reads straight into its slice of the
  * shared target array, and CRC-verifies just that range. Allocation
  * (the measured 28 s/2 GB first-touch pathology) parallelizes the
  * same way — each big array is zeroed by its own pre-task.
  *
  * Layout/atomicity: one `block-<pid>.blk` per serving block, staged
  * and swapped with the shared replacing rename; a `_manifest` file —
  * written by the DRIVER only after every block file landed — records
  * the geometry (word count, layout flags, block count, the
  * enableServing block-count pin it was built under) and gates the
  * whole load: no manifest, wrong geometry, or any unreadable block
  * file means the caller falls back to the normal full build. Old
  * version dirs are swept at commit time alongside `_nav`.
  *
  * Scale: block files are written/read by the executor that owns the
  * partition — the driver never sees the bytes; on a 1000-executor
  * cluster the warm load is one IO-bound task per block against the
  * shared FS (which fans out to extent ranges inside the task's own
  * core entitlement — `spark.task.cpus`, so a declared-cores executor
  * never oversubscribes). Every extent is CRC32-guarded: a torn or
  * bit-rotten range fails its check and the build falls back, never
  * serves garbage.
  */
private[graft] final class BlockStore(
    dirUri: String,
    confProps: Array[(String, String)],
    nWords: Int,
    isIvf: Boolean,
    withBytes: Boolean,
    withDoc: Boolean,
    /** The `enableServing(blocks)` pin this tier was requested under
      * (0 = follow the join width). A manifest built under a different
      * pin is rejected — the caller's layout decision wins over reuse.
      */
    requestedBlocks: Int,
    /** Merge-on-read folder (geometry-checked like the rest — a
      * folder's storage mode never changes, so a mismatch only means a
      * foreign/corrupt manifest). MOR manifests additionally carry the
      * committed ceilings + fold ceilings the build snapshotted, which
      * is what makes a RETAINED stale dir a warm-RESTART seed: a
      * restarted process chain-extends from it with just the missed
      * commit windows instead of paying the full cold build
      * ([[VectorDB]] warm chain restart).
      */
    isMor: Boolean) extends Serializable {

  import BlockStore._

  @transient private lazy val conf: Configuration = {
    val c = new Configuration()
    confProps.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private def blockPath(pid: Int) = new Path(dirUri, s"block-$pid.blk")
  private def manifestPath = new Path(dirUri, "_manifest")

  /** Persist one block's arrays (staged + replacing rename; CRC'd
    * header + per-extent CRCs + CRC'd footer table). The nav field is
    * NOT written — [[NavStore]] owns graph persistence; the loader
    * reattaches it. Failures warn and never fail the build: persistence
    * is an optimization, and a missing block file simply means no
    * manifest is written and the next open builds cold.
    */
  private[db] def trySaveBlock(pid: Int, blk: PreparedScan.Block): Unit = {
    val p = blockPath(pid)
    val tmp = new Path(dirUri,
      s".block-$pid.blk.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      val fs = p.getFileSystem(conf)
      val raw = new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 20)
      try {
        val rows = blk.ids.length
        val nChunks = if (blk.byteLen > 0) blk.bytes.length else 0

        // ---- header (fixed layout, own CRC) ----
        val hdr = java.nio.ByteBuffer.allocate(HeaderBytes)
        hdr.putInt(BlockMagic); hdr.putInt(FormatVersion)
        hdr.putInt(rows); hdr.putInt(nWords)
        hdr.put(if (blk.cells.nonEmpty) 1.toByte else 0.toByte)
        hdr.putInt(blk.byteLen)
        hdr.putInt(if (blk.byteLen > 0) blk.rowsPerChunk else 1)
        hdr.putInt(nChunks)
        hdr.put(if (blk.docs != null) 1.toByte else 0.toByte)
        val hcrc = new java.util.zip.CRC32()
        hcrc.update(hdr.array(), 0, HeaderBytes)
        raw.write(hdr.array(), 0, HeaderBytes)
        writeLong(raw, hcrc.getValue)
        var offset: Long = HeaderBytes + 8L

        val extents = scala.collection.mutable.ArrayBuffer.empty[Extent]
        val slab = new Array[Byte](SlabBytes)

        // One extent: body already produced as slab callbacks.
        def extent(kind: Byte, arrayIndex: Int, elemStart: Int,
                   elemCount: Int)(body: java.util.zip.CRC32 => Long): Unit = {
          val crc = new java.util.zip.CRC32()
          val len = body(crc)
          extents += Extent(kind, arrayIndex, elemStart, elemCount,
            offset, len, crc.getValue)
          offset += len
        }

        def longExtents(kind: Byte, a: Array[Long]): Unit = {
          val perExt = ExtentBytes / 8
          var start = 0
          while (start < a.length) {
            val n = math.min(a.length - start, perExt)
            extent(kind, 0, start, n) { crc =>
              var i = start
              val end = start + n
              while (i < end) {
                val m = math.min(end - i, SlabBytes / 8)
                java.nio.ByteBuffer.wrap(slab).asLongBuffer().put(a, i, m)
                crc.update(slab, 0, m * 8)
                raw.write(slab, 0, m * 8)
                i += m
              }
              n * 8L
            }
            start += n
          }
        }

        def intExtents(kind: Byte, a: Array[Int]): Unit = {
          val perExt = ExtentBytes / 4
          var start = 0
          while (start < a.length) {
            val n = math.min(a.length - start, perExt)
            extent(kind, 0, start, n) { crc =>
              var i = start
              val end = start + n
              while (i < end) {
                val m = math.min(end - i, SlabBytes / 4)
                java.nio.ByteBuffer.wrap(slab).asIntBuffer().put(a, i, m)
                crc.update(slab, 0, m * 4)
                raw.write(slab, 0, m * 4)
                i += m
              }
              n * 4L
            }
            start += n
          }
        }

        longExtents(KindIds, blk.ids)
        longExtents(KindWords, blk.words)
        if (blk.cells.nonEmpty) intExtents(KindCells, blk.cells)

        if (blk.byteLen > 0) {
          var c = 0
          while (c < nChunks) {
            val chunk = blk.bytes(c)
            var start = 0
            while (start < chunk.length) {
              val n = math.min(chunk.length - start, ExtentBytes)
              extent(KindPayload, c, start, n) { crc =>
                crc.update(chunk, start, n)
                raw.write(chunk, start, n)
                n.toLong
              }
              start += n
            }
            c += 1
          }
        }

        if (blk.docs != null) {
          // Per-doc framing (int len or -1, then UTF-8 bytes), split at
          // doc boundaries so each extent decodes independently.
          var start = 0
          while (start < rows) {
            val crc = new java.util.zip.CRC32()
            var bytesOut = 0L
            var slabFill = 0
            def flush(): Unit = {
              if (slabFill > 0) {
                crc.update(slab, 0, slabFill)
                raw.write(slab, 0, slabFill)
                bytesOut += slabFill
                slabFill = 0
              }
            }
            def putInt(v: Int): Unit = {
              if (slabFill + 4 > SlabBytes) flush()
              slab(slabFill) = (v >>> 24).toByte
              slab(slabFill + 1) = (v >>> 16).toByte
              slab(slabFill + 2) = (v >>> 8).toByte
              slab(slabFill + 3) = v.toByte
              slabFill += 4
            }
            def putBytes(b: Array[Byte]): Unit = {
              if (b.length >= SlabBytes) {
                flush()
                crc.update(b); raw.write(b); bytesOut += b.length
              } else {
                if (slabFill + b.length > SlabBytes) flush()
                System.arraycopy(b, 0, slab, slabFill, b.length)
                slabFill += b.length
              }
            }
            var i = start
            while (i < rows && bytesOut + slabFill < ExtentBytes) {
              val d = blk.docs(i)
              if (d == null) putInt(-1)
              else {
                val b = d.getBytes(java.nio.charset.StandardCharsets.UTF_8)
                putInt(b.length); putBytes(b)
              }
              i += 1
            }
            flush()
            extents += Extent(KindDocs, 0, start, i - start,
              offset, bytesOut, crc.getValue)
            offset += bytesOut
            start = i
          }
        }

        // ---- footer: extent table (own CRC) + fixed trailer ----
        val tableOffset = offset
        val tbl = java.nio.ByteBuffer.allocate(4 + extents.length * ExtentDescBytes)
        tbl.putInt(extents.length)
        extents.foreach { e =>
          tbl.put(e.kind); tbl.putInt(e.arrayIndex)
          tbl.putInt(e.elemStart); tbl.putInt(e.elemCount)
          tbl.putLong(e.offset); tbl.putLong(e.byteLen); tbl.putLong(e.crc)
        }
        val tcrc = new java.util.zip.CRC32()
        tcrc.update(tbl.array(), 0, tbl.position())
        raw.write(tbl.array(), 0, tbl.position())
        writeLong(raw, tcrc.getValue)
        writeLong(raw, tableOffset)
        val end = java.nio.ByteBuffer.allocate(4).putInt(BlockMagic)
        raw.write(end.array(), 0, 4)
      } finally raw.close()
      AtomicFiles.replacingRename(fs, conf, tmp, p)
      savesForTest.incrementAndGet()
    } catch {
      case scala.util.control.NonFatal(e) =>
        try p.getFileSystem(conf).delete(tmp, false)
        catch { case scala.util.control.NonFatal(_) => }
        log.warn(s"block persist failed for block $pid under $dirUri " +
          s"(serving is unaffected; the next open builds cold): $e")
    }
  }

  /** Load block `pid` back (nav not attached — the caller reattaches
    * via [[NavStore]] or rebuilds). None on absence, geometry mismatch,
    * or any CRC failure. The extent list fans out over a pool sized by
    * the shared cores-entitlement policy ([[NswNavBuilder.autoThreads]]
    * via the same begin/end registration the NSW build uses — loads and
    * builds in flight split the same JVM core budget); each worker
    * opens its own stream and reads its ranges directly into the shared
    * target arrays.
    */
  private[db] def tryLoadBlock(pid: Int): Option[PreparedScan.Block] =
    try {
      val p = blockPath(pid)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) return None
      val fileLen = fs.getFileStatus(p).getLen
      if (fileLen < HeaderBytes + 8 + TrailerBytes) return None

      // ---- header + trailer + extent table (sequential, tiny) ----
      val in = fs.open(p)
      val (hdrOk, rows, hasCells, byteLen, rowsPerChunk, nChunks, hasDocs) =
        try {
          val hb = new Array[Byte](HeaderBytes + 8)
          in.readFully(0L, hb)
          val b = java.nio.ByteBuffer.wrap(hb)
          val magic = b.getInt(); val ver = b.getInt()
          val r = b.getInt(); val w = b.getInt()
          val hc = b.get() == 1
          val bl = b.getInt(); val rpc = b.getInt(); val nc = b.getInt()
          val hd = b.get() == 1
          val crcStored = b.getLong()
          val crc = new java.util.zip.CRC32()
          crc.update(hb, 0, HeaderBytes)
          val ok = magic == BlockMagic && ver == FormatVersion &&
            crc.getValue == crcStored && r >= 0 && w == nWords &&
            (bl == 0 || (rpc >= 1 && nc >= 0))
          (ok, r, hc, bl, if (bl > 0) rpc else 1, if (bl > 0) nc else 0, hd)
        } catch { case scala.util.control.NonFatal(_) => in.close(); return None }

      val extents =
        try {
          val tb = new Array[Byte](TrailerBytes)
          in.readFully(fileLen - TrailerBytes, tb)
          val t = java.nio.ByteBuffer.wrap(tb)
          val tableOffset = t.getLong()
          if (t.getInt() != BlockMagic) { in.close(); return None }
          val tableLen = fileLen - TrailerBytes - tableOffset
          if (!hdrOk || tableOffset < HeaderBytes + 8 || tableLen < 12 ||
              tableLen > MaxTableBytes) { in.close(); return None }
          val raw = new Array[Byte](tableLen.toInt)
          in.readFully(tableOffset, raw)
          val buf = java.nio.ByteBuffer.wrap(raw)
          val n = buf.getInt()
          if (n < 0 || 4 + n * ExtentDescBytes + 8 != tableLen) {
            in.close(); return None
          }
          val crc = new java.util.zip.CRC32()
          crc.update(raw, 0, 4 + n * ExtentDescBytes)
          val es = Array.tabulate(n) { _ =>
            Extent(buf.get(), buf.getInt(), buf.getInt(), buf.getInt(),
              buf.getLong(), buf.getLong(), buf.getLong())
          }
          if (buf.getLong() != crc.getValue) { in.close(); return None }
          es
        } catch {
          case scala.util.control.NonFatal(_) => in.close(); return None
        } finally in.close()

      // ---- coverage sanity: every array fully and exactly tiled ----
      def covered(kind: Byte, arrayIndex: Int, total: Int): Boolean = {
        val mine = extents.filter(e => e.kind == kind && e.arrayIndex == arrayIndex)
          .sortBy(_.elemStart)
        var at = 0
        mine.foreach { e =>
          if (e.elemStart != at || e.elemCount < 0) return false
          at = e.elemStart + e.elemCount
        }
        at == total
      }
      val chunkSize: Int => Int = c =>
        (math.min(rowsPerChunk.toLong * (c + 1), rows.toLong).toInt -
          rowsPerChunk * c) * byteLen
      if (!covered(KindIds, 0, rows)) return None
      if (!covered(KindWords, 0, rows * nWords)) return None
      if (hasCells && !covered(KindCells, 0, rows)) return None
      if (byteLen > 0) {
        if (nChunks != (rows + rowsPerChunk - 1) / math.max(1, rowsPerChunk))
          return None
        var c = 0
        while (c < nChunks) {
          if (!covered(KindPayload, c, chunkSize(c))) return None
          c += 1
        }
      }
      if (hasDocs && !covered(KindDocs, 0, rows)) return None

      // ---- parallel allocate + parallel extent reads ----
      // Registered against the same JVM core budget as NSW auto builds:
      // concurrent block loads (and any builds) split it fairly; on a
      // declared-cores executor this is spark.task.cpus, i.e. inline.
      val threads = math.max(1, math.min(extents.length,
        NswNavBuilder.beginAutoBuild()))
      try {
        var ids: Array[Long] = null
        var words: Array[Long] = null
        var cells: Array[Int] = Array.empty[Int]
        var chunks: Array[Array[Byte]] = Array.empty[Array[Byte]]
        var docs: Array[String] = null
        val allocs = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
        allocs += (() => ids = new Array[Long](rows))
        allocs += (() => words = new Array[Long](rows * nWords))
        if (hasCells) allocs += (() => cells = new Array[Int](rows))
        if (byteLen > 0) {
          chunks = new Array[Array[Byte]](nChunks)
          (0 until nChunks).foreach { c =>
            allocs += (() => chunks(c) = new Array[Byte](chunkSize(c)))
          }
        }
        if (hasDocs) allocs += (() => docs = new Array[String](rows))
        runAll(allocs.toIndexedSeq, threads)

        def loadExtent(e: Extent): Unit = {
          if (e.byteLen > MaxExtentLoadBytes) throw new java.io.IOException(
            s"extent too large: ${e.byteLen}")
          val s = fs.open(p)
          try {
            s.seek(e.offset)
            val crc = new java.util.zip.CRC32()
            val din = new java.io.DataInputStream(
              new java.io.BufferedInputStream(s, 1 << 20))
            e.kind match {
              case KindPayload =>
                val target = chunks(e.arrayIndex)
                din.readFully(target, e.elemStart, e.elemCount)
                crc.update(target, e.elemStart, e.elemCount)
              case KindIds | KindWords =>
                val target = if (e.kind == KindIds) ids else words
                val slab = new Array[Byte](SlabBytes)
                var i = e.elemStart
                val end = e.elemStart + e.elemCount
                while (i < end) {
                  val m = math.min(end - i, SlabBytes / 8)
                  din.readFully(slab, 0, m * 8)
                  crc.update(slab, 0, m * 8)
                  java.nio.ByteBuffer.wrap(slab, 0, m * 8).asLongBuffer()
                    .get(target, i, m)
                  i += m
                }
              case KindCells =>
                val slab = new Array[Byte](SlabBytes)
                var i = e.elemStart
                val end = e.elemStart + e.elemCount
                while (i < end) {
                  val m = math.min(end - i, SlabBytes / 4)
                  din.readFully(slab, 0, m * 4)
                  crc.update(slab, 0, m * 4)
                  java.nio.ByteBuffer.wrap(slab, 0, m * 4).asIntBuffer()
                    .get(cells, i, m)
                  i += m
                }
              case KindDocs =>
                val raw = new Array[Byte](e.byteLen.toInt)
                din.readFully(raw)
                crc.update(raw)
                val buf = java.nio.ByteBuffer.wrap(raw)
                var i = e.elemStart
                val end = e.elemStart + e.elemCount
                while (i < end) {
                  val len = buf.getInt()
                  if (len >= 0) {
                    docs(i) = new String(raw, buf.position(), len,
                      java.nio.charset.StandardCharsets.UTF_8)
                    buf.position(buf.position() + len)
                  }
                  i += 1
                }
                if (buf.remaining() != 0) throw new java.io.IOException(
                  s"doc extent at ${e.elemStart}: trailing bytes")
              case k => throw new java.io.IOException(s"unknown extent kind $k")
            }
            if (crc.getValue != e.crc) throw new java.io.IOException(
              s"extent CRC mismatch (kind ${e.kind} at ${e.offset})")
          } finally s.close()
        }

        runAll(extents.toIndexedSeq.map(e => () => loadExtent(e)), threads)
        loadsForTest.incrementAndGet()
        Some(PreparedScan.Block(ids, words, cells, cells.distinct.sorted,
          chunks, byteLen, math.max(1, rowsPerChunk), docs))
      } finally NswNavBuilder.endAutoBuild()
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  /** DRIVER, after the build materialized: write the manifest iff every
    * block file landed (a failed per-block save already warned — the
    * dir then stays manifest-less and the next open builds cold).
    * Atomic swap like every marker.
    */
  def writeManifestIfComplete(nBlocks: Int, totalRows: Long,
                              morCeilings: (Int, Int),
                              morFolds: (Int, Int)): Unit =
    try {
      val fs = manifestPath.getFileSystem(conf)
      val present = (0 until nBlocks).forall(pid => fs.exists(blockPath(pid)))
      if (!present) return
      val tmp = new Path(dirUri,
        s"._manifest.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      val out = new java.io.DataOutputStream(fs.create(tmp, true))
      try {
        out.writeInt(ManifestMagic); out.writeInt(ManifestVersion)
        out.writeInt(nWords)
        out.writeBoolean(isIvf); out.writeBoolean(withBytes)
        out.writeBoolean(withDoc); out.writeBoolean(isMor)
        out.writeInt(requestedBlocks); out.writeInt(nBlocks)
        out.writeLong(totalRows)
        out.writeInt(morCeilings._1); out.writeInt(morCeilings._2)
        out.writeInt(morFolds._1); out.writeInt(morFolds._2)
      } finally out.close()
      AtomicFiles.replacingRename(fs, conf, tmp, manifestPath)
    } catch {
      case scala.util.control.NonFatal(e) =>
        log.warn(s"block manifest write failed under $dirUri " +
          s"(the next open builds cold): $e")
    }

  /** DRIVER: the persisted manifest, iff one exists and its geometry
    * (words, layout flags, storage mode, block-count pin) matches THIS
    * store's. None gates the warm path off — the caller builds cold.
    */
  def readManifest(): Option[Manifest] =
    try {
      val fs = manifestPath.getFileSystem(conf)
      if (!fs.exists(manifestPath)) None
      else {
        val in = new java.io.DataInputStream(fs.open(manifestPath))
        try {
          if (in.readInt() != ManifestMagic) None
          else if (in.readInt() != ManifestVersion) None
          else if (in.readInt() != nWords) None
          else if (in.readBoolean() != isIvf) None
          else if (in.readBoolean() != withBytes) None
          else if (in.readBoolean() != withDoc) None
          else if (in.readBoolean() != isMor) None
          else if (in.readInt() != requestedBlocks) None
          else {
            val nBlocks = in.readInt()
            in.readLong() // totalRows: informational
            val ceilings = (in.readInt(), in.readInt())
            val folds = (in.readInt(), in.readInt())
            if (nBlocks > 0) Some(Manifest(nBlocks, ceilings, folds))
            else None
          }
        } finally in.close()
      }
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
}

object BlockStore {
  private val BlockMagic = 0x47424c4b    // "GBLK"
  private val ManifestMagic = 0x47424d46 // "GBMF"
  /** Block-file format: 2 replaced v1's single sequential CRC-trailed
    * body with independently CRC'd extents + a footer table, making the
    * warm load parallel. Readers reject other versions — one cold
    * rebuild after an upgrade, never a misread.
    */
  private val FormatVersion = 2

  private val KindIds: Byte = 0
  private val KindWords: Byte = 1
  private val KindCells: Byte = 2
  private val KindPayload: Byte = 3
  private val KindDocs: Byte = 4

  /** magic, version, rows, nWords, hasCells, byteLen, rowsPerChunk,
    * nChunks, hasDocs.
    */
  private val HeaderBytes = 4 + 4 + 4 + 4 + 1 + 4 + 4 + 4 + 1
  /** tableOffset + end magic. */
  private val TrailerBytes = 8 + 4
  /** kind, arrayIndex, elemStart, elemCount, offset, byteLen, crc. */
  private val ExtentDescBytes = 1 + 4 + 4 + 4 + 8 + 8 + 8
  /** Target extent size: big enough that per-extent overhead (an open +
    * seek + CRC finalize) is noise, small enough that a 4–8M-row
    * block's arrays split into dozens of parallel units.
    */
  private val ExtentBytes = 128 << 20
  /** A doc extent closes at the FIRST doc boundary past ExtentBytes, so
    * one pathological multi-hundred-MB doc string can legitimately
    * exceed the target; cap what a loader will buffer for one extent
    * well above that but inside a single array's bound (the doc loader
    * materializes an extent as one byte[]).
    */
  private val MaxExtentLoadBytes = (Int.MaxValue - 16).toLong
  /** Extent-table sanity bound (~780k extents — two orders past any
    * real block) so a corrupt tableOffset can't provoke a huge read.
    */
  private val MaxTableBytes = 20L << 20

  private final case class Extent(kind: Byte, arrayIndex: Int,
                                  elemStart: Int, elemCount: Int,
                                  offset: Long, byteLen: Long, crc: Long)

  private def writeLong(out: java.io.OutputStream, v: Long): Unit = {
    val b = java.nio.ByteBuffer.allocate(8).putLong(v)
    out.write(b.array(), 0, 8)
  }

  /** Run `tasks` on `threads` workers (inline when 1); first failure
    * wins and is rethrown after all workers stop.
    */
  private def runAll(tasks: IndexedSeq[() => Unit], threads: Int): Unit = {
    if (tasks.isEmpty) return
    if (threads <= 1 || tasks.length == 1) { tasks.foreach(_.apply()); return }
    val cursor = new java.util.concurrent.atomic.AtomicInteger(0)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val workers = (0 until math.min(threads, tasks.length)).map { _ =>
      val t = new Thread(() => {
        try {
          var i = cursor.getAndIncrement()
          while (i < tasks.length && failure.get() == null) {
            tasks(i).apply()
            i = cursor.getAndIncrement()
          }
        } catch { case e: Throwable => failure.compareAndSet(null, e) }
      })
      t.setDaemon(true)
      t.start()
      t
    }
    workers.foreach(_.join())
    if (failure.get() != null) throw failure.get()
  }

  /** Manifest format: 2 added the storage mode + the MOR committed
    * ceilings and fold ceilings the build snapshotted (the warm-restart
    * window floor). Readers reject other versions — one cold rebuild
    * after an upgrade, never a misread.
    */
  private val ManifestVersion = 2

  /** A geometry-validated manifest: the persisted block count plus the
    * MOR ceilings/folds recorded at build time ((0,0)s under COW).
    */
  final case class Manifest(nBlocks: Int, morCeilings: (Int, Int),
                            morFolds: (Int, Int))

  /** Manifest fields read WITHOUT the instance geometry checks — the
    * commit-time sweep's retention probe (which dir is the newest
    * complete MOR build = the warm-restart seed). `isMor=false` or a
    * foreign/old-format manifest reads as None: COW dirs are never
    * retention seeds (a COW version change rewrites tier files — there
    * is no delta window to extend with).
    */
  private[db] def peekManifest(dirUri: String, conf: Configuration)
      : Option[Manifest] =
    try {
      val p = new Path(dirUri, "_manifest")
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None
      else {
        val in = new java.io.DataInputStream(fs.open(p))
        try {
          if (in.readInt() != ManifestMagic) None
          else if (in.readInt() != ManifestVersion) None
          else {
            in.readInt() // nWords
            in.readBoolean(); in.readBoolean(); in.readBoolean() // layout
            val isMor = in.readBoolean()
            in.readInt() // requestedBlocks
            val nBlocks = in.readInt()
            in.readLong() // totalRows
            val ceilings = (in.readInt(), in.readInt())
            val folds = (in.readInt(), in.readInt())
            if (isMor && nBlocks > 0) Some(Manifest(nBlocks, ceilings, folds))
            else None
          }
        } finally in.close()
      }
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[BlockStore])

  /** Test counters (shared-JVM local mode): successful loads/saves. */
  private[graft] val loadsForTest = new java.util.concurrent.atomic.AtomicInteger(0)
  private[graft] val savesForTest = new java.util.concurrent.atomic.AtomicInteger(0)

  // Bulk primitive IO slab: element-at-a-time DataOutputStream calls
  // cost a virtual dispatch per 8 bytes — at 4M rows × 16 words that is
  // 64M calls per block. Slab through a ByteBuffer instead (one write
  // per MiB). Shared by the extent writer/loader and [[NavStore]].
  private val SlabBytes = 1 << 20

  private[db] def writeLongs(out: java.io.DataOutputStream,
                             a: Array[Long]): Unit = {
    val slab = new Array[Byte](SlabBytes)
    val bb = java.nio.ByteBuffer.wrap(slab)
    var i = 0
    while (i < a.length) {
      val n = math.min(a.length - i, SlabBytes / 8)
      bb.clear()
      bb.asLongBuffer().put(a, i, n)
      out.write(slab, 0, n * 8)
      i += n
    }
  }

  private[db] def readLongs(in: java.io.DataInputStream,
                            n: Int): Array[Long] = {
    val a = new Array[Long](n)
    val slab = new Array[Byte](SlabBytes)
    var i = 0
    while (i < n) {
      val m = math.min(n - i, SlabBytes / 8)
      in.readFully(slab, 0, m * 8)
      java.nio.ByteBuffer.wrap(slab, 0, m * 8).asLongBuffer().get(a, i, m)
      i += m
    }
    a
  }

  private[db] def writeInts(out: java.io.DataOutputStream,
                            a: Array[Int]): Unit = {
    val slab = new Array[Byte](SlabBytes)
    val bb = java.nio.ByteBuffer.wrap(slab)
    var i = 0
    while (i < a.length) {
      val n = math.min(a.length - i, SlabBytes / 4)
      bb.clear()
      bb.asIntBuffer().put(a, i, n)
      out.write(slab, 0, n * 4)
      i += n
    }
  }

  private[db] def readInts(in: java.io.DataInputStream,
                           n: Int): Array[Int] = {
    val a = new Array[Int](n)
    val slab = new Array[Byte](SlabBytes)
    var i = 0
    while (i < n) {
      val m = math.min(n - i, SlabBytes / 4)
      in.readFully(slab, 0, m * 4)
      java.nio.ByteBuffer.wrap(slab, 0, m * 4).asIntBuffer().get(a, i, m)
      i += m
    }
    a
  }
}
