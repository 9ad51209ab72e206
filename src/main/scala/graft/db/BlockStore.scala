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
  * persisted, a warm serve-build at an unchanged snapshot is pure
  * sequential IO: each task streams its block file back (CRC-checked),
  * reattaches the persisted nav, and pins the block — no join, no
  * shuffle, no Row materialization. The engine analogue of the
  * reference memory-mapping its packed faiss index back instead of
  * re-adding every vector (`BinaryVectorDB.py:129-140,172`).
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
  * shared FS, exactly as wide as the build it replaces. Every stream
  * is CRC32-trailed: a torn or bit-rotten file fails the check and the
  * build falls back, never serves garbage.
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

  /** Persist one block's arrays (staged + replacing rename + trailing
    * CRC32). The nav field is NOT written — [[NavStore]] owns graph
    * persistence; the loader reattaches it. Failures warn and never
    * fail the build: persistence is an optimization, and a missing
    * block file simply means no manifest is written and the next open
    * builds cold.
    */
  private[db] def trySaveBlock(pid: Int, blk: PreparedScan.Block): Unit = {
    val p = blockPath(pid)
    val tmp = new Path(dirUri,
      s".block-$pid.blk.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      val fs = p.getFileSystem(conf)
      val crc = new java.util.zip.CRC32()
      val checked = new java.util.zip.CheckedOutputStream(
        new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 20), crc)
      val out = new java.io.DataOutputStream(checked)
      try {
        out.writeInt(BlockMagic); out.writeInt(FormatVersion)
        val rows = blk.ids.length
        out.writeInt(rows); out.writeInt(nWords)
        writeLongs(out, blk.ids)
        writeLongs(out, blk.words)
        out.writeBoolean(blk.cells.nonEmpty)
        if (blk.cells.nonEmpty) writeInts(out, blk.cells)
        out.writeInt(blk.byteLen)
        if (blk.byteLen > 0) {
          out.writeInt(blk.rowsPerChunk)
          out.writeInt(blk.bytes.length)
          blk.bytes.foreach { c => out.writeInt(c.length); out.write(c) }
        }
        out.writeBoolean(blk.docs != null)
        if (blk.docs != null) {
          var i = 0
          while (i < rows) {
            val d = blk.docs(i)
            if (d == null) out.writeInt(-1)
            else {
              val b = d.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              out.writeInt(b.length); out.write(b)
            }
            i += 1
          }
        }
        out.writeLong(crc.getValue) // trailer: body CRC
      } finally out.close()
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

  /** Stream block `pid` back (nav not attached — the caller reattaches
    * via [[NavStore]] or rebuilds). None on absence, geometry mismatch,
    * or CRC failure.
    */
  private[db] def tryLoadBlock(pid: Int): Option[PreparedScan.Block] =
    try {
      val p = blockPath(pid)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None
      else {
        val crc = new java.util.zip.CRC32()
        val checked = new java.util.zip.CheckedInputStream(
          new java.io.BufferedInputStream(fs.open(p), 1 << 20), crc)
        val in = new java.io.DataInputStream(checked)
        try {
          if (in.readInt() != BlockMagic) return None
          if (in.readInt() != FormatVersion) return None
          val rows = in.readInt()
          if (rows < 0) return None
          if (in.readInt() != nWords) return None
          val ids = readLongs(in, rows)
          val words = readLongs(in, rows * nWords)
          val cells =
            if (in.readBoolean()) readInts(in, rows) else Array.empty[Int]
          val byteLen = in.readInt()
          var rowsPerChunk = 1
          var chunks = Array.empty[Array[Byte]]
          if (byteLen > 0) {
            rowsPerChunk = in.readInt()
            val nChunks = in.readInt()
            if (rowsPerChunk < 1 || nChunks < 0) return None
            chunks = new Array[Array[Byte]](nChunks)
            var c = 0
            while (c < nChunks) {
              val len = in.readInt()
              if (len < 0) return None
              val a = new Array[Byte](len)
              in.readFully(a)
              chunks(c) = a
              c += 1
            }
          }
          val docs =
            if (!in.readBoolean()) null
            else {
              val d = new Array[String](rows)
              var i = 0
              while (i < rows) {
                val len = in.readInt()
                if (len >= 0) {
                  val b = new Array[Byte](len)
                  in.readFully(b)
                  d(i) = new String(b, java.nio.charset.StandardCharsets.UTF_8)
                }
                i += 1
              }
              d
            }
          val bodyCrc = crc.getValue // before the trailer bytes
          if (in.readLong() != bodyCrc) return None
          loadsForTest.incrementAndGet()
          Some(PreparedScan.Block(ids, words, cells, cells.distinct.sorted,
            chunks, byteLen, math.max(1, rowsPerChunk), docs))
        } finally in.close()
      }
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
  private val FormatVersion = 1
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

  // Bulk primitive IO: element-at-a-time DataOutputStream calls cost a
  // virtual dispatch per 8 bytes — at 4M rows × 16 words that is 64M
  // calls per block. Slab through a ByteBuffer instead (one write per
  // MiB), keeping the streams' CRC accounting intact.
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
