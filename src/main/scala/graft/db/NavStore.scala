package graft.db

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Executor-side persistence for per-block [[BlockNav]] structures —
  * the engine analogue of the reference persisting its faiss index next
  * to the data files (`BinaryVectorDB.py:172`, `write_index_binary`)
  * instead of rebuilding it on every open.
  *
  * Why: the graph build is the NSW strategy's whole price (measured
  * ~66 s per 1M-row block vs ~28 s for the flat serve-build at 4M,
  * GRAPHBENCH_r12_4m_true) and it used to be paid again on every
  * restart, every `enableServing` after a `disableServing`, and every
  * retirement-triggered full rebuild at an unchanged snapshot. The
  * adjacency arrays are pure derived state, so they are written once
  * per (snapshot version, block) under `<folder>/_nav/<version>/` and
  * reloaded when fresh — serve-build cost drops to IO + an id remap.
  *
  * Layout/atomicity: one `block-<partition>.nav` file per serving
  * block, staged-and-renamed like every other marker in the folder; a
  * torn or stale file fails validation inside the codec
  * ([[NavBuilder.loadNav]]) and the block silently rebuilds. Old
  * version dirs are swept by the owning [[VectorDB]] at commit time —
  * a sweep racing an in-flight save costs a warning, never
  * correctness.
  *
  * Distribution: instances ride the blockify closure to executors, so
  * they carry the Hadoop configuration as a serialized property list
  * (executors on a real cluster cannot see the driver's live
  * `Configuration` object, and the shared FS — HDFS/S3/ABFS — is
  * exactly where the files must live for every executor to reach
  * them; local[n] degenerates to the local FS).
  */
final class NavStore(
    dirUri: String,
    confProps: Array[(String, String)],
    codec: NavBuilder) extends Serializable {

  @transient private lazy val conf: Configuration = {
    val c = new Configuration()
    confProps.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private def blockPath(pid: Int) = new Path(dirUri, s"block-$pid.nav")

  /** Load the persisted nav for block `pid` against THIS build's arrays
    * (the codec validates identity — id set, geometry, builder params —
    * and remaps row order). None on absence, corruption, or mismatch:
    * the caller rebuilds.
    *
    * Body integrity: the codec's structural checks catch truncation and
    * param drift, but NOT bit rot whose degree/neighbor values happen to
    * stay in-bounds — such a graph would load silently and degrade
    * recall with no diagnostic (hamming scores stay correct, so it is
    * recall-only). The trailing CRC32 [[trySave]] appends closes that:
    * the body's checksum is verified before the decoded nav is adopted.
    * A pre-CRC file fails the trailer read and rebuilds once.
    */
  def tryLoad(pid: Int, ids: Array[Long], words: Array[Long],
              nWords: Int): Option[BlockNav] =
    try {
      val p = blockPath(pid)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None
      else {
        val crc = new java.util.zip.CRC32()
        val checked = new java.util.zip.CheckedInputStream(
          new java.io.BufferedInputStream(fs.open(p), 1 << 20), crc)
        val in = new java.io.DataInputStream(checked)
        val out = try {
          codec.loadNav(ids, words, nWords, in).filter { _ =>
            val bodyCrc = crc.getValue // before the trailer bytes
            in.readLong() == bodyCrc
          }
        } finally in.close()
        if (out.isDefined) NavStore.loadsForTest.incrementAndGet()
        out
      }
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  /** Persist block `pid`'s nav: staged to a uniquely named sibling,
    * CRC32 of the codec body appended as a trailer, then swapped onto
    * the destination with the shared REPLACING rename
    * ([[AtomicFiles.replacingRename]] — plain `FileSystem.rename`
    * refuses an existing destination on the local FS, and a
    * delete+rename absence window here would cost a concurrent loader a
    * spurious rebuild). Failures warn and never fail the build —
    * persistence is an optimization.
    */
  def trySave(pid: Int, nav: BlockNav): Unit = {
    val p = blockPath(pid)
    val tmp = new Path(dirUri,
      s".block-$pid.nav.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      val fs = p.getFileSystem(conf)
      val crc = new java.util.zip.CRC32()
      val checked = new java.util.zip.CheckedOutputStream(
        new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 20), crc)
      val out = new java.io.DataOutputStream(checked)
      val wrote = try {
        val w = codec.saveNav(nav, out)
        if (w) out.writeLong(crc.getValue) // trailer: body CRC (see tryLoad)
        w
      } finally out.close()
      if (wrote) {
        AtomicFiles.replacingRename(fs, conf, tmp, p)
        NavStore.savesForTest.incrementAndGet()
      } else fs.delete(tmp, false)
    } catch {
      case scala.util.control.NonFatal(e) =>
        try p.getFileSystem(conf).delete(tmp, false)
        catch { case scala.util.control.NonFatal(_) => }
        org.slf4j.LoggerFactory.getLogger(classOf[NavStore])
          .warn(s"nav persist failed for block $pid under $dirUri " +
            s"(serving is unaffected; the block rebuilds next open): $e")
    }
  }
}

object NavStore {
  /** Test counters (shared-JVM local mode): successful loads/saves. */
  private[graft] val loadsForTest = new java.util.concurrent.atomic.AtomicInteger(0)
  private[graft] val savesForTest = new java.util.concurrent.atomic.AtomicInteger(0)
}
