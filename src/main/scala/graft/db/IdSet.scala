package graft.db

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** The id-membership structure a compiled [[DocSelector]] pushes into the
  * prepared scan's bounded heaps — the faiss `IDSelectorBatch` analogue
  * (the reference has no filtered search at all; faiss selectors are the
  * published shape every production vector store converges on). Two
  * physical forms behind one probe interface:
  *
  *  - [[BroadcastIdSet]]: one sorted `Array[Long]` broadcast to every
  *    executor (8 B/id). Right up to ~10M matches; beyond that the
  *    broadcast and the driver collect stop scaling.
  *  - [[RunIdSet]]: the scale path — the sorted ids live as fixed-width
  *    binary RUN FILES on the shared filesystem, range-partitioned and
  *    sorted at build time; only a tiny (min, max, path) manifest ships
  *    with the closure. Each executor lazily loads just the runs its
  *    rows actually probe (soft-referenced, so memory pressure evicts),
  *    and membership is manifest binary-search + in-run binary-search.
  *    Exact semantics at ANY match count — a bloom filter alone was
  *    rejected because false positives would leak disallowed ids into
  *    filtered results.
  *
  * Probing protocol: the scan calls [[IdSet.probe]] ONCE per block and
  * then the returned [[IdProbe]] per surviving row, so the hot loop pays
  * a local array binary-search (broadcast form) or run lookup (file
  * form), never a broadcast-value fetch or cache lookup per row.
  */
private[graft] sealed trait IdSet extends Serializable {
  /** Number of ids in the set (fixed at build time). */
  def size: Long
  /** Resolve an executor-local probe handle; called once per block scan. */
  def probe(): IdProbe
  /** Driver-side: release the backing resources (broadcast / run files).
    * The set must not be probed afterwards.
    */
  def release(): Unit
}

/** Executor-local membership handle; one per block scan, not serialized. */
private[graft] trait IdProbe {
  def contains(id: Long): Boolean
}

/** Broadcast sorted-array membership (the ≤ [[VectorDB.MaxSelectorIds]]
  * form): probe = binary search over the executor-local broadcast value.
  */
private[graft] final class BroadcastIdSet(
    val bc: org.apache.spark.broadcast.Broadcast[Array[Long]]) extends IdSet {
  override def size: Long = bc.value.length.toLong
  override def probe(): IdProbe = {
    val arr = bc.value
    (id: Long) => java.util.Arrays.binarySearch(arr, id) >= 0
  }
  override def release(): Unit = bc.unpersist()
}

/** One sorted run file: `count` big-endian longs in [min, max]. Ranges
  * across a manifest are disjoint (range-partitioned at build time).
  */
private[graft] final case class RunMeta(path: String, min: Long, max: Long, count: Long)

/** File-backed sorted-run membership — the selector scale path past the
  * broadcast ceiling. The manifest (O(runs) driver/closure bytes) is
  * binary-searched per probe to locate the candidate run; the run's ids
  * load lazily into an executor-local soft-referenced cache on first
  * probe ([[RunIdSet.loadRun]]) and are binary-searched thereafter. A
  * 100M-id selector is ~800 MB of run files on the FS but only the
  * probed runs ever occupy executor memory — and the prepared scan
  * probes membership only for rows that already survived the hamming
  * bound, so an unselective scan touches few runs.
  *
  * `confProps` carries the driver's explicit Hadoop configuration
  * entries; executors reconstruct `new Configuration()` plus these
  * overrides (Hadoop's `Configuration` itself is not serializable),
  * which reaches any filesystem the executor classpath can.
  */
private[graft] final class RunIdSet(
    val dir: String,
    val runs: Array[RunMeta],
    val total: Long,
    val confProps: Map[String, String]) extends IdSet {

  override def size: Long = total

  override def probe(): IdProbe = {
    val rs = runs
    val props = confProps
    if (rs.isEmpty) (_: Long) => false
    else {
      val maxs = rs.map(_.max)
      (id: Long) => {
        // first run with max >= id
        var lo = 0; var hi = maxs.length - 1; var at = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (maxs(mid) >= id) { at = mid; hi = mid - 1 } else lo = mid + 1
        }
        at >= 0 && rs(at).min <= id && {
          val ids = RunIdSet.loadRun(rs(at), props)
          java.util.Arrays.binarySearch(ids, id) >= 0
        }
      }
    }
  }

  /** Delete the run directory. Driver-side (uses the live Hadoop conf
    * via the recorded props, which on the driver equal the originals).
    */
  override def release(): Unit = {
    val fs = FileSystem.get(new java.net.URI(dir), RunIdSet.confOf(confProps))
    fs.delete(new Path(dir), true)
    RunIdSet.dropCached(dir)
  }
}

private[graft] object RunIdSet {

  /** Executor-local run cache: path → soft-referenced sorted ids. Soft
    * references let the JVM evict cold runs under memory pressure; a
    * re-probe reloads from the FS.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.ref.SoftReference[Array[Long]]]

  private[db] def confOf(props: Map[String, String]): Configuration = {
    val c = new Configuration()
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private[db] def loadRun(meta: RunMeta, props: Map[String, String]): Array[Long] = {
    val ref = cache.get(meta.path)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) hit
    else {
      val loaded = readRun(meta, props)
      cache.put(meta.path, new java.lang.ref.SoftReference(loaded))
      loaded
    }
  }

  private def readRun(meta: RunMeta, props: Map[String, String]): Array[Long] = {
    require(meta.count <= Int.MaxValue / 8, s"run ${meta.path} too large: ${meta.count}")
    val p = new Path(meta.path)
    val fs = FileSystem.get(p.toUri, confOf(props))
    val in = fs.open(p)
    try {
      val n = meta.count.toInt
      val bytes = new Array[Byte](n * 8)
      in.readFully(0L, bytes)
      val out = new Array[Long](n)
      java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
      out
    } finally in.close()
  }

  private[db] def dropCached(dir: String): Unit = {
    val it = cache.keySet().iterator()
    while (it.hasNext) if (it.next().startsWith(dir)) it.remove()
  }

  /** Write one partition's sorted ids as a run file; returns its meta,
    * or None for an empty partition. Executor-side.
    */
  private[db] def writeRun(dir: String, pid: Int, it: Iterator[Long],
                           props: Map[String, String]): Option[RunMeta] = {
    if (!it.hasNext) None
    else {
      val path = s"$dir/run-$pid.ids"
      val p = new Path(path)
      val fs = FileSystem.get(p.toUri, confOf(props))
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16))
      var min = Long.MaxValue
      var max = Long.MinValue
      var prev = Long.MinValue
      var count = 0L
      try {
        while (it.hasNext) {
          val id = it.next()
          require(id >= prev, s"run $pid not sorted: $id after $prev")
          prev = id
          if (count == 0L) min = id
          max = id
          out.writeLong(id)
          count += 1
        }
      } finally out.close()
      Some(RunMeta(path, min, max, count))
    }
  }
}
