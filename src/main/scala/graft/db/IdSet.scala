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
  *    rows actually probe (bounded-LRU cached, cold runs evicted),
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
  * load lazily into an executor-local bounded-LRU cache on first
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
    val confProps: Map[String, String],
    val owned: Boolean = true) extends IdSet {

  override def size: Long = total

  override def probe(): IdProbe = {
    val rs = runs
    val props = confProps
    if (rs.isEmpty) (_: Long) => false
    else {
      val maxs = rs.map(_.max)
      // Per-handle run table: the shared cache (and any lock or hash
      // lookup) is touched ONCE per (run, block scan); every further
      // probe of the same run is a plain local-array read. Without
      // this, 16 concurrent scan tasks contending on the shared cache
      // per probe measured 433 ms vs 23 ms filtered-search latency at
      // 1M×1024.
      val local = new Array[Array[Long]](rs.length)
      (id: Long) => {
        // first run with max >= id
        var lo = 0; var hi = maxs.length - 1; var at = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (maxs(mid) >= id) { at = mid; hi = mid - 1 } else lo = mid + 1
        }
        at >= 0 && rs(at).min <= id && {
          var ids = local(at)
          if (ids == null) {
            ids = RunIdSet.loadRun(rs(at), props)
            local(at) = ids
          }
          java.util.Arrays.binarySearch(ids, id) >= 0
        }
      }
    }
  }

  /** Release the backing. Owned (built in this JVM): delete the run
    * directory. Adopted from another JVM's persisted manifest
    * (`owned = false`): only drop the local caches — the building JVM
    * keeps deletion duty, so one reader's release cannot pull files
    * out from under the rest of the fleet. Driver-side (uses the live
    * Hadoop conf via the recorded props, which on the driver equal the
    * originals).
    */
  override def release(): Unit = {
    if (owned) {
      val fs = FileSystem.get(new java.net.URI(dir), RunIdSet.confOf(confProps))
      fs.delete(new Path(dir), true)
    }
    RunIdSet.dropCached(dir)
  }
}

/** Persistence of a compiled file-backed selector's identity + run
  * manifest beside its run files (`<sel-dir>/manifest`) — the
  * cross-JVM face of the selector catalog: the building JVM pays the
  * predicate scan and run write ONCE, every other JVM over the folder
  * adopts the selector by reading this one small file (no Catalyst
  * job, no duplicate run files). Written only for CATALOGED selectors
  * (their run files live until a commit supersedes them — an uncached
  * `selector()` handle deletes its files at release, which would race
  * adopters). Run entries are stored RELATIVE to the selector dir (run
  * files always live directly inside it), so the whole `_selectors`
  * tree is PORTABLE: replicate or move the DB folder and adoption
  * resolves runs against wherever the manifest now lives. Line-based,
  * predicate base64-encoded (predicate text is arbitrary);
  * unknown/corrupt manifests read as None and the caller falls back
  * to compiling.
  */
private[graft] object SelectorManifest {

  /** `dir` is the directory the manifest was READ from (runs resolved
    * against it), not wherever the builder originally wrote.
    */
  final case class Manifest(version: String, dir: String, pred: String,
                            maxBroadcast: Int, runSize: Int, total: Long,
                            runs: Array[RunMeta])

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  def write(fs: FileSystem, dir: String, version: String, pred: String,
            maxBroadcast: Int, runSize: Int, total: Long,
            runs: Array[RunMeta]): Unit = {
    val sb = new StringBuilder
    sb.append("format=2").append('\n')
    sb.append("version=").append(version).append('\n')
    sb.append("pred=").append(b64(pred)).append('\n')
    sb.append("maxBroadcast=").append(maxBroadcast).append('\n')
    sb.append("runSize=").append(runSize).append('\n')
    sb.append("total=").append(total).append('\n')
    runs.foreach { r =>
      require(r.path.startsWith(dir + "/"),
        s"run ${r.path} not inside selector dir $dir")
      sb.append("run=").append(b64(r.path.stripPrefix(dir + "/")))
        .append('\t').append(r.min)
        .append('\t').append(r.max).append('\t').append(r.count).append('\n')
    }
    val out = fs.create(new Path(s"$dir/manifest"), true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
  }

  def read(fs: FileSystem, dir: String): Option[Manifest] =
    try {
      val p = new Path(s"$dir/manifest")
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                   finally in.close()
        val fields = scala.collection.mutable.Map[String, String]()
        val runs = Array.newBuilder[RunMeta]
        text.linesIterator.filter(_.nonEmpty).foreach { line =>
          val i = line.indexOf('=')
          require(i > 0, s"bad manifest line: $line")
          val (k, v) = (line.substring(0, i), line.substring(i + 1))
          if (k == "run") {
            val parts = v.split('\t')
            require(parts.length == 4, s"bad run line: $line")
            runs += RunMeta(s"$dir/${unb64(parts(0))}", parts(1).toLong,
              parts(2).toLong, parts(3).toLong)
          } else fields(k) = v
        }
        require(fields("format") == "2", s"unknown manifest format")
        Some(Manifest(fields("version"), dir, unb64(fields("pred")),
          fields("maxBroadcast").toInt, fields("runSize").toInt,
          fields("total").toLong, runs.result()))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}

private[graft] object RunIdSet {

  /** Executor-local run cache: path → sorted ids, strong references
    * under a bounded byte budget (`GRAFT_SELECTOR_CACHE_MB`, default
    * 256 MB per JVM). Lock-free reads (ConcurrentHashMap) — the per
    * scan-handle local table above means this cache is consulted once
    * per (run, block scan) anyway, never per probe. Soft references
    * were tried and thrash (a heap under serving-block pressure clears
    * them every GC, re-reading every probed run per query); a
    * synchronized LRU was tried and serializes concurrent scan tasks.
    * Over budget, arbitrary entries evict until inside — recency
    * tracking isn't worth a lock when reload is one 64 MB-max
    * sequential FS read.
    */
  private val cacheMaxBytes: Long =
    sys.env.get("GRAFT_SELECTOR_CACHE_MB").map(_.toLong << 20).getOrElse(256L << 20)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]
  private val cacheBytes = new java.util.concurrent.atomic.AtomicLong(0L)

  private def cacheGet(path: String): Array[Long] = cache.get(path)

  private def cachePut(path: String, ids: Array[Long]): Unit = {
    if (cache.putIfAbsent(path, ids) == null) {
      val total = cacheBytes.addAndGet(ids.length * 8L)
      if (total > cacheMaxBytes) {
        val it = cache.entrySet().iterator()
        while (cacheBytes.get() > cacheMaxBytes && it.hasNext) {
          val e = it.next()
          if (e.getKey != path && cache.remove(e.getKey, e.getValue))
            cacheBytes.addAndGet(-e.getValue.length * 8L)
        }
      }
    }
  }

  private[db] def confOf(props: Map[String, String]): Configuration = {
    val c = new Configuration()
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private[db] def loadRun(meta: RunMeta, props: Map[String, String]): Array[Long] = {
    val hit = cacheGet(meta.path)
    if (hit != null) hit
    else {
      val loaded = readRun(meta, props)
      cachePut(meta.path, loaded)
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
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(dir) && cache.remove(e.getKey, e.getValue))
        cacheBytes.addAndGet(-e.getValue.length * 8L)
    }
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
