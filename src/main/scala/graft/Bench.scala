package graft
import org.apache.spark.sql.SparkSession

/** Driver bench: one JSON line with per-query steady-state seconds.
  *
  * Measurement hygiene (round-5/6 review findings: single-JVM suite
  * timings inflate 2.5-5× over isolated runs — cross-family heap history
  * and GC noise mask per-query regressions even after cache clears):
  *  - the TOP-LEVEL invocation forks ONE CHILD JVM PER QUERY FAMILY
  *    (d/e/m/p/q/s/t/v prefix) and merges their JSON lines, so every
  *    family's numbers come from a JVM whose heap has only ever run that
  *    family — the same regime as an isolated `SPARK_GRAFT_ONLY` run;
  *  - each child gives its family one untimed warm pass (builds its
  *    indexes/caches, JITs its codegen) before timing;
  *  - each query reports the MEDIAN of `SPARK_GRAFT_REPS` (default 3)
  *    steady-state repetitions (a stray GC pause can't masquerade as a
  *    plan regression), with the per-query MIN alongside in
  *    `queries_min` for regression triage;
  *  - per-query exceptions are COUNTED, not swallowed: a query that
  *    throws is EXCLUDED from `queries`/`queries_min` (its fast-failure
  *    time would otherwise read as a speedup), its name lands in
  *    `failed`, and ANY error forces the headline `value` to -1 — a
  *    round-over-round diff of the total can never mistake breakage
  *    for improvement.
  *
  * Forking reconstructs the child from this JVM's own binary, input
  * arguments, and classpath; when that's not viable (e.g. launched from
  * an sbt layered classloader whose java.class.path lacks the classes)
  * it falls back to the single-JVM path. `SPARK_GRAFT_NOFORK=1` forces
  * the fallback; `SPARK_GRAFT_ONLY=a,b` (local iteration) also runs
  * in-process, which is exactly the isolated regime already.
  */
object Bench {

  /** Queries measured at ONE rep: the transactional gates, whose per-rep
    * cost is deliberate commit/fence/re-read semantics at Spark's
    * per-job floor. Keyed by exact name — a name-prefix convention
    * would silently demote any future query that happens to start with
    * 'x' to a noisier single-rep median (ADVICE r13).
    */
  private[graft] val SingleRepQueries: Set[String] =
    Set("x1_pinned_compaction", "x2_incremental_serving")

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  /** 1-minute system load average (-1 when the platform can't report
    * one). Recorded in every bench line: round 9 shipped a bench whose
    * q-family read ~2× slow purely from machine load (the round's own
    * sbt work running alongside), and without the load recorded the
    * artifact was indistinguishable from a plan regression.
    */
  private def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  /** Load ceiling above which a family's numbers are considered
    * contaminated and the family is re-run once (forked path only).
    * The default scales with the child's own thread count — a
    * local[N] child legitimately drives loadavg toward N (and the
    * 1-minute EMA carries the previous family's work into the next
    * child's start), so a fixed ceiling below ~1.5·N would re-run
    * every family against the bench's own load. max(12, 1.5·cpus)
    * keeps the guard meaningful for small-N children while only
    * flagging genuinely external load under wide ones.
    */
  private def loadMax(): Double =
    sys.env.get("SPARK_GRAFT_LOAD_MAX").map(_.toDouble).getOrElse {
      val cpus = sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(4)
      math.max(12.0, 1.5 * cpus)
    }

  /** Per-query baseline minima from the last quiet-machine local bench
    * (`BENCH_baseline_local.json`, refreshed each round) — the second
    * contamination guard (round-10 verdict item 4): the loadavg ceiling
    * missed BENCH_r10's 1.5-1.8× d-family inflation because ambient
    * load peaked at 6.35, under any self-load-tolerant ceiling. A
    * family whose MEDIAN exceeds its baseline MIN by
    * [[baselineSlack]]× is re-run once regardless of load — plan
    * regressions survive both attempts and still show; transient load
    * doesn't. Empty when the file is missing or was recorded at a
    * different scale factor.
    */
  private[graft] def resolveBaselineFile(): Option[java.io.File] = {
    // Resolution order (r14 verdict item 1: the driver gate ran with
    // reruns=[] while v9 sat at 8× its baseline because the bare
    // relative path below never resolved from the driver's cwd):
    //  1. explicit SPARK_GRAFT_BENCH_BASELINE;
    //  2. the cwd file (local iteration from the repo root);
    //  3. the repo root derived from the compiled-classes classpath
    //    entry (target/scala-2.13/classes → three parents up) — the
    //    anchor that holds from ANY cwd the driver launches with.
    // An EXPLICIT env path is authoritative: set-but-missing means the
    // caller wants the guard OFF (paired A/B drills) — falling through
    // to the cwd file would silently re-enable it against a baseline
    // the caller specifically rejected.
    sys.env.get("SPARK_GRAFT_BENCH_BASELINE") match {
      case Some(p) => return Some(new java.io.File(p)).filter(_.isFile)
      case None => ()
    }
    val candidates =
      Seq(new java.io.File("BENCH_baseline_local.json")) ++
        System.getProperty("java.class.path", "")
          .split(java.io.File.pathSeparatorChar).toSeq
          .filter(_.replace('\\', '/').endsWith("target/scala-2.13/classes"))
          .flatMap { p =>
            Option(new java.io.File(p).getParentFile)
              .flatMap(d => Option(d.getParentFile))
              .flatMap(d => Option(d.getParentFile))
              .map(root => new java.io.File(root, "BENCH_baseline_local.json"))
          }
    candidates.find(_.isFile)
  }

  private def baselineMins(sfDir: String): Map[String, Double] = {
    val fOpt = resolveBaselineFile()
    if (fOpt.isEmpty) {
      // Loud, not silent: an unresolved baseline disables the second
      // contamination guard entirely — exactly the r14 failure mode.
      System.err.println("[bench] no BENCH_baseline_local.json found " +
        "(env/cwd/repo root) — the baseline contamination guard is OFF")
      return Map.empty
    }
    val f = fOpt.get
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
      val baseSf = Option(root.get("sf")).map(_.asText()).getOrElse("")
      // the baseline only means anything at the same scale factor
      if (!baseSf.endsWith(sfDir.split('/').last)) Map.empty
      else {
        val node = root.get("queries_min")
        if (node == null) Map.empty
        else {
          val names = node.fieldNames()
          val b = Map.newBuilder[String, Double]
          while (names.hasNext) {
            val k = names.next(); b += k -> node.get(k).asDouble()
          }
          b.result()
        }
      }
    } catch { case _: Exception => Map.empty }
  }

  private def baselineSlack(): Double =
    sys.env.get("SPARK_GRAFT_BASELINE_SLACK").flatMap(_.toDoubleOption)
      .getOrElse(1.5)

  /** The baseline guard's decision, extracted for direct testing
    * (BenchGuardSpec pins that a poisoned draw FIRES it — r14 shipped
    * a driver gate where it was silently inert): queries whose median
    * exceeds their quiet-machine baseline min by more than `slack`×.
    */
  private[graft] def slowVsBaseline(med: Seq[(String, Double)],
                                    baseline: Map[String, Double],
                                    slack: Double): Seq[String] =
    med.collect {
      case (q, v) if baseline.get(q).exists(b => v > b * slack) => q
    }

  /** Deterministic single-thread CPU probe, stamped into the JSON line
    * as `cpu_probe_ms`: a fixed xorshift+popcount loop whose wall time
    * depends only on this box's single-core speed. Round-over-round
    * artifact diffs divide by it to separate machine drift from plan
    * regressions — BENCH_r11_local came in a UNIFORM ~1.4× over
    * BENCH_r10_local including queries whose code no round had touched,
    * and without a stamped probe that offset was indistinguishable from
    * a repo-wide regression. Warm-run median of 3.
    */
  private def cpuProbe(): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9e3779b97f4a7c15L
      var acc = 0L
      var i = 0
      while (i < 20000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        acc += java.lang.Long.bitCount(x)
        i += 1
      }
      // acc escapes through the blackhole below so the loop can't be DCE'd
      blackhole = acc
      (System.nanoTime() - t0) / 1e6
    }
    once() // JIT warm
    val xs = Seq(once(), once(), once()).sorted
    xs(1)
  }
  @volatile private var blackhole: Long = 0L

  /** Deterministic IO probe, stamped as `io_probe_ms`: write 64 MB to
    * the shuffle-local tmpdir in 1 MB chunks with an fsync, read it
    * back, delete. The CPU probe cannot see drift in the disk/page-
    * cache subsystem — r11's `d4_dedup_ngram` 1.59× probe-normalized
    * "regression" was exactly that (shuffle-IO machine drift, confirmed
    * by rebuilding the pre-session commit); this stamp makes the next
    * such diff attributable without a worktree rebuild. Median of 3.
    */
  private def ioProbe(): Double = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ioprobe")
    try {
      val chunk = new Array[Byte](1 << 20)
      new scala.util.Random(42).nextBytes(chunk)
      def once(i: Int): Double = {
        val f = dir.resolve(s"probe$i.bin")
        val t0 = System.nanoTime()
        val fos = new java.io.FileOutputStream(f.toFile)
        try {
          var j = 0
          while (j < 64) { fos.write(chunk); j += 1 }
          fos.getFD.sync()
        } finally fos.close()
        val in = java.nio.file.Files.newInputStream(f)
        try {
          val buf = new Array[Byte](1 << 20)
          var n = 0L
          var r = in.read(buf)
          while (r >= 0) { n += r; r = in.read(buf) }
          blackhole = n
        } finally in.close()
        java.nio.file.Files.delete(f)
        (System.nanoTime() - t0) / 1e6
      }
      val xs = Seq(once(0), once(1), once(2)).sorted
      xs(1)
    } finally {
      try java.nio.file.Files.deleteIfExists(dir)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Writeback-settle (r14 verdict item 2): sync, then wait (bounded)
    * for the page cache's Dirty pool to drain under ~64 MB. A bench
    * family recorded behind another family's unflushed gigabytes reads
    * 1.2–2× slow with nothing wrong in the plan (SCANBENCH_r14b's
    * 49 ms bare scan under its own 22 ms funnel row — internally
    * impossible except as writeback contention). Returns the Dirty kB
    * it settled at (-1 when /proc/meminfo is unreadable).
    */
  private[graft] def settleWriteback(maxWaitMs: Long = 15000): Long = {
    def dirtyKb(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/meminfo")
        try src.getLines().collectFirst {
          case l if l.startsWith("Dirty:") => l.split("\\s+")(1).toLong
        }.getOrElse(-1L)
        finally src.close()
      } catch { case _: Exception => -1L }
    try new ProcessBuilder("sync").start().waitFor()
    catch { case _: Exception => () }
    val t0 = System.nanoTime()
    var d = dirtyKb()
    while (d > 65536 && (System.nanoTime() - t0) < maxWaitMs * 1000000L) {
      Thread.sleep(500)
      d = dirtyKb()
    }
    d
  }

  /** `loadStart`/`loadEnd` are point samples at run start/end;
    * `famMax` is the max load any family's timing observed (forked
    * path: max over child-reported samples; in-process: max of the two
    * point samples) — the contamination ceiling a reader should judge
    * the numbers by.
    */
  private def jsonLine(qMed: collection.Map[String, Double],
                       qMin: collection.Map[String, Double],
                       errors: Int, failed: Seq[String], sfDir: String,
                       loadStart: Double, loadEnd: Double, famMax: Double,
                       reruns: Seq[String] = Nil): String = {
    def obj(m: collection.Map[String, Double]) =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // any failure invalidates the headline total: a crashed family or
    // query REDUCES the sum, so a plain value diff would read breakage
    // as a speedup
    val total = if (errors > 0) -1.0 else qMed.values.sum
    val failedArr = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val rerunsArr = reruns.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Double.toString, NOT an f"" interpolator: f"%.2f" is
    // locale-dependent (comma decimals under e.g. de_DE would corrupt
    // the parent-child JSON protocol).
    def r2(x: Double): String = (math.round(x * 100) / 100.0).toString
    s"""{"metric":"total","value":$total,"unit":"sec","queries":${obj(qMed)},""" +
      s""""queries_min":${obj(qMin)},"errors":$errors,"failed":$failedArr,""" +
      s""""loadavg_start":${r2(loadStart)},"loadavg_end":${r2(loadEnd)},""" +
      s""""loadavg_family_max":${r2(famMax)},"reruns":$rerunsArr,""" +
      s""""cpu_probe_ms":${r2(cpuProbe())},"io_probe_ms":${r2(ioProbe())},""" +
      s""""dirty_kb":${settleWriteback(maxWaitMs = 0)},"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val isChild = sys.env.contains("SPARK_GRAFT_CHILD")
    val noFork = sys.env.contains("SPARK_GRAFT_NOFORK") || sys.env.contains("SPARK_GRAFT_ONLY")
    if (!isChild && !noFork && runForked()) return
    runInProcess()
  }

  // ---- forked (top-level) path ---------------------------------------------

  /** One child JVM per family, same binary/flags/classpath/env as this
    * JVM; merges the children's JSON lines. Returns false when the child
    * invocation can't be reconstructed — caller falls back in-process.
    */
  private def runForked(): Boolean = {
    import scala.jdk.CollectionConverters._
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java")
    val cp = System.getProperty("java.class.path", "")
    val haveClasses = cp.split(java.io.File.pathSeparatorChar).exists(p =>
      new java.io.File(p, "graft/Bench.class").isFile ||
        (p.endsWith(".jar") && new java.io.File(p).getName.startsWith("graft")))
    if (!javaBin.isFile || !haveClasses) return false
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val families = SparkEntry.queries.keys.toSeq.sorted.groupBy(_.head).toSeq.sortBy(_._1)
    val loadStart = loadAvg()

    // One child attempt: returns the parsed result + the child's max
    // recorded loadavg, or None when the child crashed / emitted garbage.
    def runFamily(names: Seq[String])
        : Option[(Seq[(String, Double)], Seq[(String, Double)], Int, Seq[String], Double)] = {
      val cmd = Seq(javaBin.getAbsolutePath) ++ jvmArgs ++
        Seq("-cp", cp, "graft.Bench")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_CHILD", "1")
      pb.environment().put("SPARK_GRAFT_ONLY", names.mkString(","))
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toList
      val code = proc.waitFor()
      out.find(_.startsWith("{")).filter(_ => code == 0).flatMap(parseChildLine)
    }

    val qMed = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val qMin = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val reruns = scala.collection.mutable.ArrayBuffer.empty[String]
    var errors = 0
    var famMax = loadStart
    val baseline = baselineMins(sfDir)
    if (baseline.isEmpty)
      System.err.println("[bench] WARNING: baseline guard running EMPTY " +
        s"(file missing or recorded at a different sf than $sfDir)")
    families.foreach { case (fam, names) =>
      // Writeback settle between children: the previous family's
      // unflushed writes otherwise bill the next family's IO.
      settleWriteback()
      // Two contamination guards, each re-running the family ONCE:
      //  - load (round-9 finding): the family's child saw loadavg above
      //    the ceiling — keep the attempt that saw the quieter machine;
      //  - baseline (round-10 finding): some query's median exceeds its
      //    last quiet-machine min by the slack factor — ambient load
      //    under the ceiling still inflates timings; keep the FASTER
      //    attempt (a real plan regression is slow in both).
      def slow(med: Seq[(String, Double)]): Seq[String] =
        slowVsBaseline(med, baseline, baselineSlack())
      val first = runFamily(names)
      val attempt = first match {
        case Some(r) if r._5 > loadMax() =>
          System.err.println(f"[bench] family '$fam' saw loadavg ${r._5}%.1f > " +
            f"${loadMax()}%.1f — re-running once on a (hopefully) quieter machine")
          reruns += fam.toString
          runFamily(names) match {
            case Some(r2) if r2._5 < r._5 => Some(r2)
            case _ => Some(r)
          }
        case Some(r) if slow(r._1).nonEmpty =>
          System.err.println(s"[bench] family '$fam' queries " +
            s"${slow(r._1).mkString(",")} exceed the local baseline " +
            s"min by >${baselineSlack()}x — re-running once")
          reruns += fam.toString
          runFamily(names) match {
            case Some(r2) if r2._1.map(_._2).sum < r._1.map(_._2).sum => Some(r2)
            case _ => Some(r)
          }
        case other => other
      }
      attempt match {
        case Some((med, min, errs, fld, famLoad)) =>
          qMed ++= med; qMin ++= min; errors += errs; failed ++= fld
          famMax = math.max(famMax, famLoad)
        case None =>
          System.err.println(s"[bench] family '$fam' child failed — " +
            s"counting its ${names.size} queries as errors")
          errors += names.size
          failed ++= names
      }
    }
    println(jsonLine(qMed, qMin, errors, failed.toSeq, sfDir, loadStart, loadAvg(),
      famMax, reruns.toSeq))
    true
  }

  /** Parse a child's JSON line with Jackson (on the Spark classpath) —
    * a real parser fails LOUDLY on format drift where substring
    * arithmetic would silently merge an empty family.
    */
  private def parseChildLine(line: String)
      : Option[(Seq[(String, Double)], Seq[(String, Double)], Int, Seq[String], Double)] =
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
      def numObj(field: String): Seq[(String, Double)] = {
        val node = root.get(field)
        if (node == null) Nil
        else {
          val names = node.fieldNames()
          val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
          while (names.hasNext) {
            val k = names.next()
            buf += k -> node.get(k).asDouble()
          }
          buf.toSeq
        }
      }
      def strArr(field: String): Seq[String] = {
        val node = root.get(field)
        if (node == null) Nil
        else (0 until node.size()).map(i => node.get(i).asText())
      }
      val famLoad = math.max(
        Option(root.get("loadavg_start")).map(_.asDouble()).getOrElse(-1.0),
        Option(root.get("loadavg_end")).map(_.asDouble()).getOrElse(-1.0))
      Some((numObj("queries"), numObj("queries_min"),
        Option(root.get("errors")).map(_.asInt()).getOrElse(0), strArr("failed"),
        famLoad))
    } catch {
      case _: Exception => None
    }

  // ---- in-process (child / fallback) path ----------------------------------

  private def runInProcess(): Unit = {
    val loadStart = loadAvg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Session warmup: JIT/codegen the common scan+agg+join paths once so
    // the first timed query doesn't absorb ~10s of JVM startup.
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy("l_returnflag").count().collect()
      li.limit(1000).join(li.limit(1000), "l_orderkey").count()
    } catch { case _: Throwable => () }
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name)) }
    // Family = leading letter of the query name (d1/e3/q_rollup/v10 → d/e/q/v).
    val families = selected.toSeq.sortBy(_._1).groupBy(_._1.head).toSeq.sortBy(_._1)

    val qMed = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val qMin = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failedNames = scala.collection.mutable.LinkedHashSet.empty[String]
    families.foreach { case (_, qs) =>
      // Bound the persisted footprint to one family's working set (only
      // reachable with >1 family: the fallback / NOFORK path).
      Graft.clearAllCaches(spark)
      // Same writeback settle as the forked parent applies between
      // children — the NOFORK path otherwise times the next family
      // against this one's unflushed writes.
      if (selected.size > qs.size) settleWriteback()
      // Warm pass: builds this family's session-lifetime indexes and
      // caches and JITs its codegen — the same warm-index regime the
      // reference's published numbers use (index resident in RAM).
      qs.foreach { case (name, fn) =>
        try { fn(spark, sfDir).count() } catch {
          case t: Throwable =>
            failedNames += name
            System.err.println(s"[bench] warm pass of $name failed: $t")
        }
      }
      qs.foreach { case (name, fn) =>
        // Transactional gates: reps pinned to 1 (explicit names, not a
        // prefix — a future query merely NAMED x* must not silently get
        // a noisier 1-rep median). Each rep is 4s of deliberate
        // commit/fence/re-read semantics at Spark's per-job floor
        // (TxPhaseProbe-adjudicated irreducible), its regression signal
        // lives in TxBench/IncBench, and 3 reps made x1+x2 31% of the
        // whole driver gate for a median nobody reads.
        val qReps = if (Bench.SingleRepQueries.contains(name)) 1 else reps
        val samples = (1 to qReps).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch {
            case t: Throwable =>
              failedNames += name
              System.err.println(s"[bench] $name failed: $t")
          }
          (System.nanoTime() - t0) / 1e9
        }
        // a query that threw records NO timing — its fast-failure reps
        // would otherwise read as a speedup in the per-query diff
        if (!failedNames.contains(name)) {
          qMed(name) = median(samples)
          qMin(name) = samples.min
        }
      }
    }
    val loadEnd = loadAvg()
    println(jsonLine(qMed, qMin, failedNames.size, failedNames.toSeq, sfDir,
      loadStart, loadEnd, math.max(loadStart, loadEnd)))
    spark.stop()
  }
}
