package graft

import org.apache.spark.sql.SparkSession

/** Session-level utilities for the graft engine. */
object Graft {

  /** Release every session-lifetime memoized relation the operator
    * families keep (packed-code hot tier, shingle/postings/prefix/simhash
    * dedup relations, IVF and k-means index entries). Without this the
    * persisted footprint grows monotonically across fixture dirs and
    * scale factors within one JVM — exactly the bench/test regime — and
    * late queries absorb GC pauses and cache eviction that have nothing
    * to do with their plans. Fixture dirs are immutable, so dropping the
    * caches is always safe; the next query that needs one rebuilds it.
    */
  def clearAllCaches(spark: SparkSession): Unit = {
    operators.Search.clearCaches(spark)
    operators.Dedup.clearCaches(spark)
    operators.MLSimilarity.clearCaches(spark)
    operators.Sketches.clearCaches(spark)
    operators.Pipeline.clearCaches(spark)
    operators.TextAnalysis.clearCaches(spark)
  }

  /** Path to a scheduler allocation file declaring the DEFAULT pool's
    * internal mode FAIR. `spark.scheduler.mode=FAIR` alone is NOT enough
    * for concurrent serving: it only enables the fair scheduler builder,
    * whose default pool still runs FIFO internally unless an allocation
    * file says otherwise (Spark's `FairSchedulableBuilder` —
    * DEFAULT_SCHEDULING_MODE is FIFO), so without this file a queued
    * lookup job still waits out every earlier scan's remaining tasks.
    * Serving benches pass it as `spark.scheduler.allocation.file`.
    */
  /** A scratch directory deleted recursively at JVM exit. Bench mains
    * build multi-GB throwaway DBs (a 4M×1024 corpus is ~5 GB across the
    * two tiers); plain `createTempDirectory` leaked them across runs
    * until /tmp filled — every bench scratch DB goes through here now.
    */
  def scratchDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$tag")
    scratchPaths.add(d)
    installScratchHook
    d.toString
  }

  /** All scratch dirs drain through ONE shutdown hook: benches that call
    * [[scratchDir]] per configuration (IvfBench, GraphBench) used to
    * register a hook + thread object per call, accumulated for the JVM
    * lifetime (ADVICE r11).
    */
  private val scratchPaths =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val installScratchHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      var p = scratchPaths.poll()
      while (p != null) { rm(p.toFile); p = scratchPaths.poll() }
    }))

  /** Scheduler pool for off-the-query-path work (the incremental-serving
    * background flatten): weight 1 vs the default pool's 8, so a
    * foreground commit or search keeps ~8/9 of the task slots while a
    * flatten is in flight. Only takes effect under FAIR scheduling with
    * [[fairDefaultPoolFile]] (serving deployments); under FIFO the pool
    * property is ignored — harmless.
    */
  val BackgroundPool = "graft-background"

  lazy val fairDefaultPoolFile: String = {
    val f = java.nio.file.Files.createTempFile("graft-fairscheduler", ".xml")
    java.nio.file.Files.writeString(f,
      """<?xml version="1.0"?>
        |<allocations>
        |  <pool name="default">
        |    <schedulingMode>FAIR</schedulingMode>
        |    <weight>8</weight>
        |    <minShare>0</minShare>
        |  </pool>
        |  <pool name="graft-background">
        |    <schedulingMode>FIFO</schedulingMode>
        |    <weight>1</weight>
        |    <minShare>0</minShare>
        |  </pool>
        |</allocations>
        |""".stripMargin)
    f.toFile.deleteOnExit()
    f.toString
  }
}
