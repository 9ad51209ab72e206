package graft

import graft.db.{IndexStrategies, VectorDB}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cold serve-build variance probe (r14 verdict item 6): same-code cold
  * builds at 4M swung 188–300 s across rounds, suspected to be
  * post-ingest writeback state rather than the plan. The probe splits
  * ingest from build so the SAME ingested folder can be cold-built
  * repeatedly from fresh JVMs, with the writeback-settle protocol
  * (scripts/settle.sh) between rows and `_nav`/`_blocks` swept by the
  * caller so every build pays the full codes⋈docs + graph cost:
  *
  *   ingest <dir> <n> <dim> <nBlocks>   — create + chunked ingest
  *   build  <dir> <nBlocks>             — timed cold enableServing, one
  *                                        JSON row on stdout, exit
  *
  * Three consecutive `build` rows within ~1.3× close the item as
  * protocol (writeback), a wider band points at the join/assembly
  * phase. scripts/coldbuild.sh drives the sequence.
  */
object ColdBuildProbe {

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val clusters = 100
    val intrinsicDim = 8
    val sigma = 0.5
    val dim = if (args.length > 3) args(3).toInt else 1024
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-coldbuildprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", Graft.fairDefaultPoolFile)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    IndexStrategies.register(new IndexStrategies.Nsw())

    class SynthEmbedder(val dim: Int) extends graft.db.Embedder {
      override def embed(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
        val gen = RecallBench.pointGen(dim, clusters, intrinsicDim, sigma)
        val genUdf = udf { id: Long => gen(id)._1 }
        genUdf(text.cast("long")).cast("array<float>")
      }
    }

    mode match {
      case "ingest" =>
        val n = args(2).toLong
        val nBlocks = if (args.length > 4) args(4).toInt else 4
        val db = VectorDB.openOrCreate(spark, dir,
          model = s"graft-synth-$dim", dim = dim, index = VectorDB.IndexNsw)
        def docsRange(lo: Long, hi: Long) =
          spark.range(lo, hi).select(col("id").as("doc_id"),
            col("id").cast("string").as("text")).repartition(nBlocks)
        val chunk = 2000000L // caps the per-batch embed spill (GraphBench)
        val t0 = System.nanoTime()
        var lo = 0L
        while (lo < n) {
          db.addDocuments(docsRange(lo, math.min(lo + chunk, n)),
            new SynthEmbedder(dim))
          lo += chunk
        }
        println(f"""{"mode":"ingest","n":$n,"ingest_s":${(System.nanoTime() - t0) / 1e9}%.1f}""")
      case "build" =>
        val nBlocks = if (args.length > 2) args(2).toInt else 4
        // persistence writes off: each probe row must pay the identical
        // full cold build, and a persisted _blocks dir would warm the
        // next JVM's row
        val db = VectorDB.openOrCreate(spark, dir, dim = dim)
          .blockPersistence(Long.MaxValue)
        val load0 = java.lang.management.ManagementFactory
          .getOperatingSystemMXBean.getSystemLoadAverage
        val t0 = System.nanoTime()
        db.enableServing(blocks = nBlocks)
        val buildS = (System.nanoTime() - t0) / 1e9
        db.disableServing()
        println(f"""{"mode":"cold_build","build_s":$buildS%.1f,""" +
          f""""loadavg_start":$load0%.2f,"loadavg_end":${java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage}%.2f}""")
      case other =>
        throw new IllegalArgumentException(s"unknown mode: $other")
    }
    spark.stop()
  }
}
