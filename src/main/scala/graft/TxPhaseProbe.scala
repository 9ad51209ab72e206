package graft

import org.apache.spark.sql.SparkSession

/** Throwaway phase profiler for the x-family gate queries: runs x1/x2
  * twice (first = memo build + warmup, second = steady) with per-phase
  * walls printed by the operator when SPARK_GRAFT_TX_PHASES=1.
  */
object TxPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-txphase")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Kernels.install(spark)
    Seq("x1", "x2").foreach { q =>
      (0 until 3).foreach { rep =>
        val t0 = System.nanoTime()
        val df = if (q == "x1") operators.Transactional.pinnedCompaction(spark, dir)
                 else operators.Transactional.incrementalServing(spark, dir)
        df.collect()
        println(f"[txphase] $q rep $rep total ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      }
    }
    spark.stop()
  }
}
