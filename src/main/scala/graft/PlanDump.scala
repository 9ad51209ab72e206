package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round plan capture: writes each declared query's
  * `.explain("formatted")` output to <outDir>/<name>_<suffix>.txt so
  * plan-shape claims in OPTIMIZATION notes are checkable without
  * running Spark. Usage:
  *   scripts/run.sh graft.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        try {
          val df = fn(spark, sfDir)
          // GRAFT_PLANDUMP_EXECUTE=1 appends the POST-EXECUTION adaptive
          // plan (AQE's final plan, where ReusedExchange/AQEShuffleRead
          // and runtime join rewrites are visible) after the static one.
          val static = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val plan =
            if (sys.env.contains("GRAFT_PLANDUMP_EXECUTE")) {
              // collect(), not count(): count() builds a SEPARATE
              // QueryExecution, leaving this df's AdaptiveSparkPlan
              // unexecuted (isFinalPlan=false). Declared query results
              // are small (the oracle collects them too).
              df.collect()
              static + "\n\n== Final (adaptive, post-execution) Plan ==\n" +
                df.queryExecution.executedPlan.toString
            } else static
          Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
          println(s"[plandump] $name ok (${plan.length} chars)")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
