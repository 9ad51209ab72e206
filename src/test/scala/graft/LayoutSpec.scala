package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout specs backing the at-scale claims in ARCHITECTURE.md:
  * partition pruning for IVF-cell layouts, and bucketed co-located joins
  * that eliminate the join shuffle entirely.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftlayout").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("label-partitioned codes: a cell probe prunes partitions at the source") {
    val dir = tmpDir()
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .write.partitionBy("label").mode("overwrite").parquet(s"$dir/by_label")

    val probed = spark.read.parquet(s"$dir/by_label")
      .filter(col("label").isin(3, 7))
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [label"), s"no partition filter:\n$scan")

    // Prune is real: only the probed cells' files are read.
    val allFiles = probed.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(allFiles.nonEmpty)
    assert(allFiles.forall(f => f.contains("label=3") || f.contains("label=7")),
      s"read beyond probed partitions: ${allFiles.mkString("\n")}")
  }

  test("bucketed tables co-locate the join: no shuffle before the sort-merge join") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    // Force SMJ (no broadcast) to expose the exchange question.
    val smj = spark.table("li_bucketed").hint("merge")
      .join(spark.table("ord_bucketed").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = smj.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    // And it computes the right thing.
    val n = smj.count()
    val expected = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .join(spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(n == expected)
  }
}
