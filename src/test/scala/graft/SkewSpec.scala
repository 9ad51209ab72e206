package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted-join correctness: result equals the plain join, and the join
  * key space is widened by the salt.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salting spreads a hot join key across partitions (quantified)") {
    import spark.implicits._
    // 95% of fact rows share one key — the hash-partitioned join lands
    // them all in a single task without mitigation.
    val fact = spark.range(100000).select(col("id"),
      when(pmod(col("id"), lit(20)) < 19, 0L).otherwise(pmod(col("id"), lit(97))).as("key"))
    val dim = spark.range(97).select(col("id").as("key"),
      concat(lit("v"), col("id")).as("v"))

    def maxPartitionShare(df: org.apache.spark.sql.DataFrame): Double = {
      val counts = df.withColumn("pid", spark_partition_id())
        .groupBy("pid").count().collect().map(_.getLong(1))
      counts.max.toDouble / counts.sum
    }

    val plain = fact.hint("merge").join(dim.hint("merge"), "key")
    val salted = Skew.saltedJoin(fact, dim, "key", saltCol = col("id"), saltFactor = 8)

    val plainShare = maxPartitionShare(plain)
    val saltedShare = maxPartitionShare(salted)
    info(f"hot-partition share: plain $plainShare%.2f -> salted $saltedShare%.2f")
    assert(plainShare > 0.9, s"fixture should be skewed, got $plainShare")
    assert(saltedShare < plainShare / 3,
      s"salting should spread the hot key: $plainShare -> $saltedShare")
    assert(plain.count() == salted.count())
  }

  test("salted join equals plain join on a skewed fact table") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val supp = spark.read.parquet(s"$dir/supplier.parquet")
      .select("s_suppkey", "s_name")
    val big = li.withColumnRenamed("l_suppkey", "s_suppkey")

    val plain = big.join(supp, "s_suppkey")
      .groupBy("s_name").agg(round(sum("l_quantity"), 2).as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val salted = Skew.saltedJoin(big, supp, "s_suppkey",
        saltCol = col("l_orderkey"), saltFactor = 8)
      .groupBy("s_name").agg(round(sum("l_quantity"), 2).as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap

    assert(plain == salted)
    assert(plain.nonEmpty)
  }

  test("q_salted_join (the registered query) equals the unsalted aggregation") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.Relational.qSaltedJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_partkey").as("partkey"),
        expr("cast(round(l_extendedprice * 100) as bigint) * " +
          "(100 - cast(round(l_discount * 100) as bigint))").as("rev_c4"))
    val pt = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey").as("partkey"), col("p_brand"))
    val plain = li.join(pt, "partkey")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"), sum("rev_c4").as("rev_c4"))
      .select(col("p_brand"), col("n_items"),
        expr("(rev_c4 + 50) div 100").as("revenue_c"))
      .orderBy("p_brand").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == plain)
    assert(got.nonEmpty)
  }

  test("AQE splits the hot partition automatically (skew=true in the adaptive plan)") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      // Fixture-scale skew is kilobytes, not the 256MB production default —
      // scale the thresholds down so the splitter can see it.
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val fact = spark.range(200000).select(col("id"),
        when(pmod(col("id"), lit(20)) < 19, 0L).otherwise(pmod(col("id"), lit(97))).as("key"))
      val dim = spark.range(97).select(col("id").as("key"),
        concat(lit("v"), col("id")).as("v"))
      val joined = fact.join(dim, "key")
      // Execute THIS frame's own QueryExecution (a count() plans a
      // different query and leaves joined's adaptive plan unfinalized).
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew split missing:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }
}
