package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted-join correctness: result equals the plain join, and the join
  * key space is widened by the salt.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

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
}
