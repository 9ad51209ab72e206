package graft

import graft.functions.Kernels
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ungrouped `graft_topk_cand` fast path ([[graft.plans.TopKCandStrategy]]):
  * the funnel's Phase-I reduction plans as the primitive-heap physical
  * operator pair instead of ObjectHashAggregate, with identical results
  * — pinned against an independent sort-limit oracle over the same
  * data. Shapes the strategy must NOT claim (grouped, non-attribute
  * children) keep Spark's own aggregate exec.
  */
class TopKCandExecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def topkDf(df: org.apache.spark.sql.DataFrame, k: Int) = {
    Kernels.install(spark)
    df.select(Kernels.hammingTopKCand(
        col("h"), col("vec_id"), col("code"), col("embedding"), k).as("topk"))
      .select(explode(col("topk")).as("c"))
      .select(col("c.vec_id"), col("c.score"), col("c.code"), col("c.embedding"))
  }

  private def fixture(n: Int) = (1 to n).map { i =>
    (i.toLong, i % 37, Seq((i * 2654435761L) ^ i, i.toLong << 7),
      Seq(i.toFloat, (i % 5).toFloat))
  }.toDF("vec_id", "h", "code", "embedding")

  test("fast path engages on the ungrouped shape and matches the sort-limit oracle") {
    val df = fixture(5000).repartition(7)
    val got = topkDf(df, 25)
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("TopKCandFinal") && p.contains("TopKCandPartial"),
      s"custom exec did not engage:\n$p")
    assert(!p.contains("ObjectHashAggregate"), s"fell back to object agg:\n$p")

    val expected = fixture(5000)
      .orderBy(col("h").asc, col("vec_id").asc).limit(25)
    val g = got.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getSeq[Long](2), r.getSeq[Float](3))).toSeq
    val e = expected.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getSeq[Long](2), r.getSeq[Float](3))).toSeq
    assert(g == e)
  }

  test("k larger than the row count returns everything, ranked") {
    val got = topkDf(fixture(10).repartition(4), 100)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == (1L to 10L))
  }

  test("empty input yields zero exploded rows (one empty heap row)") {
    assert(topkDf(fixture(10).filter(col("h") < -1), 5).count() == 0)
  }

  test("null scores and ids are skipped, not crashed on") {
    val df = fixture(100)
      .withColumn("h", when(col("vec_id") % 3 === 0, col("h")))
    val got = topkDf(df, 10).select("vec_id").as[Long].collect().toSet
    assert(got.nonEmpty && got.forall(_ % 3 == 0))
  }

  test("grouped top-k keeps Spark's aggregate exec (strategy must not claim it)") {
    Kernels.install(spark)
    val grouped = fixture(1000)
      .groupBy(col("vec_id") % 4)
      .agg(Kernels.hammingTopKCand(
        col("h"), col("vec_id"), col("code"), col("embedding"), 5).as("topk"))
    val p = grouped.queryExecution.executedPlan.toString
    assert(!p.contains("TopKCandFinal"), s"strategy claimed a grouped shape:\n$p")
    assert(grouped.count() == 4)
  }

  test("the registered funnel query runs through the exec with oracle-equal output") {
    val dir = "/root/testdata/sf0.001"
    val funnel = graft.operators.Search.funnel(spark, dir)
    val p = funnel.queryExecution.executedPlan.toString
    assert(p.contains("TopKCandFinal"), s"funnel lost the fast path:\n$p")
    // and still no range-sort degeneration in any config shape
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(funnel.count() > 0)
  }
}
