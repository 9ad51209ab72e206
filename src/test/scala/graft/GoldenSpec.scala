package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.2 items 4-5: checked-in golden top-k lists (computed from
  * the DuckDB oracle on the seeded sf0.001 fixtures — engine-independent
  * truth) and the funnel's recall@10 against the exact float-cosine scan,
  * mirroring the reference's published quality-retention claims
  * (~90% binary-only, README.md:134).
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** (queryVecId → expected funnel top-10 doc ids, in rank order). */
  private val golden: Map[Long, Seq[Long]] = Map(
    0L -> Seq(0L, 17L, 225L, 12L, 483L, 260L, 347L, 299L, 232L, 497L),
    7L -> Seq(7L, 382L, 466L, 209L, 329L, 220L, 18L, 326L, 249L, 340L),
    42L -> Seq(42L, 27L, 324L, 463L, 329L, 200L, 262L, 478L, 361L, 461L))

  test("funnel top-10 matches the checked-in golden lists (queries 0, 7, 42)") {
    golden.foreach { case (q, expected) =>
      val got = graft.operators.Search.funnel(spark, dir, queryVecId = q)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(got == expected, s"query $q")
    }
  }

  test("every query's own vector ranks first with hamming 0") {
    golden.keys.foreach { q =>
      val top = graft.operators.Search.funnel(spark, dir, queryVecId = q).head()
      assert(top.getAs[Long]("vec_id") == q)
      assert(top.getAs[Int]("score_hamming") == 0)
    }
  }

  test("knnPerLabel (heap aggregate) equals the window-rank definition") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // The bounded-heap per-label top-k must be row-identical to the
    // definitional row_number() form it replaced (the window is fine at
    // fixture scale; it's the 100× plan that was wrong).
    val got = graft.operators.Search.knnPerLabel(spark, dir)
      .collect().map(_.toSeq).toSeq
    val emb = graft.operators.Search.packedEmb(spark, dir)
    val q = typedlit(graft.operators.Search.queryVector(spark, dir, 0L))
    val w = Window.partitionBy(col("label")).orderBy(col("score").desc, col("vec_id").asc)
    val want = emb
      .withColumn("score", round(graft.functions.Kernels.cosine(
        col("embedding").cast("array<double>"), q), 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .orderBy(col("label").asc, col("rnk").asc)
      .select("label", "rnk", "vec_id", "score")
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("funnel recall@10 vs exact float cosine >= 0.7 (reference claims ~90%)") {
    val recalls = golden.keys.toSeq.map { q =>
      val funnel = graft.operators.Search.funnel(spark, dir, queryVecId = q)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val exact = graft.operators.Search.knnCosine(spark, dir, queryVecId = q)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      funnel.intersect(exact).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"recall@10 per query: ${recalls.mkString(", ")} (mean $mean%.2f)")
    assert(mean >= 0.7, s"mean recall $mean below floor")
  }
}
