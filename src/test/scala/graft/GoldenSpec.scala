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
