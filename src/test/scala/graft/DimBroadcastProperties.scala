package graft

import graft.operators.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the size-gated dimension broadcast
  * ([[Relational.dimBroadcast]]). PlanSpec pins the gate at the fixture
  * tables' exact estimate boundary; these cover SYNTHETIC relations of
  * random row count and payload width — the shape that actually grows
  * with SF — so the gate's contract is pinned independent of any one
  * table:
  *  - the hint appears iff Catalyst's own size estimate fits the budget
  *    (exactly at the estimate: hint; one byte under: none), for any
  *    relation size;
  *  - Catalyst's estimate is monotone in both row count and row width
  *    over these shapes — the property that makes a byte budget a
  *    meaningful proxy for "small enough to broadcast";
  *  - the gate changes only join STRATEGY, never the answer: joining
  *    through `dimBroadcast` under a zero budget (shuffle regime) and an
  *    unbounded budget (broadcast regime) yields the identical relation,
  *    with the expected rows computed by a pure-Scala oracle.
  */
object DimBroadcastProperties extends Properties("graft.dimBroadcast") {

  private lazy val spark = TestSpark.spark

  // each case runs driver-side plan analysis plus (for the join law) two
  // tiny Spark jobs: keep the case count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  /** Synthetic dimension of `rows` rows with a `width`-char payload —
    * size is a pure function of the two generated knobs.
    */
  private def dim(rows: Long, width: Int): DataFrame =
    spark.range(rows).select(col("id").as("k"),
      lpad(conv(col("id"), 10, 16), width, "x").as("pad"))

  private def estimate(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  private def hinted(df: DataFrame): Boolean =
    df.queryExecution.analyzed.toString.contains("ResolvedHint")

  private val genShape = for {
    rows <- Gen.chooseNum(1L, 5000L)
    width <- Gen.chooseNum(1, 64)
  } yield (rows, width)

  property("hint iff Catalyst's estimate fits the budget, at the exact boundary") =
    forAll(genShape) { case (rows, width) =>
      val d = dim(rows, width)
      val est = estimate(d)
      est > 0 &&
        hinted(Relational.dimBroadcast(d, est.toLong)) &&
        !hinted(Relational.dimBroadcast(d, est.toLong - 1)) &&
        hinted(Relational.dimBroadcast(d, Long.MaxValue)) &&
        !hinted(Relational.dimBroadcast(d, 0L))
    }

  property("the size estimate is monotone in rows and width") =
    forAll(genShape) { case (rows, width) =>
      val base = estimate(dim(rows, width))
      base <= estimate(dim(rows + 1000, width)) &&
        base <= estimate(dim(rows, width + 8))
    }

  private val genJoinCase = for {
    nDim <- Gen.chooseNum(1L, 40L)
    width <- Gen.chooseNum(1, 16)
    facts <- Gen.listOfN(60, Gen.chooseNum(0L, 60L))
  } yield (nDim, width, facts.zipWithIndex.map { case (k, i) => (i.toLong, k) })

  property("gate regimes (broadcast vs shuffle) produce the identical join") =
    forAll(genJoinCase) { case (nDim, width, facts) =>
      import spark.implicits._
      val d = dim(nDim, width)
      // mirror of lpad(conv(k, 10, 16), width, "x"): uppercase hex,
      // left-padded with 'x' to `width`, TRUNCATED to the width-prefix
      // when the hex digits overflow it (lpad's documented behavior)
      val padOf = (0L until nDim).map { k =>
        val hex = java.lang.Long.toHexString(k).toUpperCase
        k -> (if (hex.length >= width) hex.take(width)
              else "x" * (width - hex.length) + hex)
      }.toMap
      val f = facts.toDF("fid", "k")
      def run(budget: Long): Seq[(Long, Long, String)] =
        f.join(Relational.dimBroadcast(d, budget), Seq("k"))
          .select("fid", "k", "pad").as[(Long, Long, String)]
          .collect().toSeq.sorted
      val expected = facts.collect {
        case (fid, k) if k < nDim => (fid, k, padOf(k))
      }.sorted
      val bc = run(Long.MaxValue)
      val sh = run(0L)
      bc == sh && bc == expected
    }
}
