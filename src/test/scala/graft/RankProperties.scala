package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck law for `Dedup.rankWithinBuckets` (r15 verdict #6: the
  * carry fold's `buckets==1 && continues` accumulation is subtle, and
  * the fixture specs cover only the constant-key flood and one
  * interleave): over a RANDOM key multiset and a RANDOM shuffle
  * partition count, the distributed two-pass rank must equal the
  * `row_number() OVER (PARTITION BY cluster, s16 ORDER BY sk, vec_id)`
  * twin — computed here as a pure-Scala oracle, independent of Spark's
  * window machinery. The generator's shapes deliberately include:
  *  - more partitions than rows (EMPTY partitions in the carry fold);
  *  - a single constant bucket across many partitions (one bucket
  *    straddling 3+ boundaries — consecutive `buckets==1` carries must
  *    ACCUMULATE, not reset);
  *  - few buckets × many rows (straddles at both ends of partitions);
  *  - fully random mixes.
  */
object RankProperties extends Properties("graft.rankWithinBuckets") {

  private lazy val spark = TestSpark.spark

  // Each case runs 2 Spark jobs (bounds collect + result collect) plus a
  // range-bounds sample: keep the case count bounded.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  /** (partitions, rows as (vec_id, cluster, s16, sk)) — vec_id unique. */
  private val genCase: Gen[(Int, List[(Long, Int, Long, Long)])] = for {
    parts <- Gen.chooseNum(1, 12)
    nRows <- Gen.frequency(
      2 -> Gen.chooseNum(0, 6),    // fewer rows than partitions
      5 -> Gen.chooseNum(40, 300)) // buckets straddle several partitions
    constant <- Gen.frequency(3 -> false, 1 -> true) // the flood shape
    keys <- Gen.listOfN(nRows,
      if (constant) Gen.const((0, 0L, 0L))
      else for {
        cluster <- Gen.chooseNum(0, 2)
        s16 <- Gen.chooseNum(0L, 2L)
        sk <- Gen.chooseNum(0L, 1L)
      } yield (cluster, s16, sk))
    // non-contiguous ids so range boundaries don't align with insertion
    ids <- Gen.const(keys.indices.map(i => i.toLong * 13 % 10007 * 10007 + i))
  } yield (parts, keys.zip(ids).map { case ((c, s, k), id) => (id, c, s, k) })

  property("distributed rank == row_number window twin, any multiset x partition count") =
    forAll(genCase) { case (parts, rows) =>
      import spark.implicits._
      val prior = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        val df = rows.toDF("vec_id", "cluster", "s16", "sk")
        val got = graft.operators.Dedup.rankWithinBuckets(df)
          .select("vec_id", "rnk").as[(Long, Long)].collect().toMap
        val expected = rows.groupBy(r => (r._2, r._3)).values.flatMap { bucket =>
          bucket.sortBy(r => (r._4, r._1)).zipWithIndex
            .map { case (r, i) => r._1 -> (i + 1L) }
        }.toMap
        got == expected
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prior)
        // release this case's ranked persist + offsets broadcast — also
        // exercises the lifecycle hook 30 times per run
        graft.operators.Dedup.clearCaches(spark)
      }
    }
}
