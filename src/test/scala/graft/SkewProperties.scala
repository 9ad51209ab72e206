package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the salted join (SkewSpec pins one fixture; these
  * cover random relations and salt factors):
  *  - `saltedJoin(big, small, key, c, n)` equals the plain inner join as
  *    a MULTISET (duplicate keys on either side multiply identically),
  *    for any salt factor — the expected relation is computed in pure
  *    Scala, an oracle independent of Spark's join machinery;
  *  - the salt assignment is a pure function of the salt column:
  *    identical across re-evaluation AND across physical partitioning
  *    (a `rand()` salt breaks exactly this — straggler-retry replays
  *    would re-draw it).
  */
object SkewProperties extends Properties("graft.skew") {

  private lazy val spark = TestSpark.spark

  // Spark jobs per case: keep the case count bounded.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val genCase = for {
    saltFactor <- Gen.chooseNum(1, 8)
    nKeys <- Gen.chooseNum(1L, 12L)
    nBig <- Gen.chooseNum(0, 120)
    bigKeys <- Gen.listOfN(nBig, Gen.chooseNum(0L, nKeys * 2))
    // small side may repeat keys: multiplicity must survive salting
    smallKeys <- Gen.listOfN(8, Gen.chooseNum(0L, nKeys))
  } yield (saltFactor, bigKeys.zipWithIndex.map { case (k, i) => (i.toLong, k) },
    smallKeys.zipWithIndex.map { case (k, i) => (k, s"v${k}_$i") })

  property("saltedJoin == plain inner join as a multiset, for any salt factor") =
    forAll(genCase) { case (sf, big, small) =>
      import spark.implicits._
      val gotRows = Skew.saltedJoin(big.toDF("id", "key"), small.toDF("key", "v"),
          "key", saltCol = col("id"), saltFactor = sf)
        .select("key", "id", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted
      val expected = (for {
        (id, k) <- big
        (k2, v) <- small if k2 == k
      } yield (k, id, v)).sorted
      gotRows == expected
    }

  property("salt assignment is deterministic and partition-independent") =
    forAll(Gen.chooseNum(1, 8), Gen.chooseNum(1, 80)) { (sf, n) =>
      import spark.implicits._
      val rows = (0 until n).map(i => (i.toLong, (i * 7L) % 13L))
      def salts(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
        df.withColumn("__salt", Skew.saltExpr(col("id"), sf))
          .select("id", "__salt").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val base = salts(rows.toDF("id", "key"))
      val repart = salts(rows.toDF("id", "key").repartition(5))
      base == repart && base.values.forall(s => s >= 0 && s < sf)
    }
}
