package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes EVERY registered driver query once at sf0.001.
  *
  * This is deliberately shallow (the DuckDB oracle gate checks values);
  * its job is to catch whole-query breakage inside `sbt test` — analysis
  * errors, fixture schema drift (e.g. the events `ts` column changing
  * physical parquet type between testdata generations), or a registry
  * entry wired to a renamed operator. Without it a query can compile,
  * pass every unit spec, and still throw at Verify/Bench time.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every oracleSql key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("every registered query has an oracle (driver gate counts only oracled queries)") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without DuckDB oracles: $unoracled")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, dir)
      assert(df.count() >= 0) // force full execution; throws on any error
    }
  }
}
