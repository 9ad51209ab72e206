package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Losslessness proof-by-test for the PPJoin candidate pruning in
  * `Dedup.ngramJaccardDedup`: the prefix index + length filter +
  * position filter must produce EXACTLY the pairs an unfiltered
  * all-pairs Jaccard join over the same df-capped shingle universe
  * produces. The filters only ever drop non-qualifying candidate
  * matches — a missing qualifying pair here means one of the bounds
  * (max ≤ 2·min; min(na−pa, nb−pb) ≥ ⌈(na+nb)/3⌉) is wrong.
  */
class PrefixFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("prefix+length+position filtered pairs == unfiltered all-pairs Jaccard") {
    val mine = graft.operators.Dedup.ngramJaccardDedup(spark, dir)

    // Brute force over the identical capped universe: every pair, exact
    // set intersection, same integer basis-point Jaccard.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = docs.select(col("doc_id"),
      graft.functions.Kernels.shingles3(col("text")).as("s"))
    val post = sh.select(col("doc_id"), explode(col("s")).as("sg"))
    val dfreq = post.groupBy("sg").agg(count(lit(1)).as("c"))
    val cap = post.join(dfreq, "sg").filter(col("c") <= 200)
      .groupBy("doc_id").agg(collect_set(col("sg")).as("s2"))
    val brute = cap.select(col("doc_id").as("doc_a"), col("s2").as("sa"))
      .crossJoin(cap.select(col("doc_id").as("doc_b"), col("s2").as("sb")))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("u", size(col("sa")) + size(col("sb")) - col("i"))
      .filter(col("i") * 2 >= col("u"))
      .withColumn("jaccard_bp", expr("int((20000 * i + u) div (2 * u))"))
      .select("doc_a", "doc_b", "jaccard_bp")

    val missing = brute.exceptAll(mine).count()
    val extra = mine.exceptAll(brute).count()
    assert(missing == 0, s"filters dropped $missing qualifying pairs")
    assert(extra == 0, s"verification admitted $extra non-qualifying pairs")
    assert(mine.count() == mine.distinct().count(), "duplicate output rows")
    assert(mine.count() > 0, "fixture should contain planted near-dups")
  }
}
