package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 + hybrid RRF: the distributed scoring is checked against an
  * independent driver-side BM25 computed from the raw fixture text, and
  * the fusion against its rank-arithmetic definition.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def naiveBm25(terms: Seq[String]): Map[Long, Double] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum / n
    val df = terms.map(t => t -> docs.values.count(_.contains(t)).toDouble).toMap
    docs.map { case (id, words) =>
      val dl = words.size.toDouble
      val score = terms.map { t =>
        val tf = words.count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.sum
      id -> score
    }.filter(_._2 > 0)
  }

  test("bm25TopK matches a driver-side BM25 over the raw text") {
    val terms = Retrieval.DefaultTerms
    val expected = naiveBm25(terms).toSeq
      .map { case (id, s) => (id, math.rint(s * 10000) / 10000) }
      .sortBy { case (id, s) => (-s, id) }
      .take(15)
    val got = Retrieval.bm25TopK(spark, dir, terms, 15).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25"))).toSeq
    assert(got.map(_._1) === expected.map(_._1))
    got.zip(expected).foreach { case ((_, g), (_, e)) =>
      assert(math.abs(g - e) < 1e-9, s"score mismatch: $g vs $e")
    }
  }

  test("bm25: a document containing no query term never appears") {
    val hits = Retrieval.bm25TopK(spark, dir, Seq("vector"), 1000).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val without = spark.read.parquet(s"$dir/documents.parquet")
      .filter(!col("text").contains("vector"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits.intersect(without).isEmpty)
  }

  test("hybridRrf fuses both lists: rrf equals 1/(60+r_text) + 1/(60+r_vec)") {
    val rows = Retrieval.hybridRrf(spark, dir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val rt = Option(r.getAs[Integer]("r_text")).map(_.toDouble)
      val rv = Option(r.getAs[Integer]("r_vec")).map(_.toDouble)
      assert(rt.isDefined || rv.isDefined, "a fused row must come from a list")
      val want = rt.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - math.rint(want * 1e6) / 1e6) < 1e-12)
    }
    // fused order is non-increasing with doc_id tie-break
    val scores = rows.map(r => (r.getAs[Double]("rrf"), r.getAs[Long]("doc_id")))
    assert(scores === scores.sortBy { case (s, id) => (-s, id) })
  }

  test("a document ranked high by BOTH retrievers outscores single-list docs at the same rank") {
    val rows = Retrieval.hybridRrf(spark, dir).collect()
    val both = rows.filter(r => r.getAs[Integer]("r_text") != null && r.getAs[Integer]("r_vec") != null)
    val single = rows.filter(r => r.getAs[Integer]("r_text") == null || r.getAs[Integer]("r_vec") == null)
    if (both.nonEmpty && single.nonEmpty) {
      // any doc in both lists beats any doc that appears in exactly one
      // list at an equal-or-worse best rank
      val bestSingle = single.map(r => math.min(
        Option(r.getAs[Integer]("r_text")).map(_.toInt).getOrElse(Int.MaxValue),
        Option(r.getAs[Integer]("r_vec")).map(_.toInt).getOrElse(Int.MaxValue))).min
      both.foreach { b =>
        val worst = math.max(b.getAs[Integer]("r_text").toInt, b.getAs[Integer]("r_vec").toInt)
        if (worst <= bestSingle)
          assert(b.getAs[Double]("rrf") > single.map(_.getAs[Double]("rrf")).max)
      }
    }
  }
}
