package graft

import graft.db.VectorDB
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The heap aggregates and every search path must accept arbitrary
  * k/oversample (the reference accepts any, `BinaryVectorDB.py:174`) —
  * round 1 hard-required k=10 / k·oversample=100 at registration.
  */
class ArbitraryKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("multiQueryHamming at k=25 equals the single-query top-25 scan per query") {
    val qids = Seq(0L, 7L, 42L)
    val batched = graft.operators.Search.multiQueryHamming(spark, dir, qids, k = 25)
      .collect().groupBy(_.getAs[Long]("qid"))
    qids.foreach { q =>
      val got = batched(q).sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("score_hamming"))).toSeq
      val single = graft.operators.Search.hammingTopK(spark, dir, q, topK = 25)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("score_hamming"))).toSeq
      assert(got.length == 25 && got == single, s"query $q")
    }
  }

  test("multiQueryFunnel at k=7, oversample 6/2 matches the single-query funnel") {
    val qids = Seq(0L, 42L)
    val batched = graft.operators.Search.multiQueryFunnel(
        spark, dir, qids, k = 7, binaryOversample = 6, int8Oversample = 2)
      .collect().groupBy(_.getAs[Long]("qid"))
    qids.foreach { q =>
      val got = batched(q).sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq
      val single = graft.operators.Search.funnel(
          spark, dir, q, k = 7, binaryOversample = 6, int8Oversample = 2)
        .collect().map(_.getAs[Long]("vec_id")).toSeq
      assert(got.length == 7 && got == single, s"query $q")
    }
  }

  test("VectorDB.searchMany at k=25, binaryOversample=5 equals per-query searchVector") {
    val tmp = java.nio.file.Files.createTempDirectory("graftk").toFile
    tmp.delete()
    val db = VectorDB.openOrCreate(spark, tmp.getAbsolutePath)
    db.addDocuments((1L to 150L).map(i =>
      (i, s"word${i % 19} word${i % 11} word${i % 29} word${i % 3}")).toDF("doc_id", "text"))

    val emb = new graft.db.HashingEmbedder()
    val queries = Seq("word1 word8", "word17 word2 word5").zipWithIndex.map {
      case (t, i) =>
        (i.toLong, spark.range(1).select(emb.embed(lit(t)).cast("array<double>"))
          .head().getSeq[Double](0))
    }
    val many = db.searchMany(queries, k = 25, binaryOversample = 5, int8Oversample = 2)
      .collect().groupBy(_.getAs[Long]("qid"))
    queries.foreach { case (qid, qv) =>
      val batched = many(qid).sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score_cossim"))).toSeq
      val single = db.searchVector(qv, k = 25, binaryOversample = 5, int8Oversample = 2)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score_cossim"))).toSeq
      assert(batched.length == 25 && batched == single, s"query $qid")
    }
  }
}
