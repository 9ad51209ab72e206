package graft

import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MLlib similarity specs: k-means IVF sanity/recall, and MLlib
  * MinHashLSH `approxSimilarityJoin` cross-checked against the exact
  * n-gram-Jaccard dedup pairs.
  */
class MLSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("kmeans IVF: query's own vector is found, scores sorted, probes restrict cells") {
    val res = graft.operators.MLSimilarity.kmeansIvfKnn(spark, dir, queryVecId = 0)
      .collect()
    assert(res.nonEmpty)
    assert(res.head.getAs[Long]("vec_id") == 0L, "self should rank first")
    val cells = res.map(_.getAs[Int]("cell")).toSet
    assert(cells.size <= 2, s"nprobe=2 must restrict to <=2 cells, got $cells")
    val scores = res.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("index layouts resolve under the session warehouse via the Hadoop FS API") {
    val d = graft.db.IndexStore.dirFor(spark, "spec", "/some/source")
    assert(d.contains("graft-indexes/spec-"))
    // fully qualified through FileSystem.makeQualified — a real cluster
    // gets hdfs:///s3a:// here, never a driver-local java.nio path
    assert(new java.net.URI(d).getScheme == "file")
    assert(d == graft.db.IndexStore.dirFor(spark, "spec", "/some/source"),
      "same (kind, source) must be deterministic")
    assert(d != graft.db.IndexStore.dirFor(spark, "spec", "/other/source"))
  }

  test("MLlib MinHashLSH candidates cover the exact near-dup pairs (recall >= 0.8)") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val shingled = docs.select(col("doc_id"),
      graft.functions.Kernels.shingles3(col("text")).as("s"))

    val cv = new CountVectorizer().setInputCol("s").setOutputCol("features")
      .setBinary(true).fit(shingled)
    val vectorized = cv.transform(shingled)

    val lsh = new MinHashLSH().setNumHashTables(8).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes").fit(vectorized)
    val pairs = lsh.approxSimilarityJoin(vectorized, vectorized, 0.5, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = graft.operators.Dedup.ngramJaccardDedup(spark, dir)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val recall = exact.intersect(pairs).size.toDouble / exact.size
    info(f"MLlib LSH recall over ${exact.size} exact pairs: $recall%.2f")
    assert(recall >= 0.8)
  }
}
