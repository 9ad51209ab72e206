package graft

import graft.db.VectorDB
import graft.streaming.StreamingIngest
import org.scalatest.funsuite.AnyFunSuite

/** E8 specs: batch/stream equivalence of the windowed aggregation, and
  * foreachBatch index upsert into a VectorDB.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming hourly counts equal the batch aggregation (sf0.001 replay)") {
    val dir = "/root/testdata/sf0.001"
    val q = StreamingIngest.runHourlyToMemory(spark, dir, "hourly_stream")
    try {
      val streamed = spark.table("hourly_stream")
        .orderBy("hour_epoch", "event_type")
        .collect().map(_.toSeq).toSeq
      val batch = graft.operators.Events.hourly(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("foreachBatch streaming upsert maintains the vector index") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdbs").toFile
    tmp.delete()
    val db = VectorDB.openOrCreate(spark, tmp.getAbsolutePath)

    // Stream the documents fixture in as (doc_id, text) micro-batches.
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val docsStream = spark.readStream.schema(schema)
      .parquet(s"$dir/documents.*")
      .select($"doc_id", $"text")
    val q = StreamingIngest.indexUpsert(db, docsStream)
    q.stop()

    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(db.count() == n)
    // and the index is queryable
    assert(db.search("the fast key order sort table", k = 3).count() == 3)
  }
}
