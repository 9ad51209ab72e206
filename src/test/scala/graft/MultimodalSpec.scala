package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing spec: schema, partition-wise decode determinism,
  * and batch-shape invariants of the binary-payload path.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("oracle precondition: fixture text is pure ASCII (bytes == characters)") {
    import org.apache.spark.sql.functions._
    // The m1/m2 DuckDB oracles chunk by character while the engine chunks
    // by UTF-8 byte — identical only for ASCII. Pin the invariant so a
    // non-ASCII fixture fails HERE, not as a silent oracle divergence.
    Seq("sf0.001", "sf0.01").foreach { sf =>
      val nonAscii = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .filter(octet_length(col("text")) =!= length(col("text"))).count()
      assert(nonAscii == 0L, s"$sf has $nonAscii non-ASCII documents")
    }
  }

  test("media relation has opaque binary payloads with typed metadata") {
    val media = Multimodal.mediaFromDocuments(spark, "/root/testdata/sf0.001")
    val schema = media.schema
    assert(schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    assert(schema("kind").dataType == org.apache.spark.sql.types.StringType)
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decode is deterministic and runs per partition without shuffle") {
    val media = Multimodal.mediaFromDocuments(spark, "/root/testdata/sf0.001")
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq, "features must not depend on partitioning")
    // no Exchange in the single-pass plan
    val plan = Multimodal.extractFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode plan must be shuffle-free:\n$plan")
  }

  test("feature arithmetic matches the payload bytes") {
    val media = Multimodal.mediaFromDocuments(spark, "/root/testdata/sf0.001")
    val row = media.orderBy("media_id").head()
    val payload = row.getAs[Array[Byte]]("payload")
    val f = Multimodal.StubDecoder.decode(
      Multimodal.MediaRow(row.getAs[Long]("media_id"), row.getAs[String]("kind"), payload))
    assert(f.n_bytes == payload.length)
    assert(f.width == (payload(0) & 0xff) + 1)
    assert(f.height == (payload(1) & 0xff) + 1)
  }

  test("frame sampling: 1-to-N fan-out over video payloads, shuffle-free, deterministic") {
    val media = Multimodal.mediaFromDocuments(spark, "/root/testdata/sf0.001")
    val frames = Multimodal.sampleFrames(media).collect()
    assert(frames.nonEmpty)
    // Only video payloads fan out; sampled indices are the every-4th frames.
    val videoIds = media.filter(org.apache.spark.sql.functions.col("kind") === "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(frames.map(_.media_id).toSet == videoIds)
    assert(frames.forall(_.frame_idx % 4 == 0))
    assert(frames.forall(f => f.f_bytes > 0 && f.f_bytes <= 64))
    // Fan-out count per payload: ceil(bytes/64) frames, every 4th kept.
    val byId = frames.groupBy(_.media_id).view.mapValues(_.length).toMap
    media.filter(org.apache.spark.sql.functions.col("kind") === "video").collect().foreach { r =>
      val n = (r.getAs[Array[Byte]]("payload").length + 63) / 64
      assert(byId(r.getAs[Long]("media_id")) == (n + 3) / 4)
    }
    // Generator runs data-local: no Exchange in the plan.
    val plan = Multimodal.sampleFrames(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame sampling must be shuffle-free:\n$plan")
  }
}
