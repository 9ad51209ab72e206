package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video handled as opaque
  * `binary` payloads with typed metadata, processed partition-wise.
  *
  * The Spark-side architecture is real and tested — schema, partition
  * batching, typed decode boundary — while the actual codec call is a
  * deliberate stub ([[StubDecoder]]): media libraries are not in this
  * environment, and the decode seam is exactly where a production
  * deployment plugs in JNI/FFmpeg (Scala) or `mapInPandas` + PIL/librosa
  * (Python). Swapping the decoder never changes the plan shape: payloads
  * stay opaque bytes end to end, decode runs data-local per partition,
  * and extracted features are ordinary columns.
  *
  * Scale notes: payload columns dominate row size, so the media relation
  * is stored separately from metadata (same two-tier idea as the
  * VectorDB codes/docs split); feature extraction is a pure per-partition
  * map — no shuffle; `spark.sql.files.maxPartitionBytes` bounds decode
  * batch memory.
  */
object Multimodal {

  /** One media row: id, kind tag, opaque payload, source length. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (the decode output contract). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           width: Int, height: Int, est_frames: Int,
                           checksum: Long)

  /** Decoder seam. Implementations must be deterministic per payload. */
  trait Decoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** Deterministic stand-in for the real codec: "parses" a fake 4-byte
    * header as width/height and derives frame count / checksum from the
    * bytes. A real implementation would call the codec library here —
    * same signature, same partition-wise execution.
    */
  object StubDecoder extends Decoder {
    override def decode(r: MediaRow): MediaFeatures = {
      val b = r.payload
      val w = if (b.length > 0) (b(0) & 0xff) + 1 else 1
      val h = if (b.length > 1) (b(1) & 0xff) + 1 else 1
      var sum = 0L
      var i = 0
      while (i < b.length) { sum = (sum + (b(i) & 0xff)) % 1000003L; i += 1 }
      MediaFeatures(r.media_id, r.kind, b.length, w, h, b.length / 256 + 1, sum)
    }
  }

  /** Build a media relation from the documents fixture: the text bytes
    * become the opaque payload (deterministic, so oracle-checkable), the
    * kind tag cycles by id.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        element_at(typedlit(Seq("image", "audio", "video")),
          (col("doc_id") % 3).cast("int") + 1).as("kind"),
        col("text").cast("binary").as("payload"))

  /** Partition-wise decode: the typed `mapPartitions` boundary a real
    * codec would run behind (JVM-side analogue of `mapInPandas`).
    */
  def extractFeatures(media: DataFrame, decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(decoder.decode))
  }

  /** The oracle-checked query: features of the documents-derived media
    * relation. Every output is deterministic arithmetic on the payload
    * bytes, so DuckDB can mirror it from the text column directly.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaFromDocuments(spark, dir))
      .toDF()
      .orderBy("media_id")
      .select(col("media_id"), col("kind"), col("n_bytes"), col("width"),
        col("height"), col("est_frames"), col("checksum"))

  /** One sampled frame (the 1→N decode output contract). */
  case class Frame(media_id: Long, frame_idx: Int, f_bytes: Int, f_checksum: Long)

  /** Frame sampling — the 1→N multimodal shape (one video payload yields
    * many frames): a typed `flatMap` over the partition, emitting every
    * `every`-th fixed-size frame of each video payload with its checksum.
    * In the stub model a "frame" is a `frameBytes` chunk; a real codec
    * yields decoded frames at the same seam with the same fan-out
    * semantics. No shuffle — the generator runs data-local, and output
    * size is payload/(frameBytes·every), bounded per partition by
    * `maxPartitionBytes`.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
                   every: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].filter(_.kind == "video").flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, i) if i % every == 0 =>
          var sum = 0L
          chunk.foreach(b => sum = (sum + (b & 0xff)) % 1000003L)
          Frame(r.media_id, i, chunk.length, sum)
      }
    }
  }

  /** The oracle-checked frame-sampling query over the documents-derived
    * media relation (video payloads only).
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaFromDocuments(spark, dir))
      .toDF()
      .orderBy("media_id", "frame_idx")
      .select("media_id", "frame_idx", "f_bytes", "f_checksum")

  // Oracle precondition (asserted in MultimodalSpec, not incidental): the
  // DuckDB mirrors chunk/measure by CHARACTER (substr/ascii) while the
  // Scala side operates on UTF-8 BYTES — equal iff the fixture text is
  // pure ASCII. The spec pins `octet_length == char_length` over the whole
  // documents table, so a non-ASCII fixture fails the suite loudly at the
  // precondition instead of silently diverging frame boundaries/checksums.
  val oracles: Map[String, String] = Map(
    "m2_frame_sample" ->
      """WITH v AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT doc_id, u.i, substr(text, (u.i * 64 + 1)::INT, 64) chunk
        |      FROM v, unnest(range(0, (length(text) + 63) // 64)) u(i) WHERE u.i % 4 = 0)
        |SELECT doc_id AS media_id, i::INT AS frame_idx, length(chunk)::INT AS f_bytes,
        |  list_reduce(list_prepend(0::BIGINT,
        |      [ascii(x)::BIGINT for x in string_split_regex(chunk, '')]),
        |    (a, b) -> (a + b) % 1000003) AS f_checksum
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,

    "m1_media_features" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  length(text)::INT AS n_bytes,
        |  (ascii(substr(text, 1, 1)) + 1)::INT AS width,
        |  (ascii(substr(text, 2, 1)) + 1)::INT AS height,
        |  (length(text) // 256 + 1)::INT AS est_frames,
        |  list_reduce(list_prepend(0::BIGINT,
        |      [ascii(x)::BIGINT for x in string_split_regex(text, '')]),
        |    (a, b) -> (a + b) % 1000003) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin,
  )
}
