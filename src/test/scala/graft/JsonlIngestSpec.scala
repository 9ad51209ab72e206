package graft

import graft.db.VectorDB
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end parity with the reference's flagship example
  * (`examples/create_new_db.py:32-50`): ingest a gzipped-JSONL corpus,
  * map docs → text with a caller-supplied expression (the `docs2text`
  * extension point), bulk-load an empty DB, and search. Spark's JSON
  * source handles the gzip codec transparently — the ingest is one
  * `spark.read.json(path)` with no custom code.
  */
class JsonlIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeJsonlGz(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graftjsonl")
    val f = dir.resolve("corpus.jsonl.gz")
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(f))
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8")) finally out.close()
    f.toString
  }

  test("jsonl.gz → read.json → addDocuments(docs2text) → funnel search") {
    // Same record shape as the reference example corpus: {_id, title, text}.
    val corpus = (0L until 40L).map { i =>
      val topic = Seq("alps", "ocean", "desert", "tundra")(i.toInt % 4)
      s"""{"_id": $i, "title": "$topic article $i", "text": "about the $topic region number $i"}"""
    } :+ """{"_id": 40, "title": "facebook", "text": "facebook was founded by mark zuckerberg"}"""
    val path = writeJsonlGz(corpus)

    // Ingest: codec inferred from the .gz extension; schema inferred.
    val raw = spark.read.json(path)
    assert(raw.count() == 41)

    val tmp = java.nio.file.Files.createTempDirectory("graftjsonldb").toFile
    tmp.delete()
    val db = VectorDB.openOrCreate(spark, tmp.getAbsolutePath)
    assert(db.count() == 0)

    // docs2text = title + " " + text (the example's lambda), as a Column;
    // the full JSON record rides along as the stored doc payload.
    db.addDocuments(raw.select(
      col("_id").as("doc_id"),
      concat_ws(" ", col("title"), col("text")).as("text"),
      to_json(struct(col("_id"), col("title"), col("text"))).as("doc")))
    assert(db.count() == 41)

    val hits = db.search("who founded facebook", k = 3).collect()
    assert(hits.length == 3)
    assert(hits.head.getAs[Long]("doc_id") == 40L)
    assert(hits.head.getAs[String]("doc").contains("zuckerberg"))

    // Reopen from disk: the built DB is durable, search still works.
    val db2 = VectorDB.openOrCreate(spark, db.folder)
    assert(db2.count() == 41)
    assert(db2.search("who founded facebook", k = 1).head().getAs[Long]("doc_id") == 40L)
  }
}
