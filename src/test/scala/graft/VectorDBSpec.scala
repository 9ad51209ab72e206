package graft

import graft.db.VectorDB
import org.scalatest.funsuite.AnyFunSuite

/** CRUD lifecycle spec mirroring the reference's
  * `examples/add_update_delete.py` end to end (add → search → add more →
  * update by re-adding an id → delete → guards), plus the O13 error
  * guards and O1 open/create semantics.
  */
class VectorDBSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftdb").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("create, add, search, update, delete lifecycle (add_update_delete.py)") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    assert(db.count() == 0)

    // add 2 docs (examples/add_update_delete.py:23-29)
    db.addDocuments(Seq(
      (1L, "Berlin is the capital of Germany"),
      (2L, "Paris is the capital of France")).toDF("doc_id", "text"))
    assert(db.count() == 2)

    // search finds the matching doc first
    val hit = db.search("capital of France Paris", k = 1).head()
    assert(hit.getAs[Long]("doc_id") == 2L)

    // add a third
    db.addDocuments(Seq((3L, "Rome is the capital of Italy")).toDF("doc_id", "text"))
    assert(db.count() == 3)

    // update = re-add an existing id (examples/add_update_delete.py:68-76)
    db.addDocuments(Seq((2L, "Madrid is the capital of Spain")).toDF("doc_id", "text"))
    assert(db.count() == 3)
    val updated = db.search("Madrid capital Spain", k = 1).head()
    assert(updated.getAs[Long]("doc_id") == 2L)
    assert(updated.getAs[String]("doc").contains("Madrid"))

    // delete (examples/add_update_delete.py:92)
    db.removeDocs(Seq(2L))
    assert(db.count() == 2)

    // delete-missing guard (BinaryVectorDB.py:159-160)
    intercept[IllegalArgumentException] { db.removeDocs(Seq(2L)) }

    // reopen from disk: state survives
    val db2 = VectorDB.openOrCreate(spark, db.folder)
    assert(db2.count() == 2)
  }

  test("guard: search on empty index fails (BinaryVectorDB.py:190-191)") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    intercept[IllegalArgumentException] { db.search("anything") }
  }

  test("guard: non-empty folder without config.json is rejected (BinaryVectorDB.py:43-45)") {
    val dir = freshDir()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "stray.txt"), "x")
    intercept[IllegalStateException] { VectorDB.openOrCreate(spark, dir) }
  }

  test("guard: missing doc_id/text columns and null ids are rejected") {
    val db = VectorDB.openOrCreate(spark, freshDir())
    intercept[IllegalArgumentException] {
      db.addDocuments(Seq(("x")).toDF("text"))
    }
    intercept[IllegalArgumentException] {
      db.addDocuments(Seq((1L, "ok")).toDF("doc_id", "wrong"))
    }
  }

  test("docs2text as a Column expression: JSON payload, title+text extraction (create_new_db.py shape)") {
    import org.apache.spark.sql.functions._
    val db = VectorDB.openOrCreate(spark, freshDir())
    // The reference example stores {'title','text'} dicts and extracts
    // docs2text = title + ' ' + text (examples/create_new_db.py:42).
    // Here the payload is a JSON column and docs2text is any Column expr.
    val input = Seq(
      (0L, """{"title": "Berlin", "text": "capital of Germany"}"""),
      (1L, """{"title": "Paris", "text": "capital of France"}"""))
      .toDF("doc_id", "doc")
      .withColumn("text", concat_ws(" ",
        get_json_object($"doc", "$.title"), get_json_object($"doc", "$.text")))
    db.addDocuments(input)
    val hit = db.search("Paris capital France", k = 1).head()
    assert(hit.getAs[Long]("doc_id") == 1L)
    // the stored payload is the original JSON object, not the text
    assert(hit.getAs[String]("doc").contains("\"title\": \"Paris\""))
  }

  test("1024-dim embedder: codes pack to 16 longs, search round-trips (reference native width)") {
    val db = VectorDB.openOrCreate(spark, freshDir(), model = "graft-hash-1024", dim = 1024)
    val emb = new graft.db.HashingEmbedder(1024)
    db.addDocuments(Seq(
      (10L, "alpha beta gamma delta epsilon"),
      (11L, "zeta eta theta iota kappa"),
      (12L, "alpha beta gamma delta zeta")).toDF("doc_id", "text"), emb)
    val width = db.codes.select(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.col("code"))).head().getInt(0)
    assert(width == 16, s"1024 bits must pack to 16 longs, got $width")
    val hit = db.search("alpha beta gamma delta epsilon", k = 1, embedder = emb).head()
    assert(hit.getAs[Long]("doc_id") == 10L)
  }

  test("config round-trips model and dim") {
    val dir = freshDir()
    VectorDB.openOrCreate(spark, dir, model = "my-model", dim = 64)
    val re = VectorDB.openOrCreate(spark, dir)
    assert(re.model == "my-model")
    assert(re.dim == 64)
  }

  test("heap-pressure warning fires exactly under the measured headroom bound") {
    // The r14 restart A/B's shape: 4M × 1024-dim × 16 words packs
    // ~4.7 GB — a 24 GB heap (the measured GC collapse) sits under the
    // 6× bound and must warn; 48 GB (the measured recovery) must not.
    def warn(heapGb: Long, local: Boolean = true) =
      VectorDB.heapPressureWarning(4000000L, 1024, 16, heapGb << 30, local)
    assert(warn(24).isDefined, "24 GB at the 4M geometry must warn")
    assert(warn(48).isEmpty, "48 GB at the 4M geometry must not warn")
    assert(warn(24, local = false).isEmpty, "cluster mode never warns")
    assert(VectorDB.heapPressureWarning(600L, 1024, 16, 8L << 30,
      localMode = true).isEmpty, "toy tiers never warn")
    val est = 4000000L * (8L + 16 * 8L + 1024 + 16)
    assert(VectorDB.heapPressureWarning(4000000L, 1024, 16,
      VectorDB.HeapTierMultiple * est, localMode = true).isEmpty &&
      VectorDB.heapPressureWarning(4000000L, 1024, 16,
        VectorDB.HeapTierMultiple * est - 1, localMode = true).isDefined,
      "the bound is exact at HeapTierMultiple x estimated tier bytes")
  }
}
