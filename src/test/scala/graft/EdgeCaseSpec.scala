package graft

import graft.functions.Kernels
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases and kernel type guards: the failure modes a user hits
  * first.
  */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kernels reject wrong input types with a named analysis error") {
    val df = Seq(("a", 1)).toDF("s", "i")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(Kernels.hamming(col("s"), col("s"))).collect()
    }
    assert(e.getMessage.contains("graft_hamming"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(Kernels.h60(col("i"))).collect()
    }
    assert(e2.getMessage.contains("graft_h60"))
  }

  test("shingles of short texts are empty, not an error") {
    val out = Seq("one two", "a", "").toDF("text")
      .select(Kernels.shingles3(col("text")).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(out.forall(_.isEmpty))
  }

  test("search with k larger than the index returns all docs, ranked") {
    val tmp = java.nio.file.Files.createTempDirectory("graftedge").toFile
    tmp.delete()
    val db = graft.db.VectorDB.openOrCreate(spark, tmp.getAbsolutePath)
    db.addDocuments(Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text"))
    assert(db.search("alpha beta", k = 50).count() == 2)
  }

  test("typed Dataset views expose the tiers with case-class rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graftedge2").toFile
    tmp.delete()
    val db = graft.db.VectorDB.openOrCreate(spark, tmp.getAbsolutePath)
    db.addDocuments(Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"))
    val code = db.typedCodes.collect().head
    assert(code.doc_id == 1L && code.code.length == 1)
    val doc = db.typedDocs.collect().head
    assert(doc.doc == "alpha beta gamma" && doc.emb_int8.length == 64)
  }

  test("guard: embedder/index dim mismatch is rejected, not silently truncated") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdim").toFile
    tmp.delete()
    val db = graft.db.VectorDB.openOrCreate(spark, tmp.getAbsolutePath, dim = 1024)
    intercept[IllegalArgumentException] {
      db.addDocuments(Seq((1L, "alpha beta")).toDF("doc_id", "text")) // default 64-dim embedder
    }
  }

  test("guard: duplicate doc_ids within one batch are rejected") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdup").toFile
    tmp.delete()
    val db = graft.db.VectorDB.openOrCreate(spark, tmp.getAbsolutePath)
    intercept[IllegalArgumentException] {
      db.addDocuments(Seq((1L, "a b c"), (1L, "d e f")).toDF("doc_id", "text"))
    }
  }

  test("guard: searchMany rejects duplicate qids instead of silently merging pools") {
    val tmp = java.nio.file.Files.createTempDirectory("graftqid").toFile
    tmp.delete()
    val db = graft.db.VectorDB.openOrCreate(spark, tmp.getAbsolutePath)
    db.addDocuments(Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text"))
    val qv = (0 until 64).map(i => math.sin(i) / 8.0)
    intercept[IllegalArgumentException] {
      db.searchMany(Seq((7L, qv), (7L, qv)), k = 1)
    }
  }

  test("guard: reopening with contradicting explicit config errors instead of ignoring it") {
    val tmp = java.nio.file.Files.createTempDirectory("graftconf").toFile
    tmp.delete()
    graft.db.VectorDB.openOrCreate(spark, tmp.getAbsolutePath) // cow, array, 64
    intercept[IllegalArgumentException] {
      graft.db.VectorDB.openOrCreate(spark, tmp.getAbsolutePath,
        storage = graft.db.VectorDB.StorageMor)
    }
    intercept[IllegalArgumentException] {
      graft.db.VectorDB.openOrCreate(spark, tmp.getAbsolutePath, dim = 1024)
    }
    // re-opening with defaults (or matching values) is fine
    assert(graft.db.VectorDB.openOrCreate(spark, tmp.getAbsolutePath).dim == 64)
  }

  test("empty-array embedding packs to empty code and zero hamming") {
    val out = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
      .select(Kernels.hamming(Kernels.packBits(col("a")), Kernels.packBits(col("b"))))
      .head().getInt(0)
    assert(out == 0)
  }

  test("guards: banded near-dup hamming cap, non-literal heap arity, index mismatch") {
    // Banding is pigeonhole-exact only up to numBands - 1 = 7.
    val vecs = Seq((1L, Seq.fill(64)(0.1))).toDF("vec_id", "v")
    intercept[IllegalArgumentException] {
      graft.operators.Search.nearDupPairs(vecs, maxHamming = 8)
    }
    // The heap arity must be a foldable literal (it sizes the agg buffer).
    intercept[Exception] {
      Seq((1, 1L)).toDF("s", "i")
        .selectExpr("graft_topk_hamming(s, i, s)").collect()
    }
    // ... and a POSITIVE one: k = 0 / negative would silently build an
    // empty heap and return empty aggregates instead of erroring.
    intercept[Exception] {
      Seq((1, 1L)).toDF("s", "i")
        .selectExpr("graft_topk_hamming(s, i, 0)").collect()
    }
    intercept[Exception] {
      Seq((1, 1L)).toDF("s", "i")
        .selectExpr("graft_topk_hamming(s, i, -3)").collect()
    }
    // Funnel sizing guards on the facade: zero/negative stages rejected.
    val dbDir = java.nio.file.Files.createTempDirectory("graftguardk").toFile
    dbDir.delete()
    val db = graft.db.VectorDB.openOrCreate(spark, dbDir.getAbsolutePath)
    db.addDocuments(Seq((1L, "alpha beta")).toDF("doc_id", "text"))
    intercept[IllegalArgumentException] { db.searchVector(Seq.fill(64)(0.1), k = 0) }
    intercept[IllegalArgumentException] {
      db.searchVector(Seq.fill(64)(0.1), binaryOversample = 0)
    }
    intercept[IllegalArgumentException] {
      db.searchMany(Seq((0L, Seq.fill(64)(0.1))), int8Oversample = -1)
    }
    intercept[IllegalArgumentException] { db.searchMany(Seq.empty) }
    // The index strategy round-trips through config, and a probe count
    // below 1 is a caller error, not an empty result.
    val tmp = java.nio.file.Files.createTempDirectory("graftguard").toFile
    tmp.delete()
    val ivf = graft.db.VectorDB.openOrCreate(spark, tmp.getAbsolutePath,
      index = graft.db.VectorDB.IndexIvf)
    ivf.addDocuments(Seq((1L, "alpha beta")).toDF("doc_id", "text"))
    assert(graft.db.VectorDB.openOrCreate(spark, tmp.getAbsolutePath).index ==
      graft.db.VectorDB.IndexIvf)
    intercept[IllegalArgumentException] { ivf.search("alpha", nprobe = 0) }
  }
}
