package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** E2d incremental simhash dedup: the batch-vs-corpus operator must agree
  * exactly with the cross-boundary slice of the full pair relation (which
  * is itself DuckDB-oracled), and must never emit batch-internal pairs.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("incremental result equals the cross-boundary slice of the full pair relation") {
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    val split = n * 4 / 5
    val all = Dedup.simhashDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // full relation has doc_a < doc_b, so cross pairs are exactly
    // doc_a in corpus, doc_b in batch
    val expected = all.filter { case (a, b, _) => a < split && b >= split }
      .groupBy(_._2)
      .map { case (id, ps) => (id, ps.length.toLong, ps.map(_._3).min) }
      .toSet
    assert(expected.nonEmpty, "fixture should have cross-boundary near-dups")

    val got = Dedup.incrementalSimhashDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
    // all flagged docs are batch docs
    got.foreach { case (id, _, _) => assert(id >= split) }
  }

  test("general (corpus, batch) API matches the fixture derivation on BOTH join paths") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val split = docs.count() * 4 / 5
    val corpus = docs.filter(col("doc_id") < split)
    val batch = docs.filter(col("doc_id") >= split)
    val expected = Dedup.incrementalSimhashDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // small batch → broadcast path (hint present, gated by the threshold)
    val bc = Dedup.incrementalSimhashDedup(corpus, batch, 10)
    assert(bc.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "small batch should take the broadcast path")
    assert(bc.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      == expected)

    // threshold 0 → banded shuffle join: no hint, identical answers
    val sh = Dedup.incrementalSimhashDedup(corpus, batch, 10, 0L)
    assert(!sh.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "above-threshold batch must not plant a broadcast hint")
    assert(sh.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      == expected)
  }

  test("precomputed-simhash API equals the (corpus, batch) API on both join paths") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val split = docs.count() * 4 / 5
    val corpus = docs.filter(col("doc_id") < split)
    val batch = docs.filter(col("doc_id") >= split)
    val expected = Dedup.incrementalSimhashDedup(corpus, batch, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val corpusSim = Dedup.simhashRelation(corpus)
    val batchSim = Dedup.simhashRelation(batch)
    Seq(true, false).foreach { bcast =>
      val got = Dedup
        .incrementalSimhashDedupPrecomputed(corpusSim, batchSim, 10, bcast)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expected, s"precomputed path (broadcastBatch=$bcast) diverged")
    }
  }

  test("general API agrees with the oracled pair relation on RANDOM corpus/batch splits") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val allPairs = Dedup.simhashDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))

    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // ~45% corpus, ~45% batch, ~10% excluded — exercised sides overlap
      // nothing, and excluded docs must influence neither.
      val assign = ids.map(id => id -> rnd.nextInt(10)).toMap
      val corpusIds = assign.collect { case (id, r) if r < 4 => id }.toSet
      val batchIds = assign.collect { case (id, r) if r >= 4 && r < 9 => id }.toSet

      val expected = allPairs.flatMap { case (a, b, h) =>
        Seq(
          if (corpusIds(a) && batchIds(b)) Some((b, a, h)) else None,
          if (corpusIds(b) && batchIds(a)) Some((a, b, h)) else None
        ).flatten
      }.groupBy(_._1).map { case (d, ps) =>
        (d, ps.map(_._2).distinct.length.toLong, ps.map(_._3).min)
      }.toSet

      val got = Dedup.incrementalSimhashDedup(
          docs.filter(col("doc_id").isInCollection(corpusIds)),
          docs.filter(col("doc_id").isInCollection(batchIds)), 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("general API: empty batch and empty corpus both yield empty results") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val none = docs.filter(col("doc_id") < 0)
    assert(Dedup.incrementalSimhashDedup(docs, none, 10).count() == 0)
    assert(Dedup.incrementalSimhashDedup(none, docs, 10).count() == 0)
  }

  test("batch-internal near-dups are NOT flagged (corpus-only pairing)") {
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    val split = n * 4 / 5
    val batchPairs = Dedup.simhashDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a >= split && b >= split }
    val flagged = Dedup.incrementalSimhashDedup(spark, dir).collect()
      .map(_.getLong(0)).toSet
    // a doc appearing ONLY in batch-internal pairs must not be flagged
    val onlyInternal = batchPairs.flatMap(p => Seq(p._1, p._2)).toSet --
      Dedup.simhashDedup(spark, dir).collect()
        .filter(r => r.getLong(0) < split && r.getLong(1) >= split)
        .map(_.getLong(1)).toSet
    onlyInternal.foreach(id => assert(!flagged.contains(id),
      s"doc $id has only batch-internal dups but was flagged"))
  }
}
