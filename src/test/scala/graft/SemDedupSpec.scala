package graft

import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup decision semantics (d6): the fixtures carry no natural
  * semantic dups (near-random 64-dim vectors), so the clone augmentation
  * gives a KNOWN-TRUE answer — every clone (vec_id + 1e6) must be
  * evicted by exactly its source, and nothing else may be evicted. The
  * learned-cluster variant is approximate at cluster boundaries (the
  * paper's own trade), so it gets a subset + coverage bound instead of
  * exactness.
  */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val nBase: Long =
    spark.read.parquet(s"$dir/embeddings.parquet").count()

  test("label-cluster d6: removals are exactly the clones, each evicted by its source") {
    val rows = graft.operators.Dedup.semDedup(spark, dir).collect()
    assert(rows.length == nBase, s"expected $nBase removals, got ${rows.length}")
    rows.foreach { r =>
      val id = r.getLong(0); val dupOf = r.getLong(2)
      assert(id >= 1000000L, s"non-clone $id evicted")
      assert(dupOf == id - 1000000L, s"clone $id evicted by $dupOf, not its source")
    }
  }

  test("learned-cluster variant: removals stay a subset of the clones with >=95% coverage") {
    val rows = graft.operators.Dedup.semDedupLearned(spark, dir).collect()
    rows.foreach { r =>
      val id = r.getLong(0); val dupOf = r.getLong(2)
      assert(id >= 1000000L, s"non-clone $id evicted")
      assert(dupOf == id - 1000000L, s"clone $id evicted by $dupOf, not its source")
    }
    // boundary straddles (source and clone assigned different learned
    // cells) are the paper's own miss class — bound, don't forbid
    assert(rows.length >= (nBase * 0.95).toLong,
      s"learned clusters evicted only ${rows.length} of $nBase clones")
  }

  test("hot buckets are salted: a single-bucket clone cluster stays equi-join and matches the unsalted result") {
    import spark.implicits._
    val dim = 16
    val n = 4000
    // every row near-parallel with positive signs: ONE (cluster, s16)
    // bucket, all pairwise cosines ≈ 1 — the pathological hot bucket the
    // salting exists for
    val rows = (0 until n).map { i =>
      (i.toLong, 0, (0 until dim).map(d => 1.0 + 0.0001 * ((i + d) % 7)).toArray)
    }.toDF("vec_id", "cluster", "v")
    val salted = graft.operators.Dedup.semDedupOver(rows, 0.97, saltRows = 64)
    val plan = salted.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"the salted self-join must stay an equi-join:\n$plan")
    val got = salted.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val unsalted = graft.operators.Dedup
      .semDedupOver(rows, 0.97, saltRows = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == unsalted, "salting must not change the decision")
    assert(got.size == n - 1 && got.forall(_._2 == 0L),
      "every row but the global minimum evicts to id 0")
  }

  test("bounded variant (maxNeighbors): no quadratic pairs, subset of exact, >=95% coverage on a pathological bucket") {
    import spark.implicits._
    val dim = 64
    val n = 3000
    // one near-identical bucket: exact = ~4.5M cosine pairs; bounded at
    // T=32 generates exactly (n-1)·T-ish pairs through an equi-join
    val rows = (0 until n).map { i =>
      (i.toLong, 0, (0 until dim).map(d => 1.0 + 0.0001 * ((i + d) % 7)).toArray)
    }.toDF("vec_id", "cluster", "v")
    val bounded = graft.operators.Dedup.semDedupOver(rows, 0.97, maxNeighbors = 32)
    val plan = bounded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"the bounded variant must stay an equi-join:\n$plan")
    val got = bounded.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val exact = graft.operators.Dedup.semDedupOver(rows, 0.97)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every bounded decision is one the exact path also makes (a
    // compared pair is a pair): the removal set is a strict subset
    assert(got.keySet.subsetOf(exact.keySet),
      "bounded removals must be a subset of the exact removal set")
    // decision delta, quantified: on a near-identical bucket each row's
    // window predecessors are all dups, so coverage stays high
    assert(got.size >= (exact.size * 0.95).toInt,
      s"bounded covered ${got.size} of ${exact.size} exact removals")
    // the default path is byte-identical to before the knob existed
    val dflt = graft.operators.Dedup.semDedupOver(rows, 0.97, maxNeighbors = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dflt == exact)
  }

  test("bounded rank: a bucket larger than every partition sorts multi-task with window-identical ranks") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ONE bucket with a CONSTANT secondary sort key — the near-identical
    // flood shape: the range partitioner must spread it on the unique
    // vec_id tiebreaker, and the rank carry must chain across every
    // partition boundary the bucket straddles.
    val n = 5000
    val flood = (0 until n).map(i => (i.toLong * 7 % 100000, 0))
      .toDF("vec_id", "cluster")
      .withColumn("s16", lit(0L)).withColumn("sk", lit(0L))
    val ranked = graft.operators.Dedup.rankWithinBuckets(flood)
    val sizes = ranked.rdd
      .mapPartitions(it => Iterator.single(it.size)).collect()
    assert(sizes.count(_ > 0) > 1,
      s"the single giant bucket must sort across >1 task, got ${sizes.toSeq}")
    assert(sizes.forall(_ < n),
      "no task may hold the whole bucket (the r13 single-task sort bound)")
    val got = ranked.select("vec_id", "rnk").as[(Long, Long)].collect().toMap
    val expected = flood.select("vec_id").as[Long].collect()
      .sorted.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(got == expected, "ranks must be the dense (sk, vec_id)-order position")

    // interleaved multi-bucket case: bit-identical to the window form
    // the distributed rank replaced
    val mixed = (0 until 2000).map { i =>
      (i.toLong, i % 3, (i % 5).toLong, (i % 7).toLong)
    }.toDF("vec_id", "cluster", "s16", "sk")
    val gotMixed = graft.operators.Dedup.rankWithinBuckets(mixed)
      .select("vec_id", "rnk").as[(Long, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster", "s16").orderBy("sk", "vec_id")
    val ref = mixed.withColumn("rnk", row_number().over(w).cast("long"))
      .select("vec_id", "rnk").as[(Long, Long)].collect().toMap
    assert(gotMixed == ref, "distributed rank must equal the window rank")

    // and the public bounded path no longer plans a row-relation Window
    val dim = 64
    val rows = (0 until 3000).map { i =>
      (i.toLong, 0, (0 until dim).map(d => 1.0 + 0.0001 * ((i + d) % 7)).toArray)
    }.toDF("vec_id", "cluster", "v")
    val bounded = graft.operators.Dedup.semDedupOver(rows, 0.97, maxNeighbors = 32)
    val plan = bounded.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"the bounded variant must not gather buckets into window tasks:\n$plan")
  }

  test("applying the decision: anti-join returns the corpus to its pre-clone size") {
    import spark.implicits._
    val removed = graft.operators.Dedup.semDedup(spark, dir).select("vec_id")
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"label")
    val clones = base.withColumn("vec_id", $"vec_id" + 1000000L)
    val kept = base.unionByName(clones).join(removed, Seq("vec_id"), "left_anti")
    assert(kept.count() == nBase)
  }
}
