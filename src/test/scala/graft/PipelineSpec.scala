package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pipeline-composition operators (P1–P4): the distributed
  * connected-components result is checked against an independent
  * driver-side union-find, and the split/pack/decontaminate operators
  * against their conservation invariants.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("dedupClusters equals a driver-side union-find over the same pairs") {
    val pairs = graft.operators.Dedup.simhashDedup(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)

    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.toSeq.groupBy(find).map { case (_, m) =>
      (m.min, m.size.toLong)
    }.toSet

    val got = graft.operators.Pipeline.dedupClusters(spark, dir).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_docs"))).toSet
    assert(got == expected)
  }

  test("decontaminateBloom equals decontaminate, and the bloom actually prunes") {
    import org.apache.spark.sql.functions._
    import graft.functions.Kernels
    val p4 = graft.operators.Pipeline.decontaminate(spark, dir).collect().toSeq
    val p6 = graft.operators.Pipeline.decontaminateBloom(spark, dir).collect().toSeq
    assert(p6 == p4)
    assert(p4.nonEmpty)

    // Pruning evidence, measured the same way the operator builds it: the
    // bloom pre-filter must pass every true hit but strictly fewer
    // postings than the unfiltered train side.
    Kernels.install(spark)
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val ex = d.select(col("doc_id"), col("source"),
        explode(Kernels.shingles3(col("text"))).as("sg"))
    val evalSg = ex.filter(col("source") === "src0").select("sg").distinct()
    val evalH = evalSg.select(Kernels.h60(col("sg")).as("h"))
    val bloom = Kernels.serializeBloom(
      evalH.stat.bloomFilter("h", math.max(evalH.count(), 64L), 0.001))
    val train = ex.filter(col("source") =!= "src0")
    val total = train.count()
    val kept = train.filter(
      Kernels.bloomMightContain(lit(bloom), Kernels.h60(col("sg")))).count()
    val trueHits = train.join(evalSg, "sg").select("doc_id", "sg").count()
    assert(kept >= trueHits, "bloom must never drop a true hit")
    assert(kept < total, s"bloom should prune the posting join: kept $kept of $total")
    info(f"bloom pre-filter: $total postings -> $kept (true hits $trueHits)")
  }

  test("hashSplit partitions every document exactly once (counts conserve)") {
    val split = graft.operators.Pipeline.hashSplit(spark, dir).collect()
    val perLang = split.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val truth = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    assert(perLang == truth)
    // Content-hash split: the train bucket dominates (80% expected).
    val train = split.filter(_.getAs[String]("split") == "train").map(_.getAs[Long]("n_docs")).sum
    assert(train * 10 > split.map(_.getAs[Long]("n_docs")).sum * 6)
  }

  test("packSequences conserves tokens and fills bins contiguously per lang") {
    val packed = graft.operators.Pipeline.packSequences(spark, dir).collect()
    val totTokens = packed.map(_.getAs[Long]("tokens")).sum
    val truth = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("sum(size(split(text, ' ')))").head().getLong(0)
    assert(totTokens == truth)
    packed.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val bins = rows.map(_.getAs[Int]("bin")).sorted.toSeq
      assert(bins == (0 until bins.length), s"lang $lang bins: $bins")
    }
  }

  test("packSequences is shard-size independent (two-phase prefix sum ≡ single stream)") {
    // The sub-shard size only bounds partition width; the packed bins must
    // be identical for any choice — including a shard size larger than the
    // corpus (degenerate single-shard = the naive per-lang running sum)
    // and a tiny one that forces many cross-shard offset handoffs.
    val ref = graft.operators.Pipeline.packSequences(spark, dir,
      shardDocs = Long.MaxValue).collect().map(_.toSeq).toSeq
    for (s <- Seq(1L, 7L, 64L)) {
      val got = graft.operators.Pipeline.packSequences(spark, dir, shardDocs = s)
        .collect().map(_.toSeq).toSeq
      assert(got == ref, s"shardDocs=$s diverged")
    }
  }

  test("decontaminate: contaminated is bounded by train, eval source excluded") {
    val rows = graft.operators.Pipeline.decontaminate(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_train"))
    }
    val nTrain = rows.map(_.getAs[Long]("n_train")).sum
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    val nEval = spark.read.parquet(s"$dir/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("source") === "src0").count()
    assert(nTrain == total - nEval)
  }

  test("stratifiedSample: conserves counts, keeps within stratum rates, layout-independent") {
    val s = graft.operators.Pipeline.stratifiedSample(spark, dir).collect()
    val truth = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    assert(s.map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_docs")).toMap == truth)
    val rates = Map("en" -> 0.25, "es" -> 0.50, "zh" -> 0.75)
    s.foreach { r =>
      val (lang, n, kept) = (r.getAs[String]("lang"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(kept <= n)
      val p = rates.getOrElse(lang, 1.0)
      if (p == 1.0) assert(kept == n, s"$lang should keep everything")
      else {
        // binomial(n, p): allow 5 sigma
        val tol = 5 * math.sqrt(n * p * (1 - p))
        assert(math.abs(kept - n * p) <= tol, s"$lang kept=$kept of n=$n at p=$p")
      }
    }
    // The keep decision hashes content only — a physically different layout
    // (7 shuffled partitions round-tripped through parquet) must produce
    // the identical aggregate rows.
    val base = spark.read.parquet(s"$dir/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft-strat-").toString
    try {
      base.repartition(7).write.mode("overwrite").parquet(tmp)
      val relaid = spark.read.parquet(tmp)
      assert(relaid.rdd.getNumPartitions != base.rdd.getNumPartitions ||
        relaid.inputFiles.toSet != base.inputFiles.toSet) // layout really changed
      val reran = graft.operators.Pipeline.stratifiedSampleOf(relaid)
        .collect().map(_.toSeq).toSeq
      assert(reran == s.map(_.toSeq).toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("clustersFromPairs: chains, triangles, disjoint components, empty input") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    // triangle 10-11-12, isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val got = graft.operators.Pipeline.clustersFromPairs(pairs).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_docs"))).toSet
    assert(got == Set((1L, 4L), (10L, 3L), (20L, 2L)))

    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(graft.operators.Pipeline.clustersFromPairs(empty).count() == 0)
  }

  test("deep chain crosses checkpoint boundaries; maxIter is configurable and loud") {
    import spark.implicits._
    // A 25-node path has diameter 24 — propagation runs well past several
    // CheckpointEvery boundaries, so the lineage-truncated labels must
    // still converge to one component. driverCollapseEdges = 0 forces the
    // DISTRIBUTED path (the default would collapse this tiny graph to the
    // driver-side union-find).
    val chain = (1L until 25L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = graft.operators.Pipeline
      .clustersFromPairs(chain, driverCollapseEdges = 0L).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_docs"))).toSet
    assert(got == Set((1L, 25L)))

    // Both paths agree on the same input.
    val viaUnionFind = graft.operators.Pipeline.clustersFromPairs(chain).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_docs"))).toSet
    assert(viaUnionFind == got)

    // The cap is a parameter: a diameter beyond it fails loudly instead of
    // returning a silently split component.
    intercept[IllegalStateException] {
      graft.operators.Pipeline.clustersFromPairs(chain, maxIter = 3,
        driverCollapseEdges = 0L)
    }
  }

  test("exportShuffle: positions are a permutation, seed-dependent, layout-independent") {
    import spark.implicits._
    val got = graft.operators.Pipeline.exportShuffle(spark, dir)
      .select("pos", "doc_id").as[(Long, Long)].collect()
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(got.map(_._1).sorted.sameElements(1L to n),
      "positions must be exactly 1..N")
    // deterministic: a second construction agrees bit-for-bit
    val again = graft.operators.Pipeline.exportShuffle(spark, dir)
      .select("pos", "doc_id").as[(Long, Long)].collect()
    assert(got.sortBy(_._2).sameElements(again.sortBy(_._2)))
    // the seed actually shuffles: a different seed produces a different
    // permutation (astronomically unlikely to collide on 1000+ docs)
    val other = graft.operators.Pipeline.exportShuffle(spark, dir, seed = 7L)
      .select("pos", "doc_id").as[(Long, Long)].collect()
    assert(got.sortBy(_._2).map(_._1).toSeq != other.sortBy(_._2).map(_._1).toSeq)
    // and it is NOT the identity order (doc_id order would leak source
    // locality into batch composition)
    assert(got.sortBy(_._2).map(_._1).toSeq != (1L to n).toSeq)
  }

  test("sourceMixture: shares sum to ~100%, dominant source capped, small sources kept whole") {
    val rows = graft.operators.Pipeline.sourceMixture(spark, dir).collect()
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getAs[Long]("share_bp")).sum
    // rounded per-source shares sum to 10000 within rounding slack
    assert(math.abs(shareSum - 10000L) <= rows.length,
      s"shares must sum to ~10000 bp, got $shareSum")
    val t = rows.map(_.getAs[Long]("tok_sum")).sum
    rows.foreach { r =>
      val tok = r.getAs[Long]("tok_sum")
      val keep = r.getAs[Long]("keep_rate_bp")
      val capped = r.getAs[Long]("capped_tokens")
      if (r.getAs[Long]("share_bp") <= graft.operators.Pipeline.SourceCapBp) {
        assert(keep == 10000L, s"under-cap source must keep everything: $r")
        assert(capped == tok, s"under-cap budget is its own size: $r")
      } else {
        assert(keep < 10000L, s"over-cap source must downsample: $r")
        assert(capped == graft.operators.Pipeline.SourceCapBp * t / 10000,
          s"over-cap budget is the cap: $r")
      }
    }
  }

  test("corpusBuild: composed result obeys each stage's invariants") {
    import spark.implicits._
    val got = graft.operators.Pipeline.corpusBuild(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    // stage bound: never more docs than the p4 train survivors (the
    // composed pipeline only ever removes further)
    val p4 = graft.operators.Pipeline.decontaminate(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1) - r.getLong(2))).toMap
    got.groupBy(_._1._1).foreach { case (lang, bySplit) =>
      val total = bySplit.values.map(_._1).sum
      assert(total <= p4(lang),
        s"$lang: composed docs $total must not exceed decontaminated survivors ${p4(lang)}")
    }
    // every (lang, split) combination that appears is a real split name
    assert(got.keySet.map(_._2).subsetOf(Set("train", "val", "test")))
    // deterministic: re-planning agrees bit-for-bit
    val again = graft.operators.Pipeline.corpusBuild(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == again)
    // with the cap wide open (100%), capping removes nothing: result
    // equals dedup+decontam+split exactly; with it, counts only shrink
    val uncapped = graft.operators.Pipeline
      .corpusBuild(spark, dir, capBp = 10000L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    got.foreach { case (k, (n, _)) =>
      assert(n <= uncapped(k), s"capping must only shrink: $k $n vs ${uncapped(k)}")
    }
  }

  test("unigramNll: exact micro-nat costs, OOV floored at 1/T under a vocab cut") {
    import spark.implicits._
    graft.functions.Kernels.install(spark)
    // corpus: 'aa' x5, 'bb' x2, 'zz' x1 => T=8; vocab=2 keeps {aa,bb},
    // 'zz' is OOV and costs ln(T/1)
    val docs = Seq(
      (1L, "aa aa bb"),   // 2·ln(8/5) + ln(8/2)
      (2L, "aa bb zz"),   // ln(8/5) + ln(8/2) + ln(8)
      (3L, "aa aa")       // 2·ln(8/5)
    ).toDF("doc_id", "text")
    def u(p: Double): Long = math.round(1e6 * math.log(p))
    val exp = Map(
      1L -> (3L, 2 * u(8.0 / 5) + u(8.0 / 2)),
      2L -> (3L, u(8.0 / 5) + u(8.0 / 2) + u(8.0)),
      3L -> (2L, 2 * u(8.0 / 5)))
    val got = graft.operators.TextAnalysis.unigramNllOver(docs, vocab = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == exp, s"got $got expected $exp")
    // vocab large enough: no OOV, zz costs ln(7/1) anyway (count 1)
    val full = graft.operators.TextAnalysis.unigramNllOver(docs, vocab = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(full(1L) == exp(1L)._2 && full(3L) == exp(3L)._2)
    assert(full(2L) == exp(2L)._2, "count-1 vocab word == OOV floor cost")
    // the scoring join must broadcast the (bounded) vocabulary
    val plan = graft.operators.TextAnalysis.unigramNll(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab join must broadcast:\n$plan")
  }

  test("bigramNll: in-vocab conditionals, bigram->unigram backoff, OOV floor") {
    import spark.implicits._
    graft.functions.Kernels.install(spark)
    // uni: aa x3, bb x3, cc x1 (T=7); bigrams: (aa,bb) x3, (bb,aa) x1,
    // (bb,cc) x1. vocab=1 keeps bigram (aa,bb) (cost ln(3/3)=0) and
    // unigram aa (ties on count, lexical order) — so (bb,aa) backs off
    // to in-vocab aa, (bb,cc) backs off to OOV cc = the 1/T floor.
    val docs = Seq(
      (1L, "aa bb aa bb"), // ln(7/3) head + 0 + backoff aa ln(7/3) + 0
      (2L, "aa bb cc")     // ln(7/3) head + 0 + backoff cc ln(7)
    ).toDF("doc_id", "text")
    def u(p: Double): Long = math.round(1e6 * math.log(p))
    val exp = Map(
      1L -> (4L, 2 * u(7.0 / 3)),
      2L -> (3L, u(7.0 / 3) + u(7.0)))
    val got = graft.operators.TextAnalysis.bigramNllOver(docs, vocab = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == exp, s"got $got expected $exp")
  }
}
