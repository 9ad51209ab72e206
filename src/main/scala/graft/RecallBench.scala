package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-vs-oversampling sweep — the engine-side reproduction of the
  * reference's quality-retention table (~90% binary-only → ~95% with
  * ⟨float,binary⟩ rescore → ~99.99% with int8 rescore at oversample
  * 10/3, reference README.md:132-155). For each (binaryOversample,
  * int8Oversample) config, measures mean recall@10 of the funnel against
  * the exact float-cosine top-10 over `nQueries` queries.
  *
  * Two fixture regimes:
  *  - `graft.RecallBench [sfDir] [nQueries]` — the driver's parquet
  *    fixtures (64-dim near-random vectors; absolute recall is depressed
  *    because sign-bit codes of near-random data carry little margin —
  *    see ARCHITECTURE.md "Recall vs oversampling").
  *  - `graft.RecallBench synth [n] [dim] [clusters] [intrinsicDim]
  *    [sigma] [nQueries]` — a clustered manifold on the unit sphere with
  *    LOW INTRINSIC DIMENSION, the property real embedding corpora have
  *    and near-random fixtures lack: cluster centers are random unit
  *    vectors; each point is `normalize(center + sigma * A_l u)` where
  *    `A_l` spans an `intrinsicDim`-dim per-cluster subspace and
  *    `u ~ N(0, I/r)`. Nearest neighbors then differ by meaningful
  *    angular margins that 1024-bit sign codes resolve, so the sweep can
  *    reproduce the reference's retention shape at its own geometry
  *    (1024-dim, reference README.md:9).
  */
object RecallBench {

  /** Deterministic clustered-sphere fixture, written as
    * `dir/embeddings.parquet` with the driver fixtures' schema
    * (vec_id long, embedding array<float>, label int — label is the
    * generating cluster, so the IVF cell layout gets realistic cells).
    * Generation is distributed (mapPartitions over spark.range) and
    * seed-deterministic: centers/bases derive from the cluster id, the
    * per-point draw from the point id — no shared RNG state, so any
    * partitioning yields identical rows.
    */
  /** The per-point generator behind [[synthesize]], exposed so other
    * benches (IvfBench's synth [[graft.db.Embedder]]) can produce the
    * IDENTICAL vector for an id. Seed-deterministic and instance-local:
    * cluster geometry memoizes lazily per instance, the per-point draw
    * derives from the point id alone — no shared RNG state, so any
    * partitioning (or any caller) yields identical rows. Returns the
    * generated (vector, cluster) pair.
    */
  /** `biasDims > 0` makes the manifold SKEWED (non-centered clusters):
    * the first `biasDims` coordinates of every cluster center are
    * forced positive (|gaussian| + `bias`), so the sign bits a prefix
    * quantizer reads are constant across the corpus — the degenerate
    * case for sign-code-prefix cells that the learned k-majority
    * assignment (round-11) must keep balanced.
    */
  def pointGen(dim: Int, clusters: Int, intrinsicDim: Int, sigma: Double,
               seed: Long = 42L, bias: Double = 0.0,
               biasDims: Int = 0): Long => (Array[Float], Int) = {
    // Per-cluster geometry memoized per instance (clusters are few;
    // each is O(intrinsicDim * dim) to build).
    val geom = scala.collection.mutable.HashMap.empty[Int, (Array[Double], Array[Array[Double]])]
    def clusterGeom(l: Int): (Array[Double], Array[Array[Double]]) =
      geom.synchronized {
        geom.getOrElseUpdate(l, {
          val r = new scala.util.Random(seed * 1000003L + l)
          val c = Array.fill(dim)(r.nextGaussian())
          var bi = 0
          while (bi < biasDims && bi < dim) {
            c(bi) = math.abs(c(bi)) + bias
            bi += 1
          }
          val inv = 1.0 / math.sqrt(c.map(x => x * x).sum)
          var i = 0
          while (i < dim) { c(i) *= inv; i += 1 }
          // Random (not orthogonalized) basis is fine: we only need the
          // point cloud to live near an r-dim affine patch of the sphere.
          val basis = Array.fill(intrinsicDim)(
            Array.fill(dim)(r.nextGaussian() / math.sqrt(dim.toDouble)))
          (c, basis)
        })
      }
    (id: Long) => {
      val l = java.lang.Long.remainderUnsigned(
        scala.util.hashing.byteswap64(id ^ (seed * 31L)), clusters.toLong).toInt
      val (c, basis) = clusterGeom(l)
      val r = new scala.util.Random(scala.util.hashing.byteswap64(id * 7919L + seed))
      val tmp = new Array[Double](dim)
      System.arraycopy(c, 0, tmp, 0, dim)
      var j = 0
      while (j < intrinsicDim) {
        val u = sigma * r.nextGaussian() / math.sqrt(intrinsicDim.toDouble)
        val b = basis(j)
        var i = 0
        while (i < dim) { tmp(i) += u * b(i); i += 1 }
        j += 1
      }
      var ss = 0.0
      var i = 0
      while (i < dim) { ss += tmp(i) * tmp(i); i += 1 }
      val inv = 1.0 / math.sqrt(ss)
      val p = new Array[Float](dim)
      i = 0
      while (i < dim) { p(i) = (tmp(i) * inv).toFloat; i += 1 }
      (p, l)
    }
  }

  def synthesize(spark: SparkSession, dir: String, n: Long, dim: Int,
                 clusters: Int, intrinsicDim: Int, sigma: Double,
                 seed: Long = 42L): Unit = {
    import spark.implicits._
    val ds = spark.range(n).as[Long].mapPartitions { it =>
      val gen = pointGen(dim, clusters, intrinsicDim, sigma, seed)
      it.map { id => val (p, l) = gen(id); (id, p, l) }
    }
    ds.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** One full sweep over a fixture dir: exact float-cosine top-10 per
    * query, then the funnel-config grid (including the (1,1) binary-only
    * row — phase I alone decides the result set there) and the
    * pruned-probe IVF rows. Returns the artifact JSON line.
    */
  def sweep(spark: SparkSession, dir: String, qids: Seq[Long],
            geometry: String, extraJson: => String): String = {
    // extraJson is BY-NAME: the caller's contamination stamps (loadavg,
    // io_probe_ms, dirty_kb) must sample at line-emission time — AFTER
    // the sweep's measured sections — matching the Bench/ServeBench
    // protocol. Evaluated eagerly they'd stamp the pre-sweep state, and
    // the ~192 MB ioProbe itself would run between the settle and the
    // sweep (ADVICE r16).
    val nQueries = qids.size
    val exact: Map[Long, Set[Long]] = qids.map { q =>
      q -> graft.operators.Search.knnCosine(spark, dir, queryVecId = q, k = 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }.toMap

    val configs = Seq((1, 1), (2, 1), (5, 1), (10, 1), (10, 3), (20, 3), (50, 5))
    val rows = configs.map { case (bo, io) =>
      val recalls = qids.map { q =>
        val got = graft.operators.Search.funnel(spark, dir, queryVecId = q,
          k = 10, binaryOversample = bo, int8Oversample = io)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        got.intersect(exact(q)).size / 10.0
      }
      val mean = recalls.sum / recalls.size
      println(f"""{"binary_oversample":$bo,"int8_oversample":$io,"recall_at_10":$mean%.3f,"n_queries":$nQueries}""")
      (bo, io, mean)
    }

    // Pruned-probe IVF: the scale path trades cells scanned for recall —
    // sweep nprobe against the same exact top-10s (nprobe = all cells
    // must be exact by construction; the interesting rows are 1-4).
    val ivfRows = Seq(1, 2, 4).map { np =>
      val recalls = qids.map { q =>
        val got = graft.operators.Search.ivfKnn(spark, dir, queryVecId = q,
          k = 10, nprobe = np)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        got.intersect(exact(q)).size / 10.0
      }
      val mean = recalls.sum / recalls.size
      println(f"""{"ivf_nprobe":$np,"recall_at_10":$mean%.3f,"n_queries":$nQueries}""")
      (np, mean)
    }

    val best = rows.maxBy(_._3)
    val funnelJson = rows.map { case (bo, io, r) =>
      f"""{"binary_oversample":$bo,"int8_oversample":$io,"recall_at_10":$r%.3f}""" }
      .mkString("[", ",", "]")
    val ivfJson = ivfRows.map { case (np, r) =>
      f"""{"nprobe":$np,"recall_at_10":$r%.3f}""" }.mkString("[", ",", "]")
    f"""{"metric":"recall_at_10_default","value":${rows.find(r => r._1 == 10 && r._2 == 3).map(_._3).getOrElse(0.0)}%.3f,"best":${best._3}%.3f,"binary_only":${rows.find(r => r._1 == 1 && r._2 == 1).map(_._3).getOrElse(0.0)}%.3f,"funnel_configs":$funnelJson,"ivf_probe":$ivfJson,"n_queries":$nQueries,"geometry":"$geometry"$extraJson,"note":"reference README.md:134-153 retention claims: ~90%% binary-only, ~95%% float-binary rescore, ~99.99%% int8 rescore at oversample 10/3"}"""
  }

  def main(args: Array[String]): Unit = {
    val synth = args.headOption.contains("synth")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-recallbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Long benches run hundreds of jobs in one JVM; shuffle files and
      // superseded cache blocks free only when the ContextCleaner sees
      // their references GC'd, and the default 30min periodic GC never
      // fires inside a bench run. A 60s floor keeps the on-disk footprint
      // bounded (the pre-fix 1M recall sweep accumulated 60+ GB of dead
      // shuffle files and filled the disk).
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val json = if (synth) {
      val n = if (args.length > 1) args(1).toLong else 100000L
      val dim = if (args.length > 2) args(2).toInt else 1024
      val clusters = if (args.length > 3) args(3).toInt else 100
      val intrinsicDim = if (args.length > 4) args(4).toInt else 8
      val sigma = if (args.length > 5) args(5).toDouble else 0.5
      val nQueries = if (args.length > 6) args(6).toInt else 20
      val dir = Graft.scratchDir("recall-synth")
      synthesize(spark, dir, n, dim, clusters, intrinsicDim, sigma)
      // settle the synthesis writeback out of the sweep's timings, and
      // stamp the same contamination markers the Bench line carries
      // (r15 verdict #5: the recall artifact must ride the protocol)
      Bench.settleWriteback()
      val qids = (0 until nQueries).map(i => i.toLong * (n / nQueries) + i)
      sweep(spark, dir, qids, geometry = "synthetic-clustered-sphere",
        extraJson = f""","n":$n,"dim":$dim,"clusters":$clusters,"intrinsic_dim":$intrinsicDim,"sigma":$sigma%.2f,"loadavg":${Bench.loadAvg()}%.2f,"io_probe_ms":${Bench.ioProbe()}%.2f,"dirty_kb":${Bench.dirtyKb()}""")
    } else {
      val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
      val nQueries = if (args.length > 1) args(1).toInt else 20
      val qids = (0 until nQueries).map(_.toLong * 7L) // spread over the table
      sweep(spark, sfDir, qids, geometry = "fixture",
        extraJson = s""","sf":"$sfDir"""")
    }
    println(json)
    spark.stop()
  }
}
