package graft

import graft.db.{Embedder, VectorDB}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF tuning sweep at the `VectorDB` facade: recall-vs-latency across
  * the (ivfCells, nprobe) grid — the guidance a reference migrant needs
  * for the engine's one index knob (the reference has no IVF at all; its
  * index is always a flat exhaustive scan, `BinaryVectorDB.py:58-62`).
  *
  * Geometry: the clustered unit-sphere manifold of
  * [[RecallBench.pointGen]] at the reference's native 1024-dim — low
  * intrinsic dimension, the property real embedding corpora have. For
  * each cells config a fresh DB is BUILT through the real write path
  * (`addDocuments` with a synth embedder), served
  * (`enableServing()`), and probed at nprobe ∈ {1, 2, 4, 8, all}.
  *
  * Recall here is measured against the SAME DB's full-probe results
  * (nprobe = all cells ≡ flat, parity spec-pinned) — it isolates what
  * the PROBING knob alone costs, separate from the funnel's own
  * retention (that is RECALL_r{N}'s job). Latency is the served
  * `searchHits` median over the query set.
  *
  * Round 11 additions:
  *  - every grid row records the cell-size balance of its build
  *    (`cell_ratio` = max/median over non-empty cells) — the pruning
  *    payoff collapses when one cell holds the corpus;
  *  - a SKEWED manifold pass (non-centered clusters: the first 32
  *    center coordinates forced positive) compares the learned
  *    k-majority assignment (now the default) against the legacy
  *    sign-code prefix — the degenerate case the round-10 verdict
  *    flagged, where prefix cells collapse into one.
  *
  * Usage: `graft.IvfBench [nDocs] [dim] [nQueries]` (default
  * 200k × 1024 × 20; cells grid 16/64/256).
  */
object IvfBench {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val dim = if (args.length > 1) args(1).toInt else 1024
    val nQueries = if (args.length > 2) args(2).toInt else 20
    val clusters = 100
    val intrinsicDim = 8
    val sigma = 0.5
    val skewBias = 1.0
    val skewDims = 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ivfbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", Graft.fairDefaultPoolFile)
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

    // Embedder that regenerates the synth vector from the id carried in
    // the text column — same math, same seed as RecallBench.synthesize,
    // so the DB's stored vectors ARE the manifold points.
    class SynthEmbedder(val dim: Int, clusters: Int, intrinsicDim: Int,
                        sigma: Double, bias: Double, biasDims: Int) extends Embedder {
      override def embed(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
        // ONE generator instance captured by the udf closure — pointGen
        // memoizes cluster geometry per instance, so building it per row
        // would redo the O(intrinsicDim·dim) gaussian setup 200k times.
        val gen = RecallBench.pointGen(dim, clusters, intrinsicDim, sigma,
          bias = bias, biasDims = biasDims)
        val genUdf = udf { id: Long => gen(id)._1 }
        genUdf(text.cast("long")).cast("array<float>")
      }
    }

    val docs = spark.range(n).select(col("id").as("doc_id"),
      col("id").cast("string").as("text"))
    val qids = (0 until nQueries).map(i => i.toLong * (n / nQueries) + i)

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }

    /** Build + serve one DB; return its grid rows (each carrying the
      * build's cell balance) and tear serving down.
      */
    def sweep(cells: Int, assign: String, manifold: String,
              probes: Seq[Int]): Seq[String] = {
      val (bias, biasDims) =
        if (manifold == "skewed") (skewBias, skewDims) else (0.0, 0)
      val qGen = RecallBench.pointGen(dim, clusters, intrinsicDim, sigma,
        bias = bias, biasDims = biasDims)
      val queries = qids.map(id => id -> qGen(id)._1.map(_.toDouble).toSeq).toMap
      val dir = Graft.scratchDir(s"ivf$cells-$assign-$manifold") + "/db"
      val db = VectorDB.openOrCreate(spark, dir, model = s"graft-synth-$dim",
        dim = dim, index = VectorDB.IndexIvf, ivfCells = cells,
        ivfAssign = assign)
      db.addDocuments(docs,
        new SynthEmbedder(dim, clusters, intrinsicDim, sigma, bias, biasDims))
      // Cell balance of this build: max/median over NON-EMPTY cells,
      // plus how many of the configured cells hold anything at all.
      val sizes = db.codes.groupBy("cell").count()
        .collect().map(_.getLong(1)).sorted
      val cellRatio = sizes(sizes.length / 2) match {
        case 0 => -1.0
        case med => sizes.last.toDouble / med
      }
      val balance = f""""cells_nonempty":${sizes.length},""" +
        f""""cell_ratio":$cellRatio%.2f"""
      db.enableServing()
      db.searchHits(queries(qids.head), k = 10) // warm
      val full = qids.map { q =>
        q -> db.searchHits(queries(q), k = 10).map(_.docId).toSet
      }.toMap
      val fullMs = median(qids.map(q => time(db.searchHits(queries(q), k = 10))))
      // Warm the probed (cell-masked) scan path too — its first call JITs
      // the skip branch and would otherwise pollute the first grid row.
      db.searchHits(queries(qids.head), k = 10, nprobe = 1)

      val probeRows = probes.filter(_ < cells).map { np =>
        val (recalls, times) = qids.map { q =>
          val t0 = System.nanoTime()
          val got = db.searchHits(queries(q), k = 10, nprobe = np)
            .map(_.docId).toSet
          val ms = (System.nanoTime() - t0) / 1e6
          (got.intersect(full(q)).size / 10.0, ms)
        }.unzip
        val rec = recalls.sum / recalls.size
        val ms = median(times)
        f"""{"cells":$cells,"assign":"$assign","manifold":"$manifold",""" +
          f""""nprobe":$np,"recall_vs_full":$rec%.3f,"hits_ms":$ms%.1f,$balance}"""
      }
      val fullRow =
        f"""{"cells":$cells,"assign":"$assign","manifold":"$manifold",""" +
          f""""nprobe":$cells,"recall_vs_full":1.000,"hits_ms":$fullMs%.1f,$balance}"""
      (probeRows :+ fullRow).foreach(println)
      db.disableServing()
      probeRows :+ fullRow
    }

    // The r10 grid, now under the learned (default) assignment…
    val centered = Seq(16, 64, 256).flatMap(cells =>
      sweep(cells, VectorDB.IvfAssignKmeans, "centered", Seq(1, 2, 4, 8)))
    // …and the skewed-manifold comparison at one geometry: learned
    // cells must stay bounded where prefix cells collapse.
    val skewed = Seq(VectorDB.IvfAssignKmeans, VectorDB.IvfAssignPrefix)
      .flatMap(assign => sweep(64, assign, "skewed", Seq(4, 8)))
    val rows = centered ++ skewed

    println(s"""{"metric":"ivf_tuning","n":$n,"dim":$dim,"clusters":$clusters,""" +
      s""""intrinsic_dim":$intrinsicDim,"n_queries":$nQueries,""" +
      s""""skew_bias":$skewBias,"skew_dims":$skewDims,""" +
      s""""rows":${rows.mkString("[", ",", "]")},""" +
      """"note":"recall_vs_full isolates the probing knob: nprobe-probed results vs the same DB at full probe (= flat, parity spec-pinned); funnel-vs-exact retention is RECALL_r{N}'s job. cell_ratio = max/median over non-empty cells of the build. assign=kmeans is the learned k-majority quantizer (default since r11); the skewed rows show prefix collapsing (cells_nonempty ~ 1) where kmeans stays balanced."}""")
    spark.stop()
  }
}
