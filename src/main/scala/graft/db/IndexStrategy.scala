package graft.db

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Extensible index-strategy seam behind `VectorDB`'s `index` knob —
  * the engine-side mirror of the reference's `index_type` constructor
  * parameter (`BinaryVectorDB/BinaryVectorDB.py:17`, which accepts any
  * faiss binary index object). The facade stays fixed; what varies per
  * strategy is (a) whether the hot tier carries a `cell:int` column
  * (cell-partitioned COW snapshots, serving-block skip sets) and, if
  * so, (b) how a row's code maps to a cell and (c) in which order a
  * query probes cells.
  *
  * Built-ins: [[IndexStrategies.Flat]] (exhaustive scan — the
  * reference's own default) and [[IndexStrategies.Ivf]] (cell
  * partitioning with the learned k-majority or legacy prefix
  * quantizer). Additional strategies register via
  * [[IndexStrategies.register]] BEFORE `openOrCreate` — the stored
  * config names the strategy, so a folder built with a custom strategy
  * reopens only in a JVM that registered it (same contract as a custom
  * faiss index type: the code must be importable).
  */
trait IndexStrategy {

  /** The name persisted in `config.json` and matched at reopen. */
  def name: String

  /** True when the hot tier carries a `cell` column: the COW snapshot
    * is then written `partitionBy("cell")` (file-source partition
    * pruning), serving blocks carry per-row cells + distinct-cell skip
    * sets, and `nprobe` is accepted at search time.
    */
  def partitioned: Boolean

  /** Cell id (int) for each ingested row, from the packed
    * `array<long>` code column. Called only when [[partitioned]];
    * ingest-time only — the query path reads the persisted column.
    * `packedCodes`/`nRows` describe the WHOLE batch, for strategies
    * that learn a model from it (e.g. the first-batch k-majority
    * centroids).
    */
  def cellColumn(ctx: IndexStrategy.Context, codeArray: Column,
                 packedCodes: org.apache.spark.sql.DataFrame,
                 nRows: Long): Column =
    throw new UnsupportedOperationException(s"$name does not partition")

  /** All cells in probe-priority order for a query's packed words
    * (`take(nprobe)` is the probe set). Called only when
    * [[partitioned]].
    */
  def probeOrder(ctx: IndexStrategy.Context, qWords: Seq[Long]): IndexedSeq[Int] =
    throw new UnsupportedOperationException(s"$name does not partition")

  /** Optional per-serving-block candidate generator ([[NavBuilder]]):
    * when defined, the prepared scan builds one [[BlockNav]] per block
    * and Phase-I top-B runs through it instead of the linear scan —
    * possibly APPROXIMATE (the strategy's contract to document).
    * Orthogonal to [[partitioned]]: a cell-partitioned strategy may also
    * navigate within blocks. The non-serving Catalyst path ignores this
    * (it stays exhaustive/exact). Default: none — linear scan.
    */
  def navBuilder(ctx: IndexStrategy.Context): Option[NavBuilder] = None
}

object IndexStrategy {

  /** What a strategy may consult, without coupling to the `VectorDB`
    * internals: geometry plus callbacks into the owning instance for
    * the persisted centroid model (learned once, folder-resident).
    */
  final case class Context(
      cells: Int,
      nWords: Int,
      prefixBits: Int,
      assign: String,
      /** The folder's persisted centroid model, if any. */
      centroidModel: () => Option[IvfCentroids.Model],
      /** Get-or-learn centroids from (packed-codes DF, batch row count). */
      ensureCentroids: (org.apache.spark.sql.DataFrame, Long) => IvfCentroids.Model)
}

/** JVM-global registry of [[IndexStrategy]] implementations, keyed by
  * name. Built-ins are pre-registered; `VectorDB.openOrCreate` resolves
  * the requested/stored name here.
  */
object IndexStrategies {

  object Flat extends IndexStrategy {
    val name = VectorDB.IndexFlat
    val partitioned = false
  }

  /** Cell-partitioned strategy: learned k-majority centroids
    * (`ivf_assign = kmeans`, the default — [[IvfCentroids]]) or the
    * legacy sign-code prefix (`prefix` — what pre-knob folders store).
    */
  object Ivf extends IndexStrategy {
    val name = VectorDB.IndexIvf
    val partitioned = true

    override def cellColumn(ctx: IndexStrategy.Context, codeArray: Column,
                            packedCodes: org.apache.spark.sql.DataFrame,
                            nRows: Long): Column =
      if (ctx.assign == VectorDB.IvfAssignKmeans) {
        // Learned: nearest k-majority centroid by hamming — ingest-only
        // cost (O(cells·words) popcounts per row via a UDF over the
        // packed code); the first batch learns + persists the model.
        val m = ctx.ensureCentroids(packedCodes, nRows)
        val assignU = udf((code: scala.collection.Seq[Long]) => m.assign(code.toArray))
        assignU(codeArray)
      } else
        shiftrightunsigned(element_at(codeArray, 1), 64 - ctx.prefixBits)
          .bitwiseAND(lit(ctx.cells - 1)).cast("int")

    override def probeOrder(ctx: IndexStrategy.Context,
                            qWords: Seq[Long]): IndexedSeq[Int] =
      ctx.centroidModel() match {
        case Some(m) => m.probeOrder(qWords.toArray)
        case None =>
          val qPrefix = (qWords(0) >>> (64 - ctx.prefixBits)).toInt & (ctx.cells - 1)
          (0 until ctx.cells).sortBy(c =>
            (java.lang.Integer.bitCount(c ^ qPrefix), c))
      }
  }

  /** Navigable-small-world strategy: each serving block carries an NSW
    * graph over its codes ([[NswNavBuilder]]) and Phase-I is best-first
    * graph search — sub-linear per partition, APPROXIMATE at the default
    * width (recall tunable via `efSearch`; `efSearch` ≥ block rows
    * degenerates to exact, spec-pinned). The analogue of constructing
    * the reference with `faiss.IndexBinaryHNSW(d, M)`
    * (`BinaryVectorDB.py:17` takes the index object; its parameters ride
    * the object) — here, register a reparameterized instance under the
    * same name before open: `IndexStrategies.register(new Nsw(m = 32))`.
    * Without serving the strategy behaves exactly like `flat`.
    */
  final class Nsw(val m: Int = 16, val efConstruction: Int = 128,
                  val efSearch: Int = 96,
                  /** 0 (default) = auto-sized concurrent insertion —
                    * cores-aware, [[NswNavBuilder.autoThreads]]; 1 =
                    * deterministic single-threaded builds.
                    */
                  val buildThreads: Int = 0,
                  val hierarchy: Boolean = true) extends IndexStrategy {
    val name = VectorDB.IndexNsw
    val partitioned = false
    override def navBuilder(ctx: IndexStrategy.Context): Option[NavBuilder] =
      Some(new NswNavBuilder(m, efConstruction, efSearch, buildThreads, hierarchy))
  }

  /** IVF cells + per-block NSW graphs composed: the hot tier is
    * cell-partitioned (learned k-majority / prefix quantizer, probe
    * pruning — everything [[Ivf]] does) AND each serving block carries
    * a navigable-small-world graph, so a probe-limited search skips
    * non-probed blocks and navigates sub-linearly inside the probed
    * ones — per-cell graphs, built with the serving blocks at
    * commit-refresh. Same approximation contract as [[Nsw]]; exact at
    * `efSearch` ≥ block rows AND full probe.
    */
  final class IvfNsw(val m: Int = 16, val efConstruction: Int = 128,
                     val efSearch: Int = 96,
                     /** 0 (default) = auto — see [[Nsw.buildThreads]]. */
                     val buildThreads: Int = 0,
                     val hierarchy: Boolean = true) extends IndexStrategy {
    val name = VectorDB.IndexIvfNsw
    val partitioned = true
    override def cellColumn(ctx: IndexStrategy.Context, codeArray: Column,
                            packedCodes: org.apache.spark.sql.DataFrame,
                            nRows: Long): Column =
      Ivf.cellColumn(ctx, codeArray, packedCodes, nRows)
    override def probeOrder(ctx: IndexStrategy.Context,
                            qWords: Seq[Long]): IndexedSeq[Int] =
      Ivf.probeOrder(ctx, qWords)
    override def navBuilder(ctx: IndexStrategy.Context): Option[NavBuilder] =
      Some(new NswNavBuilder(m, efConstruction, efSearch, buildThreads, hierarchy))
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, IndexStrategy]()
  register(Flat)
  register(Ivf)
  register(new Nsw())
  register(new IvfNsw())

  /** Register a strategy (idempotent by name; last registration wins).
    * Must happen before any `openOrCreate` naming it.
    */
  def register(s: IndexStrategy): Unit = registry.put(s.name, s)

  def get(name: String): Option[IndexStrategy] = Option(registry.get(name))

  def names: Set[String] = {
    val b = Set.newBuilder[String]
    registry.forEach((k, _) => b += k)
    b.result()
  }
}
