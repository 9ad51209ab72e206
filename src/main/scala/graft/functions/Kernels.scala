package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions._

/** Column-level API over the graft vector kernels plus the deterministic
  * text-hashing helpers shared by the dedup/text-analysis operators.
  *
  * Registration: `Kernels.install(spark)` (idempotent, per-session) or the
  * [[GraftExtensions]] `SparkSessionExtensions` class for sessions built
  * with `.withExtensions`. The Column helpers resolve through the
  * registry (`call_function`), so they work on any installed session and
  * the same kernels are usable from SQL.
  */
object Kernels {

  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_hamming"   -> (e => HammingDistance(e(0), e(1))),
    "graft_dot"       -> (e => DotProduct(e(0), e(1))),
    "graft_sign_dot"  -> (e => SignDotPacked(e(0), e(1))),
    "graft_pack_bits" -> (e => PackSignBits(e(0))),
    "graft_int8"      -> (e => QuantizeInt8(e(0), e(1))),
    "graft_dot_int8"  -> (e => DotInt8(e(0), e(1))),
    "graft_norm_int8" -> (e => NormInt8(e(0))),
    "graft_simhash"   -> (e => SimHash60(e(0))),
    "graft_h60"       -> (e => Md5Hash60(e(0))),
    "graft_h60_array" -> (e => Md5Hash60Array(e(0))),
    "graft_minhash_16" -> (e => MinHashSig(e(0), 16)),
    "graft_minhash_32" -> (e => MinHashSig(e(0), 32)),
    "graft_embed_64"  -> (e => HashingEmbed(e(0), 64)),
    "graft_shingle3"  -> (e => Shingle3(e(0))),
    "graft_embed_1024" -> (e => HashingEmbed(e(0), 1024)),
    // k arrives as a literal expression argument, parsed at build time
    // (the reference accepts any k/oversample, BinaryVectorDB.py:174).
    "graft_topk_hamming" -> (e => HammingTopKAgg(e(0), e(1), litInt(e(2), "graft_topk_hamming"))),
    "graft_topk_code" -> (e => HammingTopKCodeAgg(e(0), e(1), e(2), litInt(e(3), "graft_topk_code"))),
    "graft_topk_cand" -> (e => HammingTopKCandAgg(e(0), e(1), e(2), e(3), litInt(e(4), "graft_topk_cand"))),
    "graft_topk_score" -> (e => ScoreTopKAgg(e(0), e(1), litInt(e(2), "graft_topk_score"))),
    "graft_kmv" -> (e => KmvSketchAgg(e(0), litInt(e(1), "graft_kmv"))),
    // Spark's own runtime-row-filter predicate (the expression behind
    // injected bloom runtime filters), exposed for explicit broadcast
    // bloom pre-filters: args = (bloom bytes literal, long value).
    "graft_bloom_might_contain" -> (e =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(e(0), e(1))),
  )

  /** Fold a constant integer argument at function-build time (the heap
    * arity must be fixed before execution — it sizes the agg buffer).
    */
  private def litInt(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: k must be a literal, got ${e.sql}")
    val k = e.eval() match {
      case i: Int => i
      case l: Long =>
        require(l >= 1 && l <= Int.MaxValue, s"$fn: k out of range, got $l")
        l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: k must be an integer literal, got $other")
    }
    // A zero/negative arity would silently build an empty heap and return
    // empty aggregates instead of erroring.
    require(k >= 1, s"$fn: k must be >= 1, got $k")
    k
  }

  /** Sessions whose registry already holds every kernel. Keyed by the
    * session object (clones via `newSession()` carry their own registry
    * and register on first use); guards the serving hot path — `install`
    * sits on every search call, and re-registering 16 functions
    * per query is avoidable registry mutation (and WARN-log spam).
    */
  private val installedSessions =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Serializes extraStrategies check-and-append across sessions (the
    * ExperimentalMethods object may be shared by clones).
    */
  private val strategyLock = new Object

  /** Idempotent per-session registration of all kernels. Session clones
    * (`newSession()`/`cloneSession()`) copy the parent's registry
    * contents, so each kernel is registered only if its name is absent —
    * an unconditional createOrReplace would emit a "replaced a previously
    * registered function" WARN per kernel per clone (16 lines of log spam
    * on every events/streaming session, round-9 review item 4). The
    * existence check is by NAME: the `graft_*` namespace is reserved —
    * a caller who registers their own function under a graft_ name
    * before install() wins the name and the kernels will resolve to it.
    */
  def install(spark: SparkSession): Unit =
    if (installedSessions.add(spark)) {
      val registry = spark.sessionState.functionRegistry
      registrations.foreach { case (name, builder) =>
        if (!registry.functionExists(FunctionIdentifier(name)))
          registry.createOrReplaceTempFunction(name, builder, "built-in")
      }
      // The ungrouped graft_topk_cand fast path (primitive-heap physical
      // operator — see graft.plans.TopKCandStrategy). Idempotent per
      // session; sessions built with GraftExtensions get it there.
      // SPARK_GRAFT_NO_TOPK_EXEC=1 keeps the ObjectHashAggregate path
      // (A/B benching + safety valve for a custom physical operator).
      if (!sys.env.contains("SPARK_GRAFT_NO_TOPK_EXEC")) {
        // ExperimentalMethods may be shared across session clones, and
        // check-then-append is not atomic — two sessions installing
        // concurrently could register the strategy twice (ADVICE r11).
        // One global lock: installs are rare (once per session).
        val exp = spark.experimental
        strategyLock.synchronized {
          if (!exp.extraStrategies.contains(graft.plans.TopKCandStrategy))
            exp.extraStrategies = exp.extraStrategies :+ graft.plans.TopKCandStrategy
        }
      }
    }

  // ---- vector kernels -----------------------------------------------------

  /** popcount(xor) over `array<long>` packed codes. */
  def hamming(a: Column, b: Column): Column = call_function("graft_hamming", a, b)

  /** Dot product of two numeric arrays (double accumulator). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** L2 norm of a numeric array. */
  def norm(a: Column): Column = sqrt(call_function("graft_dot", a, a))

  /** Cosine similarity of two numeric arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** `q · (2*unpackbits(code) − 1)` — Phase-II score from the packed code. */
  def signDot(q: Column, code: Column): Column = call_function("graft_sign_dot", q, code)

  /** Q1: float vector → packed sign-bit code (`array<long>`, MSB-first). */
  def packBits(v: Column): Column = call_function("graft_pack_bits", v)

  /** Q2: float vector → int8 bytes, symmetric linear scale by maxAbs. */
  def int8(v: Column, maxAbs: Column): Column = call_function("graft_int8", v, maxAbs)

  /** Dot of float/double query against an int8 binary column. */
  def dotInt8(q: Column, bytes: Column): Column = call_function("graft_dot_int8", q, bytes)

  /** L2 norm of an int8 binary column. */
  def normInt8(bytes: Column): Column = call_function("graft_norm_int8", bytes)

  /** 60-bit SimHash over an array of token hashes. */
  def simHash(hashes: Column): Column = call_function("graft_simhash", hashes)

  /** Bounded top-k aggregate over (int score, long id) pairs — smallest k
    * by (score, id), as array<struct<vec_id,score>>. Map-side partial
    * heaps mean a multi-query scan shuffles only Q×k states. Any k ≥ 1
    * (passed as a literal, folded at function-build time).
    */
  def hammingTopK(score: Column, id: Column, k: Int): Column =
    call_function("graft_topk_hamming", score, id, lit(k))

  /** Top-k heap carrying the packed code as payload — phase II of the
    * fused funnel reads candidate codes from the aggregate output.
    */
  def hammingTopKWithCode(score: Column, id: Column, code: Column, k: Int): Column =
    call_function("graft_topk_code", score, id, code, lit(k))

  /** Top-k heap carrying BOTH funnel payloads (code for phase II,
    * embedding for phase III) — lets the single-query funnel express
    * phase I as a bounded aggregation the optimizer can never rewrite
    * into a global sort (see [[graft.functions.HammingTopKCandAgg]]).
    */
  def hammingTopKCand(score: Column, id: Column, code: Column,
                      emb: Column, k: Int): Column =
    call_function("graft_topk_cand", score, id, code, emb, lit(k))

  /** Bounded top-k over (double score, long id) — LARGEST k by
    * (score desc, id asc), best first, as array<struct<vec_id,score>>.
    * The grouped-top-k replacement for low-cardinality window ranks:
    * map-side partial heaps shuffle only groups×k states.
    */
  def scoreTopK(score: Column, id: Column, k: Int): Column =
    call_function("graft_topk_score", score, id, lit(k))

  /** KMV distinct-count sketch over long hashes: the k smallest distinct
    * values as a sorted-asc `array<long>` (k a literal ≥ 2). Bounded
    * map-side state — O(groups·k) shuffle for any input size — and
    * mergeable downstream (k smallest of `array_union(a, b)` = the union
    * sketch).
    */
  def kmvSketch(hash: Column, k: Int): Column =
    call_function("graft_kmv", hash, lit(k))

  /** Broadcast-bloom membership test over long values: `bloom` must be a
    * binary LITERAL holding a serialized `org.apache.spark.util.sketch
    * .BloomFilter` (e.g. from `df.stat.bloomFilter(...)` +
    * [[serializeBloom]]). Resolves to Spark's own
    * `BloomFilterMightContain` — the same predicate its injected runtime
    * row-level filters use — so the pre-filter is a native codegen'd
    * expression, not a UDF.
    */
  def bloomMightContain(bloom: Column, value: Column): Column =
    call_function("graft_bloom_might_contain", bloom, value)

  /** Serialize a driver-side bloom filter to the byte form
    * [[bloomMightContain]] expects as its literal argument. */
  def serializeBloom(bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  // ---- deterministic text hashing (oracle-mirrorable) ---------------------

  /** 60-bit deterministic hash: first 15 hex chars of md5, as a BIGINT.
    * DuckDB mirror: `cast(concat('0x', substr(md5(x), 1, 15)) as bigint)`.
    * Non-negative (< 2^60), so bitwise ops stay sign-free in both engines.
    */
  def h60(c: Column): Column = call_function("graft_h60", c)

  /** [[h60]] over every element of an `array<string>` in one pass. */
  def h60Array(c: Column): Column = call_function("graft_h60_array", c)

  /** Q3 hashing embedder: tokens → L2-normalized `array<float>` of a
    * registered dimension (64 or 1024 — the reference's native width).
    */
  def hashEmbed(tokens: Column, dim: Int = 64): Column = {
    require(dim == 64 || dim == 1024,
      s"registered hashing-embedder dimensions are 64 and 1024, got $dim")
    call_function(s"graft_embed_$dim", tokens)
  }

  def hashEmbed64(tokens: Column): Column = hashEmbed(tokens, 64)

  /** Whitespace tokens (the corpus is space-separated keyword text). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word 3-gram shingles. DuckDB mirror:
    * `list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)])`.
    */
  def shingles3(text: Column): Column = call_function("graft_shingle3", tokens(text))

  private val MersennePrime31 = 2147483647L // 2^31 − 1

  /** MinHash signature: array of `numHashes` minima over per-permutation
    * affine mixes of the shingle hashes, all mod 2^31−1. Products stay
    * < 2^62, so the identical formula is overflow-safe in both Spark
    * (Long) and DuckDB (BIGINT, which errors on overflow). Per-row (no
    * shuffle). DuckDB mirror of permutation i applied to base hash h:
    * `((2*i+1) * (h % 2147483647) + i * 12582917) % 2147483647`.
    */
  def minhashSignature(shingleHashes: Column, numHashes: Int): Column = {
    // MinHashSig carries a non-expression Int parameter, so it goes
    // through a registered per-arity builder (Column(expr) is internal
    // in Spark 4).
    require(numHashes == 16 || numHashes == 32,
      s"registered MinHash arities are 16 and 32, got $numHashes")
    call_function(s"graft_minhash_$numHashes", shingleHashes)
  }
}

/** `SparkSessionExtensions` hook: `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) registers every
  * graft kernel as a permanent SQL function.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    Kernels.registrations.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.VectorExpressions", name),
        builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.TopKCandStrategy)
  }
}
