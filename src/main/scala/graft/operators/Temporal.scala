package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators over the event stream — the two join shapes a
  * log/feature pipeline needs that plain equi-joins can't express:
  *
  *  - '''as-of join''' (each left row matches the single most recent right
  *    row at or before it) — feature lookup "state as of event time";
  *  - '''range/interval join''' (each interval matches every point inside
  *    it) — windowed attribution, sessional co-occurrence.
  *
  * Neither exists as a Spark operator, and the naive formulation of both is
  * an inequality theta-join that Catalyst can only plan as a broadcast
  * nested loop (O(n·m) comparisons and a single-box right side). These
  * implementations re-express the semantics with operators that DO
  * partition:
  *
  *  - as-of = union both sides tagged, one window per key, carry the last
  *    non-null right payload forward — ONE shuffle on the key, linear work,
  *    the classic log-merge shape (no per-row probe at all);
  *  - range = bucket time by the window width; an interval of width ≤ W
  *    overlaps at most 2 width-W buckets, so exploding the interval side
  *    into its buckets turns the theta-join into an equi-join on
  *    (key, bucket) with a residual range filter — pair enumeration is
  *    bounded by true temporal locality, never n·m.
  *
  * Both are therefore the 100 TB plan: they shuffle on (user, time-bucket)
  * like any other keyed operator, with no broadcast of a big side and no
  * nested loop. Timestamps are compared in epoch MICROSECONDS
  * (`unix_micros` over the normalized read ≡ DuckDB `epoch_ns(ts) // 1000`
  * — both floor; see [[Events.normalizeTs]] for the fixture's physical
  * timestamp units).
  *
  * Reference scope note: the reference engine has no temporal joins
  * (`/root/reference/BinaryVectorDB/BinaryVectorDB.py` — batch KV + vector
  * search only); these are extension operators in the spirit of SURVEY.md
  * §2.3's event-analytics family (E8).
  */
object Temporal {

  /** Epoch-microsecond projection of the events fixture. */
  private def eventsUs(spark: SparkSession, dir: String): DataFrame =
    Events.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))

  /** As-of join: for every `error` event, the most recent other-type event
    * by the same user at or before it (ties on `us` broken by the larger
    * `event_id` — deterministic under the fixture's microsecond ties).
    *
    * Implementation: union the tagged sides, sort each user's timeline once
    * (`us` asc, candidates before errors at equal `us`, `event_id` asc),
    * and carry the last candidate payload forward with
    * `last(_, ignoreNulls)` over the running window. One exchange on
    * `user_id`; no join at all. Errors with no prior candidate keep NULLs
    * (left-outer as-of).
    */
  def asofJoin(spark: SparkSession, dir: String, leftType: String = "error"): DataFrame = {
    val e = eventsUs(spark, dir)
    val tagged = e.withColumn("tag", when(col("event_type") === leftType, 1).otherwise(0))
    // Candidates (tag 0) sort before errors (tag 1) at equal us, so the
    // running `last` sees exactly the candidates with (us, id) ≤ the error.
    val timeline = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("tag").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val candidate = when(col("tag") === 0,
      struct(col("us").as("pus"), col("event_id").as("pid"), col("event_type").as("ptype")))
    tagged
      .withColumn("prev", last(candidate, ignoreNulls = true).over(timeline))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("us").as("err_us"),
        col("prev.ptype").as("prev_type"),
        (col("us") - col("prev.pus")).as("gap_us"))
      .orderBy("event_id")
  }

  /** Default attribution window: 10 minutes, in microseconds. */
  val WindowUs: Long = 600000000L

  /** Range join: events falling in the 10 minutes after each signup by the
    * same user, aggregated per signup (count + value sum; signups with no
    * follow-up keep zero). The interval side explodes into the ≤ 2 width-W
    * buckets `[s, s+W)` overlaps, the point side computes its single
    * bucket, and the join is a plain equi-join on (user_id, bucket) plus
    * the exact residual filter — a point lies in exactly one bucket, so no
    * pair can match twice and no distinct is needed.
    */
  def rangeJoinBucketed(spark: SparkSession, dir: String,
                        windowUs: Long = WindowUs): DataFrame = {
    val e = eventsUs(spark, dir)
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"), col("us").as("s_us"))
    val sExp = signups.withColumn("bucket",
      explode(array_distinct(array(
        expr(s"s_us div ${windowUs}L"),
        expr(s"(s_us + ${windowUs - 1}L) div ${windowUs}L")))))
    val points = e.filter(col("event_type") =!= "signup")
      .select(col("user_id"), col("us"), col("value"),
        expr(s"us div ${windowUs}L").as("bucket"))
    // Sum in exact integer cents: `value` is exactly-2-dp (TESTDATA), and a
    // double sum's last digit is partial-aggregation-order dependent — the
    // same revenue-cents contract as Relational (commit 83f1971).
    val matched = sExp.join(points, Seq("user_id", "bucket"))
      .filter(col("us") >= col("s_us") && col("us") < col("s_us") + windowUs)
      .groupBy("signup_id")
      .agg(count(lit(1)).as("n"), sum(Events.valueCents).as("v_c"))
    signups.join(matched, Seq("signup_id"), "left")
      .select(col("signup_id").as("event_id"), col("user_id"), col("s_us"),
        coalesce(col("n"), lit(0L)).as("n_follow"),
        coalesce(col("v_c"), lit(0L)).as("sum_value_c"))
      .orderBy("event_id")
  }

  val oracles: Map[String, String] = Map(
    // Deterministic as-of mirror: rank all candidates at-or-before each
    // error by (us desc, event_id desc) and keep rn=1 — the same tie-break
    // the window implementation applies. (DuckDB's ASOF JOIN keyword leaves
    // equal-timestamp ties unspecified, so the mirror ranks explicitly.)
    "q_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us, event_type
        |           FROM events),
        |err AS (SELECT * FROM e WHERE event_type = 'error'),
        |cand AS (SELECT * FROM e WHERE event_type <> 'error'),
        |m AS (
        |  SELECT err.event_id, c.event_type AS ptype, c.us AS pus,
        |    row_number() OVER (PARTITION BY err.event_id
        |                       ORDER BY c.us DESC, c.event_id DESC) AS rn
        |  FROM err JOIN cand c ON c.user_id = err.user_id AND c.us <= err.us)
        |SELECT err.event_id, err.user_id, err.us AS err_us,
        |  m.ptype AS prev_type, err.us - m.pus AS gap_us
        |FROM err LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)
        |ORDER BY event_id""".stripMargin,

    "q_range_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
        |                  event_type, value FROM events),
        |s AS (SELECT event_id, user_id, us AS s_us FROM e WHERE event_type = 'signup'),
        |p AS (SELECT user_id, us, value FROM e WHERE event_type <> 'signup')
        |SELECT s.event_id, s.user_id, s.s_us,
        |  count(p.us)::BIGINT AS n_follow,
        |  coalesce(sum(round(p.value * 100)::BIGINT), 0)::BIGINT AS sum_value_c
        |FROM s LEFT JOIN p ON p.user_id = s.user_id
        |  AND p.us >= s.s_us AND p.us < s.s_us + 600000000
        |GROUP BY s.event_id, s.user_id, s.s_us
        |ORDER BY s.event_id""".stripMargin,
  )
}
