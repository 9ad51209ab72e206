package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics (batch form; [[graft.streaming.StreamingIngest]]
  * runs the same aggregations as Structured Streaming queries and the
  * specs assert batch/stream equivalence — extension E8).
  *
  * Timestamps are emitted as epoch seconds (BIGINT) so the oracle compare
  * is type-stable; Spark `unix_timestamp` FLOORS sub-second timestamps, so
  * the DuckDB mirror is `floor(epoch(ts))::BIGINT` (a bare
  * `epoch(ts)::BIGINT` cast rounds — off-by-one on .5+ fractions).
  */
object Events {

  /** The events fixture has shipped `ts` as both parquet TIMESTAMP(NANOS)
    * (older generations) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (current). Spark rejects NANOS by default; with `nanosAsLong` it
    * surfaces as LongType, which we convert via integer division — `div`,
    * not `/`, since nanos ~1.7e18 exceed double's 53-bit mantissa. MICROS
    * surfaces as TimestampNTZType when not adjusted to UTC (the current
    * fixture — handled by [[normalizeTs]]'s NTZ branch) or TimestampType
    * when adjusted (the passthrough case); the nanosAsLong flag is a
    * no-op for both, so [[events]] adapts on the resolved schema and
    * handles every fixture generation.
    *
    * The legacy flag is set on a SCOPED SESSION CLONE (`newSession()` —
    * same SparkContext, isolated SQL conf), never on the caller's shared
    * session: each parquet scan resolves its conf through the session its
    * relation was created with, so only the events read sees the flag.
    * (A per-read `.option(...)` does NOT work — the executor-side schema
    * converter consults the session conf, not the relation's options.)
    */
  private[graft] val NanosAsLong = "spark.sql.legacy.parquet.nanosAsLong"

  private val nanosSessions =
    scala.collection.concurrent.TrieMap.empty[SparkSession, SparkSession]

  /** The events-reader clone of `spark`: isolated conf with nanosAsLong
    * set. Also the session that owns any streaming sink started from an
    * [[graft.streaming.StreamingIngest.eventsStream]] source.
    */
  private[graft] def eventsSession(spark: SparkSession): SparkSession =
    nanosSessions.getOrElseUpdate(spark, {
      val s = spark.newSession()
      s.conf.set(NanosAsLong, "true")
      s
    })

  /** Normalize a raw events relation so `ts` is TimestampType regardless
    * of the fixture's physical timestamp encoding (see [[NanosAsLong]]).
    * The NTZ case maps the naive wall-clock to the SAME instant DuckDB's
    * `epoch(ts)` assigns it (epoch = naive value read as UTC) without
    * consulting `spark.sql.session.timeZone` — a plain cast would shift
    * by the session zone and break the oracle compare off-UTC.
    */
  private[graft] def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos surfaced as long
        // A LongType ts is assumed to be NANOSECONDS (the nanosAsLong
        // surfacing). Guard the unit per row: epoch nanos for any date
        // past 1973 exceed 1e17, while plain int64 micros (~1.7e15 for
        // 2024) or seconds never do — a fixture generation shipping
        // unlabeled micros must fail loudly here instead of silently
        // shifting every timestamp 1000×.
        // NULL ts stays NULL (the guard must not turn a nullable column
        // into a query-wide crash); only a present-but-too-small value
        // raises.
        raw.withColumn("ts", timestamp_micros(expr(
          "case when ts is null then cast(null as bigint) " +
            "when ts >= 100000000000000000 then ts div 1000 " +
            "else raise_error(concat('events.ts LongType value ', ts, " +
            "' is too small to be epoch nanoseconds — unlabeled int64 " +
            "micros/seconds fixture?')) end")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", timestamp_micros(expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")))
      case _ => raw // already an instant (TIMESTAMP with tz semantics)
    }

  private[operators] def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(eventsSession(spark).read.parquet(s"$dir/events.parquet"))

  /** E8a: tumbling 1-hour windows per event type — the canonical streaming
    * aggregation shape (`window()` aligns to epoch hours, same as
    * `date_trunc('hour')`). Partial aggregation map-side; one shuffle on
    * (window, event_type).
    */
  /** `value` carries exactly-2-dp amounts (TESTDATA fixture); summing them
    * as doubles is partial-aggregation-order dependent, so every sum here
    * is taken in exact integer cents (`round(value·100)::BIGINT`) — the
    * same contract as Relational's revenue cents (commit 83f1971).
    */
  private[graft] val valueCents = expr("cast(round(value * 100) as bigint)")

  def hourly(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(valueCents).as("sum_value_c"))
      .select(unix_timestamp(col("w.start")).as("hour_epoch"), col("event_type"),
        col("n"), col("sum_value_c"))
      .orderBy("hour_epoch", "event_type")

  /** E8b: sessionization — gaps-and-islands with a 30-minute inactivity
    * gap. One shuffle on user_id; both window functions share the same
    * partitioning/ordering so Catalyst plans a single Window exchange.
    */
  def sessionize(spark: SparkSession, dir: String, gapSeconds: Long = 1800): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val sec = unix_timestamp(col("ts"))
    val sessions = events(spark, dir)
      .withColumn("prev_sec", lag(sec, 1).over(w))
      .withColumn("new_sess",
        when(col("prev_sec").isNull || (sec - col("prev_sec")) > gapSeconds, 1L).otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_events"), (max(sec) - min(sec)).as("dur_secs"))

    sessions.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        max("dur_secs").as("max_session_secs"))
      // integer mean in exact basis points (events/session · 10^4)
      .select(col("user_id"), col("n_sessions"), col("n_events"),
        expr("int((20000 * n_events + n_sessions) div (2 * n_sessions))")
          .as("avg_session_events_bp"),
        col("max_session_secs"))
      .orderBy("user_id")
  }

  /** E8c: semi-structured props — JSON field extraction + per-type stats.
    *
    * Rows without a numeric k are excluded in BOTH engines (a group of
    * only such rows would divide by zero in the integer mean). The
    * exclusion is done INSIDE the aggregates rather than with a row
    * filter (r17): a `.filter(k.isNotNull)` on the derived column gets
    * pushed below the projection and re-runs `get_json_object` per row
    * — the guide §4.4 duplicated-evaluation trap — where min/max/sum
    * already ignore nulls, the value sum goes null-conditional, and
    * all-null groups drop out via the aggregate-level `n > 0` filter
    * (which cannot be pushed below its own aggregation). One JSON parse
    * per row instead of two; identical output.
    */
  def jsonStats(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n"), min("k").as("min_k"), max("k").as("max_k"),
        sum("k").as("ksum"),
        sum(when(col("k").isNotNull, valueCents)).as("sum_value_c"))
      .filter(col("n") > 0)
      // integer mean in exact basis points
      .select(col("event_type"), col("n"), col("min_k"), col("max_k"),
        expr("int((20000 * ksum + n) div (2 * n))").as("avg_k_bp"),
        col("sum_value_c"))
      .orderBy("event_type")

  /** E8d: conversion-funnel analytics — per user, the earliest `view`,
    * the earliest `click` STRICTLY after that view, and the earliest
    * `purchase` strictly after that click; output is users surviving
    * each step. The classic ordered-sequence product query, done without
    * any per-user event collection: three conditional-min aggregations
    * over `user_id`-hash-partitioned events. The optimizer pushes each
    * step's `event_type` filter BELOW the repartition, so the three
    * branches shuffle DISJOINT slices (views, clicks, purchases) — in
    * total one pass over the events table, filter-before-shuffle — and
    * every groupBy/join above keys on `user_id`, so the aggregated
    * per-user relations arrive co-partitioned with the next step's
    * event slice (verified executed plan: three REPARTITION_BY_COL
    * exchanges over disjoint filters, zero ENSURE_REQUIREMENTS
    * exchanges on user_id).
    *
    * Deliberately NO broadcast hints: the per-user min relations (v, c)
    * grow linearly with the user base, so forcing them executor-resident
    * would OOM at large user counts even though users ≪ events. The
    * planner still broadcasts them when its own size estimate says
    * they're genuinely small (AQE does exactly that at fixture scale) —
    * a conditional decision, which is the scale-safe one; `user_id` is
    * high-cardinality and unskewed, so the co-partitioned fallback join
    * is safe at any volume.
    */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("sec"))
      .repartition(col("user_id"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("sec").as("vs"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("sec") > col("vs"))
      .groupBy("user_id").agg(min("sec").as("cs"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("sec") > col("cs"))
      .groupBy("user_id").agg(min("sec").as("ps"))
    v.agg(count(lit(1)).as("n_users")).withColumn("step", lit("1_view"))
      .unionByName(c.agg(count(lit(1)).as("n_users")).withColumn("step", lit("2_click")))
      .unionByName(p.agg(count(lit(1)).as("n_users")).withColumn("step", lit("3_purchase")))
      .select("step", "n_users")
      .orderBy("step")
  }

  val oracles: Map[String, String] = Map(
    "e4_funnel_steps" ->
      """WITH e AS (
        |  SELECT user_id, event_type, floor(epoch(ts))::BIGINT sec FROM events),
        |v AS (SELECT user_id, min(sec) vs FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(sec) cs FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND sec > vs GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(sec) ps FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND sec > cs GROUP BY e.user_id)
        |SELECT '1_view' AS step, count(*)::BIGINT AS n_users FROM v
        |UNION ALL SELECT '2_click', count(*)::BIGINT FROM c
        |UNION ALL SELECT '3_purchase', count(*)::BIGINT FROM p
        |ORDER BY step""".stripMargin,

    "e1_hourly" ->
      """SELECT floor(epoch(date_trunc('hour', ts)))::BIGINT AS hour_epoch,
        |  event_type, count(*) AS n,
        |  sum(round(value * 100)::BIGINT)::BIGINT AS sum_value_c
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e2_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, floor(epoch(ts))::BIGINT sec,
        |    lag(floor(epoch(ts))::BIGINT) OVER
        |      (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) prev_sec
        |  FROM events),
        |marked AS (
        |  SELECT user_id, event_id, ts, sec,
        |    CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END new_sess
        |  FROM e),
        |numbered AS (
        |  SELECT user_id, sec,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sess_id
        |  FROM marked),
        |sessions AS (
        |  SELECT user_id, sess_id, count(*) n_events, max(sec) - min(sec) dur_secs
        |  FROM numbered GROUP BY user_id, sess_id)
        |SELECT user_id, count(*) AS n_sessions, sum(n_events)::BIGINT AS n_events,
        |  ((20000 * sum(n_events) + count(*)) // (2 * count(*)))::INT AS avg_session_events_bp,
        |  max(dur_secs) AS max_session_secs
        |FROM sessions GROUP BY user_id ORDER BY user_id""".stripMargin,

    "e3_json_stats" ->
      """WITH e AS (
        |  SELECT event_type, value, json_extract_string(props, '$.k')::BIGINT k
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  min(k) AS min_k, max(k) AS max_k,
        |  ((20000 * sum(k) + count(*)) // (2 * count(*)))::INT AS avg_k_bp,
        |  sum(round(value * 100)::BIGINT)::BIGINT AS sum_value_c
        |FROM e WHERE k IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
