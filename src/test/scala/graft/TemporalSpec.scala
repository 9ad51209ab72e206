package graft

import graft.operators.Temporal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Temporal joins: the scalable forms (window log-merge as-of, bucketed
  * range join) must produce exactly what the naive inequality theta-joins
  * produce, and must plan as partitioned equi-join/window work — never a
  * nested loop.
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def eventsUs(): DataFrame = {
    graft.operators.Events.normalizeTs(
      graft.operators.Events.eventsSession(spark).read
        .parquet(s"$dir/events.parquet"))
      .withColumn("us", unix_micros(col("ts")))
      .select("event_id", "user_id", "us", "event_type", "value")
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("normalizeTs LongType branch: nanos convert, NULL passes, unlabeled micros raise") {
    import spark.implicits._
    // 2024-01-01T00:00:00Z in epoch nanoseconds — well above the 1e17 guard.
    val nanos = 1704067200L * 1000000000L
    val ok = graft.operators.Events.normalizeTs(
      Seq(Some(nanos), None).toDF("ts"))
    val got = ok.select(unix_micros(col("ts"))).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(Some(nanos / 1000), None))
    // The same instant in MICROS (an unlabeled-int64 fixture) is 1000x
    // below the nanos range: the guard must raise, not silently shift.
    val err = intercept[Exception] {
      graft.operators.Events.normalizeTs(
        Seq(nanos / 1000).toDF("ts")).collect()
    }
    assert(err.getMessage.contains("too small to be epoch nanoseconds") ||
      Option(err.getCause).exists(_.getMessage.contains("too small to be epoch nanoseconds")),
      err.toString)
  }

  test("as-of join matches the naive inequality-join + argmax formulation") {
    val e = eventsUs()
    val err = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("us").as("err_us"))
    val cand = e.filter(col("event_type") =!= "error")
      .select(col("user_id"), col("us").as("pus"), col("event_id").as("pid"),
        col("event_type").as("ptype"))
    val w = Window.partitionBy("event_id").orderBy(col("pus").desc, col("pid").desc)
    val naive = err.join(cand, err("user_id") === cand("user_id") && col("pus") <= col("err_us"))
      .select(err("event_id"), err("user_id"), col("err_us"), col("ptype"), col("pus"), col("pid"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("err_us"),
        col("ptype").as("prev_type"), (col("err_us") - col("pus")).as("gap_us"))
    // errors with no prior candidate: naive inner join drops them; re-add
    val matchedIds = naive.select("event_id")
    val unmatched = err.join(matchedIds, Seq("event_id"), "left_anti")
      .select(col("event_id"), col("user_id"), col("err_us"),
        lit(null).cast("string").as("prev_type"), lit(null).cast("long").as("gap_us"))
    val expected = naive.unionByName(unmatched).orderBy("event_id")

    val got = Temporal.asofJoin(spark, dir)
    assert(got.count() === err.count(), "one output row per error event")
    assert(rows(got) === rows(expected))
  }

  test("bucketed range join matches the naive inequality join") {
    val e = eventsUs()
    val s = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("sid"), col("user_id").as("su"), col("us").as("s_us"))
    val p = e.filter(col("event_type") =!= "signup")
      .select(col("user_id").as("pu"), col("us"), col("value"))
    val naive = s.join(p,
        col("pu") === col("su") && col("us") >= col("s_us") &&
          col("us") < col("s_us") + Temporal.WindowUs, "left")
      .groupBy(col("sid").as("event_id"), col("su").as("user_id"), col("s_us"))
      .agg(count(col("us")).as("n_follow"),
        coalesce(sum(expr("cast(round(value * 100) as bigint)")), lit(0L))
          .as("sum_value_c"))
      .orderBy("event_id")

    val got = Temporal.rangeJoinBucketed(spark, dir)
    assert(got.count() === s.count(), "one output row per signup")
    assert(rows(got) === rows(naive))
  }

  test("range join plans as an equi-join on (user, bucket) — no nested loop, no cartesian") {
    val plan = Temporal.rangeJoinBucketed(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
    assert(plan.contains("bucket"), s"bucket key missing from the join:\n$plan")
  }

  test("as-of join is window work on one user partitioning — no join operator at all") {
    val plan = Temporal.asofJoin(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should be pure window/merge work:\n$plan")
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"),
      s"window carry-forward missing:\n$plan")
  }

  test("every error either has a prior candidate with gap_us >= 0 or NULLs") {
    val got = Temporal.asofJoin(spark, dir)
    assert(got.filter(col("gap_us") < 0).count() === 0)
    assert(got.filter(col("prev_type").isNull =!= col("gap_us").isNull).count() === 0)
  }
}
