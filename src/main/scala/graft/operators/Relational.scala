package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E6: general relational capability over the TPC-H-ish fixture tables —
  * scan-heavy aggregation, broadcast-dim joins, window functions, rollup.
  * These prove the engine is a full analytics surface, not only a vector
  * store, and they are the operators that carry the 100 TB scale story:
  *
  *  - fact tables (`lineitem`, `orders`) are only ever scanned with
  *    filters/projections that push into the parquet reader;
  *  - dimension tables are broadcast so fact-side data never shuffles
  *    for a join — unconditionally for the schema-bounded ones
  *    (`nation`/`region`, ≤25 rows at any SF), and behind a SIZE GATE
  *    ([[dimBroadcast]]) for `customer`/`supplier`, which grow linearly
  *    with SF: above the budget the hint is omitted and the planner's
  *    shuffle join on the high-cardinality key takes over;
  *  - aggregations are partial (map-side combine) by construction;
  *  - double-valued outputs are rounded (2–4 dp) so the DuckDB oracle
  *    hash-matches despite summation-order differences.
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Broadcast budget for SF-proportional dimensions (`customer`,
    * `supplier`): comfortably inside a normal executor/driver broadcast
    * allowance, far below the scale where a forced hint would OOM.
    * `nation`/`region` are schema-bounded (≤25 rows) and stay
    * unconditional.
    */
  val DimBroadcastMaxBytes: Long = 256L << 20

  /** The d5 conditional-hint pattern generalized to join dimensions:
    * apply `broadcast()` only while Catalyst's own size estimate for the
    * relation fits `maxBytes`; otherwise plant NO hint, leaving the
    * strategy to the planner/AQE (which at large SF picks a shuffle join
    * on the high-cardinality dim key — the scale-safe fallback). The
    * estimate is driver-side plan analysis only; no job runs.
    */
  private[graft] def dimBroadcast(df: DataFrame,
                                  maxBytes: Long = DimBroadcastMaxBytes): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(maxBytes)) broadcast(df)
    else df

  /** Discounted revenue in exact 10^-4 dollars: the fixture's prices and
    * discounts are 2-decimal values (verified exhaustively), so
    * `l_extendedprice·(1−l_discount) ≡ cents(price)·(100−cents(discount))`
    * in int64 — and an integer sum is summation-order-independent, where a
    * rounded double sum flips its last cent whenever the exact value lands
    * within an ulp of a .005 boundary (observed: q_monthly_revenue at
    * sf0.001, 3141848.765). Cent output is recovered half-up:
    * `(c4_sum + 50) div 100`. DuckDB mirror:
    * `sum(round(l_extendedprice*100)::BIGINT * (100 - round(l_discount*100)::BIGINT))`.
    */
  private val revenueC4 =
    expr("cast(round(l_extendedprice * 100) as bigint) * " +
      "(100 - cast(round(l_discount * 100) as bigint))")

  /** Half-up cents from a summed [[revenueC4]] column. */
  private def centsHalfUp(c4Sum: String): org.apache.spark.sql.Column =
    expr(s"($c4Sum + 50) div 100")

  /** TPC-H Q1-style pricing summary: the canonical scan+partial-agg shape. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        sum(expr("cast(round(l_extendedprice * 100) as bigint)")).as("sum_base_price_c"),
        sum(revenueC4).as("disc_c4"),
        // quantities are integer-valued and discounts 2-decimal: their
        // means are exact small rationals, which hit .00005 rounding
        // boundaries where Spark and DuckDB round() disagree — so the
        // means are emitted as integer basis points via exact int64
        // arithmetic (round-half-up(10^4·sum/n) = (2·10^4·sum+n) div 2n).
        sum(col("l_quantity")).cast("long").as("qsum"),
        sum(round(col("l_discount") * 100).cast("long")).as("dsum"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("sum_base_price_c"), centsHalfUp("disc_c4").as("sum_disc_price_c"),
        expr("int((20000 * qsum + count_order) div (2 * count_order))").as("avg_qty_bp"),
        expr("int((20000 * dsum + count_order) div (2 * count_order))").as("avg_disc_cbp"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: top-10 order revenue for one market segment.
    * customer is the small side → size-gated broadcast ([[dimBroadcast]]);
    * the orders⋈lineitem join shuffles on the natural key; final top-k is
    * TakeOrderedAndProject.
    */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame =
    q3TopOrders(spark, dir, DimBroadcastMaxBytes)

  /** As above with an explicit broadcast budget; pass 0 to force the
    * hint-free shuffle-join path (PlanSpec pins it stays hint-free).
    */
  def q3TopOrders(spark: SparkSession, dir: String, dimMaxBytes: Long): DataFrame = {
    val cust = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(spark, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = t(spark, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(dimBroadcast(cust, dimMaxBytes), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(revenueC4).as("rev_c4"))
      .select(col("l_orderkey"), unix_timestamp(col("o_orderdate")).as("o_orderdate_epoch"),
        centsHalfUp("rev_c4").as("revenue_c"))
      .orderBy(col("revenue_c").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-style: revenue by nation through a 5-way join; every
    * dimension side broadcast (supplier/customer behind the
    * [[dimBroadcast]] size gate), so the fact scan never shuffles for
    * joins while the dims genuinely fit.
    */
  def q5NationRevenue(spark: SparkSession, dir: String): DataFrame =
    q5NationRevenue(spark, dir, DimBroadcastMaxBytes)

  /** As above with an explicit broadcast budget for the SF-proportional
    * dims; pass 0 to force their hint-free shuffle-join path (nation,
    * schema-bounded, stays broadcast either way).
    */
  def q5NationRevenue(spark: SparkSession, dir: String, dimMaxBytes: Long): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val ord = t(spark, dir, "orders")
    val cust = t(spark, dir, "customer")
    val supp = t(spark, dir, "supplier")
    val nat = t(spark, dir, "nation")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(dimBroadcast(supp, dimMaxBytes), li("l_suppkey") === supp("s_suppkey"))
      .join(dimBroadcast(cust, dimMaxBytes), ord("o_custkey") === cust("c_custkey"))
      .filter(cust("c_nationkey") === supp("s_nationkey"))
      .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenueC4).as("rev_c4"), count(lit(1)).as("n_items"))
      .select(col("n_name"), centsHalfUp("rev_c4").as("revenue_c"), col("n_items"))
      .orderBy(col("revenue_c").desc, col("n_name").asc)
  }

  /** Window functions over the fact table: per-customer order sequencing
    * with running revenue (rank + cumulative sum in one window spec — one
    * shuffle on the partition key).
    */
  def qWindowCustomerOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders").filter(col("o_custkey") < 100)
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    ord
      .withColumn("order_seq", row_number().over(w))
      .withColumn("running_spend",
        round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .select(col("o_custkey"), col("order_seq"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("running_spend"))
      .orderBy(col("o_custkey").asc, col("order_seq").asc)
  }

  /** Rollup (grouping-sets) aggregate — subtotal + grand-total rows. */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Cube aggregate — all grouping-set combinations. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(round(sum("o_totalprice"), 2).as("sum_price"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Explicit grouping sets — the general form rollup/cube specialize:
    * per-status totals, per-priority totals, and the grand total in one
    * pass (Catalyst expands to a single Expand + hash aggregate).
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum("o_totalprice"), 2).as("sum_price"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Date/time functions over the fact table: monthly revenue series
    * (year/month extraction, month truncation, date arithmetic).
    */
  def qMonthlyRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(year(col("l_shipdate")).as("y"), month(col("l_shipdate")).as("m"))
      .agg(
        sum(revenueC4).as("rev_c4"),
        count(lit(1)).as("n_items"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .select(col("y"), col("m"), centsHalfUp("rev_c4").as("revenue_c"),
        col("n_items"), col("n_orders"))
      .orderBy("y", "m")

  /** String functions over part names: tokenize brand ids out of
    * 'Brand#N', LIKE filters, upper/substr/concat — the string-fn
    * coverage row of SURVEY §2.2.
    */
  def qStringFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_name").like("%e%"))
      .groupBy(
        substring(col("p_type"), 1, 3).as("type_prefix"),
        regexp_replace(col("p_brand"), "Brand#", "").cast("int").as("brand_num"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(upper(col("p_name"))).as("n_names"),
        max(concat(col("p_brand"), lit(":"), col("p_type"))).as("max_tag"),
        sum(length(col("p_name"))).as("lsum"))
      // integer mean in exact basis points (see q1Agg note)
      .select(col("type_prefix"), col("brand_num"), col("n"), col("n_names"),
        col("max_tag"),
        expr("int((20000 * lsum + n) div (2 * n))").as("avg_name_len_bp"))
      .orderBy("type_prefix", "brand_num")

  /** Set operations: customers active in 1996 but not 1997 (EXCEPT), and
    * active in both (INTERSECT).
    */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
    def activeIn(year: Int) = ord
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select("o_custkey").distinct()
    val only96 = activeIn(1996).except(activeIn(1997))
      .withColumn("cohort", lit("only_1996"))
    val both = activeIn(1996).intersect(activeIn(1997))
      .withColumn("cohort", lit("both_years"))
    only96.unionByName(both)
      .groupBy("cohort").agg(count(lit(1)).as("n_customers"))
      .orderBy("cohort")
  }

  /** Outer joins + null handling: per-customer order presence via a left
    * outer join (unmatched side nulls counted explicitly).
    */
  def qOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_custkey")).as("n_customers"),
        countDistinct(when(col("o_orderkey").isNull, col("c_custkey"))).as("n_inactive"),
        count(col("o_orderkey")).as("n_recent_orders"))
      .orderBy("c_mktsegment")
  }

  /** Semi/anti joins as first-class results: per nation, suppliers with
    * at least one 1996 shipment (EXISTS ≡ left_semi) and with none
    * (NOT EXISTS ≡ left_anti).
    */
  def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val supp = t(spark, dir, "supplier")
    val nat = t(spark, dir, "nation")
    val shipped = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_suppkey").as("s_suppkey")).distinct()
    val active = supp.join(shipped, Seq("s_suppkey"), "left_semi")
      .withColumn("status", lit("active_1996"))
    val inactive = supp.join(shipped, Seq("s_suppkey"), "left_anti")
      .withColumn("status", lit("inactive_1996"))
    active.unionByName(inactive)
      .join(broadcast(nat), col("s_nationkey") === nat("n_nationkey"))
      .groupBy("n_name", "status").agg(count(lit(1)).as("n_suppliers"))
      .orderBy("n_name", "status")
  }

  /** Pivot via conditional aggregation (dialect-portable): revenue per
    * ship-year split across return flags as columns.
    */
  def qPivotConditional(spark: SparkSession, dir: String): DataFrame = {
    // exact half-up cents per flag — see [[revenueC4]]
    def flagSum(f: String) =
      expr("(sum(CASE WHEN l_returnflag = '" + f + "' THEN " +
        "cast(round(l_extendedprice * 100) as bigint) * (100 - cast(round(l_discount * 100) as bigint)) " +
        "ELSE 0L END) + 50) div 100")
    t(spark, dir, "lineitem")
      .groupBy(year(col("l_shipdate")).as("y"))
      .agg(flagSum("A").as("rev_a_c"), flagSum("N").as("rev_n_c"), flagSum("R").as("rev_r_c"),
        count(lit(1)).as("n"))
      .orderBy("y")
  }

  /** Salted hot-key join, oracle-checked: revenue per part brand through
    * [[Skew.saltedJoin]]. In the fixture no single part key is pathological,
    * but the OPERATOR is the one a skewed fact table needs — the big side
    * gets a deterministic salt in [0, 8), the small side is exploded 8×,
    * and the join key becomes (key, salt), spreading any hot key over 8
    * reducers. The result is provably the plain join (SkewSpec asserts
    * it; the oracle IS the plain join), so correctness is independent of
    * the salting — only the shuffle distribution changes.
    */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_partkey").as("partkey"), col("l_orderkey"),
        revenueC4.as("rev_c4"))
    val pt = t(spark, dir, "part").select(col("p_partkey").as("partkey"), col("p_brand"))
    Skew.saltedJoin(li, pt, "partkey", saltCol = col("l_orderkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"), sum("rev_c4").as("rev_c4"))
      .select(col("p_brand"), col("n_items"), centsHalfUp("rev_c4").as("revenue_c"))
      .orderBy("p_brand")
  }

  val oracles: Map[String, String] = Map(
    "q_salted_join" ->
      """SELECT p_brand, count(*) AS n_items,
        |  ((sum(round(l_extendedprice * 100)::BIGINT
        |      * (100 - round(l_discount * 100)::BIGINT)) + 50) // 100)::BIGINT AS revenue_c
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_semi_anti" ->
      """WITH shipped AS (
        |  SELECT DISTINCT l_suppkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'),
        |tagged AS (
        |  SELECT s_nationkey, 'active_1996' AS status FROM supplier s
        |  WHERE EXISTS (SELECT 1 FROM shipped WHERE l_suppkey = s.s_suppkey)
        |  UNION ALL
        |  SELECT s_nationkey, 'inactive_1996' AS status FROM supplier s
        |  WHERE NOT EXISTS (SELECT 1 FROM shipped WHERE l_suppkey = s.s_suppkey))
        |SELECT n_name, status, count(*) AS n_suppliers
        |FROM tagged JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name, status ORDER BY n_name, status""".stripMargin,

    "q_pivot_conditional" ->
      """SELECT year(l_shipdate)::INT AS y,
        |  ((sum(CASE WHEN l_returnflag = 'A'
        |    THEN round(l_extendedprice * 100)::BIGINT * (100 - round(l_discount * 100)::BIGINT) ELSE 0 END) + 50) // 100)::BIGINT AS rev_a_c,
        |  ((sum(CASE WHEN l_returnflag = 'N'
        |    THEN round(l_extendedprice * 100)::BIGINT * (100 - round(l_discount * 100)::BIGINT) ELSE 0 END) + 50) // 100)::BIGINT AS rev_n_c,
        |  ((sum(CASE WHEN l_returnflag = 'R'
        |    THEN round(l_extendedprice * 100)::BIGINT * (100 - round(l_discount * 100)::BIGINT) ELSE 0 END) + 50) // 100)::BIGINT AS rev_r_c,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_set_ops" ->
      """WITH a96 AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
        |a97 AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'),
        |cohorts AS (
        |  SELECT o_custkey, 'only_1996' AS cohort FROM (SELECT * FROM a96 EXCEPT SELECT * FROM a97)
        |  UNION ALL
        |  SELECT o_custkey, 'both_years' AS cohort FROM (SELECT * FROM a96 INTERSECT SELECT * FROM a97))
        |SELECT cohort, count(*) AS n_customers FROM cohorts
        |GROUP BY cohort ORDER BY cohort""".stripMargin,

    "q_outer_join" ->
      """SELECT c_mktsegment,
        |  count(DISTINCT c_custkey) AS n_customers,
        |  count(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END) AS n_inactive,
        |  count(o_orderkey) AS n_recent_orders
        |FROM customer LEFT OUTER JOIN (
        |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01') o
        |  ON c_custkey = o.o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_string_funcs" ->
      """SELECT substr(p_type, 1, 3) AS type_prefix,
        |  replace(p_brand, 'Brand#', '')::INT AS brand_num,
        |  count(*) AS n,
        |  count(DISTINCT upper(p_name)) AS n_names,
        |  max(concat(p_brand, ':', p_type)) AS max_tag,
        |  ((20000 * sum(length(p_name)) + count(*)) // (2 * count(*)))::INT AS avg_name_len_bp
        |FROM part
        |WHERE p_name LIKE '%e%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  round(sum(o_totalprice), 2) AS sum_price, count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    // Revenue in exact half-up cents — see [[revenueC4]]: rounded double
    // sums of the 4-decimal price·discount products flip their last cent
    // on .005 boundaries (hit at sf0.001), integer sums can't.
    "q_monthly_revenue" ->
      """SELECT year(l_shipdate)::INT AS y, month(l_shipdate)::INT AS m,
        |  ((sum(round(l_extendedprice * 100)::BIGINT * (100 - round(l_discount * 100)::BIGINT)) + 50) // 100)::BIGINT AS revenue_c,
        |  count(*) AS n_items, count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_base_price_c,
        |  ((sum(round(l_extendedprice * 100)::BIGINT * (100 - round(l_discount * 100)::BIGINT)) + 50) // 100)::BIGINT AS sum_disc_price_c,
        |  ((20000 * sum(l_quantity)::BIGINT + count(*)) // (2 * count(*)))::INT AS avg_qty_bp,
        |  ((20000 * sum(round(l_discount * 100)::BIGINT) + count(*)) // (2 * count(*)))::INT AS avg_disc_cbp,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT l_orderkey,
        |  cast(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch,
        |  ((sum(round(l_extendedprice * 100)::BIGINT * (100 - round(l_discount * 100)::BIGINT)) + 50) // 100)::BIGINT AS revenue_c
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue_c DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n_name,
        |  ((sum(round(l_extendedprice * 100)::BIGINT * (100 - round(l_discount * 100)::BIGINT)) + 50) // 100)::BIGINT AS revenue_c,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE c_nationkey = s_nationkey
        |GROUP BY n_name
        |ORDER BY revenue_c DESC, n_name ASC""".stripMargin,

    "q_window_customer_orders" ->
      """SELECT o_custkey,
        |  (row_number() OVER w)::INT AS order_seq,
        |  o_orderkey,
        |  round(o_totalprice, 2) AS o_totalprice,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders
        |WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey ASC, order_seq ASC""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  round(sum(o_totalprice), 2) AS sum_price, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
  )
}
