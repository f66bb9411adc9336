package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables

/** Relational analytics core (SURVEY §2A) over the TPC-H-ish tables.
  *
  * Oracle-parity rules (SURVEY §6): money math is done in exact DECIMAL and
  * only converted to double at the very end, so Spark and DuckDB produce
  * bit-identical doubles regardless of partial-aggregation order; every
  * result has a deterministic ORDER BY on a unique key.
  */
object Relational {

  /** decimal casts shared by the money queries */
  private def dec(c: String, p: Int, s: Int): Column = col(c).cast(DecimalType(p, s))
  private val one = lit(1.00).cast(DecimalType(3, 2))

  /** TPC-H Q1-style pricing summary.
    * Exact-decimal sums → double; avg = decimal-sum/count in IEEE double.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val price = dec("l_extendedprice", 12, 2)
    val disc  = dec("l_discount", 4, 2)
    val tax   = dec("l_tax", 4, 2)
    val qty   = dec("l_quantity", 12, 2)
    val discounted = (price * (one - disc).cast(DecimalType(4, 2))).cast(DecimalType(18, 4))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).cast(DoubleType).as("sum_qty"),
        sum(price).cast(DoubleType).as("sum_base_price"),
        sum(discounted).cast(DoubleType).as("sum_disc_price"),
        sum(discounted * (one + tax).cast(DecimalType(4, 2))).cast(DoubleType).as("sum_charge"),
        (sum(qty).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(price).cast(DoubleType) / count(lit(1))).as("avg_price"),
        (sum(disc).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3-style shipping priority: filtered customer dimension is
    * broadcast into the orders⋈lineitem fact join; bounded top-k via
    * orderBy+limit (TakeOrderedAndProject — no global sort at scale).
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-06-01 00:00:00").cast(TimestampType)
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir).filter(col("o_orderdate") < cut)
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cut)
    val revenue = (dec("l_extendedprice", 12, 2) *
      (one - dec("l_discount", 4, 2)).cast(DecimalType(4, 2))).cast(DecimalType(18, 4))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(revenue).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON o_custkey = c_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5-style regional revenue: all dimensions (region, nation,
    * supplier, customer) broadcast; only the orders⋈lineitem fact join
    * shuffles.
    */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
        col("o_orderdate") < lit("1999-01-01 00:00:00").cast(TimestampType))
    val li = Tables.lineitem(spark, dir)
    val revenue = (dec("l_extendedprice", 12, 2) *
      (one - dec("l_discount", 4, 2)).cast(DecimalType(4, 2))).cast(DecimalType(18, 4))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenue).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Top-3 customers by account balance per market segment (ranking
    * window; partition-local sort only).
    */
  def qTopCustomersWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .withColumn("rank_in_segment", row_number().over(w))
      .filter(col("rank_in_segment") <= 3)
      .select(col("c_mktsegment"), col("rank_in_segment"), col("c_custkey"),
        col("c_name"), col("c_acctbal"))
      .orderBy(col("c_mktsegment"), col("rank_in_segment"))
  }

  val qTopCustomersSql: String =
    """SELECT c_mktsegment, rank_in_segment, c_custkey, c_name, c_acctbal
      |FROM (
      |  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
      |    CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rank_in_segment
      |  FROM customer)
      |WHERE rank_in_segment <= 3
      |ORDER BY c_mktsegment, rank_in_segment""".stripMargin

  /** ROLLUP over (status, priority) with exact-decimal money sums; rollup
    * NULLs are coalesced to 'ALL' so both engines emit identical keys.
    */
  def qRollupOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec("o_totalprice", 14, 2)).cast(DoubleType).as("total_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_price"))
      .orderBy(col("status"), col("priority"))
  }

  val qRollupSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Per-user event counts pivoted by event_type (map-side conditional
    * aggregation — one shuffle on user_id, no pivot-specific pass).
    */
  def qPivotEvents(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val aggs = types.map(t =>
      count(when(col("event_type") === t, 1)).as(s"n_$t")) :+
      count(lit(1)).as("n_total")
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("user_id"))
  }

  val qPivotSql: String =
    """SELECT user_id,
      |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
      |  count(*) FILTER (WHERE event_type = 'error') AS n_error,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      |  count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
      |  count(*) FILTER (WHERE event_type = 'view') AS n_view,
      |  count(*) AS n_total
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Running sum + 3-row moving average of event value per user. Windows
    * are ordered by event_id (arrival order): deterministic and immune to
    * the parquet ns-vs-µs timestamp truncation difference. Money math in
    * decimal; the final per-frame division is IEEE double in both engines.
    */
  def qRunningWindow(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mov = byUser.rowsBetween(-2, Window.currentRow)
    val v = dec("value", 12, 2)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"),
        sum(v).over(run).cast(DoubleType).as("running_sum"),
        (sum(v).over(mov).cast(DoubleType) / count(lit(1)).over(mov)).as("moving_avg3"))
      .orderBy(col("event_id"))
  }

  val qRunningSql: String =
    """SELECT event_id, user_id, value,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w_run AS DOUBLE) AS running_sum,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w_mov AS DOUBLE) / count(*) OVER w_mov AS moving_avg3
      |FROM events
      |WINDOW
      |  w_run AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  w_mov AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Hourly tumbling-window aggregation of the event stream (batch twin of
    * streaming.StreamOps.tumblingAgg).
    */
  def qTumblingWindow(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec("value", 12, 2)).cast(DoubleType).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("hour"), col("event_type"))
  }

  val qTumblingSql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  count(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY date_trunc('hour', ts), event_type
      |ORDER BY hour, event_type""".stripMargin

  /** Gap-based sessionization (30-min inactivity): a session boundary is
    * marked with lag(), session ids assigned by a running sum — two
    * window passes over one shuffle on user_id, then one aggregation.
    */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t_us"), dec("value", 12, 2).as("v"))
      .withColumn("is_new",
        when(col("t_us") - lag(col("t_us"), 1).over(byUser) > gapUs, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_id", sum(when(col("is_new") === 1, 1L).otherwise(
        when(lag(col("t_us"), 1).over(byUser).isNull, 1L).otherwise(0L))).over(run))
    ev.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("t_us")).as("start_us"),
        max(col("t_us")).as("end_us"),
        sum(col("v")).cast(DoubleType).as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val qSessionizeSql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t_us, CAST(value AS DECIMAL(12,2)) AS v,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
      |         WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      |), sessioned AS (
      |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM marked)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(t_us) AS start_us, max(t_us) AS end_us,
      |  CAST(sum(v) AS DOUBLE) AS sum_value
      |FROM sessioned
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** As-of join: each event picks the latest order of its customer with
    * o_orderdate <= ts (ties broken by max o_orderkey).
    *
    * Spark-first plan: instead of an exploding inequality join, events and
    * orders are unioned into one keyed timeline and a single
    * last-non-null window pass carries the most recent order forward —
    * one shuffle on the key, O(n log n) partition-local sort, no
    * candidate blowup. This is the shape that survives 100 TB.
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id").cast(LongType).as("k"),
      unix_micros(col("ts")).as("t_us"),
      lit(1).as("is_event"),
      col("event_id"),
      lit(null).cast(LongType).as("o_orderkey"),
      lit(null).cast(DoubleType).as("o_totalprice"))
    val ord = Tables.orders(spark, dir).select(
      col("o_custkey").cast(LongType).as("k"),
      // o_orderdate is TIMESTAMP_NTZ from parquet; session TZ is UTC so the
      // cast to LTZ is the identity and unix_micros applies.
      unix_micros(col("o_orderdate").cast(TimestampType)).as("t_us"),
      lit(0).as("is_event"),
      lit(null).cast(LongType).as("event_id"),
      col("o_orderkey"),
      col("o_totalprice"))
    // orders sort before events at equal t_us (is_event asc) so an order
    // dated exactly at the event timestamp is visible to it; equal-dated
    // orders resolve to max o_orderkey (last in o_orderkey asc order).
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t_us"), col("is_event"), col("o_orderkey").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(ord)
      .select(col("k"), col("t_us"), col("is_event"), col("event_id"),
        last(col("o_orderkey"), ignoreNulls = true).over(w).as("asof_orderkey"),
        last(col("o_totalprice"), ignoreNulls = true).over(w).as("asof_totalprice"))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("t_us"),
        col("asof_orderkey"), col("asof_totalprice"))
      .orderBy(col("event_id"))
  }

  val qAsofSql: String =
    """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS t_us,
      |  o.o_orderkey AS asof_orderkey, o.o_totalprice AS asof_totalprice
      |FROM events e LEFT JOIN orders o
      |  ON o.o_custkey = e.user_id AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)
      |QUALIFY o.o_orderkey IS NULL OR row_number() OVER (
      |  PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) = 1
      |ORDER BY e.event_id""".stripMargin

  /** Same as-of semantics as qAsofJoin, through the custom Catalyst
    * operator (graft.plans.AsOfJoinPlan → AsOfJoinExec): a partition-local
    * streaming merge join with O(1) state — checked against the same
    * DuckDB oracle as the window-union formulation.
    */
  def qAsofCustom(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id").cast(LongType).as("k"),
      unix_micros(col("ts")).as("t_us"),
      col("event_id"))
    val ord = Tables.orders(spark, dir).select(
      col("o_custkey").cast(LongType).as("ok"),
      unix_micros(col("o_orderdate").cast(TimestampType)).as("ot_us"),
      col("o_orderkey").as("asof_orderkey"),
      col("o_totalprice").as("asof_totalprice"))
    graft.plans.AsOf.join(ev, ord)
      .select(col("event_id"), col("k").as("user_id"), col("t_us"),
        col("asof_orderkey"), col("asof_totalprice"))
      .orderBy(col("event_id"))
  }

  /** Band-bucketed range self-join: pairs of events within 60 s of each
    * other. Each event joins only its own and the adjacent 60-s bucket —
    * a pair of equi-joins instead of an O(n²) inequality cross join.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val bandUs = 60L * 1000000
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("t_us"))
      .withColumn("bucket", floor(col("t_us") / bandUs))
    // each (a,b) pair matches exactly once: probe values are distinct and
    // only one equals b's bucket — no dedup pass needed.
    val left = ev.withColumn("probe",
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)))
    val right = ev.select(col("event_id").as("event_id_b"),
      col("event_type").as("event_type_b"), col("t_us").as("t_us_b"),
      col("bucket").as("bucket_b"))
    left.join(right, col("probe") === col("bucket_b"))
      .filter(col("event_id") < col("event_id_b") &&
        abs(col("t_us_b") - col("t_us")) <= bandUs)
      .groupBy(col("event_type"), col("event_type_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("event_type"), col("event_type_b"))
  }

  val qRangeSql: String =
    """SELECT a.event_type, b.event_type AS event_type_b, count(*) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.event_id < b.event_id
      | AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 60000000
      |GROUP BY a.event_type, b.event_type
      |ORDER BY a.event_type, b.event_type""".stripMargin

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4)) * CAST(1.00 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
