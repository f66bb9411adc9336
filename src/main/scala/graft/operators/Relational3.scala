package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Relational core, third wave — the TPC-H shapes the inventory still
  * lacked: conditional-share aggregation (Q14), aggregate-filter-then-
  * rejoin (Q18), and the bilateral two-dimension join (Q7). Money math
  * follows the Relational contract: exact DECIMAL sums, double only at
  * the edge, deterministic ORDER BY.
  */
object Relational3 {

  private def dec(c: String, p: Int, s: Int): Column = col(c).cast(DecimalType(p, s))
  private val one = lit(1.00).cast(DecimalType(3, 2))
  private def revenue: Column =
    (dec("l_extendedprice", 12, 2) *
      (one - dec("l_discount", 4, 2)).cast(DecimalType(4, 2))).cast(DecimalType(18, 4))

  /** TPC-H Q14-style promotion effect, widened to a monthly series: per
    * ship month, promo-part revenue share of total revenue.
    *
    * Shape: part (dimension) broadcast into the lineitem scan, ONE
    * two-phase conditional aggregation — the share's numerator and
    * denominator are both plain sums, so the whole query is a single
    * shuffle keyed by month. The share is integer ppm via DECIMAL
    * IntegralDivide over the exact sums (both engines truncate the
    * positive quotient identically — no double-division seam).
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    Tables.lineitem(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(unix_micros(date_trunc("month", col("l_shipdate")).cast(TimestampType))
        .as("month_us"))
      .agg(
        sum(when(col("p_type") === "PROMO", revenue)
          .otherwise(lit(0).cast(DecimalType(18, 4)))).as("promo_d"),
        sum(revenue).as("total_d"),
        count(lit(1)).as("n_lines"))
      .select(col("month_us"),
        col("promo_d").cast(DoubleType).as("promo_revenue"),
        col("total_d").cast(DoubleType).as("total_revenue"),
        expr("CAST(CAST(promo_d * 1000000 AS DECIMAL(38,4)) DIV total_d AS BIGINT)")
          .as("promo_ppm"),
        col("n_lines"))
      .orderBy(col("month_us"))
  }

  /** DuckDB's `//` on DECIMAL operands routes through double and can
    * round the quotient up by 1; HUGEINT (int128) division is exact
    * floor, which is what Spark's decimal IntegralDivide
    * (divideToIntegralValue) computes. Equivalence:
    * promo·1e6 DIV total == (promo·1e4)·1e6 // (total·1e4).
    */
  val q14Sql: String =
    """SELECT epoch_us(date_trunc('month', l_shipdate)) AS month_us,
      |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
      |  CAST(sum(rev) AS DOUBLE) AS total_revenue,
      |  CAST((CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS HUGEINT) * 1000000)
      |    // CAST(sum(rev) * 10000 AS HUGEINT) AS BIGINT) AS promo_ppm,
      |  count(*) AS n_lines
      |FROM (
      |  SELECT l_shipdate, p_type,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |         CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4)) AS rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey)
      |GROUP BY 1 ORDER BY month_us""".stripMargin

  /** TPC-H Q8-style national market share: within one market (customers
    * of one region) and one part type, the share of yearly revenue
    * supplied by one target nation — the two-level conditional-share
    * aggregation over the deepest join tree in the set (lineitem ⋈ part
    * ⋈ supplier ⋈ nation ⋈ orders ⋈ customer ⋈ nation ⋈ region).
    *
    * Shape: the part-type filter broadcasts into the fact FIRST (cuts
    * ~4/5 of lines before anything else), supplier⋈nation broadcasts,
    * the customer→nation→region market filter broadcasts into orders,
    * and lineitem ⋈ orders is the q7/q12 fact×fact co-shuffle on the
    * order key. One conditional aggregation keyed by year; share in
    * integer ppm via the q14 decimal IntegralDivide device.
    */
  val q8Region = "ASIA"
  val q8Nation = "NATION_12"
  val q8PartType = "ECONOMY"

  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val partT = Tables.part(spark, dir)
      .filter(col("p_type") === q8PartType).select(col("p_partkey"))
    val suppN = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val marketCust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey").as("cnk"), col("n_regionkey"))),
        col("c_nationkey") === col("cnk"))
      .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === q8Region).select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .join(broadcast(marketCust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_partkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(partT), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey")) // fact×fact co-shuffle
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === q8Nation, revenue)
          .otherwise(lit(0).cast(DecimalType(18, 4)))).as("nation_d"),
        sum(revenue).as("total_d"),
        count(lit(1)).as("n_lines"))
      .select(col("o_year"),
        col("nation_d").cast(DoubleType).as("nation_revenue"),
        col("total_d").cast(DoubleType).as("total_revenue"),
        expr("CAST(CAST(nation_d * 1000000 AS DECIMAL(38,4)) DIV total_d AS BIGINT)")
          .as("nation_ppm"),
        col("n_lines"))
      .orderBy(col("o_year"))
  }

  /** Same HUGEINT-floor-division equivalence as q14Sql. */
  val q8Sql: String =
    s"""SELECT CAST(o_year AS INTEGER) AS o_year,
       |  CAST(sum(CASE WHEN supp_nation = '$q8Nation' THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nation_revenue,
       |  CAST(sum(rev) AS DOUBLE) AS total_revenue,
       |  CAST((CAST(sum(CASE WHEN supp_nation = '$q8Nation' THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS HUGEINT) * 1000000)
       |    // CAST(sum(rev) * 10000 AS HUGEINT) AS BIGINT) AS nation_ppm,
       |  count(*) AS n_lines
       |FROM (
       |  SELECT year(o_orderdate) AS o_year, sn.n_name AS supp_nation,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
       |         CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4)) AS rev
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey AND p_type = '$q8PartType'
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation sn ON s_nationkey = sn.n_nationkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation cn ON c_nationkey = cn.n_nationkey
       |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = '$q8Region')
       |GROUP BY 1 ORDER BY o_year""".stripMargin

  /** TPC-H Q18-style large-volume orders: orders whose total line
    * quantity exceeds the threshold, with their customer.
    *
    * Shape: the HAVING aggregate runs FIRST (map-side partial sums on
    * the fact), and only the tiny surviving key set joins back to
    * orders⋈customer — at scale the filter output is orders-of-magnitude
    * smaller than the fact, so AQE turns the rejoin into a broadcast.
    * Never the naive three-way join before aggregation. Bounded output
    * via TakeOrdered.
    */
  val q18QtyThreshold = 250

  def q18LargeVolume(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec("l_quantity", 12, 2)).as("sum_qty_d"))
      .filter(col("sum_qty_d") > lit(q18QtyThreshold))
    big.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast(TimestampType)).as("o_orderdate_us"),
        dec("o_totalprice", 12, 2).cast(DoubleType).as("o_totalprice"),
        col("sum_qty_d").cast(DoubleType).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    s"""SELECT c_name, c_custkey, o_orderkey,
       |  epoch_us(o_orderdate) AS o_orderdate_us,
       |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
       |  CAST(sum_qty_d AS DOUBLE) AS sum_qty
       |FROM (
       |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty_d
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > $q18QtyThreshold)
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** TPC-H Q7-style bilateral volume shipping, widened to the FULL
    * nation×nation trade matrix: revenue flowing from every supplier
    * nation to every customer nation, by ship year, with a cross-border
    * flag (classic Q7 filters to one nation pair; the matrix is the same
    * plan and robust at any scale factor — a fixed pair can have zero
    * trades on a small corpus, and the matrix is what a trade analyst
    * pivots anyway).
    *
    * Shape: the TRUE dimensions (supplier, customer, both nation
    * lookups) broadcast; lineitem ⋈ orders is the q12 fact×fact
    * discipline — a co-shuffle on the order key, because orders is the
    * schema's second fact and broadcasting it is a driver/executor OOM
    * at 100 TB (AQE still broadcasts at runtime iff the filtered side
    * actually fits; a bucketed layout removes the exchange entirely —
    * lake_bucketed is that demonstration). The final keyed aggregation's
    * key space is bounded by nations² × years; the year comes from the
    * fact row itself.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val supp = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey")) // fact×fact co-shuffle
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(revenue).cast(DoubleType).as("revenue"), count(lit(1)).as("n_lines"))
      .withColumn("cross_border", col("supp_nation") =!= col("cust_nation"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7Sql: String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |  CAST(sum(rev) AS DOUBLE) AS revenue, count(*) AS n_lines,
       |  supp_nation <> cust_nation AS cross_border
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(year(l_shipdate) AS INTEGER) AS l_year,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
       |         CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4)) AS rev
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey)
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin
}
