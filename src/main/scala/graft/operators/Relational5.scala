package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Relational core, fifth wave — the four remaining TPC-H disciplines,
  * all of which canonically read `partsupp`, a table the testdata does
  * not have. The part-supplier relation is therefore DERIVED from
  * lineitem (who actually shipped which part, at what line price) — the
  * same device q16 established — and each query keeps its canonical
  * PLAN SHAPE over that derived relation: Q2's per-group min + equality
  * rejoin, Q9's profit decomposition with a dimension-derived unit
  * cost, Q11's group-vs-scalar-total HAVING, and Q20's
  * more-than-half-of-group-total quantifier. Money math follows the
  * Relational contract: exact DECIMAL sums (operand widths chosen so no
  * intermediate ever rounds), double only at the very edge,
  * deterministic ORDER BY on a unique key.
  */
object Relational5 {

  private def dec(c: String, p: Int, s: Int): Column = col(c).cast(DecimalType(p, s))
  private val one = lit(1.00).cast(DecimalType(3, 2))
  private def revenue: Column =
    (dec("l_extendedprice", 12, 2) *
      (one - dec("l_discount", 4, 2)).cast(DecimalType(4, 2))).cast(DecimalType(18, 4))

  /** TPC-H Q2-style minimum-cost supplier: for every part of the target
    * size/type, the cheapest supplier(s) in the target region, where
    * "cost" is the minimum line price at which that supplier has
    * actually shipped that part (the lineitem-derived stand-in for
    * ps_supplycost — exact DECIMAL, no division).
    *
    * Shape: the correlated `cost = (SELECT min(cost) ...)` subquery
    * becomes ONE per-part aggregation over the derived part-supplier
    * relation followed by an equality rejoin on (partkey, cost) — the
    * q17/q15 rejoin discipline. The region's supplier set (supplier ⋈
    * nation ⋈ region) is dimension-sized and broadcasts into the fact
    * scan BEFORE the per-(part, supplier) aggregation, so the fact is
    * filtered to the region while still columnar; part (size/type
    * filter pushed to its scan) broadcasts too. Ties (several suppliers
    * at the same min cost) are kept, as Q2 specifies; output is bounded
    * (top-100 by account balance).
    */
  val q2Region = "EUROPE"
  val q2SizeMax = 10
  val q2Type = "LARGE"

  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val regionSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey") && col("r_name") === q2Region)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val partT = Tables.part(spark, dir)
      .filter(col("p_size") <= q2SizeMax && col("p_type") === q2Type)
      .select(col("p_partkey"), col("p_brand"))
    // derived part-supplier cost relation, region-filtered before the agg
    val ps = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .join(broadcast(partT), col("l_partkey") === col("p_partkey"))
      .join(broadcast(regionSupp.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(dec("l_extendedprice", 12, 2)).as("cost_d"))
    val minCost = ps.groupBy(col("l_partkey").as("m_partkey"))
      .agg(min(col("cost_d")).as("min_cost_d"))
    ps.join(minCost,
        col("l_partkey") === col("m_partkey") && col("cost_d") === col("min_cost_d"))
      .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(partT), col("l_partkey") === col("p_partkey"))
      .select(dec("s_acctbal", 12, 2).cast(DoubleType).as("s_acctbal"), col("s_name"),
        col("n_name"), col("p_partkey"), col("p_brand"),
        col("cost_d").cast(DoubleType).as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val q2Sql: String =
    s"""WITH region_supp AS (
       |  SELECT s_suppkey, s_name, s_acctbal, n_name
       |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey AND r_name = '$q2Region'),
       |part_t AS (
       |  SELECT p_partkey, p_brand FROM part
       |  WHERE p_size <= $q2SizeMax AND p_type = '$q2Type'),
       |ps AS (
       |  SELECT l_partkey, l_suppkey,
       |    min(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost_d
       |  FROM lineitem
       |  JOIN part_t ON l_partkey = p_partkey
       |  JOIN region_supp ON l_suppkey = s_suppkey
       |  GROUP BY l_partkey, l_suppkey),
       |min_cost AS (
       |  SELECT l_partkey AS m_partkey, min(cost_d) AS min_cost_d
       |  FROM ps GROUP BY l_partkey)
       |SELECT CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS s_acctbal,
       |  s_name, n_name, p_partkey, p_brand,
       |  CAST(cost_d AS DOUBLE) AS supply_cost
       |FROM ps
       |JOIN min_cost ON l_partkey = m_partkey AND cost_d = min_cost_d
       |JOIN region_supp ON l_suppkey = s_suppkey
       |JOIN part_t ON l_partkey = p_partkey
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  /** TPC-H Q9-style product-type profit: per (supplier nation, ship
    * year), the profit on one product type, where profit per line is
    * revenue − cost and the unit cost is the dimension-derived stand-in
    * `p_retailprice / 2` (partsupp's ps_supplycost does not exist; a
    * retail-margin cost is deterministic, part-local, and keeps Q9's
    * whole decomposition intact).
    *
    * Shape: part (type filter pushed to its scan) broadcasts into the
    * fact FIRST — the type cut removes ~5/6 of lines before anything
    * else; supplier ⋈ nation broadcasts; the year comes from the fact
    * row itself (l_shipdate — canonical Q9 reads o_orderdate, which
    * would add a second fact join; q7/q12 already demonstrate that
    * co-shuffle, so this query deliberately stays single-fact). All
    * profit arithmetic is width-exact: (15,3) unit cost × (12,2)
    * quantity = (28,5) exact, minus (18,4) revenue widened to (29,5) —
    * no intermediate rounds, both engines agree bit-for-bit.
    */
  val q9Type = "STANDARD"

  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val partT = Tables.part(spark, dir)
      .filter(col("p_type") === q9Type)
      .select(col("p_partkey"),
        (dec("p_retailprice", 12, 2) * lit(0.5).cast(DecimalType(2, 1)))
          .cast(DecimalType(15, 3)).as("unit_cost_d"))
    val suppN = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(partT), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).as("o_year"))
      .agg(
        sum(revenue.cast(DecimalType(29, 5)) -
          (col("unit_cost_d") * dec("l_quantity", 12, 2)).cast(DecimalType(29, 5)))
          .cast(DoubleType).as("profit"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  val q9Sql: String =
    s"""SELECT n_name, CAST(year(l_shipdate) AS INTEGER) AS o_year,
       |  CAST(sum(
       |    CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
       |      CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4)) AS DECIMAL(29,5)) -
       |    CAST(CAST(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(2,1)) AS DECIMAL(15,3)) *
       |      CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(29,5))) AS DOUBLE) AS profit,
       |  count(*) AS n_lines
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey AND p_type = '$q9Type'
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY n_name, o_year
       |ORDER BY n_name, o_year DESC""".stripMargin

  /** TPC-H Q11-style important-part concentration: parts whose shipped
    * value (by suppliers of one region) exceeds 0.1% of the region's
    * total shipped value — the group-vs-scalar-total HAVING shape.
    *
    * Shape: ONE per-part aggregation over the region-filtered fact
    * (region supplier set broadcast in), then the scalar grand total is
    * the aggregation re-aggregated to one row and broadcast back (never
    * a second fact scan); the share test is exact decimal
    * cross-multiplication (value · 1000 > total — no fraction, no
    * double), and the reported share is integer ppm via the q14
    * IntegralDivide device. Output bounded by the concentration
    * threshold itself, ordered by value then partkey.
    */
  val q11Region = "ASIA"

  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val regionSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey") && col("r_name") === q11Region)
      .select(col("s_suppkey"))
    val perPart = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(revenue).as("value_d"), count(lit(1)).as("n_lines"))
    val total = perPart.agg(sum(col("value_d")).as("total_d"))
    perPart.crossJoin(broadcast(total)) // 1-row scalar broadcast
      .filter(col("value_d") * lit(1000) > col("total_d"))
      .select(col("l_partkey").as("p_partkey"),
        col("value_d").cast(DoubleType).as("value"),
        expr("CAST(CAST(value_d * 1000000 AS DECIMAL(38,4)) DIV total_d AS BIGINT)")
          .as("share_ppm"),
        col("n_lines"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** DuckDB `//` on DECIMAL routes through double (q14 lesson): route
    * the ppm quotient through HUGEINT at matching scale instead. */
  val q11Sql: String =
    s"""WITH region_supp AS (
       |  SELECT s_suppkey
       |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey AND r_name = '$q11Region'),
       |per_part AS (
       |  SELECT l_partkey,
       |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
       |      CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS value_d,
       |    count(*) AS n_lines
       |  FROM lineitem JOIN region_supp ON l_suppkey = s_suppkey
       |  GROUP BY l_partkey),
       |total AS (SELECT sum(value_d) AS total_d FROM per_part)
       |SELECT l_partkey AS p_partkey, CAST(value_d AS DOUBLE) AS value,
       |  CAST((CAST(value_d * 10000 AS HUGEINT) * 1000000)
       |    // CAST(total_d * 10000 AS HUGEINT) AS BIGINT) AS share_ppm,
       |  n_lines
       |FROM per_part, total
       |WHERE value_d * 1000 > total_d
       |ORDER BY value DESC, p_partkey""".stripMargin

  /** TPC-H Q20-style dominant shippers: suppliers who shipped MORE THAN
    * HALF of a contested part's total shipped quantity during one year
    * (Q20's "availqty > half of ordered" quantifier, derived from
    * lineitem), counted per supplier over the target part type.
    * "Contested" = the part had at least two shipping suppliers that
    * year — without it a sole-supplier part is trivially dominated.
    *
    * Shape: the fact filters (year window pushed to the scan, part type
    * broadcast in) run first; ONE per-(part, supplier) aggregation,
    * re-aggregated per part (total + supplier count) and self-joined
    * back on the part key — aggregate-to-aggregate, both sides already
    * tiny; the half test is exact integer cross-multiplication
    * (2·qty_ps > qty_total on DECIMAL sums). The final per-supplier
    * count joins names by broadcast. Every shuffle after the scan is on
    * aggregate-sized data.
    */
  val q20Year = ("1996-01-01", "1997-01-01")
  val q20Type = "PROMO"

  def q20DominantShippers(spark: SparkSession, dir: String): DataFrame = {
    val partT = Tables.part(spark, dir)
      .filter(col("p_type") === q20Type).select(col("p_partkey"))
    val ps = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(q20Year._1).cast(TimestampType) &&
        col("l_shipdate") < lit(q20Year._2).cast(TimestampType))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .join(broadcast(partT), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec("l_quantity", 12, 2)).as("qty_ps_d"))
    val perPart = ps.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("qty_ps_d")).as("qty_total_d"), count(lit(1)).as("n_supp"))
    ps.join(perPart, col("l_partkey") === col("t_partkey"))
      .filter(col("n_supp") > 1 && col("qty_ps_d") * lit(2) > col("qty_total_d"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_parts_dominated"),
        sum(col("qty_ps_d")).cast(DoubleType).as("qty_dominated"))
      .join(broadcast(Tables.supplier(spark, dir)
          .join(broadcast(Tables.nation(spark, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        col("n_parts_dominated"), col("qty_dominated"))
      .orderBy(col("n_parts_dominated").desc, col("s_suppkey"))
  }

  /** ABC / Pareto classification of parts by revenue — the inventory-
    * management staple (class A: parts covering the first 80% of
    * cumulative revenue, B: to 95%, C: the tail), and the Lorenz-curve
    * shape every "what covers most of our X" analysis reduces to.
    *
    * Scale discipline: the descending cumulative revenue uses
    * GlobalRank.withGlobalCumsum — the distributed exact prefix sum
    * (range exchange + two-pass partition offsets) — NEVER an
    * empty-partitionBy window; revenue rides as exact BIGINT
    * micro-units (decimal ×10⁴ — cumsums of doubles would be
    * order-dependent), and the class boundaries are integer
    * cross-multiplications against the 1-row total (×20 vs ×16/×19 — reduced fractions keep the products inside BIGINT at any scale). The oracle runs
    * the literal window cumsum, proving the primitive bit-exact (the
    * pack_sequences device). Output = 3 class rows.
    */
  def qAbcParts(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.GlobalRank
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(revenue).as("rev_d"))
      .select(col("l_partkey"),
        expr("CAST(rev_d * 10000 AS BIGINT)").as("rev_u"))
    // r14 optimization round: the pre-cumsum localCheckpoint is gone —
    // withGlobalCumsum now persists + counts its input itself (one
    // materialization instead of checkpoint-then-sample-then-shuffle)
    val cum = GlobalRank.withGlobalCumsum(perPart, "rev_u", "cum_u",
      col("rev_u").desc, col("l_partkey"))
    val total = cum.agg(max(col("cum_u")).as("total_u"))
    cum.crossJoin(broadcast(total)) // 1-row scalar broadcast
      .withColumn("abc_class",
        when(col("cum_u") * 20 <= col("total_u") * 16, "A")
          .when(col("cum_u") * 20 <= col("total_u") * 19, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("rev_u")).as("rev_u_sum"))
      .crossJoin(broadcast(total))
      .select(col("abc_class"), col("n_parts"),
        (col("rev_u_sum").cast(DoubleType) / 10000.0).as("revenue"),
        // ppm through DECIMAL(38,0): rev_u_sum·1e6 exceeds BIGINT at
        // sf ≥ 0.01 (micro-unit totals ~1e13); the q14 widening device
        expr("CAST(CAST(rev_u_sum AS DECIMAL(38,0)) * 1000000 DIV total_u AS BIGINT)")
          .as("share_ppm"))
      .orderBy(col("abc_class"))
  }

  val qAbcPartsSql: String =
    """WITH per_part AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |      CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4)))
      |      * 10000 AS BIGINT) AS rev_u
      |  FROM lineitem GROUP BY l_partkey),
      |cum AS (
      |  SELECT l_partkey, rev_u,
      |    sum(rev_u) OVER (ORDER BY rev_u DESC, l_partkey) AS cum_u
      |  FROM per_part),
      |total AS (SELECT max(cum_u) AS total_u FROM cum),
      |classed AS (
      |  SELECT CASE WHEN cum_u * 20 <= total_u * 16 THEN 'A'
      |              WHEN cum_u * 20 <= total_u * 19 THEN 'B'
      |              ELSE 'C' END AS abc_class,
      |    rev_u
      |  FROM cum, total)
      |SELECT abc_class, count(*) AS n_parts,
      |  CAST(sum(rev_u) AS DOUBLE) / 10000.0 AS revenue,
      |  CAST((CAST(sum(rev_u) AS HUGEINT) * 1000000) // (SELECT total_u FROM total)
      |    AS BIGINT) AS share_ppm
      |FROM classed GROUP BY abc_class ORDER BY abc_class""".stripMargin

  /** Supplier lateness ranked by the WILSON LOWER BOUND — the
    * ranking-under-uncertainty statistic (Wilson 1927; the "how not to
    * sort by average rating" device): a supplier with 3/4 late lines
    * must not outrank one with 290/400, so suppliers are ordered by the
    * 95% lower confidence bound of their late rate, not the raw ratio.
    * Late = shipped > 60 days after the order date (the q4 rule).
    *
    * Determinism: n and k are exact BIGINTs, z enters as the literal
    * 1.96 squared IN-ENGINE (1.96*1.96 — identical rounding both
    * sides), and the bound is evaluated with the same operation order
    * both engines, then rounded to 6 before the rank — the cosine
    * contract applied to a statistic.
    *
    * Shape: lineitem ⋈ orders is the q12 fact×fact co-shuffle; the
    * supplier rollup is |supplier|-keyed; names broadcast; bounded
    * TakeOrdered output.
    */
  def qSupplierReliability(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"))
    val perSupp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey")) // fact×fact co-shuffle
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          1L).otherwise(0L)).as("n_late"))
    val wilson = expr(
      """round(
        |  (CAST(n_late AS DOUBLE) / n_lines + (1.96 * 1.96) / (2.0 * n_lines)
        |   - 1.96 * sqrt((CAST(n_late AS DOUBLE) / n_lines *
        |       (1.0 - CAST(n_late AS DOUBLE) / n_lines)
        |       + (1.96 * 1.96) / (4.0 * n_lines * n_lines)) / n_lines))
        |  / (1.0 + (1.96 * 1.96) / n_lines), 6)""".stripMargin)
    perSupp
      .join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_lines"), col("n_late"),
        expr("CAST(n_late * 1000000 DIV n_lines AS BIGINT)").as("late_ppm"),
        wilson.as("wilson_low"))
      .orderBy(col("wilson_low").desc, col("s_suppkey"))
      .limit(100)
  }

  val qSupplierReliabilitySql: String =
    """WITH per_supp AS (
      |  SELECT l_suppkey, count(*) AS n_lines,
      |    CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, n_lines, n_late,
      |  CAST((CAST(n_late AS HUGEINT) * 1000000) // n_lines AS BIGINT) AS late_ppm,
      |  round(
      |    (CAST(n_late AS DOUBLE) / n_lines + (1.96 * 1.96) / (2.0 * n_lines)
      |     - 1.96 * sqrt((CAST(n_late AS DOUBLE) / n_lines *
      |         (1.0 - CAST(n_late AS DOUBLE) / n_lines)
      |         + (1.96 * 1.96) / (4.0 * n_lines * n_lines)) / n_lines))
      |    / (1.0 + (1.96 * 1.96) / n_lines), 6) AS wilson_low
      |FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
      |ORDER BY wilson_low DESC, s_suppkey LIMIT 100""".stripMargin

  /** Market-basket pair mining over order baskets — support, confidence
    * and lift for part pairs that co-occur in at least `basketMinSup`
    * orders (the association-rules staple, Agrawal et al.'s A-Priori
    * restricted to pair itemsets, which is what retail co-purchase
    * analysis actually ships).
    *
    * Shape: baskets = ONE distinct (order, part) dedup; pair generation
    * is a self-join ON THE ORDER KEY, so each order contributes
    * C(basket, 2) rows — bounded by basket size (≤ 7 lines here), never
    * by part popularity (no hot-part key exists because the join key is
    * the order); per-part supports are a \|part\|-bounded aggregate
    * broadcast back (q17 convention); the order total is a 1-row
    * broadcast. Confidence/lift in exact integer ppm (the q14
    * IntegralDivide device — lift's numerator and denominator are exact
    * BIGINT products). Bounded output by min-support + top-100.
    */
  val basketMinSup = 3

  def qBasketPairs(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val singles = b.groupBy(col("l_partkey")).agg(count(lit(1)).as("s_one"))
    val nOrders = b.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val pairs = b
      .join(b.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        "l_orderkey")
      .filter(col("l_partkey") < col("part_b"))
      .groupBy(col("l_partkey").as("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support_ab"))
      .filter(col("support_ab") >= basketMinSup)
    pairs
      .join(broadcast(singles.select(col("l_partkey").as("part_a"),
        col("s_one").as("s_a"))), "part_a")
      .join(broadcast(singles.select(col("l_partkey").as("part_b"),
        col("s_one").as("s_b"))), "part_b")
      .crossJoin(broadcast(nOrders)) // 1-row scalar broadcast
      .select(col("part_a"), col("part_b"), col("support_ab"),
        col("s_a"), col("s_b"),
        expr("CAST(support_ab * 1000000 DIV s_a AS BIGINT)").as("conf_ppm"),
        expr("CAST(support_ab * n_orders * 1000000 DIV (s_a * s_b) AS BIGINT)")
          .as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("part_a"), col("part_b"))
      .limit(100)
  }

  val qBasketPairsSql: String =
    s"""WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |singles AS (SELECT l_partkey, count(*) AS s_one FROM b GROUP BY l_partkey),
       |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
       |pairs AS (
       |  SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
       |    count(*) AS support_ab
       |  FROM b a JOIN b c
       |    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $basketMinSup)
       |SELECT part_a, part_b, support_ab, x.s_one AS s_a, y.s_one AS s_b,
       |  CAST((CAST(support_ab AS HUGEINT) * 1000000) // x.s_one AS BIGINT) AS conf_ppm,
       |  CAST((CAST(support_ab AS HUGEINT) * n_orders * 1000000)
       |    // (CAST(x.s_one AS HUGEINT) * y.s_one) AS BIGINT) AS lift_ppm
       |FROM pairs
       |JOIN singles x ON part_a = x.l_partkey
       |JOIN singles y ON part_b = y.l_partkey
       |CROSS JOIN n
       |ORDER BY lift_ppm DESC, part_a, part_b LIMIT 100""".stripMargin

  val q20Sql: String =
    s"""WITH ps AS (
       |  SELECT l_partkey, l_suppkey,
       |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty_ps_d
       |  FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = '$q20Type'
       |  WHERE l_shipdate >= TIMESTAMP '${q20Year._1}'
       |    AND l_shipdate < TIMESTAMP '${q20Year._2}'
       |  GROUP BY l_partkey, l_suppkey),
       |per_part AS (
       |  SELECT l_partkey AS t_partkey, sum(qty_ps_d) AS qty_total_d,
       |    count(*) AS n_supp
       |  FROM ps GROUP BY l_partkey)
       |SELECT s_suppkey, s_name, n_name,
       |  count(*) AS n_parts_dominated,
       |  CAST(sum(qty_ps_d) AS DOUBLE) AS qty_dominated
       |FROM ps
       |JOIN per_part ON l_partkey = t_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE n_supp > 1 AND qty_ps_d * 2 > qty_total_d
       |GROUP BY s_suppkey, s_name, n_name
       |ORDER BY n_parts_dominated DESC, s_suppkey""".stripMargin
}
