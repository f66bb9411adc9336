package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Relational core, fourth wave — the remaining TPC-H disciplines the
  * inventory lacked, adapted to the testdata schema (no partsupp /
  * commitdate / receiptdate / shipmode / phone columns exist, so each
  * query keeps its canonical PLAN SHAPE against the columns that do):
  * Q4's correlated EXISTS as a conditioned semi-join, Q12's two-fact
  * join + conditional aggregation, Q13's outer-join count distribution,
  * Q15's scalar-max rejoin, Q17's per-group average rejoin, Q19's
  * disjunctive pushdown, Q21's exists/not-exists chain, and Q22's
  * scalar-subquery + anti-join. Money math follows the Relational
  * contract: exact DECIMAL sums, double only at the edge, deterministic
  * ORDER BY on a unique key.
  */
object Relational4 {

  private def dec(c: String, p: Int, s: Int): Column = col(c).cast(DecimalType(p, s))
  private val one = lit(1.00).cast(DecimalType(3, 2))
  private def revenue: Column =
    (dec("l_extendedprice", 12, 2) *
      (one - dec("l_discount", 4, 2)).cast(DecimalType(4, 2))).cast(DecimalType(18, 4))

  /** TPC-H Q4-style priority check: orders having at least one LATE line
    * (shipped >60 days after the order date — the schema's stand-in for
    * commitdate < receiptdate), counted per order priority.
    *
    * Shape: a LEFT SEMI join — the EXISTS subquery becomes an equi-join
    * on the order key with the lateness inequality as a residual
    * condition, so the probe stops at the first matching line, nothing
    * from the lineitem side is projected, and the per-priority
    * aggregation runs on the orders side only (key space = 5).
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q6: forecast revenue change — the pushdown showcase. One
    * filtered scan, one 1-row aggregate, no join, no shuffle beyond the
    * two-phase agg. The date/quantity/discount predicates are plain
    * double/timestamp comparisons so ALL of them reach the parquet scan
    * (PushedFilters); money math is decimal-exact only inside the sum
    * (discount literals compare identically as doubles in both engines —
    * the same binary constants — so the filter stays pushable).
    */
  val q6Window = ("1996-01-01", "1997-01-01")

  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(q6Window._1).cast(TimestampType) &&
        col("l_shipdate") < lit(q6Window._2).cast(TimestampType) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum((dec("l_extendedprice", 12, 2) * dec("l_discount", 4, 2))
          .cast(DecimalType(18, 4))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"))

  val q6Sql: String =
    s"""SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
       |    CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       |  count(*) AS n_lines
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '${q6Window._1}'
       |  AND l_shipdate < TIMESTAMP '${q6Window._2}'
       |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q12-style shipping-latency accounting (shipmode replaced by
    * the ship-latency bucket the schema can express): lines bucketed by
    * days from order to ship, counting critical- vs normal-priority
    * orders per bucket.
    *
    * Shape: the one genuinely fact×fact join in the relational set —
    * lineitem ⋈ orders on the order key is a co-shuffle neither side of
    * which is broadcastable at scale; both sides arrive hash-partitioned
    * on the key and the conditional counts aggregate into a 4-row key
    * space. At 100 TB both tables would be bucketed on the order key and
    * the exchange disappears (lake_bucketed is that demonstration).
    */
  def q12ShipLatency(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"),
      col("o_orderpriority"))
    Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(
        when(datediff(col("l_shipdate"), col("o_orderdate")) <= 30, "0-30")
          .when(datediff(col("l_shipdate"), col("o_orderdate")) <= 60, "31-60")
          .when(datediff(col("l_shipdate"), col("o_orderdate")) <= 90, "61-90")
          .otherwise("90+").as("latency_bucket"),
        col("o_orderpriority"))
      .groupBy(col("latency_bucket"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy(col("latency_bucket"))
  }

  val q12Sql: String =
    """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN '0-30'
      |            WHEN date_diff('day', o_orderdate, l_shipdate) <= 60 THEN '31-60'
      |            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN '61-90'
      |            ELSE '90+' END AS latency_bucket,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY latency_bucket""".stripMargin

  /** TPC-H Q13-style customer order-count distribution, restricted to
    * urgent orders so the zero bucket is populated: how many customers
    * placed exactly k urgent orders.
    *
    * Shape: the filtered orders side pre-aggregates to one row per
    * customer BEFORE the outer join (the quality_referential discipline
    * — never outer-join the raw fact), so the left join is
    * |customer|×|customer|-bounded and null-extends to count 0; the
    * second aggregation's key space is the max order count. The oracle
    * runs the textbook left-outer-join-then-count form — DuckDB proves
    * the pre-aggregated rewrite IS Q13.
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"))
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("n_ord"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q15: top supplier(s) by revenue over one quarter.
    *
    * Shape: per-supplier revenue (key space = |supplier|, the quarter
    * filter pushed to the scan), then the maximum is a 1-row aggregate
    * broadcast back (BroadcastNestedLoopJoin over ONE row — the revenue
    * view + MAX scalar subquery of the original); the equality filter on
    * exact DECIMAL revenue keeps ties, as Q15 specifies. Supplier names
    * arrive by broadcast.
    */
  val q15Quarter = ("1996-01-01", "1996-04-01")

  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(q15Quarter._1).cast(TimestampType) &&
        col("l_shipdate") < lit(q15Quarter._2).cast(TimestampType))
      .groupBy(col("l_suppkey")).agg(sum(revenue).as("total_rev_d"))
    val mx = perSupp.agg(max(col("total_rev_d")).as("max_rev_d"))
    perSupp.crossJoin(broadcast(mx)) // 1-row scalar broadcast
      .filter(col("total_rev_d") === col("max_rev_d"))
      .join(broadcast(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev_d").cast(DoubleType).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15Sql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey, sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
       |    CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS total_rev_d
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '${q15Quarter._1}'
       |    AND l_shipdate < TIMESTAMP '${q15Quarter._2}'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, CAST(total_rev_d AS DOUBLE) AS total_revenue
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_rev_d = (SELECT max(total_rev_d) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17-style small-quantity revenue, widened per brand: revenue
    * locked in lines ordering less than 20% of their part's average
    * quantity, as the canonical "would-be yearly revenue" sum/7.
    *
    * Shape: the correlated per-part average becomes ONE aggregation
    * keyed by partkey (key space = |part|, dimension-sized), whose
    * result broadcasts back into the fact scan; the avg comparison is
    * decimal-exact cross-multiplication (5·qty·n < Σqty — no division,
    * no double seam). The fact never shuffles: broadcast threshold join
    * + broadcast part dims, then a 25-key aggregation.
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(dec("l_quantity", 12, 2)).as("sum_qty_d"), count(lit(1)).as("n_lines_p"))
    val brands = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(perPart), col("l_partkey") === col("t_partkey"))
      .filter(dec("l_quantity", 12, 2) * lit(5) * col("n_lines_p") < col("sum_qty_d"))
      .join(broadcast(brands), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg((sum(dec("l_extendedprice", 12, 2)) / lit(7.0)).cast(DoubleType)
          .as("avg_yearly"),
        count(lit(1)).as("n_small_lines"))
      .orderBy(col("p_brand"))
  }

  val q17Sql: String =
    """SELECT p_brand,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) / 7.0 AS DOUBLE) AS avg_yearly,
      |  count(*) AS n_small_lines
      |FROM lineitem
      |JOIN (SELECT l_partkey AS t_partkey,
      |        sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty_d,
      |        count(*) AS n_lines_p
      |      FROM lineitem GROUP BY l_partkey) ON l_partkey = t_partkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * n_lines_p < sum_qty_d
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** TPC-H Q19-style disjunctive discounted revenue: three brand/size/
    * quantity bands OR-ed together.
    *
    * Shape: the disjunction shares the l_partkey = p_partkey equi-key,
    * so Catalyst still plans a broadcast hash join with the OR-of-ANDs
    * as a residual filter — the classic Q19 optimizer test (a naive
    * planner degrades to a nested loop). The quantity/size bands stay
    * conjunction-extractable: `l_quantity <= 30` dominates every branch
    * and is pushed to the parquet scan.
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"), col("p_size"))
    def band(brand: String, sizeHi: Int, qLo: Int, qHi: Int): Column =
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") <= 30)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(band("Brand#12", 15, 1, 11) || band("Brand#23", 25, 10, 20) ||
        band("Brand#3", 35, 20, 30))
      .agg(sum(revenue).cast(DoubleType).as("revenue"), count(lit(1)).as("n_lines"))
  }

  val q19Sql: String =
    """SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |    CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_quantity <= 30 AND (
      |  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) OR
      |  (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20) OR
      |  (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))""".stripMargin

  /** TPC-H Q21-style suppliers who kept orders waiting: per supplier,
    * the number of multi-supplier orders where THIS supplier was the
    * ONLY one to ship late (>90 days after the order date).
    *
    * Shape: the textbook form is join + EXISTS(other supplier) + NOT
    * EXISTS(other late supplier) — two self-joins of the fact. Here both
    * quantifiers collapse into ONE per-order aggregation: per (order,
    * supplier) fold lateness, then per order count suppliers and late
    * suppliers; `n_late = 1` makes `max(CASE late→suppkey)` THE waiting
    * supplier, so no join back into the fact is needed at all. Two
    * keyed shuffles total (orderkey — unskewed, then supplier-sized),
    * plus the orders date arriving by co-shuffle on the order key (the
    * q12 fact×fact discipline). The DuckDB oracle runs the textbook
    * EXISTS/NOT-EXISTS form, proving the rewrite.
    */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"))
    val perOrderSupp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        1L).otherwise(0L)).as("is_late"))
    val waiting = perOrderSupp
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("is_late")).as("n_late"),
        max(when(col("is_late") === 1L, col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
    waiting.groupBy(col("late_supp")).agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))),
        col("late_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(100)
  }

  val q21Sql: String =
    """SELECT s_suppkey, s_name, count(DISTINCT l1.l_orderkey) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY s_suppkey, s_name
      |ORDER BY numwait DESC, s_suppkey LIMIT 100""".stripMargin

  /** Q21 oracle granularity: the textbook EXISTS form enumerates
    * qualifying l1 LINES, so a supplier with two late lines in one order
    * would count twice — and the testdata DOES contain such orders (318
    * multi-late-line (order, supplier) pairs at sf0.001). The Spark side
    * counts each waiting ORDER once (it aggregates per (order, supplier)
    * before counting), which is the semantics Q21 specifies ("numwait" =
    * number of orders kept waiting). The oracle therefore counts
    * `DISTINCT l1.l_orderkey` per supplier — both quantifiers are already
    * per-order, so collapsing duplicate late lines changes nothing else.
    * Relational4Spec asserts op ≡ the EXISTS/NOT-EXISTS recompute
    * directly (run through Spark SQL on the same data). */

  /** TPC-H Q22-style dormant high-value customers: customers whose
    * account balance exceeds the mean positive balance and who placed no
    * order in the final 20 months of the dataset, grouped by nation.
    *
    * Shape: the scalar AVG subquery is a 1-row aggregate broadcast
    * (compared by decimal-exact cross-multiplication — no double-mean
    * seam); "no recent order" is a LEFT ANTI join against the
    * date-filtered orders projection (the filter pushed to the scan);
    * nation names arrive by broadcast. Key space of the final
    * aggregation = 25 nations.
    */
  val q22Cutoff = "2000-01-01"

  def q22DormantCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), dec("c_acctbal", 12, 2).as("bal_d"))
    val stats = cust.filter(col("bal_d") > 0)
      .agg(sum(col("bal_d")).as("sum_bal_d"), count(lit(1)).as("n_pos"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(q22Cutoff).cast(TimestampType))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(stats)) // 1-row scalar broadcast
      .filter(col("bal_d") * col("n_pos") > col("sum_bal_d"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("bal_d")).cast(DoubleType).as("totacctbal"))
      .orderBy(col("n_name"))
  }

  val q22Sql: String =
    s"""SELECT n_name, count(*) AS numcust,
       |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |WHERE CAST(c_acctbal AS DECIMAL(12,2)) *
       |    (SELECT count(*) FROM customer WHERE CAST(c_acctbal AS DECIMAL(12,2)) > 0)
       |  > (SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer
       |     WHERE CAST(c_acctbal AS DECIMAL(12,2)) > 0)
       |  AND NOT EXISTS (
       |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |      AND o_orderdate >= TIMESTAMP '$q22Cutoff')
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** TPC-H Q16-style supplier variety: how many DISTINCT (non-excluded)
    * suppliers have shipped each (brand, type, size) part family. The
    * testdata has no partsupp, so the part-supplier relation is derived
    * from lineitem — the canonical Q16 plan survives: a NOT IN
    * exclusion list (here: suppliers with s_acctbal < 1000, the
    * deterministic stand-in for the comment-LIKE complaints filter), a
    * distinct part-supplier projection, and a per-family distinct count.
    *
    * Shape discipline: the DISTINCT runs FIRST on (brand, type, size,
    * suppkey) — a keyed dedup whose output is bounded by the true
    * relation size — and the final count is a plain count over deduped
    * rows, never COUNT(DISTINCT) (no Expand). The exclusion list is
    * suppliers-sized → broadcast LEFT ANTI; part is dimension-sized →
    * broadcast into the fact scan.
    */
  def q16SupplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val excl = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 1000.0).select(col("s_suppkey"))
    val part = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1")
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
      .distinct()
      .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(count(lit(1)).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size, count(*) AS supplier_cnt FROM (
      |  SELECT DISTINCT p.p_brand, p.p_type, p.p_size, l.l_suppkey
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_brand <> 'Brand#1'
      |    AND l.l_suppkey NOT IN (
      |      SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000))
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin
}
