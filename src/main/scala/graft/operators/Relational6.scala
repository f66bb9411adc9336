package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Relational core, sixth wave — the round-8 analytics additions:
  * CUSUM changepoint detection over the event stream's daily rates,
  * market-concentration (HHI) accounting, an exact-integer OLS
  * elasticity fit, and the year-over-year spend-decile transition
  * matrix. House contract throughout: exact DECIMAL money math,
  * integer ppm verdicts (no float threshold seams), GlobalRank for
  * any global order statistic (never an empty-partitionBy window),
  * deterministic ORDER BY on a unique key.
  *
  * Reference behavior anchors: dbsurveyor's profiling/quality surface
  * (statistical summaries per column/table, drift detection) — these
  * extend the same analytics family over the TPC-H-ish tables.
  */
object Relational6 {

  private def dec(c: String, p: Int, s: Int): Column = col(c).cast(DecimalType(p, s))
  private val one = lit(1.00).cast(DecimalType(3, 2))
  private def revenue: Column =
    (dec("l_extendedprice", 12, 2) *
      (one - dec("l_discount", 4, 2)).cast(DecimalType(4, 2))).cast(DecimalType(18, 4))

  /** CUSUM changepoint detection per event type — "did this event's
    * daily rate shift, and when": for each type, the day k maximizing
    * the absolute cumulative deviation from the overall mean rate,
    * CUSUM(k) = Σ_{d≤k} c_d − k·(T/n). INTEGER-EXACT throughout: the
    * deviation is carried cross-multiplied as n·Σ_{d≤k} c_d − k·T
    * (BIGINT — no rational mean is ever materialized), and the
    * before/after mean rates are exact integer ppm. Ties on |dev|
    * break to the EARLIEST day (a flat series reports its first day
    * with ndev_max = 0 — "no change" is visible, not an error).
    *
    * Scale shape: ONE (type, day) aggregation over the fact (map-side
    * combined); everything after is |types|×|days| — the per-type
    * cumulative/argmax windows partition BY TYPE over day-count-bounded
    * partitions (30 rows here; years of days at most — never
    * data-sized, so the window is legal; the partitionBy is what makes
    * it so). At 100 TB the daily rollup is the only fact-sized pass.
    */
  def eventsChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        unix_micros(date_trunc("day", col("ts"))).as("d_us"))
      .agg(count(lit(1)).as("c"))
    val totals = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("total_events"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("d_us"))
    val dev = daily
      .join(broadcast(totals), "event_type")
      .withColumn("k", row_number().over(wCum))
      .withColumn("cum", sum(col("c")).over(wCum))
      // dev_k = n·cum_k − k·T, exact in BIGINT (both factors fact-count
      // bounded; n_days·cum ≤ days × total events)
      .withColumn("ndev", col("n_days") * col("cum") - col("k") * col("total_events"))
      .withColumn("abs_ndev", abs(col("ndev")))
    val wPick = Window.partitionBy(col("event_type"))
      .orderBy(col("abs_ndev").desc, col("d_us"))
    dev
      .withColumn("pick", row_number().over(wPick))
      .filter(col("pick") === 1)
      .select(col("event_type"), col("n_days"), col("total_events"),
        col("d_us").as("cp_d_us"), col("abs_ndev").as("ndev_max"),
        col("k").cast(LongType).as("n_days_before"),
        expr("CAST(cum * 1000000 DIV k AS BIGINT)").as("mean_before_ppm"),
        expr("""CAST((total_events - cum) * 1000000
               |  DIV nullif(n_days - k, 0) AS BIGINT)""".stripMargin)
          .as("mean_after_ppm"))
      .orderBy(col("event_type"))
  }

  val eventsChangepointSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS d_us,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |totals AS (
      |  SELECT event_type, count(*) AS n_days,
      |    CAST(sum(c) AS BIGINT) AS total_events
      |  FROM daily GROUP BY 1),
      |dev AS (
      |  SELECT d.event_type, t.n_days, t.total_events, d.d_us,
      |    row_number() OVER (PARTITION BY d.event_type ORDER BY d.d_us) AS k,
      |    CAST(sum(d.c) OVER (PARTITION BY d.event_type ORDER BY d.d_us)
      |      AS BIGINT) AS cum
      |  FROM daily d JOIN totals t USING (event_type)),
      |scored AS (
      |  SELECT *, abs(n_days * cum - k * total_events) AS abs_ndev,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY abs(n_days * cum - k * total_events) DESC, d_us) AS pick
      |  FROM dev)
      |SELECT event_type, n_days, total_events, d_us AS cp_d_us,
      |  abs_ndev AS ndev_max, k AS n_days_before,
      |  CAST((CAST(cum AS HUGEINT) * 1000000) // k AS BIGINT) AS mean_before_ppm,
      |  CAST((CAST(total_events - cum AS HUGEINT) * 1000000)
      |    // nullif(n_days - k, 0) AS BIGINT) AS mean_after_ppm
      |FROM scored WHERE pick = 1
      |ORDER BY event_type""".stripMargin

  /** Supplier revenue concentration per nation — Herfindahl–Hirschman
    * index over each nation's supplier revenue shares, plus the
    * "effective number of suppliers" (1/HHI) every concentration
    * writeup quotes. Shares are exact integer ppm of the nation's
    * DECIMAL-exact revenue; HHI is the BIGINT sum of squared ppm
    * shares (units of 1e-12 — 1e12 = monopoly), so the whole index is
    * integer arithmetic over floored shares (documented contract: the
    * ≤ |suppliers| ppm of flooring slack never moves a concentration
    * verdict).
    *
    * Scale shape: one fact scan pre-aggregated to (nation, supplier) —
    * supplier⋈nation is dimension-sized and broadcasts INTO the fact
    * scan; nation totals are a 25-row aggregate broadcast back; the
    * HHI rollup is |nations| rows. No data-sized shuffle beyond the
    * per-(nation, supplier) combine.
    */
  def qSupplierHhi(spark: SparkSession, dir: String): DataFrame = {
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val perSupp = Tables.lineitem(spark, dir)
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), col("s_suppkey"))
      .agg(sum(revenue).as("rev_d"))
      .select(col("n_name"), col("s_suppkey"),
        expr("CAST(rev_d * 10000 AS BIGINT)").as("rev_u"))
    val perNation = perSupp.groupBy(col("n_name"))
      .agg(sum(col("rev_u")).as("total_u"))
    perSupp
      .join(broadcast(perNation), "n_name")
      // ppm share through DECIMAL(38,0): rev_u·1e6 exceeds BIGINT once
      // micro-unit totals pass ~9e12 (the q14/abc widening device)
      .withColumn("share_ppm",
        expr("CAST(CAST(rev_u AS DECIMAL(38,0)) * 1000000 DIV total_u AS BIGINT)"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        (sum(col("rev_u")).cast(DoubleType) / 10000.0).as("revenue"),
        sum(col("share_ppm") * col("share_ppm")).as("hhi_e12"),
        max(col("share_ppm")).as("top_share_ppm"))
      .withColumn("effective_suppliers_e3",
        expr("CAST(1000000000000000 DIV hhi_e12 AS BIGINT)"))
      .orderBy(col("hhi_e12").desc, col("n_name"))
  }

  val qSupplierHhiSql: String =
    """WITH per_supp AS (
      |  SELECT n_name, s_suppkey,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |      CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4)))
      |      * 10000 AS BIGINT) AS rev_u
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY n_name, s_suppkey),
      |per_nation AS (
      |  SELECT n_name, CAST(sum(rev_u) AS BIGINT) AS total_u
      |  FROM per_supp GROUP BY n_name),
      |shared AS (
      |  SELECT s.n_name, s.rev_u,
      |    CAST((CAST(s.rev_u AS HUGEINT) * 1000000) // n.total_u AS BIGINT)
      |      AS share_ppm
      |  FROM per_supp s JOIN per_nation n USING (n_name))
      |SELECT n_name, count(*) AS n_suppliers,
      |  CAST(sum(rev_u) AS DOUBLE) / 10000.0 AS revenue,
      |  CAST(sum(share_ppm * share_ppm) AS BIGINT) AS hhi_e12,
      |  max(share_ppm) AS top_share_ppm,
      |  CAST(1000000000000000 // CAST(sum(share_ppm * share_ppm) AS BIGINT)
      |    AS BIGINT) AS effective_suppliers_e3
      |FROM shared GROUP BY n_name
      |ORDER BY hhi_e12 DESC, n_name""".stripMargin

  /** Discount elasticity per brand — the OLS slope of line quantity on
    * discount percent, fit EXACTLY: x = the discount as an integer
    * percent (the data's own 1%-step grid), y = the integral quantity,
    * and the normal-equation terms n·Σxy − Σx·Σy and n·Σx² − (Σx)²
    * accumulate as DECIMAL(38,0) (order-independent, overflow-proof at
    * any scale); the ONLY float operation is the final one-division
    * slope/intercept at the edge — both engines divide the identical
    * exact integers, so parity is bit-for-bit. No integer division on
    * the (possibly negative) numerators: Spark's DIV truncates while
    * DuckDB's // floors — a sign-dependent seam this op refuses to
    * touch.
    *
    * Scale shape: one fact scan with part broadcast in, one per-brand
    * aggregation (map-side combined, |brands| groups), zero joins
    * after. The regression is a pure aggregate — the textbook
    * "distribute the sufficient statistics, not the model" shape.
    */
  def qDiscountElasticity(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    val xy = Tables.lineitem(spark, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        // the discount grid is exact hundredths; round() collapses any
        // double-representation dust (0.05*100 = 5.000000000000001)
        expr("CAST(round(l_discount * 100) AS DECIMAL(38,0))").as("x"),
        expr("CAST(l_quantity AS DECIMAL(38,0))").as("y"))
    xy.groupBy(col("p_brand"))
      .agg(count(lit(1)).cast(DecimalType(38, 0)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("p_brand"), col("n").cast(LongType).as("n_lines"),
        (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast(DecimalType(38, 0)).cast(DoubleType).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx"))
          .cast(DecimalType(38, 0)).cast(DoubleType).as("den"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType) /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType))
          .as("slope_qty_per_pct"),
        ((col("sy") * col("sxx") - col("sx") * col("sxy")).cast(DoubleType) /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType))
          .as("intercept_qty"))
      .orderBy(col("p_brand"))
  }

  val qDiscountElasticitySql: String =
    """WITH xy AS (
      |  SELECT p_brand,
      |    CAST(round(l_discount * 100) AS HUGEINT) AS x,
      |    CAST(l_quantity AS HUGEINT) AS y
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |s AS (
      |  SELECT p_brand, CAST(count(*) AS HUGEINT) AS n,
      |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
      |  FROM xy GROUP BY p_brand)
      |SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
      |  CAST(n * sxy - sx * sy AS DOUBLE) AS num,
      |  CAST(n * sxx - sx * sx AS DOUBLE) AS den,
      |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
      |    AS slope_qty_per_pct,
      |  CAST(sy * sxx - sx * sxy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
      |    AS intercept_qty
      |FROM s ORDER BY p_brand""".stripMargin

  /** Spend-decile transition matrix — customer migration between the
    * first era (orders before the split date) and the second: each
    * customer present in BOTH eras is deciled within each era's spend
    * distribution, and the 10×10 matrix counts moves with an exact
    * row-share ppm (share within the from-decile). The churn/upsell
    * question ("do era-1 whales stay whales?") answered as a Markov
    * matrix.
    *
    * Scale discipline: the q_spend_deciles device twice — per-era
    * customer aggregates (localCheckpointed, counted once each),
    * GlobalRank range-exchange ranks + closed-form ntile arithmetic
    * (bit-exact vs the oracle's literal ntile windows), then a
    * customer-keyed equi-join of the two eras and a ≤100-row rollup.
    * No single-partition window anywhere; the matrix rollup is
    * aggregate-sized.
    */
  val eraSplit = "1998-01-01"

  def qSegmentTransitions(spark: SparkSession, dir: String): DataFrame = {
    def eraDeciles(before: Boolean): DataFrame = {
      val cond = if (before) col("o_orderdate") < lit(eraSplit).cast("timestamp")
        else col("o_orderdate") >= lit(eraSplit).cast("timestamp")
      val perCust = Tables.orders(spark, dir)
        .filter(cond)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(14, 2))).as("spend_d"))
        .localCheckpoint()
      val n = perCust.count()
      GlobalRank
        .withGlobalRank(perCust, "c_rank", n, col("spend_d").desc, col("o_custkey"))
        .withColumn("decile", GlobalRank.ntileFromRank(10, n, "c_rank"))
        .select(col("o_custkey"), col("decile"))
    }
    // r14 optimization round (guide §2.6): the two eras' checkpoint +
    // count + rank chains are independent — overlap them from futures
    val Seq(from, to) = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(Future.sequence(Seq(
        Future(eraDeciles(before = true).withColumnRenamed("decile", "dec_from")),
        Future(eraDeciles(before = false).withColumnRenamed("decile", "dec_to")))),
        Duration.Inf)
    }
    val moves = from.join(to, "o_custkey")
      .groupBy(col("dec_from"), col("dec_to"))
      .agg(count(lit(1)).as("n_customers"))
    val rowTotals = moves.groupBy(col("dec_from"))
      .agg(sum(col("n_customers")).as("row_total"))
    moves.join(broadcast(rowTotals), "dec_from")
      .select(col("dec_from"), col("dec_to"), col("n_customers"),
        expr("CAST(n_customers * 1000000 DIV row_total AS BIGINT)")
          .as("row_share_ppm"))
      .orderBy(col("dec_from"), col("dec_to"))
  }

  val qSegmentTransitionsSql: String =
    s"""WITH from_era AS (
       |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(14,2))) AS spend_d
       |  FROM orders WHERE o_orderdate < TIMESTAMP '$eraSplit'
       |  GROUP BY o_custkey),
       |to_era AS (
       |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(14,2))) AS spend_d
       |  FROM orders WHERE o_orderdate >= TIMESTAMP '$eraSplit'
       |  GROUP BY o_custkey),
       |f AS (
       |  SELECT o_custkey,
       |    CAST(ntile(10) OVER (ORDER BY spend_d DESC, o_custkey) AS INTEGER)
       |      AS dec_from
       |  FROM from_era),
       |t AS (
       |  SELECT o_custkey,
       |    CAST(ntile(10) OVER (ORDER BY spend_d DESC, o_custkey) AS INTEGER)
       |      AS dec_to
       |  FROM to_era),
       |moves AS (
       |  SELECT dec_from, dec_to, count(*) AS n_customers
       |  FROM f JOIN t USING (o_custkey)
       |  GROUP BY dec_from, dec_to)
       |SELECT dec_from, dec_to, n_customers,
       |  CAST((CAST(n_customers AS HUGEINT) * 1000000) //
       |    sum(n_customers) OVER (PARTITION BY dec_from) AS BIGINT)
       |    AS row_share_ppm
       |FROM moves
       |ORDER BY dec_from, dec_to""".stripMargin

  /** Nation trade balance — each nation's EXPORT revenue (lines shipped
    * by its suppliers) vs IMPORT revenue (lines bought by its
    * customers) and the balance, the macro view the q7 bilateral
    * volume-shipping matrix rolls up to.
    *
    * Scale shape: ONE lineitem⋈orders fact co-shuffle on the order key
    * (never broadcast — the q7/q12 rule); supplier→nation and
    * customer→nation are true dimensions, broadcast. Each fact row then
    * contributes to TWO nations (its exporter and its importer), so the
    * row explodes into exactly two (nation, role, rev) entries in-row —
    * a bounded ×2, immediately crushed by the map-side-combined
    * \|nation\|-key aggregation (the conditional-sum pivot). Exact
    * DECIMAL(18,4) revenue all the way; double only at the edge.
    */
  def qNationTradeBalance(spark: SparkSession, dir: String): DataFrame = {
    val sn = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("exp_nation"))
    val cn = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("imp_nation"))
    val zero = lit(0).cast(DecimalType(18, 4))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
      .select(explode(array(
        struct(col("exp_nation").as("n_name"), lit("export").as("role"),
          revenue.as("rev")),
        struct(col("imp_nation").as("n_name"), lit("import").as("role"),
          revenue.as("rev")))).as("x"))
      .groupBy(col("x.n_name").as("n_name"))
      .agg(
        sum(when(col("x.role") === "export", col("x.rev")).otherwise(zero))
          .as("exp_d"),
        sum(when(col("x.role") === "import", col("x.rev")).otherwise(zero))
          .as("imp_d"),
        sum(when(col("x.role") === "export", 1L).otherwise(0L))
          .as("n_export_lines"),
        sum(when(col("x.role") === "import", 1L).otherwise(0L))
          .as("n_import_lines"))
      .select(col("n_name"),
        col("exp_d").cast(DoubleType).as("export_rev"),
        col("imp_d").cast(DoubleType).as("import_rev"),
        (col("exp_d") - col("imp_d")).cast(DoubleType).as("balance"),
        col("n_export_lines"), col("n_import_lines"))
      .orderBy(col("n_name"))
  }

  val qNationTradeBalanceSql: String =
    """WITH fact AS (
      |  SELECT sn.n_name AS exp_nation, cn.n_name AS imp_nation,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |      CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
      |      AS DECIMAL(18,4)) AS rev
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey),
      |u AS (
      |  SELECT exp_nation AS n_name, 'export' AS role, rev FROM fact
      |  UNION ALL
      |  SELECT imp_nation, 'import', rev FROM fact)
      |SELECT n_name,
      |  CAST(sum(CASE WHEN role = 'export' THEN rev ELSE 0 END) AS DOUBLE)
      |    AS export_rev,
      |  CAST(sum(CASE WHEN role = 'import' THEN rev ELSE 0 END) AS DOUBLE)
      |    AS import_rev,
      |  CAST(sum(CASE WHEN role = 'export' THEN rev ELSE 0 END) -
      |       sum(CASE WHEN role = 'import' THEN rev ELSE 0 END) AS DOUBLE)
      |    AS balance,
      |  CAST(sum(CASE WHEN role = 'export' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_export_lines,
      |  CAST(sum(CASE WHEN role = 'import' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_import_lines
      |FROM u GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Year-over-year revenue growth per customer nation — the trend
    * report over the fact: exact decimal yearly revenue, previous year
    * via lag, growth as the exact-decimal delta over the exact-decimal
    * base (both cast to double only for the final division — identical
    * IEEE semantics both engines; no integer-division sign seam on
    * shrinking years). First observed year reports NULL growth.
    *
    * Scale shape: ONE fact co-shuffle (lineitem⋈orders on the order
    * key), customer→nation broadcast, one (nation, year) two-phase
    * agg; the lag window partitions by nation over \|years\| rows —
    * bounded, never data-sized.
    */
  def qYearlyGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cn = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val perYear = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"),
        year(col("o_orderdate")).cast(IntegerType).as("yr"))
      .agg(sum(revenue).as("rev_d"), count(lit(1)).as("n_lines"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("yr"))
    perYear
      .withColumn("prev_d", lag(col("rev_d"), 1).over(w))
      .select(col("n_name"), col("yr"),
        col("rev_d").cast(DoubleType).as("revenue"),
        col("prev_d").cast(DoubleType).as("prev_revenue"),
        ((col("rev_d") - col("prev_d")).cast(DoubleType) /
          col("prev_d").cast(DoubleType)).as("yoy_growth"),
        col("n_lines"))
      .orderBy(col("n_name"), col("yr"))
  }

  val qYearlyGrowthSql: String =
    """WITH per_year AS (
      |  SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS yr,
      |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |      CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
      |      AS DECIMAL(18,4))) AS rev_d,
      |    count(*) AS n_lines
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name, yr)
      |SELECT n_name, yr, CAST(rev_d AS DOUBLE) AS revenue,
      |  CAST(lag(rev_d) OVER w AS DOUBLE) AS prev_revenue,
      |  CAST(rev_d - lag(rev_d) OVER w AS DOUBLE) /
      |    CAST(lag(rev_d) OVER w AS DOUBLE) AS yoy_growth,
      |  n_lines
      |FROM per_year
      |WINDOW w AS (PARTITION BY n_name ORDER BY yr)
      |ORDER BY n_name, yr""".stripMargin
}
