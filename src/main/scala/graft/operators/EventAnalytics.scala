package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Product-analytics operators over the event stream + part-dimension
  * share analysis: funnel conversion, weekly cohort retention, brand
  * revenue share. All single-scan or broadcast-dimension shapes.
  */
object EventAnalytics {

  /** Revenue share per part brand: lineitem ⋈ broadcast(part), exact
    * decimal revenue, share via a window total (grand-total window is one
    * extra lightweight pass over the already-aggregated rows).
    */
  def qBrandShare(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val revenue = (col("l_extendedprice").cast(DecimalType(12, 2)) *
      (lit(1.00).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(4, 2)))
        .cast(DecimalType(4, 2))).cast(DecimalType(18, 4))
    val perBrand = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(revenue).as("rev_d"), count(lit(1)).as("n_lines"))
    perBrand
      .select(col("p_brand"), col("n_lines"),
        col("rev_d").cast(DoubleType).as("revenue"),
        (col("rev_d").cast(DoubleType) /
          sum(col("rev_d")).over(Window.partitionBy()).cast(DoubleType)).as("rev_share"))
      .orderBy(col("p_brand"))
  }

  val qBrandShareSql: String =
    """WITH b AS (
      |  SELECT p_brand,
      |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS rev_d,
      |    count(*) AS n_lines
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY p_brand)
      |SELECT p_brand, n_lines, CAST(rev_d AS DOUBLE) AS revenue,
      |  CAST(rev_d AS DOUBLE) / CAST(sum(rev_d) OVER () AS DOUBLE) AS rev_share
      |FROM b ORDER BY p_brand""".stripMargin

  /** Signup → purchase funnel: per user, first signup and first purchase
    * at-or-after that signup; conversion counts and 7-day-window
    * conversion. Two keyed aggregations + a shuffle join on user_id —
    * the signup side is one row PER USER, i.e. it grows with the data,
    * so no broadcast hint (AQE may still pick one at small scale).
    */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t_us"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("t_us")).as("t_signup"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(signup, "user_id")
      .filter(col("t_us") >= col("t_signup"))
      .groupBy(col("user_id")).agg(min(col("t_us")).as("t_purchase"))
    val day7 = 7L * 24 * 3600 * 1000000
    signup.join(purchase, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_signup_users"),
        count(col("t_purchase")).as("n_converted"),
        sum(when(col("t_purchase") - col("t_signup") <= day7, 1L).otherwise(0L))
          .as("n_converted_7d"),
        (sum(col("t_purchase") - col("t_signup")).cast(DoubleType) /
          count(col("t_purchase")) / 3.6e9).as("avg_hours_to_convert"))
  }

  val qFunnelSql: String =
    """WITH signup AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t_signup
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |purchase AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
      |  FROM events e JOIN signup s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.t_signup
      |  GROUP BY e.user_id)
      |SELECT count(*) AS n_signup_users,
      |  count(t_purchase) AS n_converted,
      |  CAST(sum(CASE WHEN t_purchase - t_signup <= 604800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_7d,
      |  CAST(sum(t_purchase - t_signup) AS DOUBLE) / count(t_purchase) / 3.6e9 AS avg_hours_to_convert
      |FROM signup LEFT JOIN purchase USING (user_id)""".stripMargin

  /** Time-to-convert percentiles per funnel edge — the latency half of
    * q_funnel's count answer: for each destination event (view / click /
    * purchase), the lag from a user's FIRST signup to their first
    * destination event at-or-after it, as exact nearest-rank p50/p90/p99
    * (OBSERVED microsecond values, the events_session_stats device) plus
    * conversion ppm and the exact integer mean. The table a growth team
    * reads to decide which funnel edge to attack.
    *
    * Scale shape: one signup rollup (user-keyed) reused by all edges;
    * per edge one user-keyed lag rollup → ONE GlobalRank range exchange
    * (never a global window) → a ≤3-rank driver lookup (bounded driver
    * state, the sessionStats convention). Degrade-don't-throw: an edge
    * with zero conversions emits conv_ppm = 0 with NULL lag stats (no
    * observed lags to summarize); only an empty signup table NULLs the
    * conversion share itself.
    */
  val convLagEdges = Seq("click", "purchase", "view")
  val convLagPcts = Seq(50, 90, 99)

  def eventsConversionLag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t_us"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("t_us")).as("t_signup"))
      .localCheckpoint() // user-keyed; reused by every edge below
    val nUsers = signup.count()
    // r14 optimization round (guide §2.6): the three edges are
    // independent job chains over the shared checkpointed signup frame —
    // overlap them from driver futures (Future.sequence keeps edge order)
    val rows = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(Future.sequence(convLagEdges.map { dst => Future {
      val lagF = ev.filter(col("event_type") === dst)
        .join(signup, "user_id")
        .filter(col("t_us") >= col("t_signup"))
        .groupBy(col("user_id"), col("t_signup"))
        .agg(min(col("t_us")).as("t_dst"))
        .select(col("user_id"), (col("t_dst") - col("t_signup")).as("d"))
      // r14 optimization round: targeted order statistics — the count,
      // the lag sum AND the three percentile rows come out of ONE sorted
      // pass (GlobalRank.orderStats) instead of rank+checkpoint+agg+filter
      val (n, sd, at) = GlobalRank.orderStats(lagF,
        Seq(col("d"), col("user_id")), Some("d"),
        nn => convLagPcts.map(p => math.max(1L, (p * nn + 99) / 100)))
      if (n == 0L)
        // a dead edge (zero conversions) is a MEASURED 0-ppm conversion
        // share, not an unknown: conv_ppm is NULL only when the signup
        // table itself is empty (nothing to convert from). Mean and
        // percentiles stay NULL — there are no observed lags to report.
        // Matches the oracle's CASE structure exactly; the old
        // all-None branch diverged on any corpus with a dead edge.
        (dst, nUsers, 0L,
          if (nUsers == 0L) Option.empty[Long] else Some(0L),
          Option.empty[Long],
          Option.empty[Long], Option.empty[Long], Option.empty[Long])
      else {
        val targets = convLagPcts.map(p => p -> math.max(1L, (p * n + 99) / 100))
        val dIdx = lagF.schema.fieldIndex("d")
        val atRank: Map[Long, Long] =
          at.map { case (r, row) => r -> row.getLong(dIdx) }
        (dst, nUsers, n,
          if (nUsers == 0L) None else Some(n * 1000000L / nUsers),
          Some(sd / n), Some(atRank(targets(0)._2)),
          Some(atRank(targets(1)._2)), Some(atRank(targets(2)._2)))
      }
      } }), Duration.Inf)
    }
    rows.toDF("edge", "n_users", "n_converted", "conv_ppm", "mean_us",
      "p50_us", "p90_us", "p99_us")
      .orderBy(col("edge"))
  }

  val eventsConversionLagSql: String = {
    val edgeBlocks = convLagEdges.map { dst =>
      val ctes =
        s"""lag_$dst AS (
           |  SELECT e.user_id, min(epoch_us(e.ts)) - s.t_signup AS d
           |  FROM events e JOIN su s USING (user_id)
           |  WHERE e.event_type = '$dst' AND epoch_us(e.ts) >= s.t_signup
           |  GROUP BY e.user_id, s.t_signup),
           |nn_$dst AS (SELECT count(*) AS n, sum(d) AS sd FROM lag_$dst),
           |r_$dst AS (
           |  SELECT d, row_number() OVER (ORDER BY d, user_id) AS rk
           |  FROM lag_$dst)""".stripMargin
      val pcts = convLagPcts.map { p =>
        s"""  (SELECT d FROM r_$dst WHERE rk = greatest(1,
           |    ($p * (SELECT n FROM nn_$dst) + 99) // 100)) AS p${p}_us"""
          .stripMargin
      }.mkString(",\n")
      val sel =
        s"""SELECT '$dst' AS edge,
           |  CAST((SELECT n_users FROM nu) AS BIGINT) AS n_users,
           |  CAST((SELECT n FROM nn_$dst) AS BIGINT) AS n_converted,
           |  CASE WHEN (SELECT n_users FROM nu) = 0 THEN NULL
           |    ELSE CAST(CAST((SELECT n FROM nn_$dst) AS HUGEINT) * 1000000
           |      // (SELECT n_users FROM nu) AS BIGINT) END AS conv_ppm,
           |  CASE WHEN (SELECT n FROM nn_$dst) = 0 THEN NULL
           |    ELSE CAST((SELECT sd FROM nn_$dst)
           |      // (SELECT n FROM nn_$dst) AS BIGINT) END AS mean_us,
           |$pcts""".stripMargin
      (ctes, sel)
    }
    s"""WITH su AS (
       |  SELECT user_id, min(epoch_us(ts)) AS t_signup
       |  FROM events WHERE event_type = 'signup' GROUP BY 1),
       |nu AS (SELECT count(*) AS n_users FROM su),
       |${edgeBlocks.map(_._1).mkString(",\n")}
       |${edgeBlocks.map(_._2).mkString("\nUNION ALL\n")}
       |ORDER BY edge""".stripMargin
  }

  /** Fixed-width value histogram per event_type (20 buckets of width 25
    * over [0, 500)): one conditional-aggregation pass, the profiling
    * op every survey tool ships. Buckets derive from exact integer floor
    * of identically-computed doubles, so both engines bucket identically.
    */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(col("event_type"),
        least(floor(col("value") / 25.0), lit(19L)).cast(LongType).as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_lo", col("bucket") * 25.0)
      .orderBy(col("event_type"), col("bucket"))
  }

  val qHistogramSql: String =
    """SELECT event_type, bucket, count(*) AS n, CAST(bucket * 25.0 AS DOUBLE) AS bucket_lo
      |FROM (
      |  SELECT event_type,
      |    CAST(least(floor("value" / 25.0), 19) AS BIGINT) AS bucket
      |  FROM events)
      |GROUP BY event_type, bucket
      |ORDER BY event_type, bucket""".stripMargin

  /** Time-series resample + forward fill: each user's event stream
    * regularized onto an hourly grid (per-user span), observed hours carry
    * the exact-decimal hourly mean, gaps forward-fill the last observation
    * (last-ignore-nulls window). One agg + one generated grid + one keyed
    * join + one window — no per-user driver work, scales with user count.
    */
  def qResampleFfill(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600L * 1000000
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        (unix_micros(col("ts")) - pmod(unix_micros(col("ts")), lit(hourUs))).as("h"),
        col("value").cast(DecimalType(12, 2)).as("v"))
    val obs = ev.groupBy(col("user_id"), col("h"))
      .agg(count(lit(1)).as("n_obs"),
        (sum(col("v")).cast(DoubleType) / count(lit(1))).as("hour_avg"))
    val grid = ev.groupBy(col("user_id"))
      .agg(min(col("h")).as("hmin"), max(col("h")).as("hmax"))
      .select(col("user_id"),
        explode(expr(s"sequence(hmin, hmax, ${hourUs}L)")).as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h").as("hour_us"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("hour_avg"), ignoreNulls = true).over(w).as("filled_avg"))
      .orderBy(col("user_id"), col("hour_us"))
  }

  val qResampleSql: String =
    """WITH ev AS (
      |  SELECT user_id,
      |    epoch_us(ts) - epoch_us(ts) % 3600000000 AS h,
      |    CAST(value AS DECIMAL(12,2)) AS v
      |  FROM events),
      |obs AS (
      |  SELECT user_id, h, count(*) AS n_obs,
      |    CAST(sum(v) AS DOUBLE) / count(*) AS hour_avg
      |  FROM ev GROUP BY user_id, h),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(hmin, hmax, 3600000000)) AS h
      |  FROM (SELECT user_id, min(h) AS hmin, max(h) AS hmax FROM ev GROUP BY user_id))
      |SELECT g.user_id, g.h AS hour_us,
      |  coalesce(o.n_obs, 0) AS n_obs,
      |  last_value(o.hour_avg IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_avg
      |FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.h = o.h
      |ORDER BY g.user_id, hour_us""".stripMargin

  /** Weekly cohort retention: users bucketed by first-activity week,
    * counted as active in each subsequent week offset. One scan + two
    * aggregations; the cohort side is one row per user — data-sized, so
    * it shuffle-joins on user_id (no broadcast hint; AQE decides).
    */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        unix_micros(date_trunc("week", col("ts"))).as("w_us"))
    val firstWeek = ev.groupBy(col("user_id")).agg(min(col("w_us")).as("cohort_us"))
    val weekUs = 7L * 24 * 3600 * 1000000
    ev.join(firstWeek, "user_id")
      .select(col("user_id"), col("cohort_us"),
        ((col("w_us") - col("cohort_us")) / weekUs).cast(LongType).as("week_n"))
      .distinct()
      .groupBy(col("cohort_us"), col("week_n"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_us"), col("week_n"))
  }

  val qRetentionSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(date_trunc('week', ts)) AS w_us FROM events),
      |first_week AS (
      |  SELECT user_id, min(w_us) AS cohort_us FROM ev GROUP BY user_id)
      |SELECT cohort_us, week_n, count(*) AS n_users FROM (
      |  SELECT DISTINCT e.user_id, f.cohort_us,
      |    CAST((e.w_us - f.cohort_us) / 604800000000 AS BIGINT) AS week_n
      |  FROM ev e JOIN first_week f ON e.user_id = f.user_id)
      |GROUP BY cohort_us, week_n
      |ORDER BY cohort_us, week_n""".stripMargin

  /** Inter-event gap histogram per event type — the arrival-process
    * fingerprint (bursty vs paced vs periodic) read off per-user
    * consecutive gaps, bucketed into power-of-two second ranges. The
    * bucket id is the EXACT integer ⌊log₂(gap_s)⌋+1 computed as
    * `length(bin(gap_s))` — binary-string length, no floating log, so
    * bucket edges cannot drift between engines. Gaps are between
    * consecutive same-type events OF THE SAME USER (the lag window
    * partitions by (user, type) — user-keyed, skew-free; a global
    * per-type lag would funnel each type through one task).
    */
  def qGapHistogram(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("gap_us", col("t_us") - lag(col("t_us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .withColumn("gap_s", expr("gap_us DIV 1000000"))
      .groupBy(col("event_type"),
        expr("CAST(length(bin(gap_s)) AS INTEGER)").as("gap_bucket"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_s")).as("min_gap_s"), max(col("gap_s")).as("max_gap_s"))
      .orderBy(col("event_type"), col("gap_bucket"))
  }

  val qGapHistogramSql: String =
    """WITH g AS (
      |  SELECT event_type,
      |    (epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
      |      PARTITION BY user_id, event_type ORDER BY ts, event_id)) // 1000000
      |      AS gap_s
      |  FROM events)
      |SELECT event_type, CAST(length(bin(gap_s)) AS INTEGER) AS gap_bucket,
      |  count(*) AS n_gaps,
      |  CAST(min(gap_s) AS BIGINT) AS min_gap_s,
      |  CAST(max(gap_s) AS BIGINT) AS max_gap_s
      |FROM g WHERE gap_s IS NOT NULL
      |GROUP BY event_type, gap_bucket
      |ORDER BY event_type, gap_bucket""".stripMargin

  /** Inter-arrival burstiness per event type — the regime classifier
    * the gap histogram's shape hints at but never quantifies: the
    * squared coefficient of variation CV² = Var(gap)/E[gap]² of
    * same-user inter-arrival gaps. CV² ≈ 1 is memoryless (Poisson)
    * traffic, ≫ 1 is bursty (sessions, retry storms, bots), ≪ 1 is
    * regular (schedulers, heartbeats) — the first number a capacity
    * planner or bot-detector reads off an unfamiliar event stream.
    *
    * EXACT INTEGER throughout (the quality_join_skew discipline):
    * CV²·1e6 = (n·Σg² − (Σg)²)·1e6 DIV (Σg)² over SECOND-quantized
    * gaps (gap_us DIV 1e6 — µs gaps would push n·Σg² past DECIMAL(38)
    * on long-span types; the quantization is part of the contract and
    * identical in the oracle). Sums are DECIMAL(38,0) — exact and
    * order-independent; no variance-of-doubles anywhere. Zero-sum gap
    * types (all gaps < 1 s) emit NULL cv2 rather than an
    * engine-divergent division by zero.
    *
    * Scale shape: the gap derivation is the qGapHistogram user-keyed
    * window (skew-free — never a global per-type ordering); then ONE
    * \|types\|-key two-phase agg. Classification is integer compares on
    * the ppm value.
    */
  def qBurstiness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("gap_us", col("t_us") - lag(col("t_us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .select(col("event_type"),
        expr("CAST(gap_us DIV 1000000 AS DECIMAL(38,0))").as("g"),
        col("gap_us"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast(DecimalType(38, 0)).as("n"),
        sum(col("gap_us").cast(DecimalType(38, 0))).as("sum_gap_us"),
        sum(col("g")).cast(DecimalType(38, 0)).as("s1"),
        sum((col("g") * col("g")).cast(DecimalType(38, 0)))
          .cast(DecimalType(38, 0)).as("s2"))
      .select(col("event_type"),
        col("n").cast(LongType).as("n_gaps"),
        expr("CAST(sum_gap_us DIV n AS BIGINT)").as("mean_gap_us"),
        expr("CASE WHEN s1 = 0 THEN NULL ELSE " +
          "CAST((n * s2 - s1 * s1) * 1000000 DIV (s1 * s1) AS BIGINT) END")
          .as("cv2_ppm"))
      .withColumn("regime", expr(
        """CASE WHEN cv2_ppm IS NULL THEN 'sub_second'
          |  WHEN cv2_ppm > 1500000 THEN 'bursty'
          |  WHEN cv2_ppm < 500000 THEN 'regular'
          |  ELSE 'poisson_like' END""".stripMargin))
      .orderBy(col("event_type"))
  }

  val qBurstinessSql: String =
    """WITH g AS (
      |  SELECT event_type,
      |    epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
      |      PARTITION BY user_id, event_type ORDER BY ts, event_id)
      |      AS gap_us
      |  FROM events),
      |a AS (
      |  SELECT event_type,
      |    CAST(count(*) AS HUGEINT) AS n,
      |    sum(gap_us) AS sum_gap_us,
      |    CAST(sum(gap_us // 1000000) AS HUGEINT) AS s1,
      |    CAST(sum(CAST(gap_us // 1000000 AS HUGEINT)
      |             * CAST(gap_us // 1000000 AS HUGEINT)) AS HUGEINT) AS s2
      |  FROM g WHERE gap_us IS NOT NULL
      |  GROUP BY event_type)
      |SELECT event_type,
      |  CAST(n AS BIGINT) AS n_gaps,
      |  CAST(sum_gap_us // n AS BIGINT) AS mean_gap_us,
      |  CASE WHEN s1 = 0 THEN NULL ELSE
      |    CAST((n * s2 - s1 * s1) * 1000000 // (s1 * s1) AS BIGINT) END
      |    AS cv2_ppm,
      |  CASE WHEN s1 = 0 THEN 'sub_second'
      |    WHEN (n * s2 - s1 * s1) * 1000000 // (s1 * s1) > 1500000 THEN 'bursty'
      |    WHEN (n * s2 - s1 * s1) * 1000000 // (s1 * s1) < 500000 THEN 'regular'
      |    ELSE 'poisson_like' END AS regime
      |FROM a
      |ORDER BY event_type""".stripMargin

  /** Activity concentration — the Lorenz/Gini panel for the user base:
    * how unequally events distribute over users. One row: user count,
    * event total, the exact-integer Gini coefficient in ppm
    * (G = (2·Σ rk·c − (n+1)·Σc) / (n·Σc) over ascending-ranked per-user
    * counts — ties are rank-assignment-invariant because permuting
    * equal counts among consecutive ranks leaves Σ rk·c unchanged), and
    * the top-1% / top-10% user share of all events in ppm (the "do 1%
    * of accounts generate half the traffic" bot/whale question).
    *
    * Scale shape: per-user counts (user-keyed two-phase agg) feed ONE
    * GlobalRank range-exchange rank (never an empty-partitionBy
    * window); the Gini sums are one exact DECIMAL(38,0) aggregation
    * over the ranked frame; top-k% shares are two filtered sums by rank
    * against bounded driver scalars. All arithmetic BigInt/HUGEINT —
    * exact at any corpus size.
    */
  def qActivityGini(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    // (r14 optimization round: withGlobalRank already returns a
    // localCheckpointed frame — the second checkpoint was a pure extra
    // materialization job over identical rows)
    val ranked = GlobalRank.withGlobalRank(
      perUser, "rk", col("c"), col("user_id"))
    val agg = ranked.agg(count(lit(1)).as("n"),
      sum(col("c").cast(DecimalType(38, 0))).as("s"),
      sum((col("rk").cast(DecimalType(19, 0)) *
        col("c").cast(DecimalType(19, 0))).cast(DecimalType(38, 0)))
        .as("sic")).collect().head
    val n = agg.getLong(0)
    if (n == 0L) {
      return Seq.empty[(Long, Long, Long, Long, Long)]
        .toDF("n_users", "total_events", "gini_ppm", "top1_share_ppm",
          "top10_share_ppm")
    }
    val s = BigInt(agg.getDecimal(1).toBigInteger)
    val sic = BigInt(agg.getDecimal(2).toBigInteger)
    val gini = ((sic * 2 - s * (n + 1)) * 1000000 / (BigInt(n) * s)).toLong
    def topShare(k: Long): Long = {
      val kk = math.max(1L, k)
      val topSum = BigInt(ranked.filter(col("rk") > n - kk)
        .agg(sum(col("c").cast(DecimalType(38, 0)))).collect().head
        .getDecimal(0).toBigInteger)
      (topSum * 1000000 / s).toLong
    }
    Seq((n, s.toLong, gini, topShare(n / 100), topShare(n / 10)))
      .toDF("n_users", "total_events", "gini_ppm", "top1_share_ppm",
        "top10_share_ppm")
  }

  val qActivityGiniSql: String =
    """WITH pu AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
      |r AS (SELECT c, row_number() OVER (ORDER BY c, user_id) AS rk FROM pu),
      |a AS (SELECT CAST(count(*) AS HUGEINT) AS n,
      |        CAST(sum(c) AS HUGEINT) AS s,
      |        CAST(sum(CAST(rk AS HUGEINT) * c) AS HUGEINT) AS sic
      |      FROM r),
      |t AS (SELECT
      |  (SELECT CAST(sum(c) AS HUGEINT) FROM r
      |   WHERE rk > (SELECT n FROM a)
      |     - greatest(1, (SELECT n FROM a) // 100)) AS s1,
      |  (SELECT CAST(sum(c) AS HUGEINT) FROM r
      |   WHERE rk > (SELECT n FROM a)
      |     - greatest(1, (SELECT n FROM a) // 10)) AS s10)
      |SELECT CAST(n AS BIGINT) AS n_users, CAST(s AS BIGINT) AS total_events,
      |  CAST((2 * sic - (n + 1) * s) * 1000000 // (n * s) AS BIGINT)
      |    AS gini_ppm,
      |  CAST(s1 * 1000000 // s AS BIGINT) AS top1_share_ppm,
      |  CAST(s10 * 1000000 // s AS BIGINT) AS top10_share_ppm
      |FROM a, t""".stripMargin

  /** Key-space growth profile — the cardinality curve a capacity planner
    * and an identity-resolution audit both read: per calendar week,
    * active users, FIRST-SEEN (new) users, returning users, the
    * cumulative distinct-user count, and the new-user share in exact
    * ppm. "Is the key space still growing or are we resampling the same
    * users" is the question; the week where n_new collapses is the
    * saturation point.
    *
    * Scale shape: dedup to (week, user) FIRST (the q_sliding_distinct
    * discipline — bounds everything by active user-months), one
    * user-keyed min for first-seen, two week-keyed aggs; the
    * cumulative is a week×week JOIN cumsum over the calendar-bounded
    * week list (≤ a few hundred rows — never an empty-partitionBy
    * running window). Week keys ride as unix-micros BIGINTs (the ts
    * parity device); every number integer-exact.
    */
  def qKeyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val um = Tables.events(spark, dir)
      .select(unix_micros(date_trunc("week", col("ts"))).as("week_us"),
        col("user_id"))
      .distinct()
    val first = um.groupBy(col("user_id")).agg(min(col("week_us")).as("fm"))
    val active = um.groupBy(col("week_us")).agg(count(lit(1)).as("n_active"))
    val news = first.groupBy(col("fm").as("week_us"))
      .agg(count(lit(1)).as("n_new"))
    val byMonth = active.join(news, Seq("week_us"), "left")
      .select(col("week_us"), col("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    // calendar-bounded join cumsum (months², tiny) — not a running
    // window over an unpartitioned frame
    val cum = byMonth.select(col("week_us").as("m2"), col("n_new").as("nn"))
    byMonth
      .join(cum, col("m2") <= col("week_us"))
      .groupBy(col("week_us"), col("n_active"), col("n_new"))
      .agg(sum(col("nn")).as("cum_distinct_users"))
      .select(col("week_us"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"),
        col("cum_distinct_users"),
        expr("CAST(n_new * 1000000 DIV n_active AS BIGINT)")
          .as("new_share_ppm"))
      .orderBy(col("week_us"))
  }

  val qKeyGrowthSql: String =
    """WITH um AS (
      |  SELECT DISTINCT epoch_us(date_trunc('week', ts)) AS week_us,
      |    user_id
      |  FROM events),
      |f AS (SELECT user_id, min(week_us) AS fm FROM um GROUP BY user_id),
      |act AS (SELECT week_us, count(*) AS n_active FROM um GROUP BY week_us),
      |nw AS (SELECT fm AS week_us, count(*) AS n_new FROM f GROUP BY fm),
      |bm AS (
      |  SELECT a.week_us, a.n_active, coalesce(n.n_new, 0) AS n_new
      |  FROM act a LEFT JOIN nw n USING (week_us))
      |SELECT b.week_us, CAST(b.n_active AS BIGINT) AS n_active,
      |  CAST(b.n_new AS BIGINT) AS n_new,
      |  CAST(b.n_active - b.n_new AS BIGINT) AS n_returning,
      |  CAST((SELECT sum(c.n_new) FROM bm c WHERE c.week_us <= b.week_us)
      |    AS BIGINT) AS cum_distinct_users,
      |  CAST((CAST(b.n_new AS HUGEINT) * 1000000) // b.n_active AS BIGINT)
      |    AS new_share_ppm
      |FROM bm b
      |ORDER BY b.week_us""".stripMargin

  /** EWMA rate forecast per event type — the adaptive-baseline upgrade
    * of events_rate_anomaly's static mean/std: a 16-day exponentially
    * weighted moving average (α = 1/2) of daily arrival counts forecasts
    * the latest day, and spike/stall flags fire on 2× deviations. The
    * whole computation is INTEGER-EXACT: with α = 1/2 the truncated
    * EWMA is Σ_{k=1..16} c(d−k)·2^(16−k) in ×65536 fixed point — every
    * weight a power of two, every term a BIGINT product, no float
    * anywhere until the display column (the geometric tail beyond 16
    * days carries < 2⁻¹⁶ of the mass; truncation documented).
    *
    * Scale shape: one (type, day) aggregation over the fact; the
    * type×16 offset grid is a bounded literal frame left-joined against
    * those daily counts (zero-filling silent days — a stall you must
    * SEE); everything downstream is |types|-sized.
    */
  val ewmaHorizon = 16

  def qEwmaForecast(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        unix_micros(date_trunc("day", col("ts"))).as("d_us"))
      .agg(count(lit(1)).as("c"))
    val mx = daily.agg(max(col("d_us")).as("mx_us"))
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(mx))
      .select(col("event_type"), col("mx_us"),
        explode(expr(s"sequence(1, $ewmaHorizon)")).as("k"))
      .withColumn("d_us", col("mx_us") - col("k") * dayUs)
    val hist = grid.join(daily, Seq("event_type", "d_us"), "left")
      .select(col("event_type"), col("mx_us"),
        expr(s"coalesce(c, 0L) * shiftleft(1L, cast($ewmaHorizon - k as int))")
          .as("term"))
      .groupBy(col("event_type"), col("mx_us"))
      .agg(sum(col("term")).as("ewma_x65536"))
    val actual = daily.crossJoin(broadcast(mx))
      .filter(col("d_us") === col("mx_us"))
      .select(col("event_type"), col("c").as("actual"))
    hist.join(actual, Seq("event_type"), "left")
      .withColumn("actual", coalesce(col("actual"), lit(0L)))
      .select(col("event_type"),
        col("ewma_x65536"),
        (col("ewma_x65536").cast(DoubleType) / 65536.0).as("forecast"),
        col("actual"),
        (col("actual") * 65536 > col("ewma_x65536") * 2).as("spike"),
        (col("actual") * 65536 * 2 < col("ewma_x65536")).as("stall"))
      .orderBy(col("event_type"))
  }

  /** Next-day EWMA baseline per event type from a (ts, event_type)
    * history frame — the STATIC side of StreamOps.ewmaGate (the live
    * twin of qEwmaForecast). Same ×65536 fixed-point contract as the
    * batch op, shifted one day: offsets 0..15 from the history's last
    * day (k=0 weighs 2^15, i.e. α = ½ on the most recent day), silent
    * days zero-filled through the bounded type×16 grid. |types| rows —
    * broadcastable into the stream-static join at any scale.
    */
  def ewmaBaselineOf(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val daily = events
      .groupBy(col("event_type"),
        unix_micros(date_trunc("day", col("ts"))).as("d_us"))
      .agg(count(lit(1)).as("c"))
    val mx = daily.agg(max(col("d_us")).as("mx_us"))
    daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(mx))
      .select(col("event_type"), col("mx_us"),
        explode(expr(s"sequence(0, ${ewmaHorizon - 1})")).as("k"))
      .withColumn("d_us", col("mx_us") - col("k") * dayUs)
      .join(daily, Seq("event_type", "d_us"), "left")
      .select(col("event_type"),
        expr(s"coalesce(c, 0L) * shiftleft(1L, cast(${ewmaHorizon - 1} - k as int))")
          .as("term"))
      .groupBy(col("event_type"))
      .agg(sum(col("term")).as("ewma_x65536"))
  }

  val qEwmaForecastSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS d_us,
       |    count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |mx AS (SELECT max(d_us) AS mx_us FROM daily),
       |grid AS (
       |  SELECT t.event_type, m.mx_us, k.k,
       |    m.mx_us - k.k * 86400000000 AS d_us
       |  FROM (SELECT DISTINCT event_type FROM daily) t, mx m,
       |    range(1, ${ewmaHorizon + 1}) k(k)),
       |hist AS (
       |  SELECT g.event_type, g.mx_us,
       |    CAST(sum(coalesce(d.c, 0) * (1 << ($ewmaHorizon - g.k))) AS BIGINT)
       |      AS ewma_x65536
       |  FROM grid g LEFT JOIN daily d
       |    ON g.event_type = d.event_type AND g.d_us = d.d_us
       |  GROUP BY g.event_type, g.mx_us),
       |act AS (
       |  SELECT d.event_type, d.c AS actual
       |  FROM daily d, mx m WHERE d.d_us = m.mx_us)
       |SELECT h.event_type, h.ewma_x65536,
       |  CAST(h.ewma_x65536 AS DOUBLE) / 65536.0 AS forecast,
       |  CAST(coalesce(a.actual, 0) AS BIGINT) AS actual,
       |  coalesce(a.actual, 0) * 65536 > h.ewma_x65536 * 2 AS spike,
       |  coalesce(a.actual, 0) * 65536 * 2 < h.ewma_x65536 AS stall
       |FROM hist h LEFT JOIN act a ON h.event_type = a.event_type
       |ORDER BY h.event_type""".stripMargin

  /** Cohort-revenue (LTV) matrix — qRetention's monetized sibling: per
    * (first-seen cohort week, weeks-since-first), active users, paying
    * users, the cell's exact-decimal purchase revenue, and the running
    * CUMULATIVE revenue per cohort — the curve a growth team reads LTV
    * off. Revenue is DECIMAL(12,2)-exact (the events money device);
    * the cumulative sum is a window PARTITIONED BY cohort over the
    * aggregate-sized matrix (cohorts × weeks cells, never raw events);
    * active/paying counts come from a two-level (cell, user) → cell
    * aggregation — no COUNT(DISTINCT)/Expand.
    */
  def qCohortRevenue(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(date_trunc("week", col("ts"))).as("w_us"),
        col("value").cast(DecimalType(12, 2)).as("v"))
    val firstWeek = ev.groupBy(col("user_id")).agg(min(col("w_us")).as("cohort_us"))
    val weekUs = 7L * 24 * 3600 * 1000000
    val perUserCell = ev.join(firstWeek, "user_id")
      .select(col("user_id"), col("cohort_us"),
        ((col("w_us") - col("cohort_us")) / weekUs).cast(LongType).as("week_n"),
        when(col("event_type") === "purchase", col("v"))
          .otherwise(lit(0).cast(DecimalType(12, 2))).as("rev"))
      .groupBy(col("cohort_us"), col("week_n"), col("user_id"))
      .agg(sum(col("rev")).as("u_rev"))
    val wCum = Window.partitionBy(col("cohort_us")).orderBy(col("week_n"))
    perUserCell
      .groupBy(col("cohort_us"), col("week_n"))
      .agg(count(lit(1)).as("n_active_users"),
        sum(when(col("u_rev") > 0, 1L).otherwise(0L)).as("n_paying_users"),
        sum(col("u_rev")).as("rev_d"))
      .withColumn("cum_rev_d", sum(col("rev_d")).over(wCum))
      .select(col("cohort_us"), col("week_n"), col("n_active_users"),
        col("n_paying_users"),
        col("rev_d").cast(DoubleType).as("revenue"),
        col("cum_rev_d").cast(DoubleType).as("cum_revenue"))
      .orderBy(col("cohort_us"), col("week_n"))
  }

  val qCohortRevenueSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(date_trunc('week', ts)) AS w_us,
      |    CAST(value AS DECIMAL(12,2)) AS v
      |  FROM events),
      |first_week AS (
      |  SELECT user_id, min(w_us) AS cohort_us FROM ev GROUP BY user_id),
      |per_user_cell AS (
      |  SELECT f.cohort_us,
      |    CAST((e.w_us - f.cohort_us) / 604800000000 AS BIGINT) AS week_n,
      |    e.user_id,
      |    sum(CASE WHEN e.event_type = 'purchase' THEN e.v
      |             ELSE CAST(0 AS DECIMAL(12,2)) END) AS u_rev
      |  FROM ev e JOIN first_week f ON e.user_id = f.user_id
      |  GROUP BY 1, 2, 3),
      |cells AS (
      |  SELECT cohort_us, week_n, count(*) AS n_active_users,
      |    CAST(sum(CASE WHEN u_rev > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_paying_users,
      |    sum(u_rev) AS rev_d
      |  FROM per_user_cell GROUP BY 1, 2)
      |SELECT cohort_us, week_n, n_active_users, n_paying_users,
      |  CAST(rev_d AS DOUBLE) AS revenue,
      |  CAST(sum(rev_d) OVER (PARTITION BY cohort_us ORDER BY week_n)
      |    AS DOUBLE) AS cum_revenue
      |FROM cells ORDER BY cohort_us, week_n""".stripMargin

  /** Markov next-event transition matrix: per user in event order,
    * (event_type → next event_type) transition counts plus the
    * within-source transition probability — the user-journey /
    * "what happens after X" primitive (and a first-order behavioral
    * LM over the event alphabet).
    *
    * Shape: ONE shuffle by user_id feeds the lead() window; the
    * (src,dst) aggregation re-keys but map-side partial aggregation
    * collapses the stream to the alphabet² key space first, and the
    * probability window runs over those ≤ alphabet² aggregated rows —
    * never the raw events. Probability as parts-per-million via BIGINT
    * integer division: bit-exact cross-engine, no float rounding.
    */
  def qUserPaths(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("dst_event", lead(col("event_type"), 1).over(byUser))
      .filter(col("dst_event").isNotNull)
      .groupBy(col("event_type").as("src_event"), col("dst_event"))
      .agg(count(lit(1)).as("n_transitions"))
      .select(col("src_event"), col("dst_event"), col("n_transitions"),
        expr("""CAST(n_transitions * 1000000 DIV
                sum(n_transitions) OVER (PARTITION BY src_event) AS BIGINT)""")
          .as("p_e6"))
      .orderBy(col("src_event"), col("dst_event"))
  }

  val qUserPathsSql: String =
    """WITH t AS (
      |  SELECT event_type AS src_event,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS dst_event
      |  FROM events),
      |g AS (
      |  SELECT src_event, dst_event, count(*) AS n_transitions
      |  FROM t WHERE dst_event IS NOT NULL GROUP BY 1, 2)
      |SELECT src_event, dst_event, n_transitions,
      |  CAST((n_transitions * 1000000) // sum(n_transitions) OVER (PARTITION BY src_event) AS BIGINT) AS p_e6
      |FROM g ORDER BY src_event, dst_event""".stripMargin

  /** Event-RATE anomaly detection: per-minute tumbling counts per
    * event_type, z-scored against that type's own rate distribution;
    * the top-3 most extreme windows per type are surfaced with an
    * |z| > 3 anomaly flag — the ops-monitoring "did ingest spike/stall
    * this minute" primitive (quality_anomaly's time-axis sibling: that
    * one scores VALUES, this scores ARRIVAL RATES).
    *
    * Shape: one corpus scan → (type, minute) keyed agg; everything
    * after runs on aggregate-sized rows (types × minutes), with the
    * stats windows partitioned BY TYPE (never a single global
    * partition). Determinism: μ/σ derive from exact integer window
    * sums (Σcnt, Σcnt²) with the identical double formula both
    * engines; zero-variance types are filtered on the same exact
    * predicate; ranking ties break on the unique minute key.
    */
  def qRateAnomaly(spark: SparkSession, dir: String): DataFrame =
    rateAnomalyOf(Tables.events(spark, dir))

  /** Per-type baseline (mean/std of per-minute arrival counts) for the
    * streaming twin (StreamOps.rateMonitor): the types-sized static
    * side of its stream-static join, refreshed from history on
    * whatever cadence the pipeline re-plans. */
  def rateBaselineOf(events: DataFrame): DataFrame = {
    events
      .groupBy(col("event_type"),
        unix_micros(date_trunc("minute", col("ts"))).as("minute_us"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_w"), sum(col("cnt")).as("sx"),
        sum(col("cnt") * col("cnt")).as("sxx"))
      .select(col("event_type"),
        expr("CAST(sx AS DOUBLE) / n_w").as("mean_cnt"),
        expr("sqrt(CAST(sxx AS DOUBLE) / n_w - (CAST(sx AS DOUBLE) / n_w) * (CAST(sx AS DOUBLE) / n_w))")
          .as("std_cnt"))
  }

  /** Same operator over any (event_type, ts) frame — spec fixtures
    * plant synthetic spikes through this entry. */
  def rateAnomalyOf(events: DataFrame): DataFrame = {
    val wcnt = events
      .groupBy(col("event_type"),
        unix_micros(date_trunc("minute", col("ts"))).as("minute_us"))
      .agg(count(lit(1)).as("cnt"))
    wcnt.select(col("event_type"), col("minute_us"), col("cnt"),
        expr("count(*) OVER (PARTITION BY event_type)").as("n_w"),
        expr("CAST(sum(cnt) OVER (PARTITION BY event_type) AS DOUBLE)").as("sx"),
        expr("CAST(sum(cnt * cnt) OVER (PARTITION BY event_type) AS DOUBLE)").as("sxx"))
      .filter(expr("sxx / n_w - (sx / n_w) * (sx / n_w) > 0"))
      .select(col("event_type"), col("minute_us"), col("cnt"),
        expr("CAST(n_w AS BIGINT)").as("n_windows"),
        expr("sx / n_w").as("mean_cnt"),
        expr("sqrt(sxx / n_w - (sx / n_w) * (sx / n_w))").as("std_cnt"),
        expr("(CAST(cnt AS DOUBLE) - sx / n_w) / sqrt(sxx / n_w - (sx / n_w) * (sx / n_w))").as("z"))
      .withColumn("rk",
        expr("row_number() OVER (PARTITION BY event_type ORDER BY abs(z) DESC, minute_us)"))
      .filter(col("rk") <= 3)
      .select(col("event_type"), col("minute_us"), col("cnt"), col("n_windows"),
        col("mean_cnt"), col("std_cnt"), col("z"),
        expr("abs(z) > 3.0").as("is_anomaly"))
      .orderBy(col("event_type"), col("minute_us"))
  }

  val qRateAnomalySql: String =
    """WITH wcnt AS (
      |  SELECT event_type, epoch_us(date_trunc('minute', ts)) AS minute_us,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, minute_us, cnt,
      |    count(*) OVER (PARTITION BY event_type) AS n_w,
      |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS DOUBLE) AS sx,
      |    CAST(sum(cnt * cnt) OVER (PARTITION BY event_type) AS DOUBLE) AS sxx
      |  FROM wcnt),
      |z AS (
      |  SELECT event_type, minute_us, cnt,
      |    CAST(n_w AS BIGINT) AS n_windows,
      |    sx / n_w AS mean_cnt,
      |    sqrt(sxx / n_w - (sx / n_w) * (sx / n_w)) AS std_cnt,
      |    (CAST(cnt AS DOUBLE) - sx / n_w) / sqrt(sxx / n_w - (sx / n_w) * (sx / n_w)) AS z
      |  FROM st WHERE sxx / n_w - (sx / n_w) * (sx / n_w) > 0)
      |SELECT event_type, minute_us, cnt, n_windows, mean_cnt, std_cnt, z,
      |  abs(z) > 3.0 AS is_anomaly
      |FROM (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY abs(z) DESC, minute_us) AS rk
      |      FROM z)
      |WHERE rk <= 3
      |ORDER BY event_type, minute_us""".stripMargin

  // --------------------------------------------------- sliding distinct
  //
  // Trailing-window distinct users per day (DAU over WAU — "stickiness"):
  // for every observed day, the distinct users active that day and over
  // the trailing 7 days, plus DAU/WAU in ppm. The naive form — a sliding
  // RANGE window with a per-frame COUNT(DISTINCT) — rescans each user
  // row up to 7x AND plans an Expand; the scale shape here is the
  // standard expand-the-dedup trick: dedup to (day, user) FIRST (bounds
  // everything downstream by active-user-days, not events), then each
  // deduped pair contributes to exactly 7 target days (a bounded 7x
  // in-row explode of the ALREADY-deduped set), dedup again on
  // (target_day, user), and count. Three keyed shuffles, no Expand, no
  // per-window rescans; day keys ride as unix-micros BIGINTs (the repo's
  // timestamp parity device).

  val slideDays = 7

  def qSlidingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val du = Tables.events(spark, dir)
      .select(unix_micros(date_trunc("day", col("ts"))).as("day_us"), col("user_id"))
      .distinct()
    val daily = du.groupBy(col("day_us")).agg(count(lit(1)).as("users_1d"))
    val wau = du
      .select(explode(expr(s"sequence(0, ${slideDays - 1})")).as("i"),
        col("day_us"), col("user_id"))
      .select((col("day_us") + col("i") * dayUs).as("day_us"), col("user_id"))
      .distinct()
      .groupBy(col("day_us")).agg(count(lit(1)).as("users_7d"))
    daily.join(wau, "day_us") // inner: only observed days surface
      .withColumn("dau_wau_ppm", expr("users_1d * 1000000 div users_7d"))
      .orderBy(col("day_us"))
  }

  // ------------------------------------------------------ seasonality
  //
  // Hour-of-day × day-of-week arrival profile — the periodic-structure
  // view events_rate_anomaly (a point-anomaly pager) deliberately
  // ignores: capacity planning, alert-threshold scheduling and bot
  // detection all read this surface. Per (dow, hour) cell: events,
  // distinct users (dedup-FIRST, no countDistinct Expand), share of
  // total traffic in exact ppm. Output bounded at 168 cells.
  //
  // Scale shape: one keyed agg for events; the user dimension dedups to
  // (cell, user) first; total rides a 168-row window.

  def qSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hod"),
        col("user_id"))
    val cells = ev.groupBy(col("dow"), col("hod")).agg(count(lit(1)).as("n_events"))
    val users = ev.select(col("dow"), col("hod"), col("user_id")).distinct()
      .groupBy(col("dow"), col("hod")).agg(count(lit(1)).as("n_users"))
    cells.join(users, Seq("dow", "hod"))
      .withColumn("share_ppm",
        expr("n_events * 1000000 div sum(n_events) OVER ()"))
      .orderBy(col("dow"), col("hod"))
  }

  val qSeasonalitySql: String =
    """WITH ev AS (
      |  -- DuckDB dayofweek: Sunday=0..6; Spark: Sunday=1..7 -> +1
      |  SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
      |    CAST(hour(ts) AS INT) AS hod, user_id
      |  FROM events),
      |cells AS (SELECT dow, hod, count(*) AS n_events FROM ev GROUP BY 1, 2),
      |users AS (
      |  SELECT dow, hod, count(*) AS n_users
      |  FROM (SELECT DISTINCT dow, hod, user_id FROM ev) GROUP BY 1, 2)
      |SELECT dow, hod, n_events, n_users,
      |  CAST((n_events * 1000000) // sum(n_events) OVER () AS BIGINT) AS share_ppm
      |FROM cells JOIN users USING (dow, hod)
      |ORDER BY dow, hod""".stripMargin

  // -------------------------------------------------------- order backlog
  //
  // Daily open-order backlog — the interval-stabbing query ("how many
  // orders were in flight on day d") answered WITHOUT a day×order range
  // join: each order's lifetime [orderdate-day, last-shipdate-day]
  // becomes a +1 at open and a −1 after close (the classic sweep-line /
  // delta-event transform), daily deltas aggregate first (day-keyed,
  // bounded by the calendar), and the backlog curve is the running sum
  // of deltas over day order — via GlobalRank.withGlobalCumsum, never a
  // single-task global window (PlanInvariantSpec's class guard steers
  // exactly this shape). Orders with no lineitem lines have no close
  // and are excluded (the open-forever convention would need a horizon
  // policy; quality_reconciliation counts them separately).

  def qOrderBacklog(spark: SparkSession, dir: String): DataFrame = {
    val close = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(max(unix_micros(date_trunc("day", col("l_shipdate")))).as("close_us"))
    // close clamped to >= open: the synthetic data holds lines shipped
    // before their order date; a lifetime is at least its open day
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        unix_micros(date_trunc("day", col("o_orderdate"))).as("open_us"))
      .join(close, col("o_orderkey") === col("l_orderkey"))
      .withColumn("close_us", greatest(col("close_us"), col("open_us")))
    val opens = o.groupBy(col("open_us").as("day_us"))
      .agg(count(lit(1)).as("n_opened"))
    val closes = o.groupBy(col("close_us").as("day_us"))
      .agg(count(lit(1)).as("n_closed"))
    val deltas = opens.join(closes, Seq("day_us"), "full_outer")
      .select(col("day_us"),
        coalesce(col("n_opened"), lit(0L)).as("n_opened"),
        coalesce(col("n_closed"), lit(0L)).as("n_closed"))
      .withColumn("delta", col("n_opened") - col("n_closed"))
    graft.operators.GlobalRank
      .withGlobalCumsum(deltas, "delta", "backlog", col("day_us"))
      .select(col("day_us"), col("n_opened"), col("n_closed"), col("backlog"))
      .orderBy(col("day_us"))
  }

  val qOrderBacklogSql: String =
    """WITH close AS (
      |  SELECT l_orderkey, max(epoch_us(date_trunc('day', l_shipdate))) AS close_us
      |  FROM lineitem GROUP BY 1),
      |o AS (
      |  SELECT o_orderkey, epoch_us(date_trunc('day', o_orderdate)) AS open_us,
      |    greatest(close_us, epoch_us(date_trunc('day', o_orderdate))) AS close_us
      |  FROM orders JOIN close ON o_orderkey = l_orderkey),
      |opens AS (SELECT open_us AS day_us, count(*) AS n_opened FROM o GROUP BY 1),
      |closes AS (SELECT close_us AS day_us, count(*) AS n_closed FROM o GROUP BY 1),
      |d AS (
      |  SELECT coalesce(op.day_us, cl.day_us) AS day_us,
      |    coalesce(op.n_opened, 0) AS n_opened, coalesce(cl.n_closed, 0) AS n_closed
      |  FROM opens op FULL OUTER JOIN closes cl ON op.day_us = cl.day_us)
      |SELECT day_us, n_opened, n_closed,
      |  CAST(sum(n_opened - n_closed) OVER (ORDER BY day_us
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
      |FROM d ORDER BY day_us""".stripMargin

  // ------------------------------------------------------- SCD2 history
  //
  // Slowly-changing-dimension (type 2) history built from the event log
  // — the warehouse primitive that turns an append-only stream into a
  // queryable "state of user X at time T" dimension (as-of joins, point-
  // in-time training features and audit queries all consume this shape):
  // per user, consecutive runs of the same state (event_type here)
  // collapse into one validity interval [valid_from, valid_to), the open
  // current run flagged. Classic gaps-and-islands: change flag vs lag →
  // running-sum run ids → per-run rollup → lead() closes each interval.
  //
  // Scale shape: every window is PARTITIONED BY user (keyed shuffle,
  // per-user bounded work — never a global window); the rollup is one
  // (user, run) aggregation. Time rides as unix-micros BIGINT.

  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type").as("state"),
        unix_micros(col("ts")).as("t_us"), col("event_id"))
    val runs = ev
      .withColumn("chg",
        when(lag(col("state"), 1).over(w).isNull ||
          col("state") =!= lag(col("state"), 1).over(w), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(run))
    val agg = runs.groupBy(col("user_id"), col("run_id"))
      .agg(max(col("state")).as("state"), min(col("t_us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    agg
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w2))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(col("user_id"), col("run_id"), col("state"), col("valid_from_us"),
        col("valid_to_us"), col("n_events"), col("is_current"))
      .orderBy(col("user_id"), col("run_id"))
  }

  val scd2HistorySql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type AS state, epoch_us(ts) AS t_us, event_id
      |  FROM events),
      |r AS (
      |  SELECT *, CASE WHEN lag(state) OVER w IS NULL
      |                   OR state <> lag(state) OVER w THEN 1 ELSE 0 END AS chg
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
      |r2 AS (
      |  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY t_us, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
      |  FROM r),
      |a AS (
      |  SELECT user_id, run_id, max(state) AS state, min(t_us) AS valid_from_us,
      |    count(*) AS n_events
      |  FROM r2 GROUP BY 1, 2)
      |SELECT user_id, run_id, state, valid_from_us,
      |  lead(valid_from_us) OVER w2 AS valid_to_us, n_events,
      |  (lead(valid_from_us) OVER w2 IS NULL) AS is_current
      |FROM a WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id)
      |ORDER BY user_id, run_id""".stripMargin

  val qSlidingDistinctSql: String =
    s"""WITH du AS (
       |  SELECT DISTINCT epoch_us(date_trunc('day', ts)) AS day_us, user_id
       |  FROM events),
       |daily AS (SELECT day_us, count(*) AS users_1d FROM du GROUP BY day_us),
       |contrib AS (
       |  SELECT DISTINCT day_us + i * 86400000000 AS day_us, user_id
       |  FROM du, range(0, $slideDays) t(i)),
       |wau AS (SELECT day_us, count(*) AS users_7d FROM contrib GROUP BY day_us)
       |SELECT daily.day_us, users_1d, users_7d,
       |  (users_1d * 1000000) // users_7d AS dau_wau_ppm
       |FROM daily JOIN wau USING (day_us)
       |ORDER BY day_us""".stripMargin

  /** Week-hour activity heatmap — the (day-of-week × hour-of-day)
    * traffic matrix every ops dashboard leads with: per cell, events,
    * exact distinct users, exact decimal value sum, and the cell's
    * integer-ppm share of all traffic.
    *
    * Day-of-week is computed ARITHMETICALLY — (epoch_days + 4) mod 7
    * with 0 = Sunday (1970-01-01 was a Thursday) — because the engines'
    * dayofweek() builtins disagree on numbering (Spark 1=Sunday,
    * DuckDB 0=Sunday): integer epoch math has no convention to disagree
    * on. Timestamps are pre-1970-safe via the house floor-division
    * device (Tables.scala): day = (t - pmod(t, unit)) DIV unit — exact
    * floor for negatives because the subtracted pmod is non-negative —
    * and the oracle mirrors it with ((x % m) + m) % m non-negative
    * modulo, since DuckDB's % keeps the dividend's sign.
    *
    * Scale shape: ONE events scan, one (dow,hod)-keyed two-phase agg
    * (≤168 cells; the single grouped countDistinct takes Spark's
    * no-Expand single-distinct path), 1-row total broadcast for the
    * share.
    */
  def eventsWeeklyHeatmap(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("t_us"), col("user_id"),
        col("value").cast(DecimalType(12, 2)).as("v"))
      .select(
        expr("pmod((t_us - pmod(t_us, 86400000000)) DIV 86400000000 + 4, 7)")
          .cast("int").as("dow"),
        expr("pmod((t_us - pmod(t_us, 3600000000)) DIV 3600000000, 24)")
          .cast("int").as("hod"),
        col("user_id"), col("v"))
      .groupBy(col("dow"), col("hod"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("v")).as("v_d"))
    val total = cells.agg(sum(col("n_events")).as("t_events"))
    cells.crossJoin(broadcast(total))
      .select(col("dow"), col("hod"), col("n_events"), col("n_users"),
        col("v_d").cast(DoubleType).as("sum_value"),
        expr("CAST(n_events * 1000000 DIV t_events AS BIGINT)")
          .as("share_ppm"))
      .orderBy(col("dow"), col("hod"))
  }

  val eventsWeeklyHeatmapSql: String =
    """WITH cells AS (
      |  SELECT CAST(((((epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 + 4) % 7) + 7) % 7 AS INTEGER) AS dow,
      |    CAST(((((epoch_us(ts) - ((epoch_us(ts) % 3600000000 + 3600000000) % 3600000000)) // 3600000000) % 24) + 24) % 24 AS INTEGER) AS hod,
      |    count(*) AS n_events,
      |    count(DISTINCT user_id) AS n_users,
      |    sum(CAST(value AS DECIMAL(12,2))) AS v_d
      |  FROM events GROUP BY dow, hod),
      |total AS (SELECT sum(n_events) AS t_events FROM cells)
      |SELECT dow, hod, CAST(n_events AS BIGINT) AS n_events,
      |  CAST(n_users AS BIGINT) AS n_users,
      |  CAST(v_d AS DOUBLE) AS sum_value,
      |  CAST((CAST(n_events AS HUGEINT) * 1000000) // t_events AS BIGINT)
      |    AS share_ppm
      |FROM cells, total
      |ORDER BY dow, hod""".stripMargin

  /** Session-duration distribution — the operational summary of the
    * sessionize pass: exact nearest-rank percentiles (p10/p25/p50/p75/
    * p90/p99) of session duration in microseconds, plus count and the
    * exact integer mean. Nearest-rank (value at ceil(p·n/100), computed
    * as (p·n+99) DIV 100) keeps every emitted number an OBSERVED
    * BIGINT duration — no interpolation doubles, no cross-engine
    * rounding seam.
    *
    * Scale shape: the sessionize derivation (user-keyed windows) feeds
    * ONE GlobalRank range-exchange rank over durations (the
    * profile_histogram order-statistic device — never a
    * single-partition window); the percentile pull reads ≤ 6 rows by
    * rank; mean is an exact integer division of the duration sum. The
    * duration value at a given rank is unique regardless of tie order,
    * so the tiebreak keys only make the rank total, never change a
    * percentile.
    */
  val sessionPcts: Seq[Int] = Seq(10, 25, 50, 75, 90, 99)

  def eventsSessionStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sessions = Relational.qSessionize(spark, dir)
      .select((col("end_us") - col("start_us")).as("d"),
        col("user_id"), col("session_id"))
    // r14 optimization round: count + duration sum + six percentile rows
    // from ONE sorted pass (GlobalRank.orderStats) — no ranked frame
    val (n, sd, at) = GlobalRank.orderStats(sessions,
      Seq(col("d"), col("user_id"), col("session_id")), Some("d"),
      nn => sessionPcts.map(p => math.max(1L, (p * nn + 99) / 100)))
    // Degrade-don't-throw (the eventsAttribution discipline): a log
    // with zero sessions short-circuits to an empty, correctly-typed
    // frame before the sd/n division, the null-sum getLong, and the
    // atRank lookups could throw.
    if (n == 0L) {
      return Seq.empty[(Long, Long, Long, Long, Long, Long, Long, Long)]
        .toDF("n_sessions", "mean_us", "p10_us", "p25_us", "p50_us",
          "p75_us", "p90_us", "p99_us")
    }
    val targets = sessionPcts.map(p => p -> math.max(1L, (p * n + 99) / 100))
    val dIdx = sessions.schema.fieldIndex("d")
    val atRank: Map[Long, Long] =
      at.map { case (r, row) => r -> row.getLong(dIdx) }
    Seq((n, sd / n, atRank(targets(0)._2), atRank(targets(1)._2),
      atRank(targets(2)._2), atRank(targets(3)._2), atRank(targets(4)._2),
      atRank(targets(5)._2)))
      .toDF("n_sessions", "mean_us", "p10_us", "p25_us", "p50_us",
        "p75_us", "p90_us", "p99_us")
  }

  val eventsSessionStatsSql: String = {
    val base =
      """WITH marked AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t_us,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
        |         WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |sessioned AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM marked),
        |s AS (
        |  SELECT user_id, session_id,
        |    max(t_us) - min(t_us) AS d
        |  FROM sessioned GROUP BY user_id, session_id),
        |nn AS (SELECT count(*) AS n, sum(d) AS sd FROM s),
        |r AS (SELECT d, row_number() OVER (ORDER BY d, user_id, session_id) AS rk
        |      FROM s)""".stripMargin
    val pctSelects = sessionPcts.map { p =>
      s"""  (SELECT d FROM r WHERE rk =
         |    greatest(1, ($p * (SELECT n FROM nn) + 99) // 100)) AS p${p}_us"""
        .stripMargin
    }.mkString(",\n")
    s"""$base
       |SELECT (SELECT n FROM nn) AS n_sessions,
       |  CAST((SELECT sd FROM nn) // (SELECT n FROM nn) AS BIGINT) AS mean_us,
       |$pctSelects""".stripMargin
  }

  /** Batch last-touch attribution — the attributionJoin stream's at-rest
    * twin, over the whole event history: every purchase is attributed to
    * the user's LAST preceding touch event (click or view) within the
    * 7-day lookback, else to 'none'; the report rolls up conversions,
    * exact decimal attributed revenue, and the integer-ppm conversion
    * share per touch channel — the "which surface closes sales"
    * marketing-analytics staple.
    *
    * Scale shape: ONE events scan; the carry-forward is a user-
    * partitioned window (user-keyed, skew-free) whose frame excludes the
    * current row (UNBOUNDED PRECEDING .. 1 PRECEDING — a same-instant
    * touch still precedes the purchase in (ts, event_id) order, on both
    * engines); the touch timestamp and type ride as two parallel
    * last(..., ignoreNulls) columns over the SAME null pattern, so the
    * pair is always consistent without a struct seam. The rollup is a
    * ≤|channels|+1-key aggregation + a 1-row total broadcast. Revenue is
    * DECIMAL(12,2) from the projection (the house events.value rule),
    * double only at the output edge.
    */
  val attributionLookbackUs = 604800000000L // 7 days

  def eventsAttribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin("click", "view")
    val evs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("t_us"),
        col("value").cast(DecimalType(12, 2)).as("v"))
    val touched = evs
      .withColumn("touch_us",
        last(when(isTouch, col("t_us")), ignoreNulls = true).over(w))
      .withColumn("touch_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
    val perChannel = touched
      .filter(col("event_type") === "purchase")
      .select(
        when(col("touch_us").isNull ||
            col("t_us") - col("touch_us") > attributionLookbackUs, lit("none"))
          .otherwise(col("touch_type")).as("attributed_to"),
        col("v"))
      .groupBy(col("attributed_to"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("v")).as("rev_d"))
    val total = perChannel.agg(sum(col("n_conversions")).as("t_conv"))
    perChannel.crossJoin(broadcast(total))
      .select(col("attributed_to"), col("n_conversions"),
        col("rev_d").cast(DoubleType).as("attributed_value"),
        expr("CAST(n_conversions * 1000000 DIV t_conv AS BIGINT)")
          .as("conv_share_ppm"))
      .orderBy(col("attributed_to"))
  }

  val eventsAttributionSql: String =
    s"""WITH evs AS (
       |  SELECT user_id, event_type, event_id, epoch_us(ts) AS t_us,
       |    CAST(value AS DECIMAL(12,2)) AS v
       |  FROM events),
       |t AS (
       |  SELECT *,
       |    last_value(CASE WHEN event_type IN ('click', 'view')
       |        THEN t_us END IGNORE NULLS)
       |      OVER w AS touch_us,
       |    last_value(CASE WHEN event_type IN ('click', 'view')
       |        THEN event_type END IGNORE NULLS)
       |      OVER w AS touch_type
       |  FROM evs
       |  WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |per_channel AS (
       |  SELECT CASE WHEN touch_us IS NULL
       |      OR t_us - touch_us > $attributionLookbackUs THEN 'none'
       |      ELSE touch_type END AS attributed_to,
       |    count(*) AS n_conversions, sum(v) AS rev_d
       |  FROM t WHERE event_type = 'purchase'
       |  GROUP BY 1),
       |total AS (SELECT sum(n_conversions) AS t_conv FROM per_channel)
       |SELECT attributed_to, CAST(n_conversions AS BIGINT) AS n_conversions,
       |  CAST(rev_d AS DOUBLE) AS attributed_value,
       |  CAST((CAST(n_conversions AS HUGEINT) * 1000000) // t_conv AS BIGINT)
       |    AS conv_share_ppm
       |FROM per_channel, total
       |ORDER BY attributed_to""".stripMargin

  /** Stationary distribution of the user-journey Markov chain — where
    * event traffic settles if today's per-user transition behavior
    * repeats: the power-iteration fixpoint of the row-stochastic
    * event-type transition matrix (the q_user_paths transition counts,
    * normalized per source type). The long-run type mix is the
    * capacity-planning number behind "which surface ultimately absorbs
    * the traffic"; comparing it to the CURRENT type mix is the
    * trending-up/down signal.
    *
    * Scale shape: the only data-sized work is ONE events scan feeding a
    * (user)-partitioned lead window (user-keyed, skew-free — the
    * events_gap_histogram discipline) and a (src,dst)-keyed two-phase
    * count. Everything after is arithmetic over a BOUNDED aggregate —
    * the |event_types|² transition matrix (≤ a few thousand cells for
    * any real schema, independent of row count), which is collected and
    * iterated on the driver exactly like a broadcast scalar: the same
    * justification as the 1-row total broadcasts, applied to a
    * matrix-sized one. No per-row data ever reaches the driver.
    *
    * Determinism contract (the pageRank discipline): the entire
    * iteration is fixed-point BIGINT arithmetic in 1e-9 probability
    * units — per-cell flow is (π_i · cnt_ij) DIV tot_i, sums are exact
    * longs, K = {markovIters} rounds unrolled identically in the DuckDB
    * oracle. Types with no outgoing transitions self-loop (absorbing),
    * so mass never silently vanishes; floor-division dust does decay
    * mass, identically on both engines.
    */
  /** Per-type transition entropy — the predictability panel beside the
    * Markov stationary distribution: for each source event type, the
    * Shannon entropy (nats) of its next-type distribution and the
    * normalized ratio vs ln(out-degree). A type with ratio ≈ 0 has a
    * deterministic next step (workflow edge); ratio ≈ 1 means the
    * journey forks uniformly — the signal that distinguishes scripted
    * flows from browsing, and the per-row uncertainty a next-event
    * model could ever remove.
    *
    * Determinism: the profile_column_entropy device — per-(src,dst) ln
    * terms quantized through DECIMAL(18,9) over the \|types\|²-BOUNDED
    * transition aggregate, then summed exactly (order-independent);
    * ratio re-quantized the same way; zero/one-out-degree types emit
    * ratio 0, never a div-by-zero.
    *
    * Scale shape: the markov transition derivation (ONE events scan,
    * user-keyed lead window, (src,dst) two-phase count); everything
    * after runs over ≤\|types\|² rows (the per-src total is a window
    * over that bounded aggregate).
    */
  def qTransitionEntropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("cnt"))
    trans
      .select(col("src"), col("cnt"), expr(
        """CAST(-(CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY src)) *
          |  ln(CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY src))
          |  AS DECIMAL(18,9))""".stripMargin).as("term"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_out_types"), sum(col("cnt")).as("n_transitions"),
        sum(col("term")).as("ent_d"))
      .select(col("src").as("event_type"), col("n_out_types"),
        col("n_transitions"),
        col("ent_d").cast(DoubleType).as("entropy_nats"),
        expr("""CASE WHEN n_out_types <= 1 THEN CAST(0 AS DOUBLE)
               |  ELSE CAST(CAST(CAST(ent_d AS DOUBLE) /
               |    ln(CAST(n_out_types AS DOUBLE)) AS DECIMAL(18,9))
               |    AS DOUBLE) END""".stripMargin).as("entropy_ratio"))
      .orderBy(col("event_type"))
  }

  val qTransitionEntropySql: String =
    """WITH tr AS (
      |  SELECT src, dst, count(*) AS cnt FROM (
      |    SELECT event_type AS src,
      |      lead(event_type) OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id) AS dst
      |    FROM events)
      |  WHERE dst IS NOT NULL GROUP BY src, dst),
      |terms AS (
      |  SELECT src, cnt,
      |    CAST(-(CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY src)) *
      |      ln(CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY src))
      |      AS DECIMAL(18,9)) AS term
      |  FROM tr)
      |SELECT src AS event_type, count(*) AS n_out_types,
      |  CAST(sum(cnt) AS BIGINT) AS n_transitions,
      |  CAST(sum(term) AS DOUBLE) AS entropy_nats,
      |  CASE WHEN count(*) <= 1 THEN CAST(0 AS DOUBLE)
      |    ELSE CAST(CAST(CAST(sum(term) AS DOUBLE) /
      |      ln(CAST(count(*) AS DOUBLE)) AS DECIMAL(18,9)) AS DOUBLE) END
      |    AS entropy_ratio
      |FROM terms
      |GROUP BY src
      |ORDER BY event_type""".stripMargin

  val markovIters = 8
  val markovUnit = 1000000000L

  def eventsMarkovStationary(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("cnt"))
    // bounded collect: |types|² cells, schema-sized not data-sized
    val cells = trans.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = (cells.map(_._1) ++ cells.map(_._2)).distinct.sorted
    val tot = cells.groupBy(_._1).map { case (s, cs) => s -> cs.map(_._3).sum }
    val n = nodes.length.toLong
    // Degrade-don't-throw: a log with no transitions at all (every user
    // has ≤1 event) yields an empty, correctly-typed frame — matching
    // the oracle, whose node CTE is empty — instead of dividing by 0.
    if (n == 0L) {
      import spark.implicits._
      return Seq.empty[(String, Long)].toDF("event_type", "pi_e9")
    }
    var pi: Map[String, Long] = nodes.map(_ -> markovUnit / n).toMap
    for (_ <- 1 to markovIters) {
      val next = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      // BigInt product: pi(s)·c wraps a raw Long above ~9.2e9
      // transitions per cell; the quotient is ≤ markovUnit so the
      // narrowing back to Long is always exact.
      for ((s, d, c) <- cells)
        next(d) += (BigInt(pi(s)) * c / tot(s)).toLong
      for (node <- nodes if !tot.contains(node)) next(node) += pi(node)
      pi = nodes.map(v => v -> next(v)).toMap
    }
    val out = nodes.map(v => (v, pi(v)))
    spark.createDataFrame(out.toSeq)
      .toDF("event_type", "pi_e9")
      .orderBy(col("pi_e9").desc, col("event_type"))
  }

  val eventsMarkovStationarySql: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH tr AS MATERIALIZED (
              |  SELECT src, dst, count(*) AS cnt FROM (
              |    SELECT event_type AS src,
              |      lead(event_type) OVER (
              |        PARTITION BY user_id ORDER BY ts, event_id) AS dst
              |    FROM events)
              |  WHERE dst IS NOT NULL GROUP BY src, dst),
              |nodes AS MATERIALIZED (
              |  SELECT DISTINCT node FROM (
              |    SELECT src AS node FROM tr UNION SELECT dst FROM tr)),
              |tot AS MATERIALIZED (
              |  SELECT src, sum(cnt) AS tot FROM tr GROUP BY src),
              |p0 AS (
              |  SELECT node, $markovUnit // (SELECT count(*) FROM nodes) AS pi
              |  FROM nodes)""".stripMargin
    for (k <- 1 to markovIters) {
      sb ++= s""",
                |p$k AS (
                |  SELECT node, sum(pi) AS pi FROM (
                |    SELECT t.dst AS node, (p.pi * t.cnt) // tt.tot AS pi
                |    FROM p${k - 1} p
                |    JOIN tot tt ON tt.src = p.node
                |    JOIN tr t ON t.src = p.node
                |    UNION ALL
                |    SELECT p.node, p.pi FROM p${k - 1} p
                |    WHERE p.node NOT IN (SELECT src FROM tot))
                |  GROUP BY node)""".stripMargin
    }
    sb ++= s"""
              |SELECT n.node AS event_type,
              |  CAST(coalesce(p.pi, 0) AS BIGINT) AS pi_e9
              |FROM nodes n LEFT JOIN p$markovIters p ON p.node = n.node
              |ORDER BY pi_e9 DESC, event_type""".stripMargin
    sb.toString
  }

  // --------------------------------------------------- new vs returning
  //
  // Daily NEW-vs-RETURNING activity split — the growth-accounting chart
  // every product/ingest dashboard leads with (q_retention answers "do
  // cohorts come back", profile_key_growth tracks the key space week
  // over week; this is the per-day EVENT mix: how much of today's
  // traffic is first-ever-seen users vs the existing base — a
  // new-share collapse is stalled acquisition, a returning collapse is
  // churn, and for an ingest pipeline the same split separates
  // first-crawl volume from re-crawl volume). A user's events on their
  // very first active day count as new; everything later is returning.
  //
  // Scale shape: one events scan → (user, day)-keyed two-phase count
  // agg (the dedup-first device); first day per user = one user-keyed
  // min over that aggregate (never a window over raw events); the flag
  // join is aggregate⋈aggregate on the user key; final day-keyed
  // rollup over calendar-bounded keys. Exact integer ppm with
  // DECIMAL(38,0) widening.

  def eventsNewVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val perUserDay = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $dayUs").as("day"))
      .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("n"))
    val firstDay = perUserDay.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"))
    perUserDay.join(firstDay, "user_id")
      .select(col("day"), col("n"),
        (col("day") === col("d0")).as("is_new"))
      .groupBy(col("day"))
      .agg(sum(when(col("is_new"), col("n")).otherwise(0L)).as("new_events"),
        sum(when(!col("is_new"), col("n")).otherwise(0L))
          .as("returning_events"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("new_users"),
        sum(when(!col("is_new"), 1L).otherwise(0L)).as("returning_users"))
      .select(col("day"), col("new_events"), col("returning_events"),
        col("new_users"), col("returning_users"),
        expr("CAST(CAST(new_events AS DECIMAL(38,0)) * 1000000" +
          " DIV (new_events + returning_events) AS BIGINT)")
          .as("new_share_ppm"))
      .orderBy(col("day"))
  }

  val eventsNewVsReturningSql: String =
    """WITH pud AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |fd AS (SELECT user_id, min(day) AS d0 FROM pud GROUP BY 1)
      |SELECT p.day,
      |  CAST(sum(CASE WHEN p.day = f.d0 THEN p.n ELSE 0 END) AS BIGINT)
      |    AS new_events,
      |  CAST(sum(CASE WHEN p.day <> f.d0 THEN p.n ELSE 0 END) AS BIGINT)
      |    AS returning_events,
      |  CAST(sum(CASE WHEN p.day = f.d0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS new_users,
      |  CAST(sum(CASE WHEN p.day <> f.d0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS returning_users,
      |  CAST(CAST(sum(CASE WHEN p.day = f.d0 THEN p.n ELSE 0 END) AS HUGEINT)
      |    * 1000000 // sum(p.n) AS BIGINT) AS new_share_ppm
      |FROM pud p JOIN fd f USING (user_id)
      |GROUP BY p.day ORDER BY p.day""".stripMargin

  // ------------------------------------------------------- pareto share
  //
  // User-concentration (Lorenz/Pareto) table: for each top-percentile
  // grid point, how many of the most-active users that is and what share
  // of ALL events they produce — the "what % of users generate 80% of
  // traffic" table capacity planning and abuse triage read;
  // events_activity_gini reduces the same curve to one coefficient, this
  // emits the actionable points. Exact integer ppm everywhere.
  //
  // Scale shape: one events scan → user-keyed two-phase count agg → ONE
  // GlobalRank range exchange on (activity desc, user) — never a global
  // window — then a single conditional aggregation computes every grid
  // point in one pass over the ranked frame (thresholds fold in from the
  // 1-row totals broadcast; k = ceil(p·n/100) via the integer-ceiling
  // device).

  val paretoPcts = Seq(1, 5, 10, 20, 50)

  def eventsParetoShare(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_ev"))
    val ranked = GlobalRank.withGlobalRank(byUser, "rk",
      col("n_ev") * -1, col("user_id"))
    val totals = ranked.agg(count(lit(1)).as("n_users"),
      sum(col("n_ev")).as("n_events"))
    val grid = ranked.crossJoin(broadcast(totals))
    val aggs = paretoPcts.map { p =>
      val k = s"($p * n_users + 99) DIV 100"
      sum(when(expr(s"rk <= $k"), col("n_ev")).otherwise(lit(0L)))
        .as(s"e_$p")
    }
    val one = grid.agg(aggs.head, aggs.tail: _*)
      .crossJoin(broadcast(totals))
    paretoPcts.map { p =>
      one.select(lit(p).as("top_pct"),
        // n_top_users from the SCALAR totals row, not max() over the
        // data-sized ranked frame: on an empty events table the frame
        // aggregate yields NULL where the oracle's scalar subquery
        // derivation yields 0 (ADVICE r10)
        expr(s"CAST(($p * n_users + 99) DIV 100 AS BIGINT)")
          .as("n_top_users"),
        col(s"e_$p").as("n_top_events"),
        col("n_events"),
        // DECIMAL(38,0) widening before the ×1e6 product (the
        // pack_shard_balance overflow class — events per grid slice can
        // pass 9.2e12 at lake scale)
        expr(s"CAST(CAST(e_$p AS DECIMAL(38,0)) * 1000000 DIV n_events" +
          " AS BIGINT)").as("event_share_ppm"))
    }.reduce(_ unionByName _)
      .orderBy(col("top_pct"))
  }

  val eventsParetoShareSql: String = {
    val blocks = paretoPcts.map { p =>
      s"""SELECT $p AS top_pct,
         |  CAST(($p * (SELECT n_users FROM t) + 99) // 100 AS BIGINT)
         |    AS n_top_users,
         |  (SELECT CAST(sum(n_ev) AS BIGINT) FROM r
         |   WHERE rk <= ($p * (SELECT n_users FROM t) + 99) // 100)
         |    AS n_top_events,
         |  (SELECT CAST(n_events AS BIGINT) FROM t) AS n_events,
         |  CAST((SELECT CAST(sum(n_ev) AS HUGEINT) FROM r
         |    WHERE rk <= ($p * (SELECT n_users FROM t) + 99) // 100) * 1000000
         |    // (SELECT n_events FROM t) AS BIGINT) AS event_share_ppm"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH u AS (
       |  SELECT user_id, count(*) AS n_ev FROM events GROUP BY 1),
       |r AS (
       |  SELECT n_ev, row_number() OVER (ORDER BY -n_ev, user_id) AS rk
       |  FROM u),
       |t AS (SELECT count(*) AS n_users, sum(n_ev) AS n_events FROM u)
       |$blocks
       |ORDER BY top_pct""".stripMargin
  }

  // ----------------------------------------------------- autocorrelation
  //
  // Lag-k autocorrelation of the DAILY event-count series — the
  // first-order seasonality/persistence diagnostic an anomaly-detection
  // rollout reads before picking a baseline window (lag-1: day-to-day
  // persistence; lag-7: weekly seasonality — the same structure
  // events_seasonality shows as a heatmap, reduced to one number a
  // threshold can act on). Missing calendar days count as ZERO events
  // (they are real observations of an idle system, not missing data —
  // the quality_ingestion_gaps distinction).
  //
  // Exactness: the calendar-filled series is integer counts; all six
  // correlation sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate in
  // DECIMAL(38,0) — exact and order-independent — and Pearson's r runs
  // in IEEE double over those exact sums (mult/div/sqrt are
  // correctly-rounded in both engines; no libm pow/ln anywhere) — the
  // profile_correlations device. Zero variance or an empty pair set
  // degrades to NULL via identical CASE guards.
  //
  // Scale shape: ONE events scan → day-keyed two-phase count agg; the
  // calendar fill explodes a 1-row min/max agg into a days-sized frame
  // (calendar-bounded, broadcastable at any corpus size); each lag is a
  // days-sized equi-join + a 1-row aggregation. Nothing downstream of
  // the first agg is data-sized.

  val autocorrLags = Seq(1, 7)

  def eventsAutocorr(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val counts = Tables.events(spark, dir)
      .select(expr(s"unix_micros(ts) DIV $dayUs").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
    val bounds = counts.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val days = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val filled = days.join(counts, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("x"))
      .localCheckpoint() // days-sized; both lag joins + both sides read it
    val out = autocorrLags.map { lag =>
      val a = filled.select(col("day"), col("x"))
      val b = filled.select((col("day") - lag).as("day"), col("x").as("y"))
      a.join(b, "day")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("x").cast(dec)).cast(dec).as("sx"),
          sum(col("y").cast(dec)).cast(dec).as("sy"),
          sum((col("x") * col("y")).cast(dec)).cast(dec).as("sxy"),
          sum((col("x") * col("x")).cast(dec)).cast(dec).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).cast(dec).as("syy"))
        .select(lit(lag).as("lag"), col("n_pairs"),
          expr(
            """CASE WHEN n_pairs <= 1
              |  OR n_pairs * sxx - sx * sx = 0 OR n_pairs * syy - sy * sy = 0
              |THEN NULL ELSE
              |  (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
              |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
              |  (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
              |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
              |   sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
              |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
              |END""".stripMargin).as("r"))
    }.reduce(_ unionByName _)
    out.orderBy(col("lag"))
  }

  val eventsAutocorrSql: String = {
    val lagBlocks = autocorrLags.map { lag =>
      s"""SELECT $lag AS lag, n_pairs,
         |  CASE WHEN n_pairs <= 1
         |    OR n_pairs * sxx - sx * sx = 0 OR n_pairs * syy - sy * sy = 0
         |  THEN NULL ELSE
         |    (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |    (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
         |     sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         |  END AS r
         |FROM (
         |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(sum(CAST(a.x AS HUGEINT)) AS HUGEINT) AS sx,
         |    CAST(sum(CAST(b.x AS HUGEINT)) AS HUGEINT) AS sy,
         |    CAST(sum(CAST(a.x AS HUGEINT) * b.x) AS HUGEINT) AS sxy,
         |    CAST(sum(CAST(a.x AS HUGEINT) * a.x) AS HUGEINT) AS sxx,
         |    CAST(sum(CAST(b.x AS HUGEINT) * b.x) AS HUGEINT) AS syy
         |  FROM filled a JOIN filled b ON b.day = a.day + $lag)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH counts AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n
       |  FROM events GROUP BY 1),
       |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM counts),
       |days AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM bounds),
       |filled AS (
       |  SELECT d.day, CAST(coalesce(c.n, 0) AS BIGINT) AS x
       |  FROM days d LEFT JOIN counts c USING (day))
       |$lagBlocks
       |ORDER BY lag""".stripMargin
  }
}
