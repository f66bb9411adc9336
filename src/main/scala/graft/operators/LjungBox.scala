package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Ljung–Box portmanteau whiteness test on the daily event-count series
  * — the SIXTH leg of the bounded-series anomaly-triage panel:
  * theil_sen answers TREND, cusum answers LEVEL SHIFT, runs answers
  * RANDOMNESS (sign pattern), jarque_bera answers NORMALITY,
  * seasonal_decomp answers WEEKLY RHYTHM; this answers "is there ANY
  * linear autocorrelation left at all" — the joint test over the first
  * m lags that the per-lag events_autocorr panel (lags 1 and 7 only)
  * cannot give, and the standard residual-whiteness gate an analyst
  * runs AFTER detrending/deseasonalizing before trusting iid-based
  * monitors (cusum's ARL and the z/t tests all assume it).
  *
  * Reference relationship: the dbsurveyor quality surface scores
  * per-metric expectations (dbsurveyor-core/src/models quality
  * metrics); the portmanteau statistic is the corpus-derived
  * generalization for series-shaped metrics, same as the other five
  * panel legs.
  *
  * Definitions (textbook, Ljung & Box 1978): over the gap-filled daily
  * series x_0..x_{n-1} with mean x̄ = S/n, the lag-k sample ACF is
  *   ρ_k = Σ_{t=k..n-1} (x_t − x̄)(x_{t−k} − x̄) / Σ_t (x_t − x̄)² ,
  * and the cumulative statistic at lag m is
  *   Q_m = n(n+2) Σ_{k=1..m} ρ_k² / (n−k)  ~  χ²(m) under whiteness.
  *
  * Exactness (the house integer discipline — every device already
  * driver-green in events_autocorr / seasonal_decomp):
  *   - daily counts gap-filled over [d0, d1] (the events_autocorr fill);
  *   - per lag k the cross term C_k = Σ x_t·x_{t−k} and the two partial
  *     sums A_k = Σ_{t≥k} x_t, B_k = Σ_{t≤n-1-k} x_t accumulate as
  *     DECIMAL(38,0)/HUGEINT (squares/products formed AFTER the wide
  *     cast); with S = Σx, SS = Σx² the mean-centered numerator scales
  *     exactly by n²:
  *       num_k = n²·C_k − n·S·(A_k + B_k) + (n−k)·S²   (exact integer)
  *       den   = n·(n·SS − S²)                          (exact integer)
  *     so ρ_k = num_k/den is ONE double division of two exact wide
  *     integers — correctly-rounded IEEE, identical in both engines
  *     (the canary_comp device class);
  *   - each cumulative Q_k is ONE literal left-associated expression
  *     n(n+2)·(ρ_1²/(n−1) + … + ρ_k²/(n−k)) generated from the same
  *     builder on both sides, so the double summation ORDER is pinned
  *     by the expression tree, never by an aggregate's partition order;
  *   - rejection compares Q_k against the pinned χ²(k) 95% critical
  *     literal (3.841459 … 23.684791) — raw doubles per §6 rule-10.
  *
  * Degrades: n < 2 or a constant series (den = 0) → rho NULL → q NULL →
  * reject NULL (never an overstated verdict); a lag with no pairs
  * (k ≥ n) contributes NULL the same way. Empty events → 0 rows.
  *
  * Scale shape: ONE data-sized day-keyed aggregate (the counts
  * group-by); everything downstream runs on the horizon-bounded daily
  * grid — all 14 lags computed in ONE shifted-union + one day-keyed
  * join + one grouped aggregate (the seasonal_decomp shape, not 14
  * sequential self-join jobs), then a 1-row pivot and one inline
  * explode for the 14 output rows.
  */
object LjungBox {

  private val dayUs = 86400000000L
  private val dec = DecimalType(38, 0)

  /** Lags 1..14 — two full weekly periods, so the joint test spans the
    * rhythm seasonal_decomp measures (7, 14) plus every short lag.
    */
  val maxLag = 14

  /** χ²(k) upper-5% critical values for k = 1..14, pinned literals
    * (identical text in both engines — no CDF seam).
    */
  val chi2Crit95: Seq[Double] = Seq(
    3.841459, 5.991465, 7.814728, 9.487729, 11.070498, 12.591587,
    14.067140, 15.507313, 16.918978, 18.307038, 19.675138, 21.026070,
    22.362032, 23.684791)

  // rho_k from the pivoted wide-integer columns (c$k, ab$k, n, s, ss):
  // num and den are exact integers; the single division is the only
  // float edge. Built once, used verbatim by both engines.
  private def rhoSql(k: Int, wide: String => String): String = {
    val n = wide("n")
    s"""CASE WHEN n > $k AND c$k IS NOT NULL
       |  AND $n * (($n) * ss - s * s) <> ${wide("0")} THEN
       |  CAST(($n) * ($n) * c$k - ($n) * s * ab$k
       |       + (($n) - $k) * s * s AS DOUBLE)
       |  / CAST(($n) * (($n) * ss - s * s) AS DOUBLE)
       |END""".stripMargin
  }

  // Q_k as one literal left-associated sum over r1..rk — the float
  // summation order is the expression tree, identical both sides.
  private def qSql(k: Int): String = {
    val terms = (1 to k)
      .map(j => s"r$j * r$j / (CAST(n AS DOUBLE) - $j.0)")
      .mkString(" + ")
    s"CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * ($terms)"
  }

  def statsLjungBox(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .select(expr(s"unix_micros(ts) DIV $dayUs").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
    val bounds = counts.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val days = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val filled = days.join(counts, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("x"))
      .localCheckpoint() // days-sized; base agg + 2×14 lag-join readers
    val base = filled.agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("x").cast(dec)).cast(dec).as("s"),
      sum(col("x").cast(dec) * col("x").cast(dec)).cast(dec).as("ss"))
    // ALL 14 lags in ONE shifted-union + one day-keyed join + one
    // grouped aggregate (the seasonal_decomp shape) — not 14 sequential
    // self-join jobs, which would be pure scheduler latency on a
    // bounded grid (the q_rfm lesson)
    val lagged = (1 to maxLag).map(k =>
        filled.select((col("day") - k).as("day"), col("x").as("y"),
          lit(k).as("lag")))
      .reduce(_ unionByName _)
    val lagstats = filled.join(lagged, "day")
      .groupBy(col("lag")).agg(
        sum(col("x").cast(dec) * col("y").cast(dec)).cast(dec).as("c"),
        sum((col("x") + col("y")).cast(dec)).cast(dec).as("ab"))
    val pivotCols = (1 to maxLag).flatMap(k => Seq(
      expr(s"max(CASE WHEN lag = $k THEN c END)").as(s"c$k"),
      expr(s"max(CASE WHEN lag = $k THEN ab END)").as(s"ab$k")))
    val piv = lagstats.agg(pivotCols.head, pivotCols.tail: _*)
      .crossJoin(broadcast(base))
    val withRho = (1 to maxLag).foldLeft(piv) { (df, k) =>
      df.withColumn(s"r$k", expr(rhoSql(k, sparkWide)))
    }
    // 14 output rows off the 1-row frame via ONE inline explode — a
    // 14-branch union of 1-row selects would again be 14 scheduler
    // round-trips for no work
    val structs = (1 to maxLag).map { k =>
      s"""struct(CAST($k AS INT) AS lag, r$k AS rho,
         |  CASE WHEN r$k IS NOT NULL THEN ${qSql(k)} END AS q_stat,
         |  CAST(${chi2Crit95(k - 1)} AS DOUBLE) AS crit_95)"""
        .stripMargin.replace("\n", " ")
    }.mkString(", ")
    withRho
      .select(expr("CAST(n AS BIGINT)").as("n_days"),
        expr(s"explode(array($structs))").as("o"))
      .select(col("o.lag").as("lag"), col("n_days"),
        col("o.rho").as("rho"), col("o.q_stat").as("q_stat"),
        col("o.crit_95").as("crit_95"))
      .filter(col("n_days") >= 2)
      .withColumn("reject_whiteness",
        expr("CASE WHEN q_stat IS NOT NULL THEN q_stat > crit_95 END"))
      .orderBy(col("lag"))
  }

  private val sparkWide: String => String =
    s => s"CAST($s AS DECIMAL(38,0))"
  private val duckWide: String => String =
    s => s"CAST($s AS HUGEINT)"

  val statsLjungBoxSql: String = {
    val lagBlocks = (1 to maxLag).map { k =>
      s"""  SELECT $k AS lag,
         |    CAST(sum(CAST(a.x AS HUGEINT) * b.x) AS HUGEINT) AS c,
         |    CAST(sum(CAST(a.x + b.x AS HUGEINT)) AS HUGEINT) AS ab
         |  FROM filled a JOIN filled b ON b.day = a.day + $k""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val pivCols = (1 to maxLag).map(k =>
      s"""  max(CASE WHEN lag = $k THEN c END) AS c$k,
         |  max(CASE WHEN lag = $k THEN ab END) AS ab$k""".stripMargin)
      .mkString(",\n")
    val rhoCols = (1 to maxLag).map(k =>
      s"  ${rhoSql(k, duckWide).replace("\n", "\n  ")} AS r$k")
      .mkString(",\n")
    val outRows = (1 to maxLag).map { k =>
      s"""  SELECT $k AS lag, CAST(n AS BIGINT) AS n_days, r$k AS rho,
         |    CASE WHEN r$k IS NOT NULL THEN ${qSql(k)} END AS q_stat,
         |    CAST(${chi2Crit95(k - 1)} AS DOUBLE) AS crit_95
         |  FROM rho""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH counts AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n
       |  FROM events GROUP BY 1),
       |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM counts),
       |days AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM bounds),
       |filled AS (
       |  SELECT d.day, CAST(coalesce(c.n, 0) AS BIGINT) AS x
       |  FROM days d LEFT JOIN counts c USING (day)),
       |base AS (SELECT CAST(count(*) AS HUGEINT) AS n,
       |  CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS s,
       |  CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ss FROM filled),
       |lagstats AS (
       |$lagBlocks),
       |piv AS (SELECT
       |$pivCols
       |  FROM lagstats),
       |rho AS (SELECT piv.*, base.n, base.s, base.ss,
       |$rhoCols
       |  FROM piv, base),
       |outrows AS (
       |$outRows)
       |SELECT lag, n_days, rho, q_stat, crit_95,
       |  CASE WHEN q_stat IS NOT NULL THEN q_stat > crit_95 END
       |    AS reject_whiteness
       |FROM outrows WHERE n_days >= 2 ORDER BY lag""".stripMargin
  }
}
