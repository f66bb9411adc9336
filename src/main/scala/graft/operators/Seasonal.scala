package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Classical additive seasonal decomposition (STL-lite, period 7) of the
  * daily event-count series — the fifth leg of the bounded-series
  * anomaly-triage panel (r13 VERDICT #8): theil_sen answers TREND,
  * cusum answers LEVEL SHIFT, runs answers RANDOMNESS, jarque_bera
  * answers NORMALITY; this answers "how much of the day-to-day movement
  * is just the weekly rhythm" — the component an analyst subtracts
  * before any of the other four verdicts is trusted on daily data.
  *
  * The reference's quality/monitoring surface scores series against
  * fixed expectations (dbsurveyor-core quality metrics); a decomposition
  * is the corpus-derived generalization the panel needs at training-data
  * scale.
  *
  * Exactness (the house integer discipline, every device already
  * driver-green elsewhere):
  *   - daily counts gap-filled over [d0, d1] (the events_autocorr fill);
  *   - trend = centered 7-term moving sum T7_d = Σ_{j=-3..3} x_{d+j},
  *     built from SEVEN SHIFTED UNIONS of the day grid + one day-keyed
  *     aggregate — never a window (the class guard's point), kept ×7 so
  *     it stays integer; defined only where all 7 terms exist;
  *   - detrended ×7: det7_d = 7·x_d − T7_d, exact BIGINT;
  *   - the seasonal mean uses only COMPLETE epoch-week blocks inside
  *     the trend-defined range (block = day DIV 7; first/last complete
  *     block by pure positive integer arithmetic), so every day-of-week
  *     lane has exactly W observations and all 7 means share the common
  *     denominator 7W — the centering (indices sum to zero) becomes
  *     num*_j = 7·Σ_j det7 − Σ_all det7 on denominator 49W, integers
  *     end to end, no per-lane division anywhere;
  *   - remainder and detrended land on the shared denominator 49W:
  *     p_d = 7W·det7_d − num*_j, q_d = 7W·det7_d; their sums and sums
  *     of squares accumulate as DECIMAL(38,0)/HUGEINT (the
  *     events_autocorr pattern, squares formed AFTER the wide cast);
  *   - seasonal strength F = max(0, 1 − Var(remainder)/Var(detrended))
  *     (Wang–Smith–Hyndman): the variance ratio is computed as ONE
  *     exact wide-integer division to ppb — (ss_r·10⁹) DIV ss_d over
  *     DECIMAL(38,0)/HUGEINT with a 3-rung pre-division ladder keyed on
  *     ss_d's magnitude so neither the product nor the quotient can
  *     leave the exact range at ANY scale (the intdiv_wide canary
  *     device; quotient ≤ ~4·10⁹ so its double presentation is exact);
  *   - per-lane seasonal presents as the raw double num*_j/(49W) (§6
  *     rule-10), strong_seasonality = strength ≥ 0.64 (the tabular
  *     "strong seasonality" convention).
  *
  * Degrades: empty series → 0 rows (NULL bounds collapse the day grid,
  * both engines); fewer than 2 complete weeks or a constant series →
  * strength NULL (never an overstated verdict).
  *
  * Scale shape: ONE data-sized day-keyed aggregate; everything after
  * runs on the horizon-bounded daily grid (7 shifted unions + one
  * 7-lane aggregate + 1-row broadcasts) — the theil_sen/cusum scale
  * argument verbatim.
  */
object Seasonal {

  private val dayUs = 86400000000L
  private val dec = DecimalType(38, 0)

  def statsSeasonalDecomp(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .select(expr(s"unix_micros(ts) DIV $dayUs").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
    val bounds = counts
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .localCheckpoint() // 1 row; read by the grid AND the week bounds
    val days = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val filled = days.join(counts, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("x"))
      .localCheckpoint() // days-sized; 7 shifted readers + the det join
    val shifted = (-3 to 3).map(j =>
        filled.select((col("day") - lit(j.toLong)).as("day"), col("x")))
      .reduce(_ unionByName _)
    val t7 = shifted.groupBy(col("day"))
      .agg(sum(col("x")).as("t7"), count(lit(1)).as("nterms"))
      .filter(col("nterms") === 7)
    val wst = bounds.select(
      expr("(d0 + 9) DIV 7").as("fb"),
      expr("(d1 - 9) DIV 7").as("lb"),
      expr("(d1 - 9) DIV 7 - ((d0 + 9) DIV 7) + 1").as("w"))
    val ib = filled.join(t7, "day")
      .select(col("day"), expr("7 * x - t7").as("det7"),
        expr("day % 7").as("dow"), expr("day DIV 7").as("blk"))
      .crossJoin(broadcast(wst))
      .filter(expr("blk BETWEEN fb AND lb"))
      .localCheckpoint() // days-sized; the lane agg AND the remainder
    val sn = ib.groupBy(col("dow"))
      .agg(sum(col("det7")).as("s_num"))
    val st = sn.agg(sum(col("s_num")).as("s_all"))
    val ss = sn.crossJoin(broadcast(st))
      .select(col("dow"), expr("CAST(7 * s_num - s_all AS BIGINT)").as("num_star"))
      .localCheckpoint() // 7 rows; the remainder join AND the output
    val r = ib.join(broadcast(ss), "dow")
      .select(expr("7 * w * det7").as("qv"),
        expr("7 * w * det7 - num_star").as("pv"))
    val ag = r.agg(count(lit(1)).cast(dec).as("nn"),
        sum(col("pv").cast(dec)).cast(dec).as("sp"),
        sum(col("pv").cast(dec) * col("pv").cast(dec)).cast(dec).as("spp"),
        sum(col("qv").cast(dec)).cast(dec).as("sq"),
        sum(col("qv").cast(dec) * col("qv").cast(dec)).cast(dec).as("sqq"))
      .select(
        expr("CAST(nn * spp - sp * sp AS DECIMAL(38,0))").as("ss_r"),
        expr("CAST(nn * sqq - sq * sq AS DECIMAL(38,0))").as("ss_d"))
    ss.crossJoin(broadcast(ag)).crossJoin(broadcast(wst))
      .select(col("dow"), col("w").as("n_weeks"),
        col("num_star").as("seas_num"),
        expr(seasonalValSql).as("seasonal"),
        expr(strengthSql(sparkWide, sparkIntDiv)).as("seasonal_strength"))
      .withColumn("strong_seasonality", expr(strongSql))
      .orderBy(col("dow"))
  }

  // raw double of ONE shared division (rule-10 presentation); num_star
  // and 49W stay < 2^53 far past any realistic horizon/volume
  private val seasonalValSql =
    "CAST(num_star AS DOUBLE) / (49.0 * CAST(w AS DOUBLE))"

  // 3-rung pre-division ladder keyed on ss_d's own magnitude (a pure
  // wide-integer compare, identical both engines): keeps the first
  // quotient under ~4e17 so BIGINT/HUGEINT never overflow, and the ppb
  // numerator under DECIMAL(38,0) at any N
  private def ladSql(wide: String => String): String =
    s"""CASE WHEN ss_d >= ${wide("'1" + "0" * 35 + "'")}
       |  THEN ${wide("'1" + "0" * 27 + "'")}
       |  WHEN ss_d >= ${wide("'1" + "0" * 26 + "'")}
       |  THEN ${wide("'1" + "0" * 18 + "'")}
       |  WHEN ss_d >= ${wide("'1" + "0" * 17 + "'")}
       |  THEN ${wide("'1000000000'")}
       |  ELSE ${wide("'1'")} END""".stripMargin

  private def strengthSql(wide: String => String,
      intDiv: (String, String) => String): String = {
    val lad = ladSql(wide).replace("\n", "\n    ")
    val rq = intDiv("ss_r", s"($lad)")
    val dq = intDiv("ss_d", s"($lad)")
    val ppb = intDiv(s"(${wide(s"($rq)")} * 1000000000)", s"greatest($dq, 1)")
    s"""CASE WHEN w >= 2 AND ss_d IS NOT NULL AND ss_d > 0 THEN
       |  greatest(0.0, 1.0 - CAST($ppb AS DOUBLE) / 1000000000.0)
       |END""".stripMargin
  }

  private val strongSql =
    """CASE WHEN seasonal_strength IS NULL THEN NULL
      |  ELSE seasonal_strength >= 0.64 END""".stripMargin

  private val sparkWide: String => String =
    s => s"CAST($s AS DECIMAL(38,0))"
  private val duckWide: String => String =
    s => s"CAST($s AS HUGEINT)"
  private val sparkIntDiv: (String, String) => String =
    (a, b) => s"($a DIV $b)"
  private val duckIntDiv: (String, String) => String =
    (a, b) => s"(CAST($a AS HUGEINT) // $b)"

  val statsSeasonalDecompSql: String = {
    val shiftBlocks = (-3 to 3).map(j =>
      s"  SELECT day - ($j) AS day, x FROM filled").mkString("\n  UNION ALL\n")
    s"""WITH counts AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n
       |  FROM events GROUP BY 1),
       |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM counts),
       |days AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM bounds),
       |filled AS (
       |  SELECT d.day, CAST(coalesce(c.n, 0) AS BIGINT) AS x
       |  FROM days d LEFT JOIN counts c USING (day)),
       |shifted AS (
       |$shiftBlocks),
       |t7 AS (SELECT day, CAST(sum(x) AS BIGINT) AS t7, count(*) AS nterms
       |  FROM shifted GROUP BY 1),
       |t7f AS (SELECT day, t7 FROM t7 WHERE nterms = 7),
       |wst AS (SELECT (d0 + 9) // 7 AS fb, (d1 - 9) // 7 AS lb,
       |  (d1 - 9) // 7 - ((d0 + 9) // 7) + 1 AS w FROM bounds),
       |ib AS (SELECT f.day, 7 * f.x - t.t7 AS det7, f.day % 7 AS dow,
       |    f.day // 7 AS blk, wst.w
       |  FROM filled f JOIN t7f t USING (day), wst
       |  WHERE f.day // 7 BETWEEN wst.fb AND wst.lb),
       |sn AS (SELECT dow, CAST(sum(det7) AS BIGINT) AS s_num
       |  FROM ib GROUP BY 1),
       |st AS (SELECT CAST(sum(s_num) AS BIGINT) AS s_all FROM sn),
       |ss AS (SELECT dow, CAST(7 * s_num - s_all AS BIGINT) AS num_star
       |  FROM sn, st),
       |r AS (SELECT 7 * ib.w * ib.det7 AS qv,
       |    7 * ib.w * ib.det7 - ss.num_star AS pv
       |  FROM ib JOIN ss USING (dow)),
       |ag AS (SELECT CAST(count(*) AS HUGEINT) AS nn,
       |  CAST(sum(CAST(pv AS HUGEINT)) AS HUGEINT) AS sp,
       |  CAST(sum(CAST(pv AS HUGEINT) * pv) AS HUGEINT) AS spp,
       |  CAST(sum(CAST(qv AS HUGEINT)) AS HUGEINT) AS sq,
       |  CAST(sum(CAST(qv AS HUGEINT) * qv) AS HUGEINT) AS sqq FROM r),
       |ssq AS (SELECT nn * spp - sp * sp AS ss_r,
       |  nn * sqq - sq * sq AS ss_d FROM ag),
       |f AS (SELECT ss.dow, wst.w AS n_weeks, ss.num_star AS seas_num,
       |  $seasonalValSql AS seasonal,
       |  ${strengthSql(duckWide, duckIntDiv).replace("\n", "\n  ")}
       |    AS seasonal_strength
       |  FROM ss, ssq, wst)
       |SELECT dow, n_weeks, seas_num, seasonal, seasonal_strength,
       |  ${strongSql.replace("\n", "\n  ")} AS strong_seasonality
       |FROM f ORDER BY dow""".stripMargin
  }
}
