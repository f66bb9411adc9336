package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.GlobalRank

/** Robust distribution-shape profile — the octile-based skewness and
  * kurtosis panel beside profile_histogram's deciles: per numeric
  * profile column, the seven nearest-rank octiles E1..E7 plus Bowley
  * quartile skewness ((E6 + E2 − 2·E4)/(E6 − E2)) and Moors octile
  * kurtosis (((E7 − E5) + (E3 − E1))/(E6 − E2)) in exact integer ppm.
  *
  * WHY rank-based and not moment-based: third/fourth power sums of
  * money-scale columns overflow DECIMAL(38)/HUGEINT long before lake
  * scale (Σx⁴ at 1e5-magnitude values is ~1e26 PER MILLION ROWS, and
  * the exact rational skew² needs A2³ ~ 1e60), and a double-side
  * evaluation would hit the >2⁵³ decimal→double conversion seam the r1
  * gate already caught once. Octiles sidestep all of it: every emitted
  * statistic is either an OBSERVED value (cent-quantized BIGINT) or an
  * integer ratio of observed values — exact at any scale, and robust
  * (median/quartile shape statistics don't explode on the heavy tails
  * the profile exists to find — the quality_outlier_mad argument
  * applied to shape).
  *
  * Determinism: values are cent-quantized through DECIMAL(12,2) (the
  * weekly-heatmap device — identical in the oracle) so ranks order
  * integers; the value AT a nearest-rank is tie-order-invariant, and
  * Bowley/Moors are integer cross-ratios ((num·1e6) DIV den, NULL when
  * the interquartile range is zero rather than an engine-divergent
  * division by zero). Moors is emitted raw (Poisson-reference 1.233
  * ppm ≈ 1233000 for a normal; no −3 centering — documented contract).
  *
  * Scale shape (the profile_histogram discipline): per column ONE
  * GlobalRank range-exchange rank (full sort spread over all
  * partitions — never the builtin percentile's single-task
  * value-histogram merge), then ≤7 rows pulled by rank into bounded
  * driver state; the output is a \|columns\|-row literal frame.
  */
object Shape {

  /** (table, column) — the numeric profile surface histCols covers. */
  val shapeCols: Seq[(String, String)] = Seq(
    ("customer", "c_acctbal"), ("events", "value"),
    ("lineitem", "l_extendedprice"), ("lineitem", "l_quantity"),
    ("orders", "o_totalprice"))

  def shapeRobust(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r14 optimization round (guide §2.6 "overlap independent jobs"):
    // the per-column octile probes are independent job chains — submit
    // them from driver futures so one column's scheduler latency and
    // stage tail back-fills with another column's tasks; results are
    // re-ordered deterministically below (Future.sequence preserves
    // input order), so the output frame is unchanged.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val rows = Await.result(Future.sequence(shapeCols.map { case (t, c) =>
      Future {
      val cents = Tables.table(spark, dir, t)
        .filter(col(c).isNotNull)
        .select(expr(s"CAST(CAST($c AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("x"))
      // r14 optimization round: targeted order statistics — sort once,
      // collect ONLY the 7 octile rows (no full ranked frame, no
      // checkpoint of the whole column; see GlobalRank.orderStats)
      val (n, _, atRank) = GlobalRank.orderStats(cents, Seq(col("x")), None,
        nn => (1 to 7).map(k => math.max(1L, (k * nn + 7) / 8)))
      val targets = (1 to 7).map(k => k -> math.max(1L, (k * n + 7) / 8))
      val e = targets.map { case (k, rk) => k -> atRank(rk).getLong(0) }.toMap
      val iqr = e(6) - e(2)
      def ppm(num: Long): Option[Long] =
        if (iqr == 0L) None else Some(num * 1000000L / iqr)
      (t, c, n, e(1), e(2), e(3), e(4), e(5), e(6), e(7),
        ppm(e(6) + e(2) - 2 * e(4)), ppm((e(7) - e(5)) + (e(3) - e(1))))
      }
    }), Duration.Inf)
    rows.toDF("table_name", "column_name", "n_rows", "e1_cents", "e2_cents",
      "e3_cents", "e4_cents", "e5_cents", "e6_cents", "e7_cents",
      "bowley_skew_ppm", "moors_kurt_ppm")
      .orderBy(col("table_name"), col("column_name"))
  }

  val shapeRobustSql: String = {
    val branches = shapeCols.map { case (t, c) =>
      val octs = (1 to 7).map(k =>
        s"""  (SELECT x FROM r_${t}_$c WHERE rk =
           |    greatest(1, ($k * (SELECT n FROM n_${t}_$c) + 7) // 8))
           |    AS e$k""".stripMargin).mkString(",\n")
      (s"""r_${t}_$c AS (
          |  SELECT x, row_number() OVER (ORDER BY x) AS rk FROM (
          |    SELECT CAST(CAST($c AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
          |    FROM $t WHERE $c IS NOT NULL)),
          |n_${t}_$c AS (SELECT count(*) AS n FROM r_${t}_$c),
          |o_${t}_$c AS (
          |SELECT '$t' AS table_name, '$c' AS column_name,
          |  (SELECT CAST(n AS BIGINT) FROM n_${t}_$c) AS n_rows,
          |$octs)""".stripMargin,
       s"""SELECT table_name, column_name, n_rows,
          |  e1 AS e1_cents, e2 AS e2_cents, e3 AS e3_cents, e4 AS e4_cents,
          |  e5 AS e5_cents, e6 AS e6_cents, e7 AS e7_cents,
          |  CASE WHEN e6 - e2 = 0 THEN NULL ELSE
          |    CAST((e6 + e2 - 2 * e4) * 1000000 // (e6 - e2) AS BIGINT) END
          |    AS bowley_skew_ppm,
          |  CASE WHEN e6 - e2 = 0 THEN NULL ELSE
          |    CAST(((e7 - e5) + (e3 - e1)) * 1000000 // (e6 - e2) AS BIGINT) END
          |    AS moors_kurt_ppm
          |FROM o_${t}_$c""".stripMargin)
    }
    s"""WITH ${branches.map(_._1).mkString(",\n")}
       |SELECT * FROM (
       |${branches.map(_._2).mkString("\nUNION ALL\n")})
       |ORDER BY table_name, column_name""".stripMargin
  }
}
