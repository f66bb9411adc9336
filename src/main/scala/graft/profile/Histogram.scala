package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Equi-depth (decile) histograms of the numeric profile columns — the
  * statistic a query optimizer and a drift monitor both want where
  * q_histogram's fixed-width buckets waste resolution on skewed money
  * columns: boundaries at the exact p10..p90 so every bucket holds ~10%
  * of rows, then per-bucket counts.
  *
  * Shape per column: ONE boundary aggregation (a 1-row array of the nine
  * interpolated percentiles — the exact-percentile cross-engine contract
  * from q_quantiles) broadcast back into ONE conditional-count scan;
  * bucket id is `|{b : value ≥ b}|` via an in-row array filter over the
  * broadcast boundaries, so there is no sort and no window anywhere. At
  * 100 TB swap the exact percentile for `approx_percentile` (same plan,
  * sketch merge instead of sort-based exact) — documented, the
  * profile_table_approx precedent. Duplicate-heavy columns can produce
  * repeated boundaries and therefore empty buckets: that IS the
  * equi-depth answer for a stepped distribution, both engines agree
  * bit-for-bit on it.
  */
object Histogram {

  val histCols: Seq[(String, String)] = Seq(
    ("customer", "c_acctbal"), ("events", "value"),
    ("lineitem", "l_extendedprice"), ("lineitem", "l_quantity"),
    ("orders", "o_totalprice"))

  val nBuckets = 10

  def profileHistogram(spark: SparkSession, dir: String): DataFrame = {
    val pcts = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    histCols.map { case (t, c) =>
      val vals = Tables.table(spark, dir, t)
        .select(col(c).cast("double").as("x")).filter(col("x").isNotNull)
      val bounds = vals.agg(
        expr(s"percentile(x, array(${pcts.mkString(", ")}))").as("bs"))
      vals.crossJoin(broadcast(bounds)) // 1-row bounded broadcast
        .select(expr("CAST(size(filter(bs, b -> x >= b)) AS INT)").as("bucket"),
          col("x"), col("bs"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"), min(col("x")).as("min_v"),
          max(col("x")).as("max_v"), first(col("bs")).as("bs"))
        .select(lit(t).as("table_name"), lit(c).as("column_name"), col("bucket"),
          expr("CASE WHEN bucket = 0 THEN NULL ELSE bs[bucket - 1] END").as("lo_bound"),
          expr(s"CASE WHEN bucket = ${nBuckets - 1} THEN NULL ELSE bs[bucket] END")
            .as("hi_bound"),
          col("n_rows"), col("min_v"), col("max_v"))
    }.reduce(_ unionByName _)
      .orderBy(col("table_name"), col("column_name"), col("bucket"))
  }

  val profileHistogramSql: String = {
    val pcts = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    histCols.map { case (t, c) =>
      s"""SELECT '$t' AS table_name, '$c' AS column_name, bucket,
         |  CASE WHEN bucket = 0 THEN NULL ELSE bs[bucket] END AS lo_bound,
         |  CASE WHEN bucket = ${nBuckets - 1} THEN NULL ELSE bs[bucket + 1] END AS hi_bound,
         |  count(*) AS n_rows, min(x) AS min_v, max(x) AS max_v
         |FROM (
         |  SELECT CAST(len(list_filter(bs, b -> x >= b)) AS INT) AS bucket, x, bs
         |  FROM (SELECT CAST($c AS DOUBLE) AS x FROM $t WHERE $c IS NOT NULL),
         |       (SELECT quantile_cont(CAST($c AS DOUBLE), [${pcts.mkString(", ")}]) AS bs
         |        FROM $t WHERE $c IS NOT NULL))
         |GROUP BY bucket, bs
         |""".stripMargin
    }.mkString("", "\nUNION ALL\n", "ORDER BY table_name, column_name, bucket")
  }
}
