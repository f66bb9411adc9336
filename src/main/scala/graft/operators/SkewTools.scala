package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.Tables

/** Explicit skew-handling tools (SURVEY §5): salted two-phase aggregation.
  *
  * AQE's skew handling only splits skewed partitions for sort-merge
  * JOINS; a skewed AGGREGATION key still lands on one reducer. Salting
  * splits each key into `salt` sub-keys, pre-aggregates per (key, salt) —
  * the skewed key's rows now spread over `salt` reducers — then merges the
  * partials in a second (tiny) aggregation. Results are identical to a
  * direct groupBy; only the shuffle distribution changes.
  */
object SkewTools {

  /** Salted sum/count aggregation over one key column. The salt column is
    * derived deterministically (hash of a tiebreaker column mod salt) so
    * the operator stays reproducible; a random salt works equally for
    * plain correctness.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column,
      tiebreak: String, salt: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(xxhash64(col(tiebreak)), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n_rows"))
  }

  /** Oracle-checked query: per-user event value totals through the salted
    * two-phase path (user_id is the archetypal skewable key in an event
    * stream). Output identical to a plain groupBy — which is exactly what
    * the DuckDB oracle computes, so the gate proves salting is lossless.
    */
  def qSaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    saltedSumCount(ev, "user_id", col("value").cast(DecimalType(12, 2)),
      "event_id", salt = 16)
      .select(col("user_id"),
        col("sum_value").cast(DoubleType).as("sum_value"), col("n_rows"))
      .orderBy(col("user_id"))
  }

  val qSaltedAggSql: String =
    """SELECT user_id,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  count(*) AS n_rows
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
}
