package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data sampling with the reference's strategies
  * (dbsurveyor-core/src/models.rs:349-373: MostRecent{limit} with
  * timestamp ordering, Random{limit} as fallback).
  *
  * Both are bounded top-k reads: Spark plans `orderBy(..).limit(n)` as
  * TakeOrderedAndProject — each partition keeps its local top-n and only n
  * rows per partition reach the driver-side merge, so the pattern holds at
  * any scale. "Random" is a deterministic hash order (md5 of the key), the
  * distributed-friendly reproducible analogue of the reference's random
  * fallback.
  */
object Sampler {

  /** MostRecent{100} on events, ordered by (ts, event_id) descending. */
  def mostRecentEvents(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("t_us"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy(col("t_us").desc, col("event_id").desc)
      .limit(100)
  }

  val mostRecentSql: String =
    """SELECT event_id, epoch_us(ts) AS t_us, user_id, event_type, value
      |FROM events
      |ORDER BY t_us DESC, event_id DESC
      |LIMIT 100""".stripMargin

  /** Deterministic Random{100}: order by md5 of the primary key. */
  def randomEvents(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(md5(col("event_id").cast("string")).as("sample_key"),
        col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("sample_key"))
      .limit(100)
  }

  val randomSql: String =
    """SELECT md5(CAST(event_id AS VARCHAR)) AS sample_key,
      |  event_id, user_id, event_type, value
      |FROM events
      |ORDER BY sample_key
      |LIMIT 100""".stripMargin

  /** Deterministic stratified sample: 10 rows per event_type, chosen by
    * md5 order within each stratum (a reproducible per-group reservoir).
    * One window pass — each stratum's selection is partition-local after
    * the shuffle on the stratum key.
    */
  def stratifiedEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(md5(col("event_id").cast("string")))
    Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("user_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("event_type"), col("rn"), col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_type"), col("rn"))
  }

  val stratifiedSql: String =
    """SELECT event_type, rn, event_id, user_id, value FROM (
      |  SELECT event_type, event_id, user_id, value,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY md5(CAST(event_id AS VARCHAR))) AS INTEGER) AS rn
      |  FROM events)
      |WHERE rn <= 10
      |ORDER BY event_type, rn""".stripMargin
}
