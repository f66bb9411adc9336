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

  // ------------------------------------------------------ weighted sampling
  //
  // Priority sampling (Duffield, Lund & Thorup, JACM 2007): per source,
  // draw k documents with inclusion probability increasing in weight
  // (n_chars here — any positive mass works), plus the threshold that
  // makes the sample a near-optimal unbiased subset-sum estimator:
  // priority p_i = w_i / u_i with u_i uniform; keep the k largest
  // priorities; tau = the (k+1)-th priority; estimate w_hat_i =
  // max(w_i, tau). Sum of w_hat over the sample is unbiased for the
  // group's total weight — the property that lets a 100 TB curation run
  // audit per-source token mass from a tiny pinned sample.
  //
  // Everything is EXACT INTEGER arithmetic — no ln/exp float seam for
  // the engines to disagree on: u_i = (h_i + 1) / 2^48 with h_i the
  // first 12 md5 hex chars of the doc id (the repo's deterministic-
  // uniform device, cf. Curation.splitAssign), and ranking by ascending
  // key_i = (h_i + 1) * 1000 div w_i is ranking by DESCENDING priority
  // (p_i ~ 2^48 * 1000 / key_i). tau is integer-quantized through the
  // same key scale, so op and oracle agree bit-for-bit.
  //
  // Scale shape: one shuffle on the group key, one window pass; the
  // per-group state is the top-(k+1) ranks. (With a TopKAgg-style
  // partial top-k the shuffle carries only k+1 rows per group per
  // partition; at 20 groups the window form is already bounded.)

  val prioK = 5

  /** Priority sample of k docs per source, weighted by n_chars, with the
    * DLT threshold estimator. */
  def weightedPriority(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("sample_key"), col("doc_id"))
    val wSrc = Window.partitionBy(col("source"))
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        greatest(col("n_chars"), lit(1L)).as("weight"),
        expr("(cast(conv(substring(md5(cast(doc_id as string)), 1, 12), 16, 10) as bigint) + 1) * 1000" +
          " div greatest(n_chars, cast(1 as bigint))").as("sample_key"))
      .withColumn("rn", row_number().over(w))
      .withColumn("tau_key", max(when(col("rn") === prioK + 1, col("sample_key"))).over(wSrc))
      .filter(col("rn") <= prioK)
      .select(col("source"), col("rn").as("rank"), col("doc_id"), col("weight"),
        col("sample_key"),
        when(col("tau_key").isNotNull,
          greatest(col("weight"), expr("281474976710656000 div tau_key")))
          .otherwise(col("weight")).as("w_hat"))
      .orderBy(col("source"), col("rank"))
  }

  val weightedPrioritySql: String =
    s"""WITH d AS (
       |  SELECT source, doc_id, greatest(n_chars, 1) AS weight,
       |    ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT + 1) * 1000)
       |      // greatest(n_chars, 1) AS sample_key
       |  FROM documents),
       |r AS (
       |  SELECT source, doc_id, weight, sample_key,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY sample_key, doc_id)
       |      AS INTEGER) AS rn
       |  FROM d),
       |t AS (
       |  SELECT *, max(CASE WHEN rn = ${prioK + 1} THEN sample_key END)
       |    OVER (PARTITION BY source) AS tau_key
       |  FROM r)
       |SELECT source, rn AS rank, doc_id, weight, sample_key,
       |  CASE WHEN tau_key IS NOT NULL
       |       THEN greatest(weight, 281474976710656000 // tau_key)
       |       ELSE weight END AS w_hat
       |FROM t WHERE rn <= $prioK
       |ORDER BY source, rank""".stripMargin
}
