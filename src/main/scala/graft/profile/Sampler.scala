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

  /** Sample-representativeness audit — what the reference's MostRecent
    * sampling strategy (its artifact default) COSTS per column: the PSI
    * between each categorical column's distribution in the top-100
    * most-recent sample and in the full table, with the standard
    * 0.1/0.25 bias thresholds. A time-correlated category (a status
    * that trends, a type that launched recently) shows up here before
    * anyone trusts the artifact's sample rows as "what the table looks
    * like".
    *
    * Devices: the quality_psi smoothing/quantization contract verbatim
    * (0.5-per-bin smoothing so sample-absent categories stay finite;
    * identically-derived float terms quantized DECIMAL(18,9) before the
    * exact sum); sample membership is a deterministic total order
    * (time desc + unique-key desc — the sample_most_recent device), so
    * both engines pick the identical 100 rows; the bias verdicts
    * compare the exact decimal sum against exact decimal literals.
    *
    * Scale shape: per table one TakeOrderedAndProject(100) + one
    * category agg (both single-scan, bounded output); every window is
    * partitioned by the panel key over |bins|-bounded rows.
    */
  val coverageN = 100

  def sampleCoverage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    def panel(tbl: String, cat: String, full: DataFrame,
        samp: DataFrame): DataFrame = {
      val f = full.groupBy(col("bin")).agg(count(lit(1)).as("n_full"))
      val s = samp.groupBy(col("bin")).agg(count(lit(1)).as("n_samp"))
      f.join(s, Seq("bin"), "left")
        .select(lit(tbl).as("table_name"), lit(cat).as("column_name"),
          col("bin"), col("n_full"),
          coalesce(col("n_samp"), lit(0L)).as("n_samp"))
    }
    val ev = Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("t"), col("event_id").as("k"),
        col("event_type").as("bin"))
    val ord = Tables.table(spark, dir, "orders")
      .select(col("o_orderdate").as("t"), col("o_orderkey").as("k"),
        col("o_orderstatus").as("bin"))
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_shipdate").as("t"), col("l_orderkey").as("k"),
        col("l_linenumber").as("k2"), col("l_returnflag").as("bin"))
    val counts =
      panel("events", "event_type", ev,
        ev.orderBy(col("t").desc, col("k").desc).limit(coverageN))
      .unionByName(panel("orders", "o_orderstatus", ord,
        ord.orderBy(col("t").desc, col("k").desc).limit(coverageN)))
      .unionByName(panel("lineitem", "l_returnflag", li,
        li.orderBy(col("t").desc, col("k").desc, col("k2").desc)
          .limit(coverageN)))
    val w = Window.partitionBy(col("table_name"), col("column_name"))
    counts
      .withColumn("b_all", count(lit(1)).over(w))
      .withColumn("p_full",
        (col("n_full").cast(DoubleType) + 0.5) /
          (sum(col("n_full")).over(w).cast(DoubleType) +
            lit(0.5) * col("b_all")))
      .withColumn("p_samp",
        (col("n_samp").cast(DoubleType) + 0.5) /
          (sum(col("n_samp")).over(w).cast(DoubleType) +
            lit(0.5) * col("b_all")))
      .withColumn("psi_term",
        ((col("p_samp") - col("p_full")) * log(col("p_samp") / col("p_full")))
          .cast(DecimalType(18, 9)))
      .groupBy(col("table_name"), col("column_name"))
      .agg(sum(col("n_full")).as("n_full"), sum(col("n_samp")).as("n_sample"),
        count(lit(1)).as("n_bins"), sum(col("psi_term")).as("psi_d"))
      .select(col("table_name"), col("column_name"), col("n_full"),
        col("n_sample"), col("n_bins"),
        col("psi_d").cast(DoubleType).as("psi"),
        expr("psi_d > 0.1").as("biased"),
        expr("psi_d > 0.25").as("severely_biased"))
      .orderBy(col("table_name"))
  }

  val sampleCoverageSql: String = {
    val panels = Seq(
      ("events", "event_type",
        "SELECT event_type AS bin FROM events",
        s"""SELECT event_type AS bin FROM (
           |    SELECT event_type FROM (
           |      SELECT event_type, epoch_us(ts) AS t, event_id FROM events)
           |    ORDER BY t DESC, event_id DESC LIMIT $coverageN)"""
          .stripMargin),
      ("orders", "o_orderstatus",
        "SELECT o_orderstatus AS bin FROM orders",
        s"""SELECT o_orderstatus AS bin FROM (
           |    SELECT o_orderstatus FROM orders
           |    ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT $coverageN)"""
          .stripMargin),
      ("lineitem", "l_returnflag",
        "SELECT l_returnflag AS bin FROM lineitem",
        s"""SELECT l_returnflag AS bin FROM (
           |    SELECT l_returnflag FROM lineitem
           |    ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC
           |    LIMIT $coverageN)""".stripMargin))
    val cs = panels.map { case (t, c, fullSql, sampSql) =>
      s"""SELECT '$t' AS table_name, '$c' AS column_name, f.bin,
         |  f.n_full, coalesce(s.n_samp, 0) AS n_samp
         |FROM (SELECT bin, count(*) AS n_full FROM ($fullSql) GROUP BY 1) f
         |LEFT JOIN (SELECT bin, count(*) AS n_samp FROM ($sampSql) GROUP BY 1) s
         |  USING (bin)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH counts AS (
       |$cs),
       |terms AS (
       |  SELECT table_name, column_name, n_full, n_samp,
       |    CAST(((CAST(n_samp AS DOUBLE) + 0.5) /
       |          (CAST(sum(n_samp) OVER (PARTITION BY table_name, column_name) AS DOUBLE)
       |            + 0.5 * count(*) OVER (PARTITION BY table_name, column_name)) -
       |          (CAST(n_full AS DOUBLE) + 0.5) /
       |          (CAST(sum(n_full) OVER (PARTITION BY table_name, column_name) AS DOUBLE)
       |            + 0.5 * count(*) OVER (PARTITION BY table_name, column_name))) *
       |      ln(((CAST(n_samp AS DOUBLE) + 0.5) /
       |          (CAST(sum(n_samp) OVER (PARTITION BY table_name, column_name) AS DOUBLE)
       |            + 0.5 * count(*) OVER (PARTITION BY table_name, column_name))) /
       |          ((CAST(n_full AS DOUBLE) + 0.5) /
       |          (CAST(sum(n_full) OVER (PARTITION BY table_name, column_name) AS DOUBLE)
       |            + 0.5 * count(*) OVER (PARTITION BY table_name, column_name))))
       |      AS DECIMAL(18,9)) AS psi_term
       |  FROM counts)
       |SELECT table_name, column_name,
       |  CAST(sum(n_full) AS BIGINT) AS n_full,
       |  CAST(sum(n_samp) AS BIGINT) AS n_sample,
       |  CAST(count(*) AS BIGINT) AS n_bins,
       |  CAST(sum(psi_term) AS DOUBLE) AS psi,
       |  sum(psi_term) > 0.1 AS biased,
       |  sum(psi_term) > 0.25 AS severely_biased
       |FROM terms
       |GROUP BY table_name, column_name
       |ORDER BY table_name""".stripMargin
  }
}
