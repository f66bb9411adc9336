package graft.output

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Partitioned-lake output: materialize event aggregates into a
  * date-partitioned parquet layout so downstream readers get partition
  * pruning — the storage shape every 100 TB pipeline standardizes on
  * (one directory per day, predicate on the partition column never
  * touches other days' files).
  */
object Lake {

  /** Daily per-type aggregate of events, written partitioned by day. */
  def writeDailyAgg(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .write.mode("overwrite")
      .partitionBy("day")
      .parquet(outDir)
  }

  /** Read one day back; the filter must prune at the partition level
    * (PartitionFilters in the scan, not a post-scan filter).
    */
  def readDay(spark: SparkSession, outDir: String, day: String): DataFrame =
    spark.read.parquet(outDir).filter(col("day") === day)

  /** Bucketed materialization — the OTHER lake layout lever (SURVEY §5):
    * write both join sides bucketed AND sorted by the join key into the
    * session catalog; every subsequent equi-join on that key is then
    * co-located (bucket-to-bucket, no Exchange) and pre-sorted (no Sort)
    * — the pay-once-shuffle-never-again trade a 100 TB pipeline makes
    * for its repeated fact-fact joins. Bucket counts must match across
    * tables; at scale you'd size them to target-partition bytes.
    */
  def writeBucketed(spark: SparkSession, sfDir: String, buckets: Int = 8): Unit = {
    Tables.orders(spark, sfDir).write
      .bucketBy(buckets, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("g_orders_bucketed")
    Tables.customer(spark, sfDir).write
      .bucketBy(buckets, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("g_customer_bucketed")
  }

  /** Per-customer order rollup over the bucketed tables. With both sides
    * bucketed on the join key, the merge-join plan has zero shuffle
    * exchanges and zero sorts before the join (asserted in LakeSpec).
    */
  def bucketedJoin(spark: SparkSession): DataFrame = {
    val o = spark.table("g_orders_bucketed")
    val c = spark.table("g_customer_bucketed")
    // hint the merge join so the check is about bucketing, not about
    // AQE's broadcast choice at toy scale
    o.hint("merge").join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"))
  }
}
