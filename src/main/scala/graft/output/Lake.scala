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
}
