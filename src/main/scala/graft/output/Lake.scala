package graft.output

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ------------------------------------------------------------- z-order
  //
  // The THIRD lake layout lever: multi-dimensional data clustering.
  // Partitioning prunes on ONE hierarchy, bucketing co-locates ONE join
  // key; a Z-ORDER (Morton-curve) sort clusters rows so that files are
  // tight bounding boxes in TWO dimensions at once — parquet min/max
  // footer stats then skip files for 2-d box predicates that a linear
  // sort can only prune on its leading column. The device Delta/Iceberg
  // expose as OPTIMIZE ZORDER BY, built here from plain Spark: quantize
  // each dimension to 8-bit ranks, interleave the bits into a Morton
  // key, range-repartition + sort by it, write.

  val zBits = 8

  /** Morton interleave of two pre-bucketed (< 2^zBits) integer columns. */
  def zValue(xb: Column, yb: Column): Column =
    (0 until zBits).map { i =>
      shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** events written z-ordered on (user_id, day): each output file is a
    * bounding box in both dimensions. `linear = true` writes the
    * baseline layout sorted by user_id only (same file count) — the
    * comparison LakeSpec measures skipping against.
    */
  def writeZOrdered(spark: SparkSession, sfDir: String, outDir: String,
                    files: Int = 16, linear: Boolean = false): Unit = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_micros(date_trunc("day", col("ts"))).as("day_us"),
        col("event_type"), col("value"))
    // dimension ranges: one tiny agg (at 100 TB these come from table
    // stats / a sketch; exact min-max here keeps the test deterministic)
    val r = ev.agg(min("user_id"), max("user_id"), min("day_us"), max("day_us"))
      .collect()(0)
    val (uMin, uMax, dMin, dMax) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val buckets = 1L << zBits
    def rank(c: Column, lo: Long, hi: Long): Column =
      least(((c - lo) * buckets / math.max(hi - lo + 1, 1L)), lit(buckets - 1))
    val keyed = ev.withColumn("z",
      if (linear) col("user_id")
      else zValue(rank(col("user_id"), uMin, uMax), rank(col("day_us"), dMin, dMax)))
    keyed
      .repartitionByRange(files, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Per-file bounding boxes of a written layout — the reader-side view
    * of what parquet footer min/max stats will allow skipping. */
  def fileBounds(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .select(col("_metadata.file_path").as("f"), col("user_id"), col("day_us"))
      .groupBy(col("f"))
      .agg(min("user_id").as("u_lo"), max("user_id").as("u_hi"),
        min("day_us").as("d_lo"), max("day_us").as("d_hi"))
}
