package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated testdata layout
  * (`<dir>/<name>.parquet`). All operators take `(SparkSession, sfDir)` and
  * resolve their inputs here, so the same code runs at any scale factor —
  * or, at cluster scale, against any parquet lake with this layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) in some testdata generations;
    // without this conf ANY read of that file throws. Set unconditionally
    // so access order never matters.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Other generations write timestamps as un-adjusted int64 micros,
    // which Spark 4 infers as TIMESTAMP_NTZ — breaking every
    // unix_micros/window call downstream. Read them as session-TZ
    // timestamps (sessions pin UTC, so the stored micros pass through
    // unchanged — same value DuckDB's epoch_us sees).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default. Read it as a nanos long and normalize to a microsecond
    * TimestampType (truncation = floor, identical to DuckDB's epoch_us),
    * so every downstream operator sees a plain timestamp column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // floor division (pmod trick), not `div` truncation: identical to
        // epoch_us semantics for pre-1970 nanos too, not just positives
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Fan a SMALL-cardinality frame out to full parallelism before
    * per-row-HEAVY work (gram explosion, per-token md5): the fixture's
    * single-file parquet tables read as 1-2 partitions, so a downstream
    * explode that multiplies row count ~300× runs on 1-2 cores no matter
    * how many the session has — measured r13 at sf1: mm_dedup_phash's
    * 19M-gram explosion took 45 s on the 2-partition scan and 5 s fanned
    * out. Hash-partitioning by the eventual grouping key lets the
    * post-explode keyed aggregate REUSE the exchange (no second
    * shuffle). At 100 TB the input arrives pre-parallel and this narrow
    * shuffle of the small frame is noise — the helper is cheap
    * insurance, not a fixture hack: any lake can hand back a
    * few-large-files table whose scan parallelism undershoots its
    * per-row compute.
    */
  def fanOut(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)
}
