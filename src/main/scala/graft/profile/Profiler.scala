package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.Tables

/** Schema/catalog profiling — the Spark-side equivalent of the reference's
  * schema collection (dbsurveyor-core/src/models.rs:65-460: tables, columns,
  * row counts). Parquet already carries the typed schema, so profiling is
  * about the data: row counts, per-column null/distinct/min/max.
  *
  * Scale notes: `profileTable` is a single wide aggregation (one scan);
  * exact per-column distincts expand the aggregate — at cluster scale swap
  * `countDistinct` for `approx_count_distinct` (same plan shape, sketch
  * merge instead of expand). Catalog profiling is one tiny agg per table —
  * embarrassingly parallel.
  */
object Profiler {

  /** Per-table row count + column count over the whole catalog. */
  def profileCatalog(spark: SparkSession, dir: String): DataFrame = {
    Tables.all.map { name =>
      val df = Tables.table(spark, dir, name)
      df.agg(count(lit(1)).as("n_rows"))
        .select(lit(name).as("table_name"), col("n_rows"),
          lit(df.schema.length).cast("long").as("n_cols"))
    }.reduce(_ unionByName _).orderBy(col("table_name"))
  }

  val catalogSql: String = {
    // column counts mirror the parquet schemas (static per the data model)
    val nCols = Map("region" -> 2, "nation" -> 3, "customer" -> 5,
      "supplier" -> 4, "part" -> 6, "orders" -> 6, "lineitem" -> 11,
      "events" -> 6, "documents" -> 5, "embeddings" -> 3)
    Tables.all.map { t =>
      s"SELECT '$t' AS table_name, count(*) AS n_rows, CAST(${nCols(t)} AS BIGINT) AS n_cols FROM $t"
    }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
  }

  /** Per-column profile of a DataFrame: non-null count, exact distinct
    * count, min/max rendered as strings. Single scan; the row-per-column
    * shape comes from exploding one aggregated row.
    */
  def profileTable(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      Seq(
        count(col(f.name)).as(s"nn_${f.name}"),
        countDistinct(col(f.name)).as(s"nd_${f.name}"),
        min(col(f.name)).cast(StringType).as(s"mn_${f.name}"),
        max(col(f.name)).cast(StringType).as(s"mx_${f.name}"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val structs = fields.map { f =>
      struct(
        lit(f.name).as("column_name"),
        col(s"nn_${f.name}").as("n_nonnull"),
        col(s"nd_${f.name}").as("n_distinct"),
        col(s"mn_${f.name}").as("min_str"),
        col(s"mx_${f.name}").as("max_str"))
    }
    one.select(inline(array(structs: _*))).orderBy(col("column_name"))
  }

  def profileLineitem(spark: SparkSession, dir: String): DataFrame =
    profileTable(Tables.lineitem(spark, dir))

  val lineitemProfileSql: String = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    cols.map { c =>
      s"""SELECT '$c' AS column_name, count($c) AS n_nonnull,
         |count(DISTINCT $c) AS n_distinct,
         |CAST(min($c) AS VARCHAR) AS min_str,
         |CAST(max($c) AS VARCHAR) AS max_str FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }
}
