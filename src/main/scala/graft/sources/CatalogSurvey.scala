package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Catalog-object survey — the Spark re-expression of the reference's
  * remaining schema-metadata surfaces (models.rs:177-243, views /
  * routines / custom types; adapters/postgres/routines.rs):
  *
  *  - VIEWS: a database survey reports each view's name and resolved
  *    column schema. Spark's analogue of a view catalog is the session
  *    catalog; graft ships a standard registry of shared-dialect view
  *    definitions, registers them as temp views over the lake, and
  *    surveys their RESOLVED schemas. The DuckDB oracle resolves the
  *    very same definitions with DESCRIBE, so the check proves both
  *    engines agree on every view's inferred column types — a genuine
  *    cross-engine semantic check, not a string copy.
  *  - TYPES: the custom-type inventory of a survey maps onto the lake's
  *    type-usage profile: every distinct column type with its column and
  *    table counts (nested/array types included).
  *  - ROUTINES: the registered-function surface of the session
  *    (spark.catalog.listFunctions) filtered to the library's functions —
  *    the analogue of a stored-routine listing. Engine-specific by
  *    nature, so rows-only checked plus ScalaTest.
  *
  * Triggers have no Spark analogue (no DML trigger machinery in a batch
  * lake engine) — recorded as out of scope in SURVEY §2 rather than
  * faked.
  */
object CatalogSurvey {

  /** Shared-dialect (Spark + DuckDB) standard view definitions over the
    * lake tables. Aggregates are chosen so both engines resolve
    * identical column types (count -> BIGINT, avg/double sums -> DOUBLE;
    * integer sums are CAST to BIGINT to avoid DuckDB's HUGEINT).
    */
  val standardViews: Seq[(String, String)] = Seq(
    "v_customer_orders" ->
      """SELECT c_custkey, c_name, count(*) AS n_orders,
        |  sum(CAST(o_totalprice AS DOUBLE)) AS total_spent
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name""".stripMargin,
    "v_doc_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  avg(CAST(n_chars AS DOUBLE)) AS avg_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin,
    "v_part_catalog" ->
      """SELECT p_brand, p_type, count(*) AS n_parts,
        |  max(CAST(p_retailprice AS DOUBLE)) AS max_price
        |FROM part GROUP BY p_brand, p_type""".stripMargin)

  /** Register the lake tables + standard views in the session catalog. */
  def registerStandardViews(spark: SparkSession, dir: String): Unit = {
    Tables.all.foreach(t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t))
    standardViews.foreach { case (name, defn) =>
      spark.sql(s"CREATE OR REPLACE TEMP VIEW $name AS $defn")
    }
  }

  /** Survey the standard views' RESOLVED schemas (view catalog). */
  def catalogViews(spark: SparkSession, dir: String): DataFrame = {
    registerStandardViews(spark, dir)
    val rows = standardViews.flatMap { case (name, _) =>
      spark.table(name).schema.fields.map(f =>
        (name, f.name, Collector.normalizeType(f.dataType)))
    }
    spark.createDataFrame(rows)
      .toDF("view_name", "column_name", "data_type")
      .orderBy(col("view_name"), col("column_name"))
  }

  val catalogViewsSql: String = {
    val typeCase =
      """CASE column_type
        |  WHEN 'BIGINT' THEN 'int64'
        |  WHEN 'INTEGER' THEN 'int32'
        |  WHEN 'DOUBLE' THEN 'float64'
        |  WHEN 'FLOAT' THEN 'float32'
        |  WHEN 'VARCHAR' THEN 'string'
        |  WHEN 'BOOLEAN' THEN 'bool'
        |  WHEN 'TIMESTAMP' THEN 'timestamp'
        |  WHEN 'TIMESTAMP_NS' THEN 'timestamp'
        |  WHEN 'FLOAT[]' THEN 'array<float32>'
        |  ELSE lower(column_type) END""".stripMargin
    standardViews.map { case (name, defn) =>
      s"SELECT '$name' AS view_name, column_name, $typeCase AS data_type FROM (DESCRIBE $defn)"
    }.mkString("", "\nUNION ALL\n", "\nORDER BY view_name, column_name")
  }

  /** Type-usage inventory of the whole lake (custom-type surface):
    * every distinct engine-neutral column type with column/table counts.
    */
  def catalogTypes(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.all.flatMap { t =>
      Tables.table(spark, dir, t).schema.fields.map(f =>
        (t, f.name, Collector.normalizeType(f.dataType)))
    }
    spark.createDataFrame(rows)
      .toDF("table_name", "column_name", "data_type")
      .groupBy(col("data_type"))
      .agg(count(lit(1)).as("n_columns"),
        countDistinct(col("table_name")).as("n_tables"))
      .orderBy(col("data_type"))
  }

  val catalogTypesSql: String =
    s"""WITH cols AS (${Collector.schemaColumnsSqlUnordered})
       |SELECT data_type, count(*) AS n_columns,
       |  count(DISTINCT table_name) AS n_tables
       |FROM cols GROUP BY data_type ORDER BY data_type""".stripMargin

  /** Library routine names registered into the session catalog. */
  val routineNames = Seq("graft_norm_text", "graft_token_count")

  /** Register graft's session routines (the stored-function analogue):
    * callable from SQL session-wide, surveyed via the catalog. The
    * native dot_product expression registers through GraftExtensions at
    * session build; these register on a live session.
    */
  def registerRoutines(spark: SparkSession): Unit = {
    spark.udf.register("graft_norm_text",
      (s: String) => if (s == null) null
        else s.toLowerCase.replaceAll("\\s+", " ").trim)
    spark.udf.register("graft_token_count",
      (s: String) => if (s == null) 0 else s.split("\\s+").count(_.nonEmpty))
  }

  /** Survey the session's registered graft routines
    * (spark.catalog.listFunctions analogue of a stored-routine listing).
    * Engine-specific surface: no SQL oracle (rows-only check) — behavior
    * asserted in CatalogSurveySpec.
    */
  def catalogRoutines(spark: SparkSession, dir: String): DataFrame = {
    registerRoutines(spark)
    import spark.implicits._
    val fns = spark.catalog.listFunctions()
      .filter(f => routineNames.contains(f.name) || f.name == "dot_product")
      .map(f => (f.name, f.isTemporary))
      .toDF("function_name", "is_temporary")
    fns.orderBy(col("function_name"))
  }

  /** One-row engine fingerprint (r13 VERDICT #6): every CORRECTNESS
    * artifact self-describes the Spark-side engine build, so a
    * build-skew dispute (r12's ten red rows, r13's canary) is a
    * one-line read instead of a round of theories. Environment-specific
    * BY PURPOSE: rows-only check (no oracle could hash-match a
    * fingerprint); the oracle-side DuckDB build is named by which — if
    * either — of canary_dec9_spark / canary_dec9_duck reads red.
    */
  def envFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val jvm = System.getProperty("java.version", "unknown")
    val vendor = System.getProperty("java.vendor", "unknown")
    val os = System.getProperty("os.name", "unknown") + " " +
      System.getProperty("os.arch", "unknown")
    spark.createDataFrame(Seq(
      (spark.version, scala.util.Properties.versionNumberString, jvm,
        vendor, os, spark.sessionState.conf.numShufflePartitions)))
      .toDF("spark_version", "scala_version", "java_version",
        "java_vendor", "os", "shuffle_partitions")
  }
}
