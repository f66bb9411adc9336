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

  /** Per-table sampling outcome (reference SampleStatus,
    * models.rs:388-429): `success` at the requested limit, `partial`
    * after halved-limit retries, `failed` when every retry threw.
    */
  case class TableInfo(name: String, columns: Seq[ColumnInfo], rowCount: Long,
      sampleHeader: Seq[String], sampleRows: Seq[Seq[String]],
      sampleStatus: String = "success", warnings: Seq[String] = Nil,
      pkCandidates: Seq[String] = Nil)

  /** Inferred relationship edge (KeyInference inclusion dependency). */
  case class FkEdge(childTable: String, childColumn: String,
      parentTable: String, parentColumn: String, coverage: Double,
      likely: Boolean)

  case class Artifact(formatVersion: String, source: String,
      tables: Seq[TableInfo], foreignKeys: Seq[FkEdge] = Nil)

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

  /** Halved-limit retry policy around a sampling closure (reference
    * `dbsurveyor-collect/src/sampling.rs`: on failure, halve the limit
    * and try again; record the outcome + warnings instead of aborting).
    * A repeat of the SAME failure (class + message) on the halved limit
    * is treated as deterministic — corrupt data fails identically at
    * every limit, so further halved-limit scans would only burn cluster
    * time — and the retry loop bails out after that second attempt.
    * Returns (rows, status, warnings).
    */
  def sampleWithRetry(limit: Int, doSample: Int => Seq[Seq[String]])
      : (Seq[Seq[String]], String, Seq[String]) = {
    // the ROOT cause identifies the failure: Spark wraps task failures
    // in SparkException layers whose messages embed stage/task ids that
    // change between attempts, so only the innermost (class, message)
    // is a stable deterministic-failure signature
    def rootSig(e: Throwable): String = {
      var c: Throwable = e
      while (c.getCause != null && (c.getCause ne c)) c = c.getCause
      s"${c.getClass.getSimpleName}: ${c.getMessage}"
    }
    val warnings = Seq.newBuilder[String]
    var lastErr: String = null
    var l = limit
    while (l >= 1) {
      try {
        val rows = doSample(l)
        return (rows, if (l == limit) "success" else "partial", warnings.result())
      } catch {
        case e: Exception =>
          val sig = rootSig(e)
          warnings += s"sample at limit $l failed: $sig"
          if (sig == lastErr) {
            warnings += "same failure at halved limit: deterministic, giving up"
            return (Nil, "failed", warnings.result())
          }
          lastErr = sig
          l = l / 2
      }
    }
    (Nil, "failed", warnings.result())
  }

  /** Collect the full artifact: schema, row counts, and a deterministic
    * MostRecent-style sample (first key column descending) per table.
    * One count + one bounded top-k read per table — no full
    * materialization. A failing table degrades (halved-limit retries,
    * then a `failed` status with warnings) instead of aborting the
    * artifact; an unloadable table is recorded as a schema-less `failed`
    * entry. With `withKeys`, PK candidates and inclusion-dependency FK
    * edges (KeyInference) are inferred from the data and embedded.
    */
  def collect(source: TableSource, sampleSize: Int = 5,
      withKeys: Boolean = false): Artifact = {
    val loaded: Seq[(String, Option[DataFrame], Seq[String])] =
      source.tableNames.map { t =>
        try { val df = source.load(t); (t, Some(df), Nil) }
        catch { case e: Exception =>
          (t, None, Seq(s"load failed: ${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
      }
    val goodTables = loaded.collect { case (t, Some(df), _) => t -> df }
    val pkMap: Map[String, Seq[String]] =
      if (withKeys && goodTables.nonEmpty)
        KeyInference.primaryKeysFor(goodTables)
          .filter(col("is_pk_candidate"))
          .collect().toSeq
          .map(r => (r.getAs[String]("table_name"), r.getAs[String]("column_name")))
          .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      else Map.empty
    val fks: Seq[FkEdge] =
      if (withKeys && goodTables.nonEmpty)
        KeyInference.foreignKeysFor(goodTables).collect().toSeq.map(r =>
          FkEdge(r.getAs[String]("child_table"), r.getAs[String]("child_column"),
            r.getAs[String]("parent_table"), r.getAs[String]("parent_column"),
            r.getAs[Double]("coverage"), r.getAs[Boolean]("is_likely_fk")))
      else Nil
    val tables = loaded.map {
      case (t, None, warns) =>
        TableInfo(t, Nil, -1L, Nil, Nil, sampleStatus = "failed", warnings = warns)
      case (t, Some(df), _) =>
        // a table can load (parquet footer reads fine) yet still fail at
        // scan time — corrupt data pages, a lost partition. Every Spark
        // ACTION here is therefore guarded: the sample via the retry
        // policy, the count directly; either failing degrades this
        // table's entry instead of aborting the whole artifact.
        try {
          val cols = df.schema.fields.toSeq.map(f =>
            ColumnInfo(f.name, normalizeType(f.dataType), f.nullable))
          // MostRecent ordering ladder (reference sampling.rs strategy
          // preference): inferred primary key > first timestamp column
          // (recency) > first column (the rowid stand-in).
          val key = pkMap.get(t).flatMap(_.headOption)
            .orElse(df.schema.fields.collectFirst {
              case f if f.dataType.isInstanceOf[TimestampType] ||
                f.dataType.isInstanceOf[TimestampNTZType] => f.name
            })
            .getOrElse(df.schema.fields.head.name)
          val (sample, status, warns) = sampleWithRetry(sampleSize, l =>
            df.orderBy(col(key).desc).limit(l).collect().toSeq.map(r =>
              r.toSeq.map(v => if (v == null) "NULL" else v.toString)))
          val (cnt, status2, warns2) =
            try (df.count(), status, warns)
            catch { case e: Exception =>
              (-1L, "failed",
                warns :+ s"count failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
            }
          // a failed entry carries no sample rows (mirrors the load-failure
          // path and keeps validate()'s failed-status invariant)
          val (hdr, rows2) =
            if (status2 == "failed") (Nil, Nil)
            else (df.schema.fieldNames.toSeq, sample)
          TableInfo(t, cols, cnt, hdr, rows2,
            sampleStatus = status2, warnings = warns2,
            pkCandidates = pkMap.getOrElse(t, Nil))
        } catch {
          case e: Exception =>
            TableInfo(t, Nil, -1L, Nil, Nil, sampleStatus = "failed",
              warnings = Seq(s"collection failed: ${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
    }
    Artifact("1.0", source.name, tables, fks)
  }

  /** Multi-database survey (adapters/postgres/multi_database.rs
    * analogue): one artifact per enumerated database, collected with the
    * same per-table machinery.
    */
  case class MultiArtifact(formatVersion: String, databases: Seq[Artifact])

  def collectAll(sources: Seq[TableSource], sampleSize: Int = 5,
      withKeys: Boolean = false): MultiArtifact =
    MultiArtifact("1.0", sources.map(s => collect(s, sampleSize, withKeys)))

  /** Enumerate parquet "databases" under a root path — each
    * subdirectory holding at least one `*.parquet` entry is one
    * database, the lake analogue of a server's database listing. Uses
    * the Hadoop FileSystem API so the same code enumerates local, HDFS
    * or object-store roots.
    */
  def enumerateLakes(spark: SparkSession, root: String): Seq[ParquetSource] = {
    import org.apache.hadoop.fs.Path
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(rootPath).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => fs.listStatus(p).exists(f => f.getPath.getName.endsWith(".parquet")))
      // full URI (p.toString), not p.toUri.getPath: stripping the
      // scheme/authority would break hdfs:// and s3a:// roots
      .map(p => new ParquetSource(spark, p.toString))
      .sortBy(_.name)
  }

  /** Run-level outcome classification for a multi-database collection
    * (reference `dbsurveyor-collect/src/outcome.rs` CollectionOutcome):
    * aggregates per-table sample statuses and warnings into one outcome
    * with the reference's process exit codes — the contract scripts and
    * CI hook into.
    */
  sealed abstract class CollectionOutcome(val exitCode: Int)
  object CollectionOutcome {
    case object Success extends CollectionOutcome(0)
    case class TotalFailure(error: String) extends CollectionOutcome(1)
    case object PartialWithoutSamples extends CollectionOutcome(2)
    case object PartialWithData extends CollectionOutcome(3)
    case object PartialWithValidationWarnings extends CollectionOutcome(4)
    case class Canceled(reason: String) extends CollectionOutcome(5)

    /** Mirrors outcome.rs from_results precedence: no schemas >
      * missing samples > partial samples > warnings > success.
      */
    def fromResults(databases: Seq[Artifact]): CollectionOutcome = {
      if (databases.isEmpty) TotalFailure("No schemas were produced")
      else if (databases.exists(_.tables.exists(_.sampleStatus == "failed")))
        PartialWithoutSamples
      else if (databases.exists(_.tables.exists(_.sampleStatus == "partial")))
        PartialWithData
      else if (databases.exists(a =>
        a.tables.exists(_.warnings.nonEmpty) || validate(a).nonEmpty))
        PartialWithValidationWarnings
      else Success
    }
  }

  /** Reference's `validate` command, at the reference's depth
    * (dbsurveyor-core/src/validation.rs: identifier validation, type
    * checks, cross-references; dbsurveyor/src/output.rs:validate_schema):
    * structural consistency + identifier sanity + sample/schema agreement
    * + key cross-references over a collected artifact.
    */
  def validate(a: Artifact): Seq[String] = {
    val errs = Seq.newBuilder[String]
    val validStatus = Set("success", "partial", "failed")
    def badIdent(s: String): Boolean =
      s.isEmpty || s.length > 255 || s.exists(c => c < ' ' || c == '\u007f')
    if (a.formatVersion != "1.0")
      errs += s"unsupported format version '${a.formatVersion}'"
    if (a.tables.isEmpty) errs += "artifact has no tables"
    a.tables.groupBy(_.name).collect { case (n, ts) if ts.size > 1 =>
      errs += s"duplicate table name '$n'" }
    a.tables.foreach { t =>
      val failed = t.sampleStatus == "failed"
      if (badIdent(t.name)) errs += s"invalid table identifier '${t.name}'"
      if (!validStatus(t.sampleStatus))
        errs += s"table ${t.name}: unknown sample status '${t.sampleStatus}'"
      if (failed && t.sampleRows.nonEmpty)
        errs += s"table ${t.name}: failed sample status but sample rows present"
      if (!failed) {
        if (t.columns.isEmpty) errs += s"table ${t.name} has no columns"
        if (t.rowCount < 0) errs += s"table ${t.name} has negative row count"
        if (t.rowCount >= 0 && t.sampleRows.size > t.rowCount)
          errs += s"table ${t.name}: more sample rows than table rows"
        if (t.sampleHeader.size != t.columns.size)
          errs += s"table ${t.name}: sample header width != column count"
        if (t.sampleHeader.nonEmpty && t.sampleHeader != t.columns.map(_.name))
          errs += s"table ${t.name}: sample header disagrees with column names"
      }
      t.columns.groupBy(_.name).collect { case (c, cs) if cs.size > 1 =>
        errs += s"table ${t.name}: duplicate column '$c'" }
      t.columns.foreach { c =>
        if (badIdent(c.name)) errs += s"table ${t.name}: invalid column identifier '${c.name}'"
        if (c.dataType.trim.isEmpty) errs += s"table ${t.name}.${c.name}: empty data type"
      }
      t.sampleRows.foreach { r =>
        if (r.size != t.sampleHeader.size)
          errs += s"table ${t.name}: ragged sample row"
      }
      val colNames = t.columns.map(_.name).toSet
      t.pkCandidates.filterNot(colNames).foreach(c =>
        errs += s"table ${t.name}: pk candidate '$c' is not a column")
    }
    val tableCols = a.tables.map(t => t.name -> t.columns.map(_.name).toSet).toMap
    a.foreignKeys.foreach { fk =>
      def check(side: String, tbl: String, c: String): Unit =
        tableCols.get(tbl) match {
          case None => errs += s"foreign key $side references unknown table '$tbl'"
          case Some(cols) if !cols(c) =>
            errs += s"foreign key $side references unknown column '$tbl.$c'"
          case _ =>
        }
      check("child", fk.childTable, fk.childColumn)
      check("parent", fk.parentTable, fk.parentColumn)
      if (fk.coverage < 0.0 || fk.coverage > 1.0)
        errs += s"foreign key ${fk.childTable}.${fk.childColumn}: coverage out of [0,1]"
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

  /** Un-ordered catalog column listing (DuckDB dialect) — the shared
    * building block: `schemaColumnsSql` adds the ORDER BY, and
    * CatalogSurvey.catalogTypesSql wraps it in a CTE (where an embedded
    * ORDER BY would be illegal). Composing both from this constant keeps
    * them in sync by construction (no string surgery on the ordered SQL).
    */
  val schemaColumnsSqlUnordered: String = {
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
    }.mkString("\nUNION ALL\n")
  }

  val schemaColumnsSql: String =
    schemaColumnsSqlUnordered + "\nORDER BY table_name, column_name"
}
