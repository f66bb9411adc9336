package graft.output

import graft.sources.Collector.{Artifact, TableInfo}

/** Structured output writers — the Spark-side equivalent of the
  * `dbsurveyor` postprocessor binary: a portable JSON artifact
  * (schema.dbsurveyor.json v1.0 analogue) and Markdown documentation
  * (dbsurveyor/src/output.rs markdown generation).
  *
  * Rendering happens driver-side over the (small) collected artifact —
  * metadata scales with schema size, not data size, exactly like the
  * reference's postprocessor that never touches the database again.
  */
object ArtifactJson {

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  private def q(s: String): String = "\"" + esc(s) + "\""

  def render(a: Artifact): String = {
    def table(t: TableInfo): String = {
      val cols = t.columns.map(c =>
        s"""{"name": ${q(c.name)}, "data_type": ${q(c.dataType)}, "nullable": ${c.nullable}}""")
        .mkString("[", ", ", "]")
      val sample = t.sampleRows.map(r =>
        r.map(q).mkString("[", ", ", "]")).mkString("[", ", ", "]")
      s"""{
         |  "name": ${q(t.name)},
         |  "row_count": ${t.rowCount},
         |  "sample_status": ${q(t.sampleStatus)},
         |  "warnings": ${t.warnings.map(q).mkString("[", ", ", "]")},
         |  "pk_candidates": ${t.pkCandidates.map(q).mkString("[", ", ", "]")},
         |  "columns": $cols,
         |  "sample_header": ${t.sampleHeader.map(q).mkString("[", ", ", "]")},
         |  "sample_rows": $sample
         |}""".stripMargin
    }
    val fks = a.foreignKeys.map(f =>
      s"""{"child_table": ${q(f.childTable)}, "child_column": ${q(f.childColumn)}, """ +
        s""""parent_table": ${q(f.parentTable)}, "parent_column": ${q(f.parentColumn)}, """ +
        s""""coverage": ${f.coverage}, "likely": ${f.likely}}""")
      .mkString("[", ",\n", "]")
    s"""{
       |"format_version": ${q(a.formatVersion)},
       |"source": ${q(a.source)},
       |"table_count": ${a.tables.size},
       |"tables": ${a.tables.map(table).mkString("[\n", ",\n", "\n]")},
       |"foreign_keys": $fks
       |}""".stripMargin
  }
}

/** SQL-DDL reconstruction of the surveyed schema — the reference's
  * `--format sql` output, which dbsurveyor/src/output.rs:121 leaves as a
  * "not yet implemented" placeholder; implemented for real here.
  * Engine-neutral types map to ANSI-ish DDL; inferred PK candidates
  * become a PRIMARY KEY (first candidate, others recorded as comments)
  * and likely FK edges become ALTER TABLE constraints.
  */
object SqlDdlDoc {

  private def sqlType(t: String): String = t match {
    case "int64" => "BIGINT"
    case "int32" => "INTEGER"
    case "float64" => "DOUBLE"
    case "float32" => "REAL"
    case "string" => "VARCHAR"
    case "bool" => "BOOLEAN"
    case "binary" => "BLOB"
    case "timestamp" => "TIMESTAMP"
    case a if a.startsWith("array<") =>
      sqlType(a.stripPrefix("array<").stripSuffix(">")) + "[]"
    case other => other.toUpperCase
  }

  def render(a: Artifact): String = {
    val sb = new StringBuilder
    sb ++= s"-- Schema DDL reconstructed by graft from: ${a.source}\n"
    sb ++= s"-- format version ${a.formatVersion}\n\n"
    a.tables.foreach { t =>
      if (t.columns.isEmpty) {
        sb ++= s"-- table ${t.name}: collection ${t.sampleStatus}, schema unavailable\n\n"
      } else {
        if (t.pkCandidates.size > 1)
          sb ++= s"-- candidate keys: ${t.pkCandidates.mkString(", ")}\n"
        val cols = t.columns.map { c =>
          val nn = if (c.nullable) "" else " NOT NULL"
          val pk = if (t.pkCandidates.headOption.contains(c.name)) " PRIMARY KEY" else ""
          s"  ${c.name} ${sqlType(c.dataType)}$nn$pk"
        }
        sb ++= cols.mkString(s"CREATE TABLE ${t.name} (\n", ",\n", "\n);\n\n")
      }
    }
    a.foreignKeys.filter(_.likely).foreach { f =>
      sb ++= s"ALTER TABLE ${f.childTable} ADD FOREIGN KEY (${f.childColumn}) " +
        s"REFERENCES ${f.parentTable} (${f.parentColumn});\n"
    }
    sb.result()
  }
}

/** Mermaid er-diagram of the surveyed schema + inferred relationships —
  * the reference's mermaid placeholder (output.rs:202), implemented.
  * Types are sanitized to mermaid-legal identifiers (no angle brackets).
  */
object MermaidDoc {

  private def mmType(t: String): String =
    t.replace("array<", "").replace(">", "_array").replace("<", "_")

  def render(a: Artifact): String = {
    val sb = new StringBuilder
    sb ++= "erDiagram\n"
    a.tables.filter(_.columns.nonEmpty).foreach { t =>
      sb ++= s"  ${t.name} {\n"
      t.columns.foreach { c =>
        val pk = if (t.pkCandidates.contains(c.name)) " PK" else ""
        sb ++= s"    ${mmType(c.dataType)} ${c.name}$pk\n"
      }
      sb ++= "  }\n"
    }
    a.foreignKeys.filter(_.likely).foreach { f =>
      // many child rows reference exactly one parent row
      sb ++= s"""  ${f.childTable} }o--|| ${f.parentTable} : "${f.childColumn} -> ${f.parentColumn}"\n"""
    }
    sb.result()
  }
}

/** Self-contained HTML documentation — the reference's HTML placeholder
  * (output.rs:164), implemented: overview, inferred relationships, and
  * per-table column/sample sections, all values HTML-escaped.
  */
object HtmlDoc {

  private def esc(s: String): String = s.flatMap {
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '&' => "&amp;"
    case '"' => "&quot;"
    case c => c.toString
  }

  def render(a: Artifact): String = {
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\">"
    sb ++= s"<title>${esc(a.source)}</title></head>\n<body>\n"
    sb ++= s"<h1>Database Documentation: ${esc(a.source)}</h1>\n"
    sb ++= "<h2>Overview</h2>\n<table><tr><th>Table</th><th>Rows</th><th>Columns</th><th>Status</th></tr>\n"
    a.tables.foreach(t => sb ++=
      s"<tr><td>${esc(t.name)}</td><td>${t.rowCount}</td><td>${t.columns.size}</td><td>${esc(t.sampleStatus)}</td></tr>\n")
    sb ++= "</table>\n"
    if (a.foreignKeys.nonEmpty) {
      sb ++= "<h2>Relationships (inferred)</h2>\n<table><tr><th>Child</th><th>Parent</th><th>Coverage</th></tr>\n"
      a.foreignKeys.filter(_.likely).foreach(f => sb ++=
        s"<tr><td>${esc(f.childTable)}.${esc(f.childColumn)}</td>" +
          s"<td>${esc(f.parentTable)}.${esc(f.parentColumn)}</td><td>${f"${f.coverage}%.3f"}</td></tr>\n")
      sb ++= "</table>\n"
    }
    a.tables.foreach { t =>
      sb ++= s"<h2>Table: ${esc(t.name)}</h2>\n"
      sb ++= "<table><tr><th>Column</th><th>Type</th><th>Nullable</th></tr>\n"
      t.columns.foreach(c => sb ++=
        s"<tr><td>${esc(c.name)}</td><td>${esc(c.dataType)}</td><td>${c.nullable}</td></tr>\n")
      sb ++= "</table>\n"
      if (t.sampleRows.nonEmpty) {
        sb ++= s"<h3>Sample (${t.sampleRows.size} rows)</h3>\n<table>"
        sb ++= t.sampleHeader.map(esc).mkString("<tr><th>", "</th><th>", "</th></tr>\n")
        t.sampleRows.foreach(r =>
          sb ++= r.map(esc).mkString("<tr><td>", "</td><td>", "</td></tr>\n"))
        sb ++= "</table>\n"
      }
    }
    sb ++= "</body></html>\n"
    sb.result()
  }
}

object MarkdownDoc {

  /** Markdown documentation: overview table + per-table sections with
    * column inventory and sample rows, mirroring `dbsurveyor generate
    * --format markdown`.
    */
  def render(a: Artifact): String = {
    val sb = new StringBuilder
    sb ++= s"# Database Documentation: ${a.source}\n\n"
    sb ++= s"Format version: ${a.formatVersion}\n\n"
    sb ++= "## Overview\n\n"
    sb ++= "| Table | Rows | Columns |\n| --- | --- | --- |\n"
    a.tables.foreach(t =>
      sb ++= s"| ${t.name} | ${t.rowCount} | ${t.columns.size} |\n")
    sb ++= "\n"
    if (a.foreignKeys.nonEmpty) {
      sb ++= "## Relationships (inferred)\n\n"
      sb ++= "| Child | Parent | Coverage | Likely FK |\n| --- | --- | --- | --- |\n"
      a.foreignKeys.foreach(f =>
        sb ++= s"| ${f.childTable}.${f.childColumn} | ${f.parentTable}.${f.parentColumn} | ${f"${f.coverage}%.3f"} | ${f.likely} |\n")
      sb ++= "\n"
    }
    a.tables.foreach { t =>
      sb ++= s"## Table: ${t.name}\n\n"
      if (t.sampleStatus != "success")
        sb ++= s"Sample status: **${t.sampleStatus}**" +
          (if (t.warnings.nonEmpty) s" (${t.warnings.mkString("; ")})" else "") + "\n\n"
      if (t.pkCandidates.nonEmpty)
        sb ++= s"Primary key candidates: ${t.pkCandidates.map(c => s"`$c`").mkString(", ")}\n\n"
      sb ++= "| Column | Type | Nullable |\n| --- | --- | --- |\n"
      t.columns.foreach(c =>
        sb ++= s"| ${c.name} | ${c.dataType} | ${c.nullable} |\n")
      if (t.sampleRows.nonEmpty) {
        sb ++= s"\n### Sample (${t.sampleRows.size} rows)\n\n"
        sb ++= t.sampleHeader.mkString("| ", " | ", " |\n")
        sb ++= t.sampleHeader.map(_ => "---").mkString("| ", " | ", " |\n")
        t.sampleRows.foreach(r =>
          sb ++= r.map(_.replace("|", "\\|")).mkString("| ", " | ", " |\n"))
      }
      sb ++= "\n"
    }
    sb.result()
  }
}
