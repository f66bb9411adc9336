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
