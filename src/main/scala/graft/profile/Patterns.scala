package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Value-pattern (mask) profiling — the classic data-profiler feature
  * the reference's per-column profile implies but never ships: every
  * string value is reduced to a character-class mask (uppercase → `A`,
  * lowercase → `a`, digit → `9`, everything else kept verbatim), runs
  * collapsed (`Aaaaaaaa#999999999` → `Aa#9`), and each (table, column)
  * reports its collapsed-mask distribution — the one-screen answer to
  * "does this column have a format, and how many formats violate it"
  * (phone/ID/code columns surface malformed rows as minority masks).
  *
  * Scale shape: ONE pruned scan per table (`stack` unpivots the
  * selected string columns in-row — no Expand wider than the column
  * list, no join), a (table, column, mask)-keyed two-phase aggregation
  * whose key space is bounded by the format diversity (masks, not
  * values), and a broadcast of the ≤|columns| per-column totals for the
  * exact ppm share. Mask rewriting is three codegen'd regexp_replace
  * calls per side — identical regex semantics in Spark and DuckDB (both
  * replace ALL occurrences; DuckDB needs the explicit 'g' flag).
  *
  * The distinct raw-mask count per collapsed mask (`n_raw_masks`) rides
  * along: a collapsed mask with many raw widths (`9` covering 1-18
  * digit runs) vs exactly one fixed-width raw mask is the
  * fixed-format-vs-free-text signal profilers key on.
  */
object Patterns {

  /** (table, columns) to profile — the catalog's string surface. */
  val patternCols: Seq[(String, Seq[String])] = Seq(
    "customer"  -> Seq("c_name", "c_mktsegment"),
    "supplier"  -> Seq("s_name"),
    "part"      -> Seq("p_name", "p_brand", "p_type"),
    "orders"    -> Seq("o_orderstatus", "o_orderpriority"),
    "events"    -> Seq("event_type", "props"),
    "documents" -> Seq("lang", "source"))

  /** Raw char-class mask (shared with the streaming maskGate twin). */
  def maskExpr(v: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($v, '[A-Z]', 'A'), " +
      "'[a-z]', 'a'), '[0-9]', '9')"

  /** Run-collapsed mask (shared with the streaming maskGate twin). */
  def collapseExpr(v: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($v, 'A+', 'A'), " +
      "'a+', 'a'), '9+', '9')"

  def valuePatterns(spark: SparkSession, dir: String): DataFrame = {
    val perTable = patternCols.map { case (tbl, cols) =>
      val stackArgs = cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
      Tables.table(spark, dir, tbl)
        .selectExpr(s"stack(${cols.size}, $stackArgs) AS (col_name, v)")
        .select(lit(tbl).as("tbl"), col("col_name"), col("v"))
    }
    // NULL keeps its own mask (`<null>`), assigned AFTER masking so a
    // genuine value that happens to look like the marker can't merge
    // with the null class
    val unpivoted = perTable.reduce(_ unionByName _)
      .withColumn("mask_raw",
        coalesce(expr(maskExpr("v")), lit("<null>")))
      .withColumn("mask",
        when(col("v").isNull, lit("<null>"))
          .otherwise(expr(collapseExpr("mask_raw"))))
    val byMask = unpivoted
      .groupBy(col("tbl"), col("col_name"), col("mask"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("mask_raw")).as("n_raw_masks"),
        min(coalesce(col("v"), lit(""))).as("example"))
    val totals = byMask.groupBy(col("tbl"), col("col_name"))
      .agg(sum(col("n_rows")).as("col_total")) // ≤ |columns| rows
    byMask.join(broadcast(totals), Seq("tbl", "col_name"))
      .select(col("tbl"), col("col_name"), col("mask"), col("n_rows"),
        col("n_raw_masks"),
        expr("CAST(n_rows * 1000000 DIV col_total AS BIGINT)")
          .as("share_ppm"),
        col("example"))
      .orderBy(col("tbl"), col("col_name"), col("n_rows").desc, col("mask"))
  }

  val valuePatternsSql: String = {
    val branches = patternCols.flatMap { case (tbl, cols) =>
      cols.map { c =>
        s"SELECT '$tbl' AS tbl, '$c' AS col_name, " +
          s"CAST($c AS VARCHAR) AS v FROM $tbl"
      }
    }.mkString("\n  UNION ALL ")
    s"""WITH unpivoted AS (
       |  $branches),
       |masked AS (
       |  SELECT tbl, col_name, v,
       |    coalesce(regexp_replace(regexp_replace(regexp_replace(v,
       |      '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'), '[0-9]', '9', 'g'),
       |      '<null>') AS mask_raw
       |  FROM unpivoted),
       |collapsed AS (
       |  SELECT tbl, col_name, v, mask_raw,
       |    CASE WHEN v IS NULL THEN '<null>'
       |      ELSE regexp_replace(regexp_replace(regexp_replace(mask_raw,
       |        'A+', 'A', 'g'), 'a+', 'a', 'g'), '9+', '9', 'g') END AS mask
       |  FROM masked),
       |by_mask AS (
       |  SELECT tbl, col_name, mask, count(*) AS n_rows,
       |    count(DISTINCT mask_raw) AS n_raw_masks,
       |    min(coalesce(v, '')) AS example
       |  FROM collapsed GROUP BY tbl, col_name, mask),
       |totals AS (
       |  SELECT tbl, col_name, sum(n_rows) AS col_total
       |  FROM by_mask GROUP BY tbl, col_name)
       |SELECT tbl, col_name, mask, CAST(n_rows AS BIGINT) AS n_rows,
       |  CAST(n_raw_masks AS BIGINT) AS n_raw_masks,
       |  CAST((CAST(n_rows AS HUGEINT) * 1000000) // col_total AS BIGINT)
       |    AS share_ppm,
       |  example
       |FROM by_mask JOIN totals USING (tbl, col_name)
       |ORDER BY tbl, col_name, n_rows DESC, mask""".stripMargin
  }
}
