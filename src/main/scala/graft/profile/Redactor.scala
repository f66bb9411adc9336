package graft.profile

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.Tables

/** Sample redaction re-expressing the reference's postprocessor redaction
  * (dbsurveyor/src/redaction/mod.rs): mode-driven masking of string values
  * by column-name pattern (minimal/balanced) or by allowlist + value shape
  * (conservative). Redaction is a pure `select` projection — a
  * column-pruned, codegen'd map with zero shuffle, so it composes with any
  * downstream operator at scale.
  */
object Redactor {

  sealed trait Mode
  case object None_ extends Mode
  case object Minimal extends Mode
  case object Balanced extends Mode
  case object Conservative extends Mode

  val Redacted = "[REDACTED]"

  /** redaction/mod.rs:102 MINIMAL_PATTERNS */
  val minimalPatterns: Seq[String] =
    Seq("password", "secret", "token", "api_key", "key", "private_key", "passwd")

  /** redaction/mod.rs:112 BALANCED_PATTERNS */
  val balancedPatterns: Seq[String] =
    Seq("email", "ssn", "phone", "dob", "birth", "credit_card", "card_number", "cvv", "sin")

  /** redaction/mod.rs:124 CONSERVATIVE_SAFE_FIELDS (+ *_id / *_at suffixes) */
  private val conservativeSafe =
    Set("id", "created_at", "updated_at", "timestamp", "date", "time")

  private def nameMatches(name: String, patterns: Seq[String]): Boolean = {
    val n = name.toLowerCase
    patterns.exists(n.contains)
  }

  private def isConservativeSafe(name: String): Boolean = {
    val n = name.toLowerCase
    conservativeSafe(n) || n.endsWith("_id") || n.endsWith("_at")
  }

  /** redaction/mod.rs:151 looks_like_timestamp — value-level exemption used
    * by conservative mode.
    */
  private def looksLikeTimestamp(c: Column): Column =
    c.contains("T") || c.contains("-") || c.contains(":")

  /** Masks string columns of `df` according to `mode`. Non-string columns
    * pass through (the reference only redacts JSON string values).
    */
  def redact(df: DataFrame, mode: Mode): DataFrame = {
    val projected = df.schema.fields.map { f =>
      val c = col(f.name)
      if (f.dataType != StringType) c
      else mode match {
        case None_ => c
        case Minimal =>
          if (nameMatches(f.name, minimalPatterns)) lit(Redacted).as(f.name) else c
        case Balanced =>
          if (nameMatches(f.name, minimalPatterns) || nameMatches(f.name, balancedPatterns))
            lit(Redacted).as(f.name)
          else c
        case Conservative =>
          if (isConservativeSafe(f.name)) c
          else when(looksLikeTimestamp(c), c).otherwise(lit(Redacted)).as(f.name)
      }
    }
    df.select(projected: _*)
  }

  /** Conservative-mode redaction of a deterministic customer sample —
    * numeric ids survive, free-text strings are masked unless they look
    * timestamp-ish (the reference's value-level carve-out).
    */
  def redactCustomerSample(spark: SparkSession, dir: String): DataFrame =
    redact(
      Tables.customer(spark, dir).filter(col("c_custkey") < 50),
      Conservative)
      .orderBy(col("c_custkey"))

  val redactCustomerSql: String = {
    def mask(c: String) =
      s"CASE WHEN contains($c, 'T') OR contains($c, '-') OR contains($c, ':') THEN $c ELSE '$Redacted' END AS $c"
    s"""SELECT c_custkey, ${mask("c_name")}, c_nationkey, c_acctbal, ${mask("c_mktsegment")}
       |FROM customer WHERE c_custkey < 50 ORDER BY c_custkey""".stripMargin
  }

  // ------------------------------------------------- artifact round-trip

  /** ARTIFACT-level redaction — the reference's actual flow
    * (dbsurveyor/src/redaction/mod.rs operates on the POSTPROCESSOR's
    * loaded artifact, masking sample-row values before any rendering;
    * the DataFrame `redact` above is the live-table analogue). Masks the
    * stringified sample cells of every table by the same mode rules:
    * only string-TYPED columns (per the recorded ColumnInfo dataType —
    * the reference masks JSON string values only), name-pattern match
    * for minimal/balanced, allowlist + the looks-like-timestamp value
    * carve-out for conservative. The "NULL" null-marker cell passes
    * through every mode (it renders a null, not a value).
    */
  def redactArtifact(a: graft.sources.Collector.Artifact,
      mode: Mode): graft.sources.Collector.Artifact = {
    val tables = a.tables.map { t =>
      val types = t.columns.map(c => c.name -> c.dataType).toMap
      val rows = t.sampleRows.map { r =>
        t.sampleHeader.zip(r).map { case (name, v) =>
          // FAIL CLOSED on a header column with no recorded ColumnInfo
          // (r13 ADVICE): a malformed/hand-edited artifact must not
          // smuggle credential-named string cells past the mask because
          // its columns list went stale — an unknown-typed cell is
          // treated as maskable ("string"), never passed through.
          maskCell(name, types.getOrElse(name, "string"), v, mode)
        }
      }
      t.copy(sampleRows = rows)
    }
    a.copy(tables = tables)
  }

  private def maskCell(name: String, dataType: String, v: String,
      mode: Mode): String = {
    if (dataType != "string" || v == "NULL") v
    else mode match {
      case None_ => v
      case Minimal =>
        if (nameMatches(name, minimalPatterns)) Redacted else v
      case Balanced =>
        if (nameMatches(name, minimalPatterns) ||
          nameMatches(name, balancedPatterns)) Redacted
        else v
      case Conservative =>
        if (isConservativeSafe(name)) v
        else if (v.contains("T") || v.contains("-") || v.contains(":")) v
        else Redacted
    }
  }

  /** redact → render → re-load round-trip as a GATED row (r12 VERDICT
    * #5): collect a deterministic customer artifact (MostRecent over the
    * first-column sampling key ⇒ top-8 by c_custkey DESC — the exact
    * rows the oracle can name), redact it at each mode, render the
    * redacted artifact to the v1.3 JSON, RE-LOAD it with ArtifactLoad,
    * and count the masked/kept cells per (mode, string column) FROM THE
    * RE-LOADED artifact — so a drift anywhere in redactArtifact, the
    * JSON renderer, or the loader breaks the hash against the oracle's
    * direct SQL recompute of the same masking semantics. The numeric
    * name-trap is live coverage: c_custkey/c_nationkey CONTAIN the
    * minimal pattern "key" but are int64-typed, so every mode passes
    * them through; conservative's value carve-out is exercised by
    * mktsegment values containing a capital T (AUTOMOBILE, FURNITURE).
    *
    * Scale shape: the artifact sample is ≤ 8 rows by contract
    * (TakeOrderedAndProject under the hood); everything after is
    * driver-side bounded work over 3 modes × 2 string columns, emitted
    * as ONE tiny literal frame. roundtrip_exact asserts the re-loaded
    * artifact EQUALS the redacted one structurally (the ArtifactLoad
    * identity the ReferenceFlowSpec proves, here riding the hash gate).
    */
  def redactRerender(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Collector
    val customerOnly = new graft.sources.TableSource {
      private val lake = new graft.sources.ParquetSource(spark, dir)
      def name: String = lake.name
      def tableNames: Seq[String] = Seq("customer")
      def load(table: String): DataFrame = lake.load(table)
      override def engine: (String, String) = lake.engine
    }
    val a = Collector.collect(customerOnly, sampleSize = 8,
      collectedAt = "1970-01-01T00:00:00Z")
    val modes: Seq[(String, Mode)] =
      Seq(("minimal", Minimal), ("balanced", Balanced),
        ("conservative", Conservative))
    val rows = for {
      (modeName, mode) <- modes
      redacted = redactArtifact(a, mode)
      back = graft.output.ArtifactLoad.load(
        graft.output.ArtifactJson.render(redacted))
      t <- back.tables
      (colName, i) <- t.sampleHeader.zipWithIndex
      if t.columns.find(_.name == colName).exists(_.dataType == "string")
    } yield {
      val cells = t.sampleRows.map(_(i))
      (modeName, colName,
        cells.size.toLong,
        cells.count(_ == Redacted).toLong,
        cells.count(c => c != Redacted && c != "NULL").toLong,
        back == redacted)
    }
    spark.createDataFrame(rows)
      .toDF("mode", "column_name", "n_sample", "n_masked", "n_kept",
        "roundtrip_exact")
      .orderBy(col("mode"), col("column_name"))
  }

  /** The oracle recomputes the masking counts directly from the top-8
    * MostRecent sample (ORDER BY c_custkey DESC — the collect()
    * first-column sampling-key ladder) and pins roundtrip_exact TRUE:
    * the Spark side earns that TRUE only by an exact render→load
    * round-trip.
    */
  val redactRerenderSql: String = {
    val carve = (c: String) =>
      s"(contains($c, 'T') OR contains($c, '-') OR contains($c, ':'))"
    s"""WITH s AS (
       |  SELECT c_name, c_mktsegment FROM customer
       |  ORDER BY c_custkey DESC LIMIT 8),
       |m AS (SELECT unnest(['minimal', 'balanced', 'conservative']) AS mode),
       |c AS (
       |  SELECT 'c_name' AS column_name,
       |    CAST(count(*) AS BIGINT) AS n_sample,
       |    CAST(sum(CASE WHEN c_name IS NOT NULL
       |      AND NOT ${carve("c_name")} THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_maskable,
       |    CAST(sum(CASE WHEN c_name IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_value
       |  FROM s
       |  UNION ALL
       |  SELECT 'c_mktsegment',
       |    CAST(count(*) AS BIGINT),
       |    CAST(sum(CASE WHEN c_mktsegment IS NOT NULL
       |      AND NOT ${carve("c_mktsegment")} THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(sum(CASE WHEN c_mktsegment IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT)
       |  FROM s)
       |SELECT m.mode, c.column_name, c.n_sample,
       |  CAST(CASE WHEN m.mode = 'conservative' THEN c.n_maskable
       |       ELSE 0 END AS BIGINT) AS n_masked,
       |  CAST(CASE WHEN m.mode = 'conservative'
       |       THEN c.n_value - c.n_maskable
       |       ELSE c.n_value END AS BIGINT) AS n_kept,
       |  TRUE AS roundtrip_exact
       |FROM m, c
       |ORDER BY mode, column_name""".stripMargin
  }
}
