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
}
