package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PII detection + scrubbing over the document corpus — the
  * training-data twin of the reference's redaction surface
  * (dbsurveyor/src/redaction/mod.rs masks SAMPLE values by key pattern;
  * a pretraining pipeline must instead scan and scrub free TEXT, the
  * Dolma/CCNet-style PII pass: emails, phone numbers, IP addresses).
  *
  * The synthetic corpus carries no PII (verified: zero digit runs), so
  * the operator PLANTS a deterministic fixture inline — doc_id-derived
  * emails/phones/IPs appended to a subset of documents — and then
  * detects and masks them. The DuckDB oracle plants the identical
  * fixture, so the scan/mask machinery (not the plant) is what parity
  * proves. On a real corpus, drop the plant and keep the scan.
  *
  * Cross-engine regex care: patterns stay inside the Java-regex /
  * RE2 common subset (character classes, bounded repetition — no
  * lookaround, no backrefs). Masking order is email > phone > ip so
  * the digits of a masked email can't re-match as a phone.
  *
  * Scale shape: pure per-row column expressions — zero shuffle except
  * the final ORDER BY (driver-gate determinism only; drop at scale).
  */
object Pii {

  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val ipRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** doc_id-keyed deterministic PII plant (Spark side). */
  private val plantedExpr =
    """concat(text,
      |  CASE WHEN doc_id % 7 = 0
      |    THEN concat(' contact user', cast(doc_id as string), '@example.com') ELSE '' END,
      |  CASE WHEN doc_id % 11 = 0
      |    THEN concat(' call 415-555-', lpad(cast(doc_id % 10000 as string), 4, '0')) ELSE '' END,
      |  CASE WHEN doc_id % 13 = 0
      |    THEN concat(' from 10.0.', cast(doc_id % 256 as string), '.', cast((doc_id * 7) % 256 as string)) ELSE '' END)"""
      .stripMargin.replace("\n", " ")

  def piiScan(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), expr(plantedExpr).as("t"))
      .select(col("doc_id"),
        regexp_count(col("t"), lit(emailRe)).as("n_emails"),
        regexp_count(col("t"), lit(phoneRe)).as("n_phones"),
        regexp_count(col("t"), lit(ipRe)).as("n_ips"),
        md5(regexp_replace(regexp_replace(regexp_replace(col("t"),
          emailRe, "[EMAIL]"), phoneRe, "[PHONE]"), ipRe, "[IP]")).as("masked_md5"))
      .withColumn("has_pii",
        (col("n_emails") + col("n_phones") + col("n_ips")) > 0)
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        col("has_pii"), col("masked_md5"))
      .orderBy(col("doc_id"))
  }

  val piiScanSql: String = {
    val planted =
      """text ||
        |  CASE WHEN doc_id % 7 = 0
        |    THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
        |  CASE WHEN doc_id % 11 = 0
        |    THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        |  CASE WHEN doc_id % 13 = 0
        |    THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END"""
        .stripMargin.replace("\n", " ")
    s"""WITH p AS (SELECT doc_id, $planted AS t FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$emailRe')) AS INTEGER) AS n_emails,
       |  CAST(len(regexp_extract_all(t, '$phoneRe')) AS INTEGER) AS n_phones,
       |  CAST(len(regexp_extract_all(t, '$ipRe')) AS INTEGER) AS n_ips,
       |  (len(regexp_extract_all(t, '$emailRe')) +
       |   len(regexp_extract_all(t, '$phoneRe')) +
       |   len(regexp_extract_all(t, '$ipRe'))) > 0 AS has_pii,
       |  md5(regexp_replace(regexp_replace(regexp_replace(t,
       |    '$emailRe', '[EMAIL]', 'g'), '$phoneRe', '[PHONE]', 'g'),
       |    '$ipRe', '[IP]', 'g')) AS masked_md5
       |FROM p
       |ORDER BY doc_id""".stripMargin
  }
}
