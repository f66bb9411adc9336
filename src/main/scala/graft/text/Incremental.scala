package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental (new-batch vs existing-corpus) deduplication — the shape
  * a production ingest actually runs: yesterday's corpus is a settled
  * fingerprint index; only TODAY'S batch is scanned, hashed and joined
  * against it. Nothing reshuffles the historical corpus (at scale the
  * index is a bucketed/sorted table, so the join is bucket-co-located —
  * the Lake.writeBucketed layout).
  *
  * The batch/corpus split here is a deterministic md5 bucket of doc_id
  * (same device as split_train_eval): bucket 0 (~10%) plays the role of
  * the incoming batch, the rest the settled corpus. Per batch doc:
  *
  *  - `corpus_dup`: exact text fingerprint already present in corpus;
  *    `corpus_canonical`: the smallest matching corpus doc_id;
  *  - `batch_dup`: an earlier batch doc (smaller doc_id) has the same
  *    fingerprint — dedup WITHIN the increment;
  *  - `keep`: first-seen overall — what actually enters the corpus.
  *
  * Fingerprint = md5(text), matching dedup_exact's exact-dup semantics.
  */
object Incremental {

  private val bucketExpr =
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % 10"

  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("fp"),
        (expr(bucketExpr) === 0).as("is_batch"))
    val batch = docs.filter(col("is_batch"))
    // corpus side: ONE row per fingerprint (the index), never the raw
    // corpus — the join fan-out is bounded by distinct fingerprints
    val corpusIdx = docs.filter(!col("is_batch"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("corpus_canonical"))
    val batchMin = batch
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("batch_first"))
    batch
      .join(corpusIdx, Seq("fp"), "left")
      .join(batchMin, Seq("fp"))
      .select(col("doc_id"),
        col("corpus_canonical").isNotNull.as("corpus_dup"),
        col("corpus_canonical"),
        (col("batch_first") < col("doc_id")).as("batch_dup"))
      .withColumn("keep", !col("corpus_dup") && !col("batch_dup"))
      .orderBy(col("doc_id"))
  }

  val dedupIncrementalSql: String =
    """WITH docs AS (
      |  SELECT doc_id, md5(text) AS fp,
      |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 = 0 AS BOOLEAN) AS is_batch
      |  FROM documents),
      |batch AS (SELECT * FROM docs WHERE is_batch),
      |corpus_idx AS (
      |  SELECT fp, min(doc_id) AS corpus_canonical
      |  FROM docs WHERE NOT is_batch GROUP BY fp),
      |batch_min AS (SELECT fp, min(doc_id) AS batch_first FROM batch GROUP BY fp)
      |SELECT b.doc_id,
      |  c.corpus_canonical IS NOT NULL AS corpus_dup,
      |  c.corpus_canonical,
      |  m.batch_first < b.doc_id AS batch_dup,
      |  (c.corpus_canonical IS NULL AND m.batch_first >= b.doc_id) AS keep
      |FROM batch b
      |LEFT JOIN corpus_idx c USING (fp)
      |JOIN batch_min m USING (fp)
      |ORDER BY b.doc_id""".stripMargin
}
