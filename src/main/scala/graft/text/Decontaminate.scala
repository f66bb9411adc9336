package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Train/eval decontamination — the benchmark-leakage scan every serious
  * pretraining pipeline runs (the GPT-3 appendix-C / PaLM style n-gram
  * overlap check): a training document is contaminated if it shares at
  * least one word n-gram with a held-out evaluation document.
  *
  * Here the held-out set is a deterministic 5% slice of the corpus
  * (doc_id % 20 == 0) standing in for an external benchmark suite; the
  * operator emits the full decontamination report — every train doc with
  * its count of distinct shared n-grams and of eval docs hit, plus the
  * contamination flag — the table a data owner diffs before a release.
  *
  * Scale shape: shingle both sides (distinct n-grams per doc), one
  * equi-join on the gram, one per-doc aggregation. In production the
  * eval side is a benchmark suite — small and bounded, hence
  * broadcastable — but since this demo's eval slice grows with the
  * corpus, the join stays a shuffle join and AQE may still elect to
  * broadcast it. At petabyte scale, join on xxhash64(gram) instead of
  * the gram string to cut shuffle bytes (collision risk ~n²/2⁶⁴ —
  * negligible; kept as the exact string here for oracle exactness).
  */
object Decontaminate {

  val ngramN = 8
  val evalModulus = 20L

  private def gramExpr: String = {
    val parts = (0 until ngramN)
      .map(j => if (j == 0) "element_at(toks, i)" else s"element_at(toks, i + $j)")
      .mkString(", ' ', ")
    s"transform(sequence(1, size(toks) - ${ngramN - 1}), i -> concat($parts))"
  }

  /** Distinct word-n-grams per row, all other columns preserved — shared
    * by the batch report and the streaming contamination monitor (where
    * the event-time column must ride along).
    */
  def withGrams(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .filter(size(col("toks")) >= ngramN)
      .withColumn("g", explode(expr(s"array_distinct($gramExpr)")))
      .drop("toks", "text")

  def report(spark: SparkSession, dir: String): DataFrame = {
    val grams = withGrams(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))
    val isEval = col("doc_id") % evalModulus === 0
    val evalGrams = grams.filter(isEval)
      .select(col("g"), col("doc_id").as("eval_id"))
    val trainGrams = grams.filter(!isEval)
    val hits = trainGrams.join(evalGrams, "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_shared_ngrams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
    Tables.documents(spark, dir)
      .select(col("doc_id")).filter(!isEval)
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared_ngrams"), lit(0L)).as("n_shared_ngrams"),
        coalesce(col("n_eval_docs"), lit(0L)).as("n_eval_docs"))
      .withColumn("is_contaminated", col("n_shared_ngrams") > 0L)
      .orderBy(col("doc_id"))
  }

  val reportSql: String = {
    val parts = (0 until ngramN)
      .map(j => if (j == 0) "t[i]" else s"t[i+$j]")
      .mkString(" || ' ' || ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
       |  FROM documents),
       |grams AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(range(1, len(t) - ${ngramN - 2}), i -> $parts)) AS g
       |  FROM toks WHERE len(t) >= $ngramN),
       |ev AS (SELECT g, doc_id AS eval_id FROM grams WHERE doc_id % $evalModulus = 0),
       |tr AS (SELECT doc_id, g FROM grams WHERE doc_id % $evalModulus <> 0),
       |hits AS (
       |  SELECT tr.doc_id, count(DISTINCT tr.g) AS n_shared_ngrams,
       |    count(DISTINCT ev.eval_id) AS n_eval_docs
       |  FROM tr JOIN ev USING (g) GROUP BY tr.doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(h.n_shared_ngrams, 0) AS BIGINT) AS n_shared_ngrams,
       |  CAST(coalesce(h.n_eval_docs, 0) AS BIGINT) AS n_eval_docs,
       |  coalesce(h.n_shared_ngrams, 0) > 0 AS is_contaminated
       |FROM documents d LEFT JOIN hits h USING (doc_id)
       |WHERE d.doc_id % $evalModulus <> 0
       |ORDER BY doc_id""".stripMargin
  }
}
