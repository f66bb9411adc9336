package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Context-window chunking — the step between a curated corpus and a
  * training/retrieval index: every document is split into overlapping
  * fixed-token windows (RAG passage indexing and long-doc training both
  * consume exactly this shape; the overlap keeps boundary-spanning
  * context retrievable).
  *
  * Chunk geometry: windows of `chunkTokens` whitespace tokens at stride
  * `chunkStride` (overlap = chunk − stride), starts at 0, stride, … —
  * the last window is the first one whose span reaches the end of the
  * doc (n ≤ chunk ⇒ exactly one chunk). Per chunk: token count, char
  * length and the chunk text's md5 (the id a passage index keys on —
  * content-addressed, so re-chunking a re-crawled doc dedups for free
  * against the [[Dedup]] fingerprint index).
  *
  * Scale shape: pure per-row column work — split once, then an in-row
  * `sequence`/`transform` explode; ZERO data shuffle (the only exchange
  * is the presentation sort). Chunk counts are closed-form integer
  * arithmetic (floor division over non-negative operands — identical in
  * both engines), so op and oracle cannot drift on geometry.
  */
object Chunker {

  val chunkTokens = 48
  val chunkStride = 32

  def chunkOverlap(spark: SparkSession, dir: String,
                   win: Int = chunkTokens, stride: Int = chunkStride): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("source"), col("toks"),
        // number of chunks: 1 + ceil(max(n-win,0) / stride), exact ints
        expr(s"1 + CAST((greatest(size(toks) - $win, 0) + $stride - 1) DIV $stride AS INT)")
          .as("n_chunks"))
      .select(col("doc_id"), col("source"), col("n_chunks"),
        posexplode(expr(
          s"""transform(sequence(0, n_chunks - 1),
             |  i -> array_join(slice(toks, i * $stride + 1, $win), ' '))""".stripMargin))
          .as(Seq("chunk_idx", "chunk_text")))
      .select(col("doc_id"), col("chunk_idx"), col("source"), col("n_chunks"),
        expr("size(split(chunk_text, ' '))").as("chunk_tokens"),
        length(col("chunk_text")).as("chunk_chars"),
        md5(col("chunk_text")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val chunkOverlapSql: String = {
    val (w, s) = (chunkTokens, chunkStride)
    s"""WITH d AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS toks,
       |    1 + CAST((greatest(len(string_split(text, ' ')) - $w, 0) + $s - 1) // $s AS INT) AS n_chunks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source, n_chunks, CAST(i AS INT) AS chunk_idx,
       |    array_to_string(toks[i * $s + 1 : i * $s + $w], ' ') AS chunk_text
       |  FROM d, unnest(range(0, n_chunks)) t(i))
       |SELECT doc_id, chunk_idx, source, n_chunks,
       |  CAST(len(string_split(chunk_text, ' ')) AS INT) AS chunk_tokens,
       |  CAST(len(chunk_text) AS INT) AS chunk_chars,
       |  md5(chunk_text) AS chunk_md5
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
  }

  /** Heaps-law vocabulary growth per source — the curation dashboard's
    * "is this source adding NEW language or repeating itself" axis
    * (a source whose type/token ratio collapses is boilerplate-heavy;
    * mix design weights it down): per source, token mass, distinct
    * vocabulary, type/token ratio in ppm and docs.
    *
    * Shape: one explode → one (source, token) distinct-style agg (map-
    * side partial dedup bounds the shuffle by |vocab|, not token mass)
    * → per-source rollup. The same two-shuffle shape as text_top_tokens.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val perSource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).as("n_tokens"))
    val vocab = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"), max(col("n")).as("max_token_freq"))
    perSource.join(vocab, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_types"),
        col("max_token_freq"),
        expr("CAST(n_types * 1000000 DIV n_tokens AS BIGINT)").as("ttr_ppm"))
      .orderBy(col("source"))
  }

  val vocabGrowthSql: String =
    """SELECT s.source, s.n_docs, s.n_tokens, v.n_types, v.max_token_freq,
      |  CAST((v.n_types * 1000000) // s.n_tokens AS BIGINT) AS ttr_ppm
      |FROM (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source) s
      |JOIN (
      |  SELECT source, count(*) AS n_types, CAST(max(n) AS BIGINT) AS max_token_freq
      |  FROM (SELECT source, tok, count(*) AS n
      |        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      |        GROUP BY source, tok)
      |  GROUP BY source) v USING (source)
      |ORDER BY source""".stripMargin
}
