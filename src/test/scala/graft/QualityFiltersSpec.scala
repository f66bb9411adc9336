package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.QualityFilters

/** Semantic checks for the Gopher-repetition / C4-cleaning filters on a
  * crafted corpus that exercises every flag (the synthetic testdata is
  * punctuation-free word soup, so the interesting branches never fire
  * there; cross-engine parity runs in the Verify/oracle gate).
  */
class QualityFiltersSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  lazy val dir: String = {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat sat on the mat.", "en", "crafted", 23L),
      (1L, "spam spam spam spam spam spam spam spam spam spam.", "en", "crafted", 50L),
      (2L, "a b", "en", "crafted", 3L),
      (3L, "lorem ipsum dolor sit amet consectetur.", "en", "crafted", 39L),
      (4L, "code { x } more words here now.", "en", "crafted", 31L),
      (5L, "", "en", "crafted", 0L),
      (6L, "alpha beta gamma delta epsilon zeta eta theta.", "en", "crafted", 46L),
      (7L, "one two three one two three one two three one two three.", "en", "crafted", 56L))
    val d = java.nio.file.Files.createTempDirectory("graft_qf").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("c4 flags fire on the crafted corpus exactly where they should") {
    val rows = QualityFilters.c4Filters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def b(id: Long, c: String) = rows(id).getAs[Boolean](c)
    assert(b(0, "keep") && b(0, "ends_terminal") && !b(0, "too_few_words"))
    assert(rows(0).getAs[Double]("mean_word_len") == 3.0)
    assert(b(2, "too_few_words") && !b(2, "keep"))
    assert(b(3, "has_lorem") && !b(3, "keep"))
    assert(b(4, "has_brace") && !b(4, "keep"))
    // empty doc: no words, zero mean, nothing fires except too_few
    assert(rows(5).getAs[Int]("n_words") == 0 &&
      rows(5).getAs[Double]("mean_word_len") == 0.0 &&
      b(5, "too_few_words") && !b(5, "ends_terminal"))
    assert(b(6, "keep"))
    // doc 7 ends in '.', enough words, normal word length -> keep
    assert(b(7, "keep"))
  }

  test("repetition metrics separate spammy docs from diverse ones") {
    val rows = QualityFilters.repetition(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: 'spam' x9 + 'spam.' -> max_tok_frac 0.9, flagged
    assert(rows(1).getAs[Double]("max_tok_frac") == 0.9)
    assert(rows(1).getAs[Boolean]("is_repetitive"))
    // doc 7: 'one two three' x4 (last with '.') -> duplicate trigrams
    assert(rows(7).getAs[Double]("dup_trigram_frac") > 0.3)
    assert(rows(7).getAs[Boolean]("is_repetitive"))
    // doc 6: all-distinct tokens -> nothing repeats (and the top bigram
    // occurring ONCE covers 0 — no short-doc 2/n floor)
    assert(rows(6).getAs[Long]("max_tok_n") == 1L &&
      rows(6).getAs[Double]("top_bigram_frac") == 0.0 &&
      rows(6).getAs[Double]("dup_trigram_frac") == 0.0 &&
      !rows(6).getAs[Boolean]("is_repetitive"))
    // doc 5 (empty) and doc 2 (two tokens): guarded zero fractions
    assert(rows(5).getAs[Double]("max_tok_frac") == 0.0)
    assert(rows(2).getAs[Double]("dup_trigram_frac") == 0.0)
    // every doc present exactly once
    assert(rows.size == 8)
  }

  test("decontamination flags exactly the train docs sharing an eval 8-gram") {
    import spark.implicits._
    val run = (1 to 12).map(i => s"tok$i").mkString(" ")   // a 12-token run
    val docs = Seq(
      // doc 0 is EVAL (0 % 20 == 0)
      (0L, s"$run eval tail words here", "en", "c", 0L),
      // doc 1 copies the full eval run -> contaminated (5 shared 8-grams)
      (1L, s"prefix $run suffix", "en", "c", 0L),
      // doc 2 copies only 7 consecutive eval tokens -> clean at n=8
      (2L, (1 to 7).map(i => s"tok$i").mkString(" ") + " unrelated trailing words padding four more", "en", "c", 0L),
      // doc 3 shares nothing
      (3L, (1 to 10).map(i => s"other$i").mkString(" "), "en", "c", 0L))
    val d = java.nio.file.Files.createTempDirectory("graft_decon").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = graft.text.Decontaminate.report(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L)) // eval doc 0 excluded
    assert(rows(1).getAs[Boolean]("is_contaminated"))
    assert(rows(1).getAs[Long]("n_shared_ngrams") == 5L) // 12-run -> 5 8-grams
    assert(rows(1).getAs[Long]("n_eval_docs") == 1L)
    assert(!rows(2).getAs[Boolean]("is_contaminated"))
    assert(!rows(3).getAs[Boolean]("is_contaminated"))
  }

  test("quality gate composes the signals; reasons name exactly the failed checks") {
    import graft.text.QualityFilters
    val sf = TestSession.sf
    val gate = QualityFilters.qualityGate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val rep = QualityFilters.repetition(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_repetitive")).toMap
    assert(gate.size == rep.size)
    gate.values.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expectKeep = r.getAs[Boolean]("struct_clean") && !rep(id) &&
        !r.getAs[Boolean]("lm_reject")
      assert(r.getAs[Boolean]("keep") == expectKeep, s"doc $id")
      val reasons = r.getAs[String]("reason")
      assert(reasons.isEmpty == r.getAs[Boolean]("keep"), s"doc $id")
      assert(reasons.contains("repetition") == rep(id), s"doc $id")
    }
    // the gate actually separates on this corpus: keeps most, drops some
    val kept = gate.values.count(_.getAs[Boolean]("keep"))
    assert(kept > gate.size / 2 && kept < gate.size,
      s"gate kept $kept of ${gate.size} — not separating")
  }

  test("char entropy matches an exact driver-side recompute; bounds hold") {
    // real corpus (not the crafted one): natural word soup must sit in
    // the mid band; the crafted fixture's 3-char doc would rightly flag
    val sf = TestSession.sf
    val rows = QualityFilters.charEntropy(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val counts = docs(id).toSeq.groupBy(identity).map(_._2.length)
      val n = counts.sum
      assert(r.getAs[Long]("n_chars") == n.toLong)
      assert(r.getAs[Long]("n_distinct_chars") == counts.size.toLong)
      // the operator's exact arithmetic: per-char term quantized to 9
      // decimals (HALF_UP — Spark's decimal cast), summed exactly
      val sum9 = counts.map(c => BigDecimal(c * math.log(c.toDouble / n))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
      val want = -(sum9.toDouble) / n
      assert(r.getAs[Double]("entropy_nats") == want, s"doc $id")
      // information bounds: 0 <= H <= ln(distinct)
      val h = r.getAs[Double]("entropy_nats")
      assert(h >= -1e-9 && h <= math.log(counts.size.toDouble) + 1e-9)
    }
    // natural-language corpus sits in the mid band: nothing flags
    assert(rows.count(r => r.getAs[Boolean]("too_uniform") ||
      r.getAs[Boolean]("too_random")) == 0)
  }
}
