package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Search

/** Relevance-scoring semantics on a crafted corpus with hand-checkable
  * tf/df values (cross-engine parity runs in the Verify/oracle gate).
  */
class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  lazy val dir: String = {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark spark spark filler filler", "en", "c", 31L),
      (1L, "spark join fast common common", "en", "c", 29L),
      (2L, "unique words only here today", "en", "c", 28L),
      (3L, "join join fast fast fast extra", "en", "c", 30L))
    val d = java.nio.file.Files.createTempDirectory("graft_search").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("bm25 scores only matching docs, positively, in sorted order") {
    val rows = Search.bm25(spark, dir).collect()
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(0L, 1L, 3L)) // doc 2 has no query term
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Long]("n_terms") == 3) // hits all three terms
    assert(byId(0L).getAs[Long]("n_terms") == 1)
    assert(rows.forall(_.getAs[Double]("score") > 0.0)) // Lucene idf > 0
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // matching all three query terms beats one saturated term
    assert(byId(1L).getAs[Double]("score") > byId(0L).getAs[Double]("score"))
  }

  test("tfidf keywords prefer rare-but-frequent tokens, ties by token") {
    val rows = Search.keywordsTfidf(spark, dir).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == Set(0L, 1L, 2L, 3L))
    byDoc.values.foreach { rs =>
      assert(rs.length <= 3 && rs.map(_.getAs[Int]("rk")).sorted.sameElements(1 to rs.length))
    }
    // doc 0: 'filler' (tf 2, df 1 -> 2*ln4 = 2.77) beats 'spark'
    // (tf 3, df 2 -> 3*ln2 = 2.08)
    val d0 = byDoc(0L).sortBy(_.getAs[Int]("rk"))
    assert(d0.head.getAs[String]("token") == "filler")
    assert(d0(1).getAs[String]("token") == "spark")
    // doc 2: five singletons tie -> alphabetical top-3
    val d2 = byDoc(2L).sortBy(_.getAs[Int]("rk")).map(_.getAs[String]("token"))
    assert(d2.sameElements(Seq("here", "only", "today")))
  }

  test("bpe pair counts weight by word frequency and pick the right merge") {
    import spark.implicits._
    // vocab: 'aaab' x2, 'cd' x1, 'e' x1 (single char -> no pair)
    val docs = Seq((0L, "aaab cd aaab e", "en", "c", 14L))
    val d = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = graft.text.TextStats.bpePairStats(spark, d).collect()
      .map(r => (r.getAs[String]("sym_a"), r.getAs[String]("sym_b")) -> r.getAs[Long]("pair_count"))
      .toMap
    // 'aaab' has pairs aa,aa,ab per occurrence; wc=2 -> aa:4, ab:2, cd:1
    assert(rows == Map(("a", "a") -> 4L, ("a", "b") -> 2L, ("c", "d") -> 1L))
    // the top merge BPE would perform next is (a,a)
    val top = graft.text.TextStats.bpePairStats(spark, d).collect().head
    assert(top.getAs[String]("sym_a") == "a" && top.getAs[String]("sym_b") == "a")
  }
}
