package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Search

/** Relevance-scoring semantics on a crafted corpus with hand-checkable
  * tf/df values (cross-engine parity runs in the Verify/oracle gate).
  */
class SearchSpec extends AnyFunSuite {

  test("phrase search counts exact occurrences; ranks by count then doc") {
    val rows = graft.text.Search.searchPhrase(TestSession.spark, TestSession.sf).collect()
    assert(rows.nonEmpty)
    val byPhrase = rows.groupBy(_.getAs[String]("phrase"))
    val docs = Tables.documents(TestSession.spark, TestSession.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def countOcc(text: String, p: String): Int = {
      var (i, n) = (text.indexOf(p), 0)
      while (i >= 0) { n += 1; i = text.indexOf(p, i + p.length) }
      n
    }
    byPhrase.foreach { case (p, rs) =>
      assert(rs.length <= graft.text.Search.phraseTopN)
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      // counts exact vs a driver-side scan (note: replace-and-measure
      // counts non-overlapping occurrences, same as indexOf stepping)
      sorted.foreach { r =>
        assert(r.getAs[Long]("n_occ") == countOcc(docs(r.getAs[Long]("doc_id")), p))
      }
      // ranking is (count desc, doc_id asc)
      val key = sorted.map(r => (-r.getAs[Long]("n_occ"), r.getAs[Long]("doc_id"))).toSeq
      assert(key == key.sorted)
      // nothing outside the top-k beats the last ranked entry
      val last = sorted.last
      val cut = (last.getAs[Long]("n_occ"), last.getAs[Long]("doc_id"))
      docs.foreach { case (id, t) =>
        val c = countOcc(t, p).toLong
        if (c >= 1 && !sorted.exists(_.getAs[Long]("doc_id") == id))
          assert(c < cut._1 || (c == cut._1 && id > cut._2), s"$p doc $id")
      }
    }
  }

  test("freshness profile: bounds and rates reconcile with raw scans") {
    import org.apache.spark.sql.functions._
    val spark = TestSession.spark
    val rows = graft.profile.Profiler.profileFreshness(spark, TestSession.sf).collect()
    assert(rows.map(_.getAs[String]("table_name")).toSeq ==
      Seq("events", "lineitem", "orders"))
    rows.foreach { r =>
      val t = r.getAs[String]("table_name")
      val c = r.getAs[String]("time_column")
      val df = Tables.table(spark, TestSession.sf, t)
      assert(r.getAs[Long]("n_rows") == df.count())
      val mm = df.agg(unix_micros(min(col(c)).cast("timestamp")),
        unix_micros(max(col(c)).cast("timestamp"))).collect().head
      assert(r.getAs[Long]("min_us") == mm.getLong(0) &&
        r.getAs[Long]("max_us") == mm.getLong(1))
      val span = (mm.getLong(1) - mm.getLong(0)) / 86400000000L
      assert(r.getAs[Long]("span_days") == span)
      if (mm.getLong(1) > mm.getLong(0))
        assert(r.getAs[Long]("rows_per_day") ==
          r.getAs[Long]("n_rows") * 86400000000L / (mm.getLong(1) - mm.getLong(0)))
    }
  }
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
