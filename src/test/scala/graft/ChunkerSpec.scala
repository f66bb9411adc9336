package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Chunker

class ChunkerSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("chunk geometry: coverage, overlap, and counts match a driver-side re-chunk") {
    val rows = Chunker.chunkOverlap(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val (w, s) = (Chunker.chunkTokens, Chunker.chunkStride)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == docs.keySet) // no doc dropped
    byDoc.foreach { case (id, chunks) =>
      val toks = docs(id).split(" ", -1)
      val expectN = 1 + (math.max(toks.length - w, 0) + s - 1) / s
      assert(chunks.length == expectN, s"doc $id chunk count")
      assert(chunks.forall(_.getAs[Int]("n_chunks") == expectN))
      val sorted = chunks.sortBy(_.getAs[Int]("chunk_idx"))
      sorted.zipWithIndex.foreach { case (c, i) =>
        val exp = toks.slice(i * s, math.min(i * s + w, toks.length))
        assert(c.getAs[Int]("chunk_tokens") == exp.length, s"doc $id chunk $i tokens")
        assert(c.getAs[Int]("chunk_chars") == exp.mkString(" ").length)
      }
      // every token position covered: last chunk reaches the end
      assert((expectN - 1) * s + w >= toks.length || toks.length <= w)
    }
  }

  test("vocab growth: per-source types/tokens match a driver-side recompute") {
    val rows = Chunker.vocabGrowth(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text")))
    val bySource = docs.groupBy(_._1)
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val allToks = bySource(src).flatMap(_._2.split(" ", -1))
      assert(r.getAs[Long]("n_docs") == bySource(src).length)
      assert(r.getAs[Long]("n_tokens") == allToks.length)
      assert(r.getAs[Long]("n_types") == allToks.distinct.length)
      val freqs = allToks.groupBy(identity).values.map(_.length.toLong)
      assert(r.getAs[Long]("max_token_freq") == freqs.max)
      assert(r.getAs[Long]("ttr_ppm") == allToks.distinct.length * 1000000L / allToks.length)
    }
  }
}
