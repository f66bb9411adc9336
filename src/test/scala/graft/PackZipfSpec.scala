package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side recomputes for pack_padded_batches and text_zipf_fit —
  * the math re-derived from raw rows in plain Scala/BigInt, independent
  * of both the op's plan and its DuckDB oracle.
  */
class PackZipfSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  private def docLens: Array[(Long, Long)] = Tables.documents(spark, sf)
    .select(col("doc_id"),
      expr("size(filter(split(text, ' '), t -> t <> ''))").cast("long").as("toks"))
    .filter(col("toks") > 0)
    .collect()
    .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("toks")))

  private def batchStats(ordered: Seq[Long], b: Int): Seq[(Long, Long, Long)] =
    ordered.grouped(b).toSeq.map { g =>
      (g.length.toLong, g.max, g.sum)
    }

  test("padded batches: exact per-batch stats; sorting beats arrival order") {
    val lens = docLens
    val b = text.Curation.padBatchSize.toInt
    val sorted = lens.sortBy { case (id, t) => (t, id) }.map(_._2).toSeq
    val expected = batchStats(sorted, b)
    val rows = text.Curation.packPaddedBatches(spark, sf).collect()
    assert(rows.length == expected.length)
    rows.sortBy(_.getAs[Long]("batch_id")).zip(expected).foreach {
      case (r, (n, mx, sm)) =>
        assert(r.getAs[Long]("n_docs") == n)
        assert(r.getAs[Long]("max_len") == mx)
        assert(r.getAs[Long]("sum_tokens") == sm)
        assert(r.getAs[Long]("pad_tokens") == n * mx - sm)
        assert(r.getAs[Long]("waste_ppm") == (n * mx - sm) * 1000000L / (n * mx))
    }
    // the op's reason to exist: length-sorted packing wastes no more than
    // arrival-order packing (sum over batches of n·max − sum)
    val arrival = lens.sortBy(_._1).map(_._2).toSeq
    def waste(xs: Seq[Long]) =
      batchStats(xs, b).map { case (n, mx, sm) => n * mx - sm }.sum
    assert(waste(sorted) <= waste(arrival))
  }

  test("zipf fit: BigInt normal equations over micro-nat terms; slope < 0") {
    val freqs = Tables.documents(spark, sf)
      .select(col("source"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("freq"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("token"),
        r.getAs[Long]("freq")))
    val bySource = freqs.groupBy(_._1)
    val rows = text.TextStats.zipfFit(spark, sf).collect()
    assert(rows.nonEmpty && rows.length == bySource.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ranked = bySource(src).sortBy(t => (-t._3, t._2)).zipWithIndex
      def q(v: Double): BigInt = BigInt(math.round(v * 1000000))
      val terms = ranked.map { case ((_, _, f), i) =>
        (q(math.log((i + 1).toDouble)), q(math.log(f.toDouble)), f)
      }
      val n = BigInt(terms.length)
      val sx = terms.map(_._1).sum; val sy = terms.map(_._2).sum
      val sxy = terms.map(t => t._1 * t._2).sum
      val sxx = terms.map(t => t._1 * t._1).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val slope = if (num < 0) -((-num) * BigInt(1000000000) / den)
        else num * BigInt(1000000000) / den
      assert(r.getAs[Long]("n_types") == terms.length)
      assert(r.getAs[Long]("n_tokens") == terms.map(_._3).sum)
      assert(r.getAs[Long]("zipf_slope_e9") == slope.toLong, s"slope mismatch for $src")
      // rank-frequency law: frequency falls with rank
      assert(r.getAs[Long]("zipf_slope_e9") < 0)
    }
  }
}
