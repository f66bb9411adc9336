package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EventAnalytics
import graft.text.{TextStats, Curation}
import graft.mm.Multimodal

/** Round-10 operators: skip-gram PMI, attention spans, autocorrelation,
  * pareto share, range search, aspect buckets — each checked against an
  * independent driver-side recompute from raw data (the oracle gate
  * proves cross-engine parity; these prove the SEMANTICS).
  */
class Round10Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("skipgram pmi equals a driver-side recompute of windowed pairs") {
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    val w = TextStats.skipgramWindow
    val pairCounts = scala.collection.mutable.Map[String, Long]()
    val tokCounts = scala.collection.mutable.Map[String, Long]()
    docs.foreach { t =>
      val toks = t.split(" ").filter(_.nonEmpty)
      toks.foreach(tk => tokCounts(tk) = tokCounts.getOrElse(tk, 0L) + 1)
      for (i <- toks.indices; j <- (i + 1) to math.min(i + w, toks.length - 1)) {
        val (a, b) = if (toks(i) <= toks(j)) (toks(i), toks(j))
          else (toks(j), toks(i))
        val k = s"$a $b"
        pairCounts(k) = pairCounts.getOrElse(k, 0L) + 1
      }
    }
    val pTotal = pairCounts.values.sum.toDouble
    val tTotal = tokCounts.values.sum.toDouble
    val want = pairCounts.toSeq
      .filter(_._2 >= TextStats.skipgramMinCount)
      .map { case (pair, cab) =>
        val Array(a, b) = pair.split(" ")
        val pmi = math.log(cab * tTotal * tTotal /
          (pTotal * tokCounts(a) * tokCounts(b)))
        (pair, cab, BigDecimal(pmi).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (p, _, pmi) => (-pmi, p) }.take(20)
    val got = TextStats.skipgramPmi(spark, sf).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("c_ab"),
        r.getAs[Double]("pmi")))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2, s"$g vs $e")
      assert(math.abs(g._3 - e._3) < 1e-9, s"$g vs $e")
    }
  }

  test("attention spans tile every sequence exactly and reconstruct docs") {
    val spans = Curation.packAttentionSpans(spark, sf).collect()
    val seqLen = Curation.seqLen
    // within a sequence: spans are adjacent, disjoint, in span_idx order
    spans.groupBy(_.getAs[Long]("seq_id")).foreach { case (_, ss) =>
      val ordered = ss.sortBy(_.getAs[Int]("span_idx"))
      assert(ordered.head.getAs[Long]("start_tok") == 0L)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("end_tok") == b.getAs[Long]("start_tok"))
        case _ => ()
      }
      ordered.foreach(s =>
        assert(s.getAs[Long]("end_tok") <= seqLen &&
          s.getAs[Long]("span_tokens") >= 1))
    }
    // across sequences: each doc's spans sum to its token count, with
    // exactly one doc_start and one doc_end
    val tokOf = Tables.documents(spark, sf)
      .select(col("doc_id"),
        expr("size(filter(split(text, ' '), t -> t <> ''))").as("t"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    spans.groupBy(_.getAs[Long]("doc_id")).foreach { case (d, ss) =>
      assert(ss.map(_.getAs[Long]("span_tokens")).sum == tokOf(d), s"doc $d")
      assert(ss.count(_.getAs[Boolean]("doc_start")) == 1, s"doc $d starts")
      assert(ss.count(_.getAs[Boolean]("doc_end")) == 1, s"doc $d ends")
    }
    // full corpus coverage: all sequences but the last are exactly full
    val bySeq = spans.groupBy(_.getAs[Long]("seq_id")).view
      .mapValues(_.map(_.getAs[Long]("span_tokens")).sum).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (s, tot) =>
      if (s != lastSeq) assert(tot == seqLen, s"seq $s") else assert(tot >= 1)
    }
  }

  test("autocorr equals a driver-side pearson over the calendar-filled series") {
    val counts = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) DIV 86400000000").as("day"))
      .groupBy("day").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d0 = counts.keys.min
    val d1 = counts.keys.max
    val x = (d0 to d1).map(d => counts.getOrElse(d, 0L)).toArray
    def pearson(lag: Int): Option[Double] = {
      val pairs = (0 until x.length - lag).map(i => (x(i), x(i + lag)))
      if (pairs.length <= 1) return None
      val n = pairs.length.toDouble
      val sx = pairs.map(_._1).sum.toDouble
      val sy = pairs.map(_._2).sum.toDouble
      val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
      val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
      val syy = pairs.map(p => p._2 * p._2).sum.toDouble
      val dx = n * sxx - sx * sx
      val dy = n * syy - sy * sy
      if (dx == 0 || dy == 0) None
      else Some((n * sxy - sx * sy) / (math.sqrt(dx) * math.sqrt(dy)))
    }
    val got = EventAnalytics.eventsAutocorr(spark, sf).collect()
      .map(r => r.getAs[Int]("lag") ->
        Option(r.getAs[java.lang.Double]("r")).map(_.doubleValue)).toMap
    EventAnalytics.autocorrLags.foreach { lag =>
      (got(lag), pearson(lag)) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12, s"lag $lag")
        case (a, b) => assert(a == b, s"lag $lag: $a vs $b")
      }
    }
  }

  test("pareto share matches a driver-side sort of user activity") {
    val byUser = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = byUser.sortBy { case (u, n) => (-n, u) }.map(_._2)
    val total = sorted.sum
    val got = EventAnalytics.eventsParetoShare(spark, sf).collect()
    got.foreach { r =>
      val p = r.getAs[Int]("top_pct")
      val k = ((p.toLong * sorted.length + 99) / 100).toInt
      val top = sorted.take(k).sum
      assert(r.getAs[Long]("n_top_users") == k, s"p=$p")
      assert(r.getAs[Long]("n_top_events") == top, s"p=$p")
      assert(r.getAs[Long]("event_share_ppm") == top * 1000000L / total, s"p=$p")
    }
    // shares are monotone in p and reach 100% at p=50 only if half the
    // users hold everything — sanity: strictly increasing
    val shares = got.sortBy(_.getAs[Int]("top_pct"))
      .map(_.getAs[Long]("event_share_ppm"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
  }

  test("range search counts match brute force at the rounded-cosine contract") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val queries = vecs.filter(_._1 < 20)
    val got = graft.sim.Similarity.rangeSearch(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[String]("tau")) ->
        r.getAs[Long]("n_in_range")).toMap
    queries.foreach { case (q, vq) =>
      graft.sim.Similarity.rangeTaus.foreach { t =>
        val tau = t.toDouble
        val want = vecs.count { case (id, v) => id != q && cos(vq, v) >= tau }
        assert(got((q, t)) == want, s"q=$q tau=$t")
      }
    }
  }

  test("nll filter sweep reconciles with the gated per-doc NLL ranking") {
    // avg_nll per doc comes from the already-gated unigramNll operator;
    // the sweep must be exactly the ceiling-threshold cut of that order
    val perDoc = TextStats.unigramNll(spark, sf).collect()
      .filter(_.getAs[Long]("n_tokens") > 0)
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("avg_nll")))
    val srcOf = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ordered = perDoc.sortBy { case (d, _, nll) => (nll, d) }
    val got = TextStats.nllFilterSweep(spark, sf).collect()
    TextStats.nllSweepPcts.foreach { p =>
      val k = ((p.toLong * ordered.length + 99) / 100).toInt
      val kept = ordered.take(k)
      val keptBySrc = kept.groupBy(t => srcOf(t._1))
      got.filter(_.getAs[Int]("keep_pct") == p).foreach { r =>
        val s = r.getAs[String]("source")
        val want = keptBySrc.getOrElse(s, Array.empty[(Long, Long, Double)])
        assert(r.getAs[Long]("kept_docs") == want.length, s"$s p=$p docs")
        assert(r.getAs[Long]("kept_tokens") == want.map(_._2).sum, s"$s p=$p toks")
      }
      // the grid point keeps exactly k docs across all sources
      assert(got.filter(_.getAs[Int]("keep_pct") == p)
        .map(_.getAs[Long]("kept_docs")).sum == k, s"p=$p total")
    }
    // retention is monotone in p per source
    got.groupBy(_.getAs[String]("source")).foreach { case (s, rs) =>
      val byP = rs.sortBy(_.getAs[Int]("keep_pct"))
        .map(_.getAs[Long]("kept_docs"))
      assert(byP.zip(byP.tail).forall { case (a, b) => a <= b }, s)
    }
  }

  test("length histogram equals a driver-side log2 census") {
    val toks = Tables.documents(spark, sf)
      .select(col("source"),
        expr("size(filter(split(text, ' '), t -> t <> ''))").as("t"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong))
    val want = toks.groupBy { case (s, t) =>
      (s, java.lang.Long.toBinaryString(t).length)
    }.view.mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    val got = TextStats.lengthHistogram(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[Int]("len_bucket"))
      val (nd, tt) = want(k)
      assert(r.getAs[Long]("n_docs") == nd && r.getAs[Long]("tot_tokens") == tt, k)
    }
    // per-source ppm shares sum to ~1e6
    got.groupBy(_.getAs[String]("source")).foreach { case (s, rs) =>
      val sum = rs.map(_.getAs[Long]("doc_share_ppm")).sum
      assert(sum > 1000000L - rs.length && sum <= 1000000L, s)
    }
  }

  test("paragraph retention equals a driver-side first-occurrence dedup") {
    val b = graft.text.Dedup.paragraphBlock
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seen = scala.collection.mutable.Set[String]()
    val agg = scala.collection.mutable.Map[String, (Long, Long, Long, Long)]()
    docs.foreach { case (_, src, text) =>
      val a = text.split(" ").filter(_.nonEmpty)
      if (a.nonEmpty) {
        a.grouped(b).foreach { blk =>
          val key = h(blk.mkString(" "))
          val keep = seen.add(key)
          val (nb, rb, nt, rt) = agg.getOrElse(src, (0L, 0L, 0L, 0L))
          agg(src) = (nb + 1, rb + (if (keep) 1 else 0),
            nt + blk.length, rt + (if (keep) blk.length else 0))
        }
      }
    }
    val got = graft.text.Dedup.paragraphRetention(spark, sf).collect()
    assert(got.length == agg.size)
    got.foreach { r =>
      val (nb, rb, nt, rt) = agg(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_blocks") == nb && r.getAs[Long]("retained_blocks") == rb &&
        r.getAs[Long]("n_tokens") == nt && r.getAs[Long]("retained_tokens") == rt,
        r.getAs[String]("source"))
    }
  }

  test("pq distortion equals a driver-side reconstruction-error recompute") {
    import graft.sim.Similarity
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // the SAME shared trained artifact the op uses
    val vframe = Tables.embeddings(spark, sf).select(
      col("vec_id"), col("label"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorOps.dot_product(col("v"), col("v"))))
    val (codes, _, flat) = Similarity.pqIndexAndBooks(vframe)
    val sub = Similarity.pqSubDim
    val codeRows = codes.collect().map(r =>
      r.getAs[Long]("vec_id") ->
        (0 until Similarity.pqM).map(s => r.getAs[Int](s"c$s")).toArray).toMap
    val want = (0 until Similarity.pqM).map { s =>
      val terms = codeRows.toSeq.flatMap { case (id, pc) =>
        val v = vecs(id)
        (0 until sub).map { k =>
          val c = flat(s * (Similarity.pqK * sub) + pc(s) * sub + k)
          val e = v(s * sub + k) - c
          BigDecimal(e * e).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
      }
      s -> (terms.sum / BigDecimal(codeRows.size)).toDouble
    }.toMap
    val got = Similarity.pqDistortion(spark, sf).collect()
    assert(got.length == Similarity.pqM)
    got.foreach { r =>
      val s = r.getAs[Int]("subspace")
      assert(r.getAs[Long]("n_vectors") == codeRows.size)
      assert(math.abs(r.getAs[Double]("mse") - want(s)) < 1e-9, s"s=$s")
      assert(r.getAs[Double]("mse") >= 0.0)
    }
  }

  test("knn assortativity equals a driver-side Newman r over the same graph") {
    import graft.sim.Similarity
    val edges = Similarity.knnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val deg = scala.collection.mutable.Map[Long, Long]()
    edges.foreach { case (s, d) =>
      deg(s) = deg.getOrElse(s, 0L) + 1; deg(d) = deg.getOrElse(d, 0L) + 1
    }
    val n = edges.length.toDouble
    val xs = edges.map(e => deg(e._1).toDouble)
    val ys = edges.map(e => deg(e._2).toDouble)
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (xs.map(a => a * a).sum, ys.map(a => a * a).sum)
    val want = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val row = Similarity.knnAssortativity(spark, sf).collect().head
    assert(row.getAs[Long]("n_edges") == edges.length)
    assert(row.getAs[Long]("n_nodes") == deg.size)
    assert(math.abs(row.getAs[Double]("assortativity") - want) < 1e-9)
    assert(math.abs(row.getAs[Double]("assortativity")) <= 1.0)
  }

  test("hard negatives are the top wrong-label candidates, exactly") {
    import graft.sim.Similarity
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Similarity.hardNegatives(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
    vecs.filter(_._1 < 20).foreach { case (q, ql, vq) =>
      val want = vecs
        .filter { case (id, l, _) => id != q && l != ql }
        .map { case (id, l, v) => (id, l, cos(vq, v)) }
        .sortBy { case (id, _, c) => (-c, id) }.take(Similarity.hardNegK)
      val rows = got(q).sortBy(_.getAs[Int]("rank"))
      assert(rows.length == want.length)
      rows.zip(want).foreach { case (r, (id, l, c)) =>
        assert(r.getAs[Long]("neg_id") == id && r.getAs[Int]("neg_label") == l,
          s"q=$q")
        assert(math.abs(r.getAs[Double]("cosine") - c) < 1e-9, s"q=$q")
        assert(r.getAs[Int]("neg_label") != r.getAs[Int]("query_label"))
      }
    }
  }

  test("vocab overlap equals a driver-side top-k intersection") {
    import graft.text.TextStats
    val md = java.security.MessageDigest.getInstance("MD5")
    def th(t: String): Long = {
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    Tables.documents(spark, sf).select("source", "text").collect()
      .foreach { r =>
        val s = r.getString(0)
        r.getString(1).split(" ").filter(_.nonEmpty)
          .foreach(t => counts((s, t)) = counts.getOrElse((s, t), 0L) + 1)
      }
    val tops: Map[String, Set[Long]] = counts.toSeq
      .groupBy(_._1._1).view.mapValues { rows =>
        rows.map { case ((_, t), c) => (c, th(t)) }
          .sortBy { case (c, h) => (-c, h) }
          .take(TextStats.vocabTopK).map(_._2).toSet
      }.toMap
    val got = TextStats.vocabOverlap(spark, sf).collect()
    got.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      val shared = (tops(a) & tops(b)).size.toLong
      assert(r.getAs[Long]("n_shared") == shared, s"$a-$b")
      assert(r.getAs[Long]("overlap_ppm") ==
        shared * 1000000L / math.min(tops(a).size, tops(b).size), s"$a-$b")
    }
    // every overlapping pair is present (zero-overlap pairs are omitted
    // by construction, identically in both engines)
    val pairs = tops.keys.toSeq.sorted.combinations(2)
      .count { case Seq(a, b) => (tops(a) & tops(b)).nonEmpty }
    assert(got.length == pairs)
  }

  test("new-vs-returning split equals a driver-side first-day replay") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val firstDay = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val byDay = ev.groupBy(_._2).view.mapValues { rows =>
      val users = rows.groupBy(_._1)
      val (nu, ru) = users.partition { case (u, rs) => firstDay(u) == rs.head._2 }
      (nu.values.map(_.length).sum.toLong, ru.values.map(_.length).sum.toLong,
        nu.size.toLong, ru.size.toLong)
    }.toMap
    val got = EventAnalytics.eventsNewVsReturning(spark, sf).collect()
    assert(got.length == byDay.size)
    got.foreach { r =>
      val d = r.getAs[Long]("day")
      val (ne, re, nu, ru) = byDay(d)
      assert(r.getAs[Long]("new_events") == ne && r.getAs[Long]("returning_events") == re, s"day $d")
      assert(r.getAs[Long]("new_users") == nu && r.getAs[Long]("returning_users") == ru, s"day $d")
      assert(r.getAs[Long]("new_share_ppm") == ne * 1000000L / (ne + re), s"day $d")
    }
    // day 1: everyone is new; new shares never exceed 1e6
    val first = got.minBy(_.getAs[Long]("day"))
    assert(first.getAs[Long]("returning_events") == 0L)
  }

  test("aspect buckets: census matches a driver-side nearest-ratio classify") {
    val geo = Tables.documents(spark, sf)
      .select(expr("octet_length(text)").as("n")).collect()
      .map(_.getInt(0))
    val pms = Multimodal.aspectBuckets
      .map { case (w, h) => (s"${w}x$h", w * 1000L / h) }.sortBy(_._2)
    val assign = geo.map { n =>
      val arPm = (16 + n % 64).toLong * 1000 / (16 + n % 48)
      val minD = pms.map { case (_, pm) => math.abs(arPm - pm) }.min
      pms.find { case (_, pm) => math.abs(arPm - pm) == minD }.get._1
    }
    val want = assign.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Multimodal.aspectBucketsReport(spark, sf).collect()
      .map(r => r.getAs[String]("bucket") -> r.getAs[Long]("n_docs")).toMap
    assert(got == want.filter(_._2 > 0))
    // shares sum to ~1e6 (floor division loses at most |buckets| ppm)
    val shareSum = Multimodal.aspectBucketsReport(spark, sf).collect()
      .map(_.getAs[Long]("doc_share_ppm")).sum
    assert(shareSum > 1000000L - 10 && shareSum <= 1000000L)
  }
}
