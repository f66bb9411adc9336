package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.{BpeTrainer, Curation, Dedup}

/** Driver-side recomputes for the round-7c curation additions:
  * containment dedup, dedup-aware mixing, and tokenizer fertility.
  */
class DiscountFertilitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("containment: exact and COMPLETE vs a brute all-pairs recompute") {
    // brute force: every directed pair over in-driver shingle sets —
    // proves the prefix filter lost nothing (exactness claim)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Set.empty
      else (0 to toks.length - 3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
    }
    val sets = docs.map { case (id, t) => id -> shingles(t) }.filter(_._2.nonEmpty)
    val brute = (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      common = (sa & sb).size
      if common * Dedup.containTauDen >= sa.size * Dedup.containTauNum
    } yield (a, b) -> (sa.size.toLong, common.toLong)).toMap
    val rows = Dedup.containmentPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    val got = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
      (r.getAs[Long]("n_a"), r.getAs[Long]("n_common"))).toMap
    assert(got == brute, s"got ${got.size} pairs, brute ${brute.size}")
    // (on this synthetic corpus every qualifying pair happens to be
    // mutual — near-dups are same-length copies — so the directionality
    // is exercised by the n_a denominators differing per direction, not
    // by one-sided pairs)
  }

  test("dedup discount: conserves tokens, discounts exactly the non-keepers") {
    val rows = Curation.mixDedupDiscount(spark, sf).collect()
    assert(rows.nonEmpty)
    // weights sum to <= 1e6 (floor quotients) and within 1e6 - n_sources
    val wsum = rows.map(_.getAs[Long]("weight_ppm")).sum
    assert(wsum <= 1000000L && wsum >= 1000000L - rows.length)
    // dropped = component members minus keepers, recomputed independently
    val keepers = Curation.keepBest(spark, sf).collect()
      .map(_.getAs[Long]("kept_doc_id")).toSet
    val members = Dedup.components(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id"))
    val droppedIds = members.filterNot(keepers).toSet
    val bySrc = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        expr("size(filter(split(text, ' '), t -> t <> ''))").cast("long").as("tok"))
      .collect()
      .groupBy(_.getAs[String]("source"))
    rows.foreach { r =>
      val ds = bySrc(r.getAs[String]("source"))
      val raw = ds.map(_.getAs[Long]("tok")).sum
      val dropTok = ds.filter(d => droppedIds(d.getAs[Long]("doc_id")))
        .map(_.getAs[Long]("tok")).sum
      assert(r.getAs[Long]("raw_tokens") == raw)
      assert(r.getAs[Long]("kept_tokens") == raw - dropTok)
      assert(r.getAs[Long]("n_dropped") ==
        ds.count(d => droppedIds(d.getAs[Long]("doc_id"))))
    }
  }

  test("curation funnel: stages nest monotonically and match their operators") {
    val rows = Curation.curationFunnel(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ingested") >= r.getAs[Long]("n_gated"))
      assert(r.getAs[Long]("n_gated") >= r.getAs[Long]("n_deduped"))
      assert(r.getAs[Long]("n_deduped") >= r.getAs[Long]("n_train"))
      assert(r.getAs[Long]("t_ingested") >= r.getAs[Long]("t_gated"))
      assert(r.getAs[Long]("retained_ppm") ==
        r.getAs[Long]("t_train") * 1000000L / r.getAs[Long]("t_ingested"))
    }
    // stage-1 counts equal the registered gate's keep counts per source
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val keepBySrc = graft.text.QualityFilters.qualityGate(spark, sf)
      .filter(col("keep")).select(col("doc_id")).collect()
      .map(r => srcOf(r.getAs[Long]("doc_id")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_gated") ==
        keepBySrc.getOrElse(r.getAs[String]("source"), 0L))
    }
    // ingested masses cover the corpus exactly
    assert(rows.map(_.getAs[Long]("n_ingested")).sum ==
      Tables.documents(spark, sf).count())
  }

  test("cohort revenue: cells match a driver-side recompute; cumsum is exact") {
    val rows = graft.operators.EventAnalytics.qCohortRevenue(spark, sf).collect()
    assert(rows.nonEmpty)
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(date_trunc("week", col("ts"))).as("w_us"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("w_us"), r.getAs[Double]("value")))
    val first = evs.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val weekUs = 7L * 24 * 3600 * 1000000
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val perUser = evs.groupBy(e => (first(e._1), (e._3 - first(e._1)) / weekUs, e._1))
      .map { case (k, es) =>
        k -> es.filter(_._2 == "purchase").map(e => d2(e._4)).sum
      }
    val cells = perUser.groupBy { case ((c, w, _), _) => (c, w) }
      .map { case (k, m) =>
        k -> (m.size.toLong, m.values.count(_ > 0).toLong, m.values.sum)
      }
    assert(rows.length == cells.size)
    rows.foreach { r =>
      val k = (r.getAs[Long]("cohort_us"), r.getAs[Long]("week_n"))
      val (na, np, rev) = cells(k)
      assert(r.getAs[Long]("n_active_users") == na)
      assert(r.getAs[Long]("n_paying_users") == np)
      assert(r.getAs[Double]("revenue") == rev.toDouble)
    }
    // cumulative = running sum of the exact decimals per cohort
    rows.groupBy(_.getAs[Long]("cohort_us")).foreach { case (c, rs) =>
      var run = BigDecimal(0)
      rs.sortBy(_.getAs[Long]("week_n")).foreach { r =>
        run += cells((c, r.getAs[Long]("week_n")))._3
        assert(r.getAs[Double]("cum_revenue") == run.toDouble)
      }
    }
  }

  test("cluster profile reconciles with the components fixpoint") {
    val rows = Dedup.clusterProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    val comp = Dedup.components(spark, sf).collect()
    val sizes = comp.filter(_.getAs[Boolean]("is_canonical"))
      .map(_.getAs[Long]("component_size"))
    val want = sizes.groupBy(identity).map { case (s, xs) => s -> xs.length.toLong }
    assert(rows.length == want.size)
    rows.foreach { r =>
      val s = r.getAs[Long]("component_size")
      assert(r.getAs[Long]("n_components") == want(s))
      assert(r.getAs[Long]("n_docs") == s * want(s))
      assert(r.getAs[Long]("n_removable") == (s - 1) * want(s))
    }
    // doc mass reconciles with the corpus and shares sum to ~1e6
    assert(rows.map(_.getAs[Long]("n_docs")).sum == comp.length.toLong)
    val shares = rows.map(_.getAs[Long]("doc_share_ppm")).sum
    assert(shares <= 1000000L && shares >= 1000000L - rows.length)
  }

  test("lang mismatch per source reconciles with the confusion matrix") {
    import graft.text.TextStats
    val rows = TextStats.qualityLangMismatch(spark, sf).collect()
    assert(rows.nonEmpty)
    // total mismatches = off-diagonal mass of the langId confusion matrix
    val confusion = TextStats.langId(spark, sf).collect()
    val offDiag = confusion
      .filter(r => r.getAs[String]("lang") != r.getAs[String]("lang_pred"))
      .map(_.getAs[Long]("n_docs")).sum
    assert(rows.map(_.getAs[Long]("n_mismatch")).sum == offDiag)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("mismatch_ppm") ==
        r.getAs[Long]("n_mismatch") * 1000000L / r.getAs[Long]("n_docs"))
    }
  }

  test("kneser-ney: per-doc NLL matches a driver recompute; model normalizes to 1") {
    import graft.text.TextStats
    val rows = TextStats.textKnBigram(spark, sf).collect()
    assert(rows.nonEmpty)
    // rebuild the model in plain Scala from the corpus
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ", -1).filter(_.nonEmpty).toSeq)
    val bgByDoc = docs.map { case (id, a) =>
      id -> (if (a.length < 2) Seq.empty[(String, String)]
             else a.zip(a.tail))
    }
    val cBg = bgByDoc.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.length }
    val cW1 = cBg.toSeq.groupBy(_._1._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    val n1Fwd = cBg.keys.toSeq.groupBy(_._1).map { case (w, xs) => w -> xs.length }
    val n1Rev = cBg.keys.toSeq.groupBy(_._2).map { case (w, xs) => w -> xs.length }
    val t = cBg.size.toDouble
    val d = TextStats.knDiscount
    def pKn(w1: String, w2: String): Double =
      math.max(cBg.getOrElse((w1, w2), 0).toDouble - d, 0.0) / cW1(w1) +
        (d * n1Fwd(w1) / cW1(w1)) * (n1Rev.getOrElse(w2, 0) / t)
    // the famous KN identity: summed over the whole vocabulary the
    // conditional normalizes to EXACTLY 1 (discount mass returns via
    // the continuation distribution, which itself sums to T/T)
    val vocab = (n1Rev.keySet ++ cW1.keySet).toSeq
    cW1.keys.take(5).foreach { w1 =>
      val z = vocab.map(w2 => pKn(w1, w2)).sum
      assert(math.abs(z - 1.0) < 1e-9, s"sum_w2 p($w1) = $z")
    }
    // per-doc NLL with the operator's 9-decimal term quantization
    val want = bgByDoc.toMap
    rows.foreach { r =>
      val bgs = want(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_bigrams") == bgs.length.toLong)
      if (bgs.nonEmpty) {
        val sum9 = bgs.map { case (w1, w2) =>
          BigDecimal(math.log(pKn(w1, w2)))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        assert(r.getAs[Double]("avg_nll_kn") == -(sum9.toDouble) / bgs.length,
          s"doc ${r.getAs[Long]("doc_id")}")
      }
    }
  }

  test("fertility: per-source sums equal the per-doc encode; ppm is the floor") {
    val enc = BpeTrainer.bpeEncodeQuery(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"))).toMap
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val expected = enc.toSeq.groupBy { case (id, _) => srcOf(id) }
      .map { case (s, xs) =>
        s -> (xs.size.toLong, xs.map(_._2._1).sum, xs.map(_._2._2).sum)
      }
    val rows = BpeTrainer.bpeFertility(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, w, t) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n_words") == w)
      assert(r.getAs[Long]("n_tokens") == t)
      assert(r.getAs[Long]("fertility_ppm") == t * 1000000L / w)
      // BPE can only merge: tokens per word in [1, chars per word]
      assert(r.getAs[Long]("fertility_ppm") >= 1000000L)
    }
  }
}
