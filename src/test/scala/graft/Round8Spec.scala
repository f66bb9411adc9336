package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EventAnalytics, GraphOps}
import graft.profile.Patterns

/** Independent driver-side recomputes for the round-8 first wave —
  * the math cross-check (the DuckDB gate cross-checks the SQL).
  */
class Round8Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("markov stationary: fixed-point iteration matches a BigInt recompute") {
    // raw transitions recomputed via collect + Scala sort (no window)
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime, r.getLong(3)))
    val cells = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val seq = rows.sortBy(r => (r._3, r._4)).map(_._2)
      seq.zip(seq.tail)
    }.groupBy(identity).map { case ((s, d), xs) => (s, d, xs.size.toLong) }
    val nodes = (cells.map(_._1) ++ cells.map(_._2)).toSeq.distinct.sorted
    val tot = cells.groupBy(_._1).map { case (s, cs) => s -> cs.map(_._3).sum }
    var pi: Map[String, BigInt] =
      nodes.map(_ -> BigInt(EventAnalytics.markovUnit / nodes.length)).toMap
    for (_ <- 1 to EventAnalytics.markovIters) {
      val next = scala.collection.mutable.Map[String, BigInt]()
        .withDefaultValue(BigInt(0))
      for ((s, d, c) <- cells) next(d) += pi(s) * c / tot(s)
      for (n <- nodes if !tot.contains(n)) next(n) += pi(n)
      pi = nodes.map(v => v -> next(v)).toMap
    }
    val got = EventAnalytics.eventsMarkovStationary(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(_._1).sorted.toSeq == nodes)
    got.foreach { case (t, p) =>
      assert(BigInt(p) == pi(t), s"pi mismatch for $t") }
    // floor-division dust only ever removes mass
    assert(got.map(_._2).sum <= EventAnalytics.markovUnit)
    assert(got.map(_._2).sum > EventAnalytics.markovUnit * 9 / 10)
  }

  test("attribution: last-touch recompute from per-user sorted logs") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"), col("event_id"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val expected = scala.collection.mutable.Map[String, (Long, BigDecimal)]()
      .withDefaultValue((0L, BigDecimal(0)))
    evs.groupBy(_._1).foreach { case (_, rows) =>
      val seq = rows.sortBy(r => (r._3, r._4))
      var touch: Option[(Long, String)] = None
      seq.foreach { case (_, typ, tUs, _, v) =>
        if (typ == "purchase") {
          val ch = touch match {
            case Some((tu, tt))
                if tUs - tu <= EventAnalytics.attributionLookbackUs => tt
            case _ => "none"
          }
          val (n, s) = expected(ch)
          expected(ch) = (n + 1,
            s + BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        }
        if (typ == "click" || typ == "view") touch = Some((tUs, typ))
      }
    }
    val totalConv = expected.values.map(_._1).sum
    val got = EventAnalytics.eventsAttribution(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == expected.keySet)
    got.foreach { r =>
      val (n, s) = expected(r.getString(0))
      assert(r.getAs[Long]("n_conversions") == n)
      assert(math.abs(r.getAs[Double]("attributed_value") - s.toDouble) < 1e-6)
      assert(r.getAs[Long]("conv_share_ppm") == n * 1000000L / totalConv)
    }
  }

  test("degree profile: bucket recompute from raw distinct pairs") {
    val cs = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    def bucketsOf(degs: Seq[Long]) = degs
      .groupBy(d => java.lang.Long.toBinaryString(d).length)
      .map { case (b, xs) => b -> (xs.size.toLong, xs.min, xs.max) }
    val exp = Map(
      "customer" -> bucketsOf(cs.groupBy(_._1).values.map(_.length.toLong).toSeq),
      "supplier" -> bucketsOf(cs.groupBy(_._2).values.map(_.length.toLong).toSeq))
    val got = GraphOps.degreeProfile(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val side = r.getString(0)
      val (n, mn, mx) = exp(side)(r.getAs[Int]("deg_bucket"))
      assert(r.getAs[Long]("n_nodes") == n)
      assert(r.getAs[Long]("min_deg") == mn && r.getAs[Long]("max_deg") == mx)
      val total = exp(side).values.map(_._1).sum
      assert(r.getAs[Long]("share_ppm") == n * 1000000L / total)
    }
    // every node accounted for, once
    assert(got.filter(_.getString(0) == "customer")
      .map(_.getAs[Long]("n_nodes")).sum == cs.map(_._1).distinct.length)
  }

  test("supplier overlap: exact Jaccard recompute from raw customer sets") {
    val cs = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = cs.groupBy(_._2).map { case (s, xs) => s -> xs.map(_._1).toSet }
    val got = GraphOps.supplierOverlap(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 100)
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (sa, sb) = (bySupp(a), bySupp(b))
      val common = (sa & sb).size.toLong
      assert(a < b)
      assert(r.getAs[Long]("n_common") == common)
      assert(r.getAs[Long]("deg_a") == sa.size.toLong)
      assert(r.getAs[Long]("deg_b") == sb.size.toLong)
      assert(r.getAs[Long]("jaccard_ppm") ==
        common * 1000000L / (sa.size + sb.size - common))
      assert(common >= GraphOps.overlapMinCommon)
    }
    // descending score order (ties broken by keys upstream)
    val scores = got.map(_.getAs[Long]("jaccard_ppm"))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
  }

  test("trade balance: per-nation export/import sums from a raw replay") {
    import graft.operators.Relational6
    val li = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("s_nationkey").as("sn"), col("c_nationkey").as("cn"),
        col("l_extendedprice"), col("l_discount"))
      .collect()
    def revOf(p: Double, d: Double): BigDecimal =
      (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
        (BigDecimal("1.00") -
          BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val nations = Tables.nation(spark, sf).collect()
      .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[String]("n_name")).toMap
    val exp = scala.collection.mutable.Map[String, BigDecimal]()
      .withDefaultValue(BigDecimal(0))
    val imp = scala.collection.mutable.Map[String, BigDecimal]()
      .withDefaultValue(BigDecimal(0))
    li.foreach { r =>
      val rev = revOf(r.getDouble(2), r.getDouble(3))
      exp(nations(r.getInt(0))) += rev
      imp(nations(r.getInt(1))) += rev
    }
    val got = Relational6.qNationTradeBalance(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val n = r.getString(0)
      assert(math.abs(r.getAs[Double]("export_rev") - exp(n).toDouble) < 1e-6)
      assert(math.abs(r.getAs[Double]("import_rev") - imp(n).toDouble) < 1e-6)
      assert(math.abs(r.getAs[Double]("balance") -
        (exp(n) - imp(n)).toDouble) < 1e-6)
    }
    // global conservation: every line exported once and imported once
    assert(got.map(_.getAs[Long]("n_export_lines")).sum ==
      got.map(_.getAs[Long]("n_import_lines")).sum)
  }

  test("yearly growth: lag semantics and the exact-decimal growth ratio") {
    import graft.operators.Relational6
    val rows = Relational6.qYearlyGrowth(spark, sf).collect()
    assert(rows.nonEmpty)
    val byNation = rows.groupBy(_.getString(0))
    byNation.values.foreach { rs =>
      val seq = rs.sortBy(_.getAs[Int]("yr"))
      // first year: null prev + null growth; later: prev == last rev and
      // growth == (rev - prev) / prev
      assert(seq.head.isNullAt(seq.head.fieldIndex("prev_revenue")))
      seq.sliding(2).foreach {
        case Array(a, b) =>
          val prev = b.getAs[Double]("prev_revenue")
          assert(math.abs(prev - a.getAs[Double]("revenue")) < 1e-9)
          val g = (b.getAs[Double]("revenue") - prev) / prev
          assert(math.abs(b.getAs[Double]("yoy_growth") - g) < 1e-12)
        case _ => ()
      }
    }
  }

  test("split leakage: signature recompute from components + hash split") {
    import java.math.BigInteger
    val comp = text.Dedup.components(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("canon_id"),
        r.getAs[Long]("component_size")))
      .filter(_._3 >= 2)
    def splitOf(docId: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 15)
      val b = new BigInteger(hex, 16).mod(BigInteger.valueOf(100)).intValue
      if (b < 1) "test" else if (b < 2) "valid" else "train"
    }
    val exp = comp.groupBy(_._2).toSeq.map { case (_, ms) =>
      val splits = ms.map(m => splitOf(m._1)).toSet
      val sig = (if (splits("train")) "T" else "") +
        (if (splits("valid")) "V" else "") + (if (splits("test")) "E" else "")
      (sig, ms.length.toLong)
    }
    val expByMix = exp.groupBy(_._1)
      .map { case (s, xs) => s -> (xs.length.toLong, xs.map(_._2).sum) }
    val got = text.Curation.splitLeakage(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == expByMix.keySet)
    val totComp = expByMix.values.map(_._1).sum
    got.foreach { r =>
      val (nc, nd) = expByMix(r.getString(0))
      assert(r.getAs[Long]("n_components") == nc)
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Boolean]("is_leaky") == (r.getString(0).length > 1))
      assert(r.getAs[Long]("comp_share_ppm") == nc * 1000000L / totComp)
    }
  }

  test("sparse cosine knn: full-vector recompute per query") {
    val got = text.Search.sparseCosine(spark, sf).collect()
    assert(got.nonEmpty)
    // rebuild the weight vectors driver-side with the same decimal path
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tf = docs.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).groupBy(identity)
        .map { case (tok, xs) => ((id, tok), xs.length.toLong) }
    }.toMap
    val dfm = tf.keys.groupBy(_._2).map { case (tok, ks) => tok -> ks.size.toLong }
    val n = docs.length.toDouble
    def w(id: Long, tok: String): BigDecimal =
      BigDecimal(tf((id, tok))) *
        BigDecimal(math.log(n / dfm(tok)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val vecs: Map[Long, Map[String, BigDecimal]] = tf.keys.groupBy(_._1)
      .map { case (id, ks) => id -> ks.map(k => k._2 -> w(id, k._2)).toMap }
    def cos2ppm(a: Long, b: Long): BigInt = {
      val (va, vb) = (vecs(a), vecs(b))
      val dot = va.keySet.intersect(vb.keySet).toSeq
        .map(t => va(t) * vb(t)).sum
      val na = va.values.map(x => x * x).sum
      val nb = vb.values.map(x => x * x).sum
      val d3 = (dot * 1000).setScale(0, BigDecimal.RoundingMode.FLOOR).toBigInt
      val q3 = (na * 1000).setScale(0, BigDecimal.RoundingMode.FLOOR).toBigInt
      val n3 = (nb * 1000).setScale(0, BigDecimal.RoundingMode.FLOOR).toBigInt
      d3 * d3 * 1000000 / (q3 * n3)
    }
    val byQuery = got.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == (0L until text.Search.sparseQueryDocs).toSet)
    byQuery.foreach { case (qid, rows) =>
      assert(rows.length == text.Search.sparseTopK)
      // exhaustive driver-side top-k for this query (only docs sharing a
      // term can score; on this corpus every doc shares terms)
      val all = docs.map(_._1).filter(_ != qid)
        .filter(nid => vecs(qid).keySet.intersect(vecs(nid).keySet).nonEmpty)
        .map(nid => (nid, cos2ppm(qid, nid)))
      val expTop = all.sortBy { case (nid, c) => (-c, nid) }
        .take(text.Search.sparseTopK)
      val gotTop = rows.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("neighbor_id"), BigInt(r.getAs[Long]("cos2_ppm"))))
      gotTop.zip(expTop).foreach { case ((gn, gc), (en, ec)) =>
        assert(gn == en, s"neighbor mismatch q=$qid: got $gn expected $en")
        assert(gc == ec, s"cos2_ppm mismatch q=$qid n=$gn: $gc vs $ec")
      }
    }
  }

  test("cluster purity: majority bookkeeping is internally consistent") {
    val rows = sim.Similarity.clusterPurity(spark, sf).collect()
    assert(rows.nonEmpty)
    val nVecs = Tables.embeddings(spark, sf).count()
    // every vector lands in exactly one cell
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == nVecs)
    rows.foreach { r =>
      val (n, maj) = (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_majority"))
      assert(maj >= 1 && maj <= n)
      assert(r.getAs[Long]("purity_ppm") == maj * 1000000L / n)
      val lbl = r.getAs[Int]("majority_label")
      assert(lbl >= 0 && lbl <= 9)
    }
  }

  test("weekly heatmap: arithmetic dow/hod recompute from raw events") {
    import graft.operators.EventAnalytics
    val evs = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("t_us"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exp = evs.groupBy { case (t, _) =>
      (((t / 86400000000L + 4) % 7).toInt, ((t / 3600000000L) % 24).toInt)
    }.map { case (k, xs) => k -> (xs.length.toLong, xs.map(_._2).distinct.length.toLong) }
    val got = EventAnalytics.eventsWeeklyHeatmap(spark, sf).collect()
    assert(got.length == exp.size && got.length <= 168)
    val totalEv = evs.length.toLong
    got.foreach { r =>
      val k = (r.getAs[Int]("dow"), r.getAs[Int]("hod"))
      assert(k._1 >= 0 && k._1 <= 6 && k._2 >= 0 && k._2 <= 23)
      val (n, u) = exp(k)
      assert(r.getAs[Long]("n_events") == n && r.getAs[Long]("n_users") == u)
      assert(r.getAs[Long]("share_ppm") == n * 1000000L / totalEv)
    }
  }

  test("session stats: nearest-rank percentiles from a sorted replay") {
    import graft.operators.{EventAnalytics, Relational}
    val ds = Relational.qSessionize(spark, sf).collect()
      .map(r => r.getAs[Long]("end_us") - r.getAs[Long]("start_us"))
      .sorted
    val n = ds.length.toLong
    val got = EventAnalytics.eventsSessionStats(spark, sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_sessions") == n)
    assert(r.getAs[Long]("mean_us") == ds.sum / n)
    EventAnalytics.sessionPcts.foreach { p =>
      val rk = math.max(1L, (p * n + 99) / 100)
      assert(r.getAs[Long](s"p${p}_us") == ds((rk - 1).toInt),
        s"p$p mismatch")
    }
  }

  test("join skew: key-count recompute for two fact keys") {
    val got = Patterns.joinSkew(spark, sf).collect()
    assert(got.length == Patterns.skewKeys.length)
    for ((tbl, k) <- Seq(("lineitem", "l_suppkey"), ("orders", "o_custkey"))) {
      val keys = Tables.table(spark, sf, tbl).select(col(k))
        .collect().map(_.getLong(0))
      val counts = keys.groupBy(identity).map(_._2.length.toLong)
      val r = got.find(x => x.getString(0) == tbl && x.getString(1) == k).get
      assert(r.getAs[Long]("n_rows") == keys.length.toLong)
      assert(r.getAs[Long]("n_keys") == counts.size.toLong)
      assert(r.getAs[Long]("max_key_rows") == counts.max)
      assert(r.getAs[Long]("max_share_ppm") ==
        counts.max * 1000000L / keys.length)
      assert(r.getAs[Long]("skew_factor_ppm") ==
        counts.max * counts.size * 1000000L / keys.length)
      assert(r.getAs[Long]("skew_factor_ppm") >= 1000000L)
    }
  }

  test("top values: bounded aggregator matches full value counts") {
    val got = Patterns.topValues(spark, sf).collect()
    assert(got.nonEmpty)
    // independent recompute for two columns of different cardinality
    for ((tbl, cn) <- Seq(("orders", "o_orderpriority"), ("part", "p_name"))) {
      val vals = Tables.table(spark, sf, tbl).select(col(cn))
        .collect().map(_.getString(0)).filter(_ != null)
      val counts = vals.groupBy(identity).map { case (v, xs) =>
        (v, xs.length.toLong) }
      val expTop = counts.toSeq.sortBy { case (v, n) => (-n, v) }
        .take(Patterns.topK)
      val rows = got.filter(r => r.getString(0) == tbl && r.getString(1) == cn)
        .sortBy(_.getAs[Int]("rank"))
      assert(rows.length == math.min(Patterns.topK, counts.size))
      rows.zip(expTop).foreach { case (r, (v, n)) =>
        assert(r.getAs[String]("v") == v && r.getAs[Long]("n_rows") == n)
        assert(r.getAs[Long]("share_ppm") == n * 1000000L / vals.length)
        assert(r.getAs[Long]("n_distinct") == counts.size.toLong)
      }
    }
  }

  test("mask translate form ≡ regex battery on adversarial strings") {
    // the r14 expression rewrite replaced maskExpr's three
    // regexp_replace passes with one translate char map (and the
    // streaming twin uses the Column forms) — pin the equivalence on
    // the edge alphabet: empty, all-classes, runs, punctuation-only,
    // the '<null>' lookalike, non-ASCII letters/digits (must pass
    // through BOTH forms untouched), and embedded whitespace
    import spark.implicits._
    val probes = Seq("", "Abc123", "AAAaaa999", "---", "<null>",
      "Ärger Straße №42", "a1B2c3", "  spaced  out  ", "ABC-12-xyz",
      "ÉÀ日本語٣٤", "mixed<null>inside", "A", "9", "a").toDF("v")
    val both = probes.select(col("v"),
      Patterns.maskRaw(col("v")).as("t_raw"),
      expr(Patterns.maskExpr("v")).as("r_raw"),
      Patterns.collapseCol(Patterns.maskRaw(col("v"))).as("t_full"),
      expr(Patterns.collapseExpr(Patterns.maskExpr("v"))).as("r_full"))
      .collect()
    both.foreach { r =>
      assert(r.getAs[String]("t_raw") == r.getAs[String]("r_raw"),
        s"raw mask diverged for '${r.getString(0)}'")
      assert(r.getAs[String]("t_full") == r.getAs[String]("r_full"),
        s"collapsed mask diverged for '${r.getString(0)}'")
    }
  }

  test("value patterns: scala-regex recompute for customer.c_name") {
    def mask(v: String): String = v
      .replaceAll("[A-Z]", "A").replaceAll("[a-z]", "a").replaceAll("[0-9]", "9")
    def collapse(m: String): String = m
      .replaceAll("A+", "A").replaceAll("a+", "a").replaceAll("9+", "9")
    val names = Tables.customer(spark, sf).select(col("c_name"))
      .collect().map(_.getString(0))
    val expected = names.groupBy(n => collapse(mask(n)))
      .map { case (m, xs) =>
        m -> (xs.length.toLong, xs.map(mask).distinct.length.toLong, xs.min) }
    val got = Patterns.valuePatterns(spark, sf).collect()
      .filter(r => r.getString(0) == "customer" && r.getString(1) == "c_name")
    assert(got.nonEmpty)
    assert(got.map(_.getAs[String]("mask")).toSet == expected.keySet)
    got.foreach { r =>
      val (n, nRaw, ex) = expected(r.getAs[String]("mask"))
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_raw_masks") == nRaw)
      assert(r.getAs[String]("example") == ex)
      assert(r.getAs[Long]("share_ppm") == n * 1000000L / names.length)
    }
    // per-column shares sum to ≤ 1e6 with only floor dust missing
    val all = Patterns.valuePatterns(spark, sf).collect()
    all.groupBy(r => (r.getString(0), r.getString(1))).foreach {
      case (_, rows) =>
        val s = rows.map(_.getAs[Long]("share_ppm")).sum
        assert(s <= 1000000L && s > 1000000L - rows.length)
    }
  }
}
