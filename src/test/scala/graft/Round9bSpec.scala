package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputes for the round-9 late wave
  * (waterfill / importance / mutual information / lexical diversity).
  * The DuckDB gate cross-checks the SQL twins; these cross-check the
  * math itself against brute-force replays of the raw tables.
  */
class Round9bSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private def docWords: Map[Long, (String, Array[String])] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2).split(" ", -1).filter(_.nonEmpty)))
      .toMap

  test("waterfill: cap is feasible, maximal, and first-match exact") {
    val words = docWords
    val srcTok = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getString(1), words(r.getLong(0))._2.length.toLong))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    val total = srcTok.values.sum
    val budget = total * text.Curation.waterfillNum / text.Curation.waterfillDen
    def f(c: Long): Long = srcTok.values.map(math.min(_, c)).sum
    val rows = text.Curation.mixWaterfill(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == srcTok.keySet)
    val caps = rows.map(r => if (r.isNullAt(4)) None else Some(r.getLong(4))).distinct
    assert(caps.length == 1, "cap must be a single corpus-level scalar")
    caps.head match {
      case Some(c) =>
        assert(f(c) <= budget, s"cap $c infeasible")
        assert(f(c + 1) > budget, s"cap $c not maximal")
      case None => assert(total <= budget)
    }
    rows.foreach { r =>
      val n = srcTok(r.getString(0))
      assert(r.getLong(2) == n)
      assert(r.getLong(3) == budget)
      val alloc = caps.head.fold(n)(math.min(n, _))
      assert(r.getLong(5) == alloc)
      assert(r.getBoolean(6) == caps.head.exists(n > _))
      assert(r.getLong(7) == (BigInt(alloc) * 1000000 / budget).toLong)
    }
    // the uncapped path: a 2x budget can never bind
    val un = text.Curation.mixWaterfill(spark, sf, 2L, 1L).collect()
    assert(un.forall(r => r.isNullAt(4) && !r.getBoolean(6) &&
      r.getLong(5) == r.getLong(2)))
  }

  /** Shared BigDecimal replay of the DSIR model: per-doc bucket lists
    * and the quantized λ table. */
  private lazy val importanceReplay: (Map[Long, Seq[String]], Map[String, BigDecimal]) = {
    val words = docWords
    val bigrams: Map[Long, Seq[String]] = words.map { case (d, (_, w)) =>
      d -> (if (w.length < 2) Seq.empty[String]
            else w.sliding(2).map(p => p(0) + " " + p(1)).toSeq)
    }
    val buckets: Map[Long, Seq[String]] =
      bigrams.map { case (d, bs) => d -> bs.map(b => md5hex(b).take(3)) }
    val rCnt = buckets.values.flatten.groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val tCnt = buckets.toSeq
      .filter { case (d, _) => words(d)._1 == text.Importance.targetLang }
      .flatMap(_._2).groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val rTot = rCnt.values.sum.toDouble
    val tTot = tCnt.values.sum.toDouble
    val nB = text.Importance.nBuckets.toDouble
    val lam: Map[String, BigDecimal] = rCnt.map { case (b, r) =>
      val t = tCnt.getOrElse(b, 0L)
      b -> BigDecimal(
        math.log((t + 1.0) / (tTot + nB)) - math.log((r + 1.0) / (rTot + nB)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    (buckets, lam)
  }

  test("importance: hashed-bigram log-ratio matches a BigDecimal replay") {
    val words = docWords
    val (buckets, lam) = importanceReplay
    val got = text.Importance.curationImportance(spark, sf).collect()
    assert(got.length == words.size)
    got.foreach { r =>
      val d = r.getLong(0)
      val bs = buckets(d)
      assert(r.getLong(2) == bs.size.toLong)
      val s = bs.groupBy(identity).toSeq
        .map { case (b, xs) => lam(b) * xs.size }.sum
      assert(math.abs(r.getDouble(3) - s.toDouble) < 1e-9, s"doc $d")
      if (bs.nonEmpty)
        assert(math.abs(r.getDouble(4) - s.toDouble / bs.size) < 1e-9)
      else assert(r.getDouble(4) == 0.0)
    }
    // direction sanity: target-language docs average a higher ratio
    val (en, other) = got.partition(_.getString(1) == text.Importance.targetLang)
    assert(en.map(_.getDouble(4)).sum / en.length >
      other.map(_.getDouble(4)).sum / other.length)
  }

  test("mutual info: H and MI match a quantized replay; NMI bounded") {
    val pairs = Tables.documents(spark, sf)
      .select(col("lang"), col("source")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = pairs.length.toDouble
    val cells = pairs.groupBy(identity).map { case (k, v) => k -> v.length }
    val cx = pairs.groupBy(_._1).map { case (k, v) => k -> v.length }
    val cy = pairs.groupBy(_._2).map { case (k, v) => k -> v.length }
    def q(d: Double): BigDecimal =
      BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val mi = cells.map { case ((x, y), c) =>
      q((c / n) * math.log((c * n) / (cx(x).toDouble * cy(y).toDouble)))
    }.sum
    def h(m: Map[String, Int]): BigDecimal =
      m.values.map(c => q(-(c / n) * math.log(c / n))).sum
    val row = profile.Profiler.profileMutualInfo(spark, sf)
      .filter(col("table_name") === "documents").collect().head
    assert(row.getLong(3) == pairs.length.toLong)
    assert(row.getLong(4) == cells.size.toLong)
    assert(math.abs(row.getDouble(5) - h(cx).toDouble) < 1e-9)
    assert(math.abs(row.getDouble(6) - h(cy).toDouble) < 1e-9)
    assert(math.abs(row.getDouble(7) - mi.toDouble) < 1e-9)
    val nmi = row.getDouble(8)
    assert(nmi >= -1e-6 && nmi <= 1.0 + 1e-6)
    // events row exists and is well-formed too
    val ev = profile.Profiler.profileMutualInfo(spark, sf)
      .filter(col("table_name") === "events").collect().head
    assert(ev.getString(2) == "dow" && ev.getLong(3) > 0)
  }

  test("curation select: top-p cutoff and composition shift replay") {
    val (buckets, lam) = importanceReplay
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val score: Map[Long, BigDecimal] = srcOf.keys.map { d =>
      d -> buckets(d).groupBy(identity).toSeq
        .map { case (b, xs) => lam(b) * xs.size }.sum
    }.toMap
    val order = srcOf.keys.toSeq.sortBy(d => (score(d).unary_-, d))
    val n = order.size.toLong
    val k = (text.Importance.selectNum * n + text.Importance.selectDen - 1) /
      text.Importance.selectDen
    val selected = order.take(k.toInt).toSet
    val bySrc = srcOf.keys.groupBy(srcOf)
    val got = text.Importance.curationSelect(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == bySrc.keySet)
    got.foreach { r =>
      val s = r.getString(0)
      val nd = bySrc(s).size.toLong
      val ns = bySrc(s).count(selected).toLong
      assert(r.getLong(1) == nd && r.getLong(2) == ns, s)
      assert(r.getLong(3) == nd * 1000000L / n)
      assert(r.getLong(4) == ns * 1000000L / k)
      assert(r.getLong(5) == (BigInt(ns) * n * 1000000 / (BigInt(nd) * k)).toLong)
    }
    // the selection must actually shift mass toward the target slice:
    // selected docs average a strictly higher score than the rest
    val rest = srcOf.keys.filterNot(selected).toSeq
    assert(selected.map(score).sum / selected.size >
      rest.map(score(_)).sum / rest.size)
  }

  test("lsh param sweep: candidate/recall counts match a signature replay") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val shing: Map[Long, Set[Long]] = docs.collect {
      case (d, t) if t.length >= 3 =>
        d -> t.sliding(3).map(_.mkString(" ")).toSet
          .map((s: String) => java.lang.Long.parseLong(md5hex(s).take(12), 16))
    }.toMap
    val p = text.Dedup.minhashP
    val sigs: Map[Long, IndexedSeq[Long]] = shing.map { case (d, hs) =>
      d -> (0 until text.Dedup.nPerms).map(i =>
        hs.map(h => ((h % p) * text.Dedup.permA(i) + text.Dedup.permB(i)) % p).min)
    }
    val ids = shing.keys.toSeq.sorted
    val truth = (for {
      ai <- ids.indices; bi <- (ai + 1) until ids.length
      a = ids(ai); b = ids(bi)
      c = (shing(a) & shing(b)).size
      u = shing(a).size + shing(b).size - c
      if 2L * c >= u
    } yield (a, b)).toSet
    val got = text.Dedup.lshParamSweep(spark, sf).collect()
    assert(got.map(r => (r.getInt(0), r.getInt(1))).toSet ==
      text.Dedup.lshSweepConfigs.toSet)
    got.foreach { r =>
      val (b, rows) = (r.getInt(0), r.getInt(1))
      val cands = (0 until b).flatMap { bi =>
        ids.groupBy(d => sigs(d).slice(bi * rows, bi * rows + rows))
          .values.filter(_.size > 1)
          .flatMap(g => for { x <- g; y <- g if x < y } yield (x, y))
      }.toSet
      assert(r.getLong(2) == cands.size.toLong, s"cand $b x $rows")
      assert(r.getLong(3) == truth.size.toLong)
      val caught = (cands & truth).size.toLong
      assert(r.getLong(4) == caught)
      assert(r.getLong(5) ==
        (if (truth.isEmpty) 0L else caught * 1000000L / truth.size))
      assert(r.getLong(6) ==
        (if (cands.isEmpty) 0L else caught * 1000000L / cands.size))
      // banding can only lose pairs relative to the finest banding
      assert(caught <= truth.size)
    }
    // monotone cost: more rows per band => no more candidates
    val byRows = got.sortBy(_.getInt(1)).map(_.getLong(2))
    assert(byRows.zip(byRows.tail).forall { case (a, c) => a >= c })
  }

  test("conversion lag: nearest-rank percentile replay per funnel edge") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val signup = evs.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val got = operators.EventAnalytics.eventsConversionLag(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == operators.EventAnalytics.convLagEdges.toSet)
    operators.EventAnalytics.convLagEdges.foreach { dst =>
      val lags = evs.filter(e => e._2 == dst && signup.contains(e._1))
        .groupBy(_._1).toSeq.flatMap { case (u, xs) =>
          val ts = xs.map(_._3).filter(_ >= signup(u))
          if (ts.isEmpty) None else Some((u, ts.min - signup(u)))
        }
      val r = got(dst)
      assert(r.getLong(1) == signup.size.toLong)
      assert(r.getLong(2) == lags.size.toLong, dst)
      if (lags.nonEmpty) {
        val n = lags.size.toLong
        assert(r.getLong(3) == n * 1000000L / signup.size)
        assert(r.getLong(4) == lags.map(l => BigInt(l._2)).sum / n)
        val sorted = lags.sortBy(l => (l._2, l._1)).map(_._2)
        operators.EventAnalytics.convLagPcts.zipWithIndex.foreach {
          case (p, i) =>
            val rk = math.max(1L, (p * n + 99) / 100)
            assert(r.getLong(5 + i) == sorted((rk - 1).toInt), s"$dst p$p")
        }
      }
    }
  }

  test("sample coverage: PSI replay of the most-recent top-100 sample") {
    def q(d: Double): BigDecimal =
      BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("t"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val sample = evs.sortBy(e => (-e._2, -e._1))
      .take(profile.Sampler.coverageN)
    val full = evs.groupBy(_._3).map { case (k, v) => k -> v.length }
    val samp = sample.groupBy(_._3).map { case (k, v) => k -> v.length }
    val b = full.size
    val nf = evs.length.toDouble
    val ns = sample.length.toDouble
    val psi = full.map { case (bin, f) =>
      val s = samp.getOrElse(bin, 0)
      val pf = (f + 0.5) / (nf + 0.5 * b)
      val ps = (s + 0.5) / (ns + 0.5 * b)
      q((ps - pf) * math.log(ps / pf))
    }.sum
    val rows = profile.Sampler.sampleCoverage(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("events", "orders", "lineitem"))
    val ev = rows("events")
    assert(ev.getLong(2) == evs.length.toLong)
    assert(ev.getLong(3) == sample.length.toLong)
    assert(ev.getLong(4) == b.toLong)
    assert(math.abs(ev.getDouble(5) - psi.toDouble) < 1e-9)
    assert(ev.getBoolean(6) == (psi > BigDecimal("0.1")))
    assert(ev.getBoolean(7) == (psi > BigDecimal("0.25")))
    rows.values.foreach { r =>
      assert(r.getLong(3) == profile.Sampler.coverageN.toLong)
      assert(r.getLong(4) > 0)
    }
  }

  test("lexical diversity: integer TTR/hapax replay from raw text") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getString(1), r.getString(2).split(" ", -1).filter(_.nonEmpty)))
      .filter(_._2.nonEmpty)
    val bySrc = docs.groupBy(_._1)
    val got = text.TextStats.lexicalDiversity(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == bySrc.keySet)
    got.foreach { r =>
      val ds = bySrc(r.getString(0)).map(_._2)
      val toks = ds.map(_.length.toLong).sum
      val types = ds.flatten.distinct.length.toLong
      val srcCounts = ds.flatten.groupBy(identity).map(_._2.length)
      val hapax = srcCounts.count(_ == 1).toLong
      val ttrSum = ds.map(w => w.distinct.length.toLong * 1000000L / w.length).sum
      assert(r.getLong(1) == ds.length.toLong)
      assert(r.getLong(2) == toks)
      assert(r.getLong(3) == types)
      assert(r.getLong(4) == types * 1000000L / toks)
      assert(r.getLong(5) == hapax * 1000000L / types)
      assert(r.getLong(6) == ttrSum / ds.length)
    }
  }
}
