package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EventAnalytics, GraphOps}

/** Independent driver-side recomputes for the round-9 operator wave
  * (the DuckDB gate cross-checks the SQL; these cross-check the math).
  */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("burstiness: CV² recompute from per-user sorted gap replay") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gaps = evs.groupBy(e => (e._1, e._2)).toSeq.flatMap { case (_, rows) =>
      val ts = rows.sortBy(r => (r._3, r._4)).map(_._3)
      ts.zip(ts.tail).map { case (a, b) => (rows.head._2, b - a) }
    }
    val want = gaps.groupBy(_._1).map { case (t, gs) =>
      val us = gs.map(_._2)
      val sec = us.map(_ / 1000000L).map(BigInt(_))
      val n = BigInt(sec.size)
      val s1 = sec.sum
      val s2 = sec.map(g => g * g).sum
      val cv2 = if (s1 == 0) None
        else Some(((n * s2 - s1 * s1) * 1000000 / (s1 * s1)).toLong)
      t -> (us.size.toLong, us.map(BigInt(_)).sum / n, cv2)
    }
    val got = EventAnalytics.qBurstiness(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == want.keySet)
    got.foreach { r =>
      val (n, mean, cv2) = want(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == mean.toLong)
      assert((if (r.isNullAt(3)) None else Some(r.getLong(3))) == cv2)
      val regime = r.getString(4)
      cv2 match {
        case None => assert(regime == "sub_second")
        case Some(v) if v > 1500000 => assert(regime == "bursty")
        case Some(v) if v < 500000  => assert(regime == "regular")
        case _ => assert(regime == "poisson_like")
      }
    }
  }

  test("robust shape: octiles + Bowley/Moors from a full sort replay") {
    val rows = profile.Shape.shapeRobust(spark, sf).collect()
    profile.Shape.shapeCols.foreach { case (t, c) =>
      val cents = Tables.table(spark, sf, t).filter(col(c).isNotNull)
        .select(expr(s"CAST(CAST($c AS DECIMAL(12,2)) * 100 AS BIGINT)"))
        .collect().map(_.getLong(0)).sorted
      val n = cents.length.toLong
      val e = (1 to 7).map(k =>
        k -> cents((math.max(1L, (k * n + 7) / 8) - 1).toInt)).toMap
      val r = rows.find(r => r.getString(0) == t && r.getString(1) == c).get
      assert(r.getLong(2) == n)
      (1 to 7).foreach(k => assert(r.getLong(2 + k) == e(k), s"$t.$c e$k"))
      val iqr = e(6) - e(2)
      if (iqr != 0) {
        assert(r.getLong(10) == (e(6) + e(2) - 2 * e(4)) * 1000000L / iqr)
        assert(r.getLong(11) == ((e(7) - e(5)) + (e(3) - e(1))) * 1000000L / iqr)
      } else assert(r.isNullAt(10) && r.isNullAt(11))
    }
  }

  test("kcore: Scala peel-to-fixpoint replay matches membership + degree") {
    var edges = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    var changed = true
    while (changed) {
      val dc = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
      val ds = edges.groupBy(_._2).map { case (k, v) => k -> v.size }
      val next = edges.filter { case (c, s) =>
        dc(c) >= GraphOps.kcoreK && ds(s) >= GraphOps.kcoreK }
      changed = next.size != edges.size
      edges = next
    }
    val wantC = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val wantS = edges.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val got = GraphOps.kcoreQuery(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == wantC.size + wantS.size)
    wantC.foreach { case (k, d) => assert(got(("customer", k)) == d) }
    wantS.foreach { case (k, d) => assert(got(("supplier", k)) == d) }
    // every surviving node really has in-core degree >= k
    got.values.foreach(d => assert(d >= GraphOps.kcoreK))
  }

  test("source overlap: pair rollup reconciles with the raw pair list") {
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = text.Dedup.ngramPrefixJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) =>
        val (sa, sb) = (srcOf(a), srcOf(b))
        (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rows = text.Dedup.sourceOverlap(spark, sf).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet == want.keySet)
    val total = want.values.sum
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == want(k))
      assert(r.getLong(3) == want(k) * 1000000L / total)
      assert(r.getBoolean(4) == (k._1 == k._2))
    }
  }

  test("shard balance: rollup reconciles with pack_shards output") {
    val shards = text.Curation.packShards(spark, sf)
      .select(col("source"), col("shard_tokens"), col("n_docs")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = text.Curation.packShardBalance(spark, sf).collect()
    shards.groupBy(_._1).foreach { case (src, xs) =>
      val r = rows.find(_.getString(0) == src).get
      val toks = xs.map(_._2)
      assert(r.getLong(1) == xs.size)
      assert(r.getLong(2) == xs.map(_._3).sum)
      assert(r.getLong(3) == toks.sum)
      assert(r.getLong(4) == toks.min && r.getLong(5) == toks.max)
      assert(r.getLong(6) == toks.min * 1000000L / toks.max)
      assert(r.getLong(7) ==
        toks.sum * 1000000L / (xs.size * text.Curation.shardCapacity))
      // every shard obeys capacity accounting: util <= 1e6 + one doc spill
      assert(r.getLong(6) >= 0 && r.getLong(6) <= 1000000L)
    }
  }

  test("activity gini: BigInt recompute from raw per-user counts") {
    val counts = Tables.events(spark, sf).groupBy(col("user_id")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(r => (r._2, r._1)).map(_._2)
    val n = counts.length.toLong
    val s = counts.map(BigInt(_)).sum
    val sic = counts.zipWithIndex
      .map { case (c, i) => BigInt(i + 1) * c }.sum
    val r = operators.EventAnalytics.qActivityGini(spark, sf).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == s.toLong)
    assert(r.getLong(2) == ((sic * 2 - s * (n + 1)) * 1000000 /
      (BigInt(n) * s)).toLong)
    def share(k: Long): Long = {
      val kk = math.max(1L, k).toInt
      (counts.takeRight(kk).map(BigInt(_)).sum * 1000000 / s).toLong
    }
    assert(r.getLong(3) == share(n / 100))
    assert(r.getLong(4) == share(n / 10))
    // Gini sits in [0, 1e6) and top shares are monotone
    assert(r.getLong(2) >= 0 && r.getLong(2) < 1000000L)
    assert(r.getLong(3) <= r.getLong(4))
  }

  test("key growth: first-seen bookkeeping reconciles per week") {
    val rows = operators.EventAnalytics.qKeyGrowth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // new + returning = active; cum is the running sum of new; the
    // final cum equals the overall distinct-user count
    var cum = 0L
    rows.foreach { case (_, active, nw, ret, c) =>
      assert(nw + ret == active)
      cum += nw
      assert(c == cum)
    }
    val distinctUsers = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(cum == distinctUsers)
    // every user's first week contributes exactly once
    assert(rows.map(_._3).sum == distinctUsers)
  }

  test("incremental components: merge equals the full from-scratch fixpoint") {
    val full = text.Dedup.components(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val inc = text.Incremental.incrementalComponents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    assert(inc == full)
    // merge bookkeeping is consistent whether or not this SF's batch
    // straddles corpus families: batch docs exist, every multi-doc
    // family is correctly sized, and any family containing a batch doc
    // got the right (global-min) canon
    val isBatch = Tables.documents(spark, sf)
      .select(col("doc_id"), expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)" +
          " as bigint) % 10 = 0").as("b"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(isBatch.values.count(identity) > 0)
    val fams = inc.groupBy(_._2)
    fams.foreach { case (canon, members) =>
      assert(members.forall(_._3 == members.size))
      assert(canon == members.map(_._1).min)
    }
    // report (not require) straddling — at tiny SFs the dup families can
    // land entirely in the corpus slice; equality-to-full above is the
    // real invariant either way
    val straddling = fams.count { case (_, ms) =>
      ms.size > 1 && ms.exists(m => isBatch(m._1)) &&
        ms.exists(m => !isBatch(m._1))
    }
    info(s"families straddling batch/corpus at this SF: $straddling")
  }

  test("threshold sweep: band classification from brute-force pairs") {
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .collect { case (d, t) if t.length >= 3 =>
        d -> t.sliding(3).map(_.mkString(" ")).toSet
      }.toSeq
    val edges = Seq((1L, 2L), (3L, 5L), (7L, 10L), (4L, 5L), (9L, 10L),
      (1L, 1L))
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      common = (sa & sb).size.toLong
      u = sa.size + sb.size - common
      if u > 0 && common * 2 >= u
    } yield edges.lastIndexWhere { case (n, d) => common * d >= u * n })
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = text.Dedup.thresholdSweep(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val labels = text.Dedup.sweepBands.map(_._3)
    assert(got.map(r => labels.indexOf(r._1) -> r._2).toMap == want)
    // cumulative is a suffix sum and the top band's cum equals its count
    val byIdx = got.map(r => labels.indexOf(r._1) -> r).toMap
    byIdx.foreach { case (i, r) =>
      assert(r._3 == byIdx.filter(_._1 >= i).values.map(_._2).sum)
    }
  }

  test("transition entropy: decimal-term recompute from raw transitions") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime,
        r.getLong(3)))
    val trans = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val seq = rows.sortBy(r => (r._3, r._4)).map(_._2)
      seq.zip(seq.tail)
    }.groupBy(identity).map { case ((s, d), xs) => (s, d, xs.size.toLong) }
    val want = trans.groupBy(_._1).map { case (src, cells) =>
      val tot = cells.map(_._3).sum.toDouble
      val ent = cells.map { c =>
        val p = c._3 / tot
        BigDecimal(-p * math.log(p))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      src -> (cells.size.toLong, cells.map(_._3).sum, ent)
    }
    val got = operators.EventAnalytics.qTransitionEntropy(spark, sf)
      .collect()
    assert(got.map(_.getString(0)).toSet == want.keySet)
    got.foreach { r =>
      val (nOut, nTr, ent) = want(r.getString(0))
      assert(r.getLong(1) == nOut && r.getLong(2) == nTr)
      assert(math.abs(r.getDouble(3) - ent.toDouble) < 1e-9)
      if (nOut > 1)
        assert(math.abs(r.getDouble(4) -
          r.getDouble(3) / math.log(nOut.toDouble)) < 1e-6)
      else assert(r.getDouble(4) == 0.0)
    }
  }

  test("apportionment: quotas sum to the budget exactly, Hamilton rule") {
    val rows = text.Curation.mixApportion(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5)))
    assert(rows.map(_._6).sum == text.Curation.apportionBudget)
    // the +1s go to exactly the largest remainders (source tiebreak)
    val leftover = text.Curation.apportionBudget - rows.map(_._3).sum
    val byRem = rows.sortBy(r => (-r._4, r._1))
    byRem.zipWithIndex.foreach { case (r, i) =>
      assert(r._5 == (i < leftover), s"${r._1}")
      assert(r._6 == r._3 + (if (r._5) 1L else 0L))
    }
    // quota proportionality: each source within 1 of its exact share
    val tot = rows.map(r => BigInt(r._2)).sum
    rows.foreach { r =>
      val exact = BigInt(text.Curation.apportionBudget) * r._2 / tot
      assert((r._6 - exact.toLong).abs <= 1L)
    }
  }

  test("minhash estimate: estimator bookkeeping + exact side is exact") {
    val rows = text.Dedup.minhashEstimate(spark, sf).collect()
    assert(rows.nonEmpty)
    // exact side replays brute-force Jaccard from raw text
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .collect { case (d, t) if t.length >= 3 =>
        d -> t.sliding(3).map(_.mkString(" ")).toSet
      }.toMap
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val m = r.getLong(2)
      assert(m >= 0 && m <= text.Dedup.nPerms)
      assert(r.getLong(3) == m * 1000000L / text.Dedup.nPerms)
      val common = (sets(a) & sets(b)).size.toLong
      val union = sets(a).size + sets(b).size - common
      val exact = if (union == 0) 0L else common * 1000000L / union
      assert(r.getLong(4) == exact, s"pair ($a,$b)")
      assert(r.getLong(5) == r.getLong(3) - r.getLong(4))
    }
    // calibration sanity: banded candidates are high-similarity pairs,
    // so the mean absolute estimator error stays far below the 50%
    // band-threshold region (32 perms → σ ≈ 1/√32 ≈ 0.18 worst-case)
    val mae = rows.map(r => math.abs(r.getLong(5))).sum / rows.length
    assert(mae < 200000L, s"mean |err| $mae ppm")
  }
}
