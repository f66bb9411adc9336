package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object TestSession {
  lazy val spark: SparkSession = GraftSession("local[4]", shufflePartitions = 4)
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import graft.operators.Relational
  lazy val spark: SparkSession = TestSession.spark
  def sf: String = TestSession.sf

  test("q1 aggregates every unfiltered lineitem row exactly once") {
    val rows = Relational.q1PricingSummary(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total == expected)
  }

  test("q3 returns at most 10 rows in strictly descending revenue") {
    val rows = Relational.q3ShippingPriority(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q_top_customers_window yields exactly 3 per segment") {
    val rows = Relational.qTopCustomersWindow(spark, sf).collect()
    val bySeg = rows.groupBy(_.getAs[String]("c_mktsegment"))
    assert(bySeg.values.forall(_.length == 3))
  }

  test("q_rollup_orders grand total equals table count") {
    val rows = Relational.qRollupOrders(spark, sf).collect()
    val grand = rows.find(r => r.getAs[String]("status") == "ALL" &&
      r.getAs[String]("priority") == "ALL").get
    assert(grand.getAs[Long]("n_orders") == Tables.orders(spark, sf).count())
  }

  test("q_sessionize: session event counts sum to total events") {
    val n = Relational.qSessionize(spark, sf)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(n == Tables.events(spark, sf).count())
  }

  test("q_user_paths: transitions sum to events minus users; probs sum to ~1e6 per src") {
    import graft.operators.EventAnalytics
    val rows = EventAnalytics.qUserPaths(spark, sf).collect()
    val nTrans = rows.map(_.getAs[Long]("n_transitions")).sum
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    // each user with k events contributes exactly k-1 transitions
    assert(nTrans == nEvents - nUsers)
    rows.groupBy(_.getAs[String]("src_event")).foreach { case (src, rs) =>
      val pSum = rs.map(_.getAs[Long]("p_e6")).sum
      // floor division: sum is within n_dst of exactly one million
      assert(pSum <= 1000000L && pSum > 1000000L - rs.length, s"src $src: $pSum")
    }
  }

  test("spend deciles: Lorenz curve is convex-increasing and reconciles") {
    import graft.operators.Relational2
    val rows = Relational2.qSpendDeciles(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    assert(rows.map(_.getAs[Long]("n_customers")).sum ==
      Tables.orders(spark, sf).select("o_custkey").distinct().count())
    val shares = rows.map(_.getAs[Long]("share_ppm"))
    // deciles ordered by spend: shares are non-decreasing (Lorenz convexity)
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a }, shares.toSeq.toString)
    val cum = rows.map(_.getAs[Long]("cum_share_ppm"))
    assert(cum.zip(cum.tail).forall { case (a, b) => b >= a })
    assert(cum.last == 1000000L) // the full cumulative is exactly 100%
    // cumulative is the running sum of shares up to ppm-floor slack
    cum.zip(shares.scanLeft(0L)(_ + _).tail).foreach { case (c, s) =>
      assert(math.abs(c - s) <= 10, s"$c vs $s")
    }
  }

  test("rfm segments partition the customer base into balanced quintiles") {
    import graft.operators.Relational2
    val rows = Relational2.qRfm(spark, sf).collect()
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    // every score is 1..5 and each dimension's quintiles are balanced
    // (ntile: sizes differ by at most 1)
    for (dim <- Seq("r_score", "f_score", "m_score")) {
      val perScore = rows.groupBy(_.getAs[Int](dim))
        .view.mapValues(_.map(_.getAs[Long]("n_customers")).sum).toMap
      assert(perScore.keySet == (1 to 5).toSet, dim)
      assert(perScore.values.max - perScore.values.min <= 1, s"$dim $perScore")
    }
    // revenue reconciles with the raw table
    val rev = rows.map(_.getAs[Double]("segment_revenue")).sum
    val want = Tables.orders(spark, sf)
      .agg(sum(col("o_totalprice").cast("decimal(14,2)")).cast("double"))
      .collect()(0).getDouble(0)
    assert(math.abs(rev - want) < 1e-6 * math.abs(want))
  }

  test("events_rate_anomaly flags a planted spike; stats match brute force") {
    import graft.operators.EventAnalytics
    def ts(min: Int, k: Int) =
      new java.sql.Timestamp(1700000000000L + min * 60000L + k * 100L)
    // 19 flat-ish minutes (4/6 alternating), then a 40-event spike
    val rows = (0 until 19).flatMap { m =>
      (0 until (if (m % 2 == 0) 4 else 6)).map(k => (ts(m, k), "click"))
    } ++ (0 until 40).map(k => (ts(19, k), "click"))
    import spark.implicits._
    val out = EventAnalytics.rateAnomalyOf(rows.toDF("ts", "event_type")).collect()
    assert(out.length == 3) // top-3 windows for the single type
    val spike = out.maxBy(r => math.abs(r.getAs[Double]("z")))
    assert(spike.getAs[Long]("cnt") == 40 && spike.getAs[Boolean]("is_anomaly"))
    // brute-force stats over the 20 windows
    val cnts = (0 until 19).map(m => if (m % 2 == 0) 4.0 else 6.0) :+ 40.0
    val mean = cnts.sum / cnts.length
    val std = math.sqrt(cnts.map(c => c * c).sum / cnts.length - mean * mean)
    assert(math.abs(spike.getAs[Double]("mean_cnt") - mean) < 1e-12)
    assert(math.abs(spike.getAs[Double]("std_cnt") - std) < 1e-12)
    assert(math.abs(spike.getAs[Double]("z") - (40.0 - mean) / std) < 1e-12)
    // non-spike flat windows are not anomalous
    out.filter(_.getAs[Long]("cnt") <= 6).foreach(r =>
      assert(!r.getAs[Boolean]("is_anomaly")))
  }

  test("q_asof_join picks the max qualifying order (brute-force check)") {
    val got = Relational.qAsofJoin(spark, sf)
    val ev = Tables.events(spark, sf).select(col("event_id"),
      col("user_id"), unix_micros(col("ts")).as("t_us"))
    val ord = Tables.orders(spark, sf).select(col("o_custkey"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"), col("o_orderkey"))
    val brute = ev.join(ord,
        col("user_id") === col("o_custkey") && col("od_us") <= col("t_us"), "left")
      .groupBy(col("event_id"))
      .agg(max(struct(col("od_us"), col("o_orderkey"))).getField("o_orderkey").as("bk"))
    val diff = got.select(col("event_id"), col("asof_orderkey"))
      .join(brute, "event_id")
      .filter(!(col("asof_orderkey") <=> col("bk")))
      .count()
    assert(diff == 0)
  }

  test("q_range_join pair count matches brute-force inequality join") {
    val got = Relational.qRangeJoin(spark, sf)
      .agg(sum("n_pairs")).collect()(0).getLong(0)
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("t_us"))
    val b = ev.select(col("event_id").as("id_b"), col("t_us").as("t_b"))
    val brute = ev.crossJoin(b)
      .filter(col("event_id") < col("id_b") &&
        abs(col("t_b") - col("t_us")) <= 60L * 1000000).count()
    assert(got == brute)
  }

  test("scd2 history: intervals tile each user's timeline; runs match a driver fold") {
    import graft.operators.EventAnalytics
    val rows = EventAnalytics.scd2History(spark, sf).collect()
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"),
        col("event_id")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("t"), r.getAs[Long]("event_id")))
    val byUser = evs.groupBy(_._1)
    val gotByUser = rows.groupBy(_.getAs[Long]("user_id"))
    assert(gotByUser.keySet == byUser.keySet)
    byUser.foreach { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._4))
      // driver-side run-length fold over (state) changes
      val runs = sorted.foldLeft(Vector.empty[(String, Long, Long)]) {
        case (acc, (_, st, t, _)) =>
          if (acc.nonEmpty && acc.last._1 == st)
            acc.init :+ ((st, acc.last._2, acc.last._3 + 1))
          else acc :+ ((st, t, 1L))
      }
      val got = gotByUser(u).sortBy(_.getAs[Long]("run_id"))
      assert(got.length == runs.length, s"user $u run count")
      got.zip(runs).zipWithIndex.foreach { case ((r, (st, from, n)), i) =>
        assert(r.getAs[Long]("run_id") == i + 1)
        assert(r.getAs[String]("state") == st, s"user $u run ${i + 1}")
        assert(r.getAs[Long]("valid_from_us") == from)
        assert(r.getAs[Long]("n_events") == n)
        // intervals tile: valid_to == next run's valid_from; last is open
        if (i < runs.length - 1)
          assert(r.getAs[Long]("valid_to_us") == runs(i + 1)._2)
        else {
          assert(r.isNullAt(r.fieldIndex("valid_to_us")))
          assert(r.getAs[Boolean]("is_current"))
        }
      }
      assert(got.count(_.getAs[Boolean]("is_current")) == 1, s"user $u one open run")
    }
  }

  test("events_seasonality: 168-bounded cells, shares sum to ~1e6, brute check") {
    import graft.operators.EventAnalytics
    val rows = EventAnalytics.qSeasonality(spark, sf).collect()
    assert(rows.length <= 168)
    val evs = Tables.events(spark, sf)
      .select(dayofweek(col("ts")).as("d"), hour(col("ts")).as("h"), col("user_id"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getAs[Long]("user_id")))
    val total = evs.length.toLong
    val byCell = evs.groupBy(e => (e._1, e._2))
    assert(rows.length == byCell.size)
    rows.foreach { r =>
      val k = (r.getAs[Int]("dow"), r.getAs[Int]("hod"))
      assert(r.getAs[Long]("n_events") == byCell(k).length.toLong, s"cell $k")
      assert(r.getAs[Long]("n_users") == byCell(k).map(_._3).distinct.length.toLong)
      assert(r.getAs[Long]("share_ppm") == byCell(k).length.toLong * 1000000L / total)
    }
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shareSum > 1000000L - rows.length && shareSum <= 1000000L)
  }

  test("q_order_backlog: sweep-line curve matches a brute per-day interval count") {
    import graft.operators.EventAnalytics
    val rows = EventAnalytics.qOrderBacklog(spark, sf).collect()
    val dayUs = 86400000000L
    val close = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(max(unix_micros(date_trunc("day", col("l_shipdate")))).as("c")).collect()
      .map(r => r.getAs[Long]("l_orderkey") -> r.getAs[Long]("c")).toMap
    val intervals = Tables.orders(spark, sf)
      .select(col("o_orderkey"), unix_micros(date_trunc("day", col("o_orderdate"))).as("o"))
      .collect().flatMap(r => close.get(r.getAs[Long]("o_orderkey"))
        .map(c => (r.getAs[Long]("o"), math.max(c, r.getAs[Long]("o")))))
    assert(rows.nonEmpty && intervals.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("day_us")
      // backlog at END of day d: opened on or before d, not yet closed by d
      val brute = intervals.count { case (o, c) => o <= d && c > d }.toLong
      assert(r.getAs[Long]("backlog") == brute, s"day $d")
      assert(r.getAs[Long]("n_opened") == intervals.count(_._1 == d).toLong)
      assert(r.getAs[Long]("n_closed") == intervals.count(_._2 == d).toLong)
    }
    // the curve starts and ends at zero net flight
    assert(rows.last.getAs[Long]("backlog") == 0L)
  }

  test("q_sliding_distinct matches a brute per-day trailing-window recompute") {
    import graft.operators.EventAnalytics
    val rows = EventAnalytics.qSlidingDistinct(spark, sf).collect()
    val dayUs = 86400000000L
    val pairs = Tables.events(spark, sf)
      .select(unix_micros(date_trunc("day", col("ts"))).as("d"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[Long]("user_id")))
    val days = pairs.map(_._1).distinct.sorted
    assert(rows.map(_.getAs[Long]("day_us")).toSeq == days.toSeq)
    rows.foreach { r =>
      val d = r.getAs[Long]("day_us")
      val dau = pairs.filter(_._1 == d).map(_._2).distinct.length.toLong
      val wau = pairs.filter(p => p._1 > d - EventAnalytics.slideDays * dayUs && p._1 <= d)
        .map(_._2).distinct.length.toLong
      assert(r.getAs[Long]("users_1d") == dau, s"day $d dau")
      assert(r.getAs[Long]("users_7d") == wau, s"day $d wau")
      assert(r.getAs[Long]("dau_wau_ppm") == dau * 1000000L / wau)
    }
  }
}
