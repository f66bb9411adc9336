package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.profile.Profiler
import graft.streaming.StreamOps

class ProfilerSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("approx profile tracks the exact profile within sketch error") {
    val exact = Profiler.profileLineitem(spark, sf).collect()
      .map(r => r.getAs[String]("column_name") -> r.getAs[Long]("n_distinct")).toMap
    val approx = Profiler.profileLineitemApprox(spark, sf).collect()
    approx.foreach { r =>
      val c = r.getAs[String]("column_name")
      val got = r.getAs[Long]("approx_distinct")
      val want = exact(c)
      assert(math.abs(got - want) <= math.max(2, (want * 0.05).toLong),
        s"$c: approx $got vs exact $want")
    }
  }

  test("column entropy matches a driver-side recompute; bounds hold") {
    val rows = Profiler.profileEntropy(spark, sf).collect()
    assert(rows.length == Profiler.entropyCols.length)
    rows.foreach { r =>
      val (t, c) = (r.getAs[String]("table_name"), r.getAs[String]("column_name"))
      val counts = Tables.table(spark, sf, t).groupBy(col(c)).count()
        .collect().map(_.getLong(1))
      val n = counts.sum.toDouble
      // recompute with the same DECIMAL(18,9) term quantization
      val ent = counts.map { k =>
        BigDecimal(-(k / n) * math.log(k / n))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      val got = r.getAs[Double]("entropy_nats")
      assert(math.abs(got - ent) < 1e-9, s"$t.$c: $got vs $ent")
      assert(r.getAs[Long]("n_distinct") == counts.length)
      // 0 <= H <= ln(n_distinct); ratio in [0, 1]
      // per-term HALF_UP quantization can exceed the analytic bound
      // by ~|values|*5e-10 on uniform distributions
      assert(got >= 0.0 && got <= math.log(counts.length.toDouble) + 1e-6)
      val ratio = r.getAs[Double]("entropy_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0 + 1e-6, s"$t.$c ratio $ratio")
    }
  }

  test("resize geometry: aspect preserved, never upscaled past the box") {
    import graft.mm.Multimodal
    val rows = Multimodal.resizeMeta(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
      val pm = r.getAs[Long]("scale_pm")
      assert(ow <= Multimodal.resizeMaxW && oh <= Multimodal.resizeMaxH)
      assert(pm == math.min(Multimodal.resizeMaxW * 1000L / w,
        Multimodal.resizeMaxH * 1000L / h))
      assert(ow == w * pm / 1000 && oh == h * pm / 1000)
      assert(r.getAs[Boolean]("downscaled") == (pm < 1000))
    }
  }

  test("pairwise correlations agree with Spark's built-in corr to float tolerance") {
    val rows = Profiler.profileCorrelations(spark, sf).collect()
    assert(rows.length == Profiler.corrCols.combinations(2).size)
    val li = Tables.lineitem(spark, sf)
    rows.foreach { r =>
      val (x, y) = (r.getAs[String]("col_x"), r.getAs[String]("col_y"))
      // corr_r presents the raw double since the r13 reversal (the r12
      // DECIMAL(18,9) quantization was itself the driver-gate seam)
      val got = r.getAs[Double]("corr_r")
      assert(got >= -1.0000001 && got <= 1.0000001, s"$x/$y out of range: $got")
      // built-in corr uses double accumulation (order-dependent), so
      // compare loosely — the operator's decimal-exact path is the oracle
      val ref = li.agg(corr(col(x), col(y))).collect()(0).getDouble(0)
      assert(math.abs(got - ref) < 1e-6, s"$x/$y: $got vs $ref")
    }
  }

  test("sql dot_product is registered via GraftExtensions") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").collect()(0)
    assert(r.getDouble(0) == 11.0)
  }

  test("native session_window agg matches ts-ordered gap sessionization counts") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf)
    val sessions = StreamOps.sessionWindowAgg(ev)  // batch mode: same API
    // expected: classic gap sessionization ordered by event time
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = ev
      .withColumn("gap", when(unix_micros(col("ts")) -
        lag(unix_micros(col("ts")), 1).over(w) > 30L * 60 * 1000000, 1L)
        .otherwise(when(lag(col("ts"), 1).over(w).isNull, 1L).otherwise(0L)))
      .withColumn("sid", sum(col("gap")).over(run))
      .groupBy(col("user_id"), col("sid")).count()
    assert(sessions.count() == expected.count())
    val nEvents = sessions.agg(sum("n_events")).collect()(0).getLong(0)
    assert(nEvents == ev.count())
  }

  test("quality_ingestion_gaps matches a driver-side calendar recompute") {
    val rows = Profiler.qualityIngestionGaps(spark, sf).collect()
      .map(r => r.getAs[String]("table_name") -> r).toMap
    assert(rows.keySet == Set("events", "lineitem", "orders"))
    val dayUs = 86400000000L
    for ((t, c) <- Seq(("events", "ts"), ("lineitem", "l_shipdate"),
        ("orders", "o_orderdate"))) {
      val days = Tables.table(spark, sf, t)
        .select(unix_micros(date_trunc("day", col(c))).as("d"))
        .distinct().collect().map(_.getLong(0)).sorted
      val gaps = days.zip(days.tail).map { case (a, b) => (b - a) / dayUs - 1 }
        .filter(_ > 0)
      val r = rows(t)
      assert(r.getAs[Long]("n_days_present") == days.length.toLong, s"$t present")
      val expected = (days.last - days.head) / dayUs + 1
      assert(r.getAs[Long]("n_days_expected") == expected, s"$t expected")
      assert(r.getAs[Long]("n_days_missing") == expected - days.length, s"$t missing")
      assert(r.getAs[Long]("n_gaps") == gaps.length.toLong, s"$t gap runs")
      assert(r.getAs[Long]("longest_gap_days") ==
        (if (gaps.isEmpty) 0L else gaps.max), s"$t longest")
      // gap runs reconcile with the missing total
      assert(gaps.sum == expected - days.length)
    }
    // the fixture is non-trivial: the order tables really have holes
    assert(rows("orders").getAs[Long]("n_gaps") > 0)
  }

  test("profile_incremental: slice-merged stats equal direct stats, proof bit set") {
    import graft.profile.IncrementalProfile
    val rows = IncrementalProfile.profileIncremental(spark, sf).collect()
    assert(rows.map(_.getAs[String]("column_name")).toSeq ==
      IncrementalProfile.profCols.sorted)
    val li = Tables.lineitem(spark, sf)
    val nRows = li.count()
    val nSlices = li.select(date_trunc("month", col("l_shipdate"))).distinct().count()
    rows.foreach { r =>
      val c = r.getAs[String]("column_name")
      assert(r.getAs[Boolean]("merge_ok"), s"$c merge proof")
      assert(r.getAs[Long]("n_rows") == nRows)
      assert(r.getAs[Long]("n_slices") == nSlices)
      // merged decimal sum equals a driver-side exact recompute
      val vals = li.select(col(c)).collect().map(_.getDouble(0))
      val want = vals.map(v => java.math.BigDecimal.valueOf(v)
          .setScale(4, java.math.RoundingMode.HALF_UP))
        .reduce(_ add _).doubleValue
      assert(r.getAs[Double]("sum_v") == want, s"$c sum")
      assert(r.getAs[Double]("min_v") == vals.min && r.getAs[Double]("max_v") == vals.max)
    }
  }

  test("sample_weighted: priority sample matches a driver-side DLT recompute") {
    import graft.profile.Sampler
    val rows = Sampler.weightedPriority(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_chars")))
    val mdt = java.security.MessageDigest.getInstance("MD5")
    def key(docId: Long, w: Long): Long = {
      val hex = mdt.digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      (java.lang.Long.parseLong(hex, 16) + 1) * 1000 / math.max(w, 1L)
    }
    val k = Sampler.prioK
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val ranked = ds.map { case (_, id, w) => (key(id, w), id, math.max(w, 1L)) }
        .sortBy(t => (t._1, t._2))
      val expect = ranked.take(k)
      val tauKey = if (ranked.length > k) Some(ranked(k)._1) else None
      val got = rows.filter(_.getAs[String]("source") == src)
        .sortBy(_.getAs[Int]("rank"))
      assert(got.map(_.getAs[Long]("doc_id")).toSeq == expect.map(_._2).toSeq,
        s"source $src sample membership/order")
      got.zip(expect).foreach { case (r, (ek, _, ew)) =>
        assert(r.getAs[Long]("sample_key") == ek)
        assert(r.getAs[Long]("weight") == ew)
        val wHat = tauKey match {
          case Some(t) => math.max(ew, 281474976710656000L / t)
          case None    => ew
        }
        assert(r.getAs[Long]("w_hat") == wHat, s"source $src doc ${r.getAs[Long]("doc_id")} w_hat")
      }
      // DLT unbiasedness device: every kept w_hat >= its own weight
      assert(got.forall(r => r.getAs[Long]("w_hat") >= r.getAs[Long]("weight")))
    }
  }
}
