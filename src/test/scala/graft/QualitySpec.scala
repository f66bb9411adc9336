package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.profile.{Quality, Redactor}

class QualitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  def sf: String = TestSession.sf

  test("format classifier matches the reference heuristics on crafted values") {
    val cases = Seq(
      ("550e8400-e29b-41d4-a716-446655440000", "uuid"),
      ("2024-01-01T12:00:00Z", "iso_datetime"),
      ("2024-01-01", "iso_date"),
      ("user@example.com", "email"),
      ("550e8400-e29b-41d4-a716-44665544000Z", "none"), // non-hex char
      ("not an email @ all", "none"),                   // '@' but no '.': wait, has spaces+no dot
      ("plain text", "none"))
    val df = cases.toDF("v", "expected")
      .withColumn("got", expr(Quality.classifySql("v")))
    val bad = df.filter(col("got") =!= col("expected")).collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("classifier precedence: uuid-shaped beats email, empty is null") {
    val df = Seq("", "a@b.c-d").toDF("v")
      .withColumn("got", expr(Quality.classifySql("v")))
    val got = df.collect().map(_.getAs[String]("got"))
    assert(got(0) == null)       // empty string → no classification
    assert(got(1) == "email")
  }

  test("balanced redaction masks sensitive names, keeps others, skips non-strings") {
    val df = Seq((1L, "hunter2", "a@b.com", "alice", 9.5))
      .toDF("user_id", "password_hash", "email_addr", "nickname", "score")
    val out = Redactor.redact(df, Redactor.Balanced).collect()(0)
    assert(out.getAs[String]("password_hash") == Redactor.Redacted) // minimal pattern
    assert(out.getAs[String]("email_addr") == Redactor.Redacted)    // balanced pattern
    assert(out.getAs[String]("nickname") == "alice")
    assert(out.getAs[Long]("user_id") == 1L)
    assert(out.getAs[Double]("score") == 9.5)
  }

  test("conservative redaction keeps safe keys and timestamp-looking values") {
    val df = Seq(("u1", "2024-01-01", "free text", "k-9"))
      .toDF("session_id", "created_at", "bio", "codename")
    val out = Redactor.redact(df, Redactor.Conservative).collect()(0)
    assert(out.getAs[String]("session_id") == "u1")      // *_id safe
    assert(out.getAs[String]("created_at") == "2024-01-01")
    assert(out.getAs[String]("bio") == Redactor.Redacted)
    assert(out.getAs[String]("codename") == "k-9")       // contains '-' → timestamp-ish
  }

  test("quality_score components are all in [0,1] and score is their mean") {
    val row = Quality.score(spark, sf).collect()(0)
    val c = row.getAs[Double]("completeness")
    val u = row.getAs[Double]("uniqueness")
    val k = row.getAs[Double]("consistency")
    val s = row.getAs[Double]("quality_score")
    for (x <- Seq(c, u, k, s)) assert(x >= 0.0 && x <= 1.0)
    assert(math.abs(s - (c + u + k) / 3.0) < 1e-12)
  }

  test("ks drift matches a driver-side grid-ECDF recomputation") {
    val rows = Quality.ksDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select("event_id", "event_type", "value").collect()
      .filter(!_.isNullAt(2))
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      // r6: grid from the type's OWN [min,max] (per-type sensitivity fix)
      val tv = ev.filter(_._2 == t).map(_._3)
      val (vmin, vmax) = (tv.min, tv.max)
      val grid = (0 until Quality.ksGridPoints)
        .map(k => vmin + (vmax - vmin) * (k.toDouble / (Quality.ksGridPoints - 1)))
      val ref = ev.filter(e => e._2 == t && e._1 % 2 == 0).map(_._3)
      val cur = ev.filter(e => e._2 == t && e._1 % 2 == 1).map(_._3)
      assert(r.getAs[Long]("n_ref") == ref.length && r.getAs[Long]("n_cur") == cur.length)
      val d = grid.map { g =>
        math.abs(ref.count(_ <= g).toDouble / ref.length -
          cur.count(_ <= g).toDouble / cur.length)
      }.max
      val got = r.getAs[Double]("ks_d")
      assert(math.abs(got - d) < 1e-12, s"$t: $got vs $d")
      assert(got >= 0.0 && got <= 1.0)
      // A/B halves of the same synthetic distribution: no gross drift
      // (bound is loose — per-type samples are small at sf0.001)
      assert(got < 0.5, s"$t unexpectedly large drift $got")
    }
  }

  test("temporal completeness reconciles with the whole-table null counts") {
    val rows = Quality.completenessTemporal(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.events(spark, sf).count()
    val totalNull = Tables.events(spark, sf).filter(col("value").isNull).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
    assert(rows.map(_.getAs[Long]("n_null_value")).sum == totalNull)
    rows.foreach { r =>
      assert(r.getAs[Long]("null_ppm") ==
        r.getAs[Long]("n_null_value") * 1000000L / r.getAs[Long]("n_events"))
    }
  }

  test("mad outliers match a driver-side median/MAD recompute") {
    val rows = Quality.outlierMad(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf).select("event_type", "value").collect()
      .filter(!_.isNullAt(1))
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value")))
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      // interpolated (type-7) median — what percentile/quantile_cont compute
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val vals = ev.filter(_._1 == t).map(_._2).toSeq
      val med = medianOf(vals)
      val mad = medianOf(vals.map(v => math.abs(v - med)))
      assert(math.abs(r.getAs[Double]("med") - med) < 1e-9, s"$t med")
      assert(math.abs(r.getAs[Double]("mad") - mad) < 1e-9, s"$t mad")
      val nOut = vals.count(v => math.abs(0.6745 * (v - med) / mad) > 3.5)
      assert(r.getAs[Long]("n_outliers") == nOut, s"$t outliers")
      assert(r.getAs[Long]("n") == vals.length)
    }
  }

  test("benford digit profile: shares sum to ~1e6, expecteds match the constant table") {
    val rows = Quality.benford(spark, sf).collect()
    assert(rows.map(_.getAs[String]("digit")).toSet.subsetOf((1 to 9).map(_.toString).toSet))
    assert(rows.map(_.getAs[Long]("n_rows")).sum == Tables.lineitem(spark, sf).count())
    val obsSum = rows.map(_.getAs[Long]("obs_ppm")).sum
    assert(obsSum <= 1000000L && obsSum > 1000000L - rows.length)
    rows.foreach { r =>
      val d = r.getAs[String]("digit").toInt
      assert(r.getAs[Long]("exp_ppm") == Quality.benfordExpectedPpm(d))
      assert(r.getAs[Long]("dev_ppm") ==
        r.getAs[Long]("obs_ppm") - r.getAs[Long]("exp_ppm"))
    }
    // the Benford expectation table itself sums to ~1e6
    assert(math.abs(Quality.benfordExpectedPpm.values.sum - 1000000L) <= 5)
  }

  test("anomaly stddev matches Spark's stddev_pop within fp tolerance") {
    val got = Quality.anomaly(spark, sf)
      .filter(col("table_name") === "events" && col("column_name") === "value")
      .collect()(0)
    val ref = Tables.events(spark, sf)
      .agg(stddev_pop(col("value")), avg(col("value"))).collect()(0)
    assert(math.abs(got.getAs[Double]("std_dev") - ref.getDouble(0)) < 1e-6)
    assert(math.abs(got.getAs[Double]("mean") - ref.getDouble(1)) < 1e-6)
  }

  test("sensitivity tiers are monotone: High flags at least as many as Low") {
    def outliers(sigma: Double): Long =
      Quality.anomalyWith(spark, sf, sigma).collect()
        .map(_.getAs[Long]("n_outliers")).sum
    val lo = outliers(Quality.Sensitivity.Low)     // 3.0σ
    val med = outliers(Quality.Sensitivity.Medium) // 2.5σ
    val hi = outliers(Quality.Sensitivity.High)    // 2.0σ
    assert(hi >= med && med >= lo)
    assert(hi > lo, "tiers should separate on this data")
  }

  test("score weights shift the composite toward the weighted component") {
    def scoreOf(w: Quality.ScoreWeights): (Double, Double, Double, Double) = {
      val r = Quality.scoreWith(spark, sf, w).collect()(0)
      (r.getAs[Double]("completeness"), r.getAs[Double]("uniqueness"),
        r.getAs[Double]("consistency"), r.getAs[Double]("quality_score"))
    }
    val (c, u, n, equal) = scoreOf(Quality.ScoreWeights())
    assert(math.abs(equal - (c + u + n) / 3.0) < 1e-12)
    // all weight on one component reproduces that component exactly
    val (_, _, _, onlyC) = scoreOf(Quality.ScoreWeights(1.0, 0.0, 0.0))
    assert(math.abs(onlyC - c) < 1e-12)
    val (_, _, _, onlyU) = scoreOf(Quality.ScoreWeights(0.0, 1.0, 0.0))
    assert(math.abs(onlyU - u) < 1e-12)
    // scaling all weights equally leaves the score unchanged
    val (_, _, _, scaled) = scoreOf(Quality.ScoreWeights(2.0, 2.0, 2.0))
    assert(math.abs(scaled - equal) < 1e-12)
    // invalid weights rejected
    intercept[IllegalArgumentException](Quality.ScoreWeights(0.0, 0.0, 0.0))
    intercept[IllegalArgumentException](Quality.ScoreWeights(-1.0, 1.0, 1.0))
  }

  test("psi drift: parity halves of one distribution measure as stable") {
    val rows = Quality.psiDrift(spark, sf).collect()
    val byCol = rows.groupBy(_.getAs[String]("column_name"))
    assert(byCol.keySet == Set("value", "event_type"))
    byCol.foreach { case (c, rs) =>
      val total = rs.find(_.getAs[String]("bin") == "TOTAL").get
      val bins = rs.filterNot(_.getAs[String]("bin") == "TOTAL")
      // every per-bin PSI term is non-negative; total is their sum
      bins.foreach(r => assert(r.getAs[Double]("psi") >= 0.0, s"$c ${r.getAs[String]("bin")}"))
      assert(math.abs(bins.map(_.getAs[Double]("psi")).sum - total.getAs[Double]("psi")) < 1e-6)
      // counts partition the (non-null) rows
      assert(total.getAs[Long]("n_ref") + total.getAs[Long]("n_cur") ==
        Tables.events(spark, sf).count())
      // event_id parity halves are samples of the SAME distribution:
      // PSI must read "stable" (< 0.1), the metric's base calibration
      assert(total.getAs[Double]("psi") < 0.1, s"$c psi ${total.getAs[Double]("psi")}")
      // value gets its 10 fixed bins (all populated at this SF)
      if (c == "value") assert(bins.length == 10)
    }
    // a genuinely shifted slice must read as drifted: compare event_type
    // distribution of purchase-only rows vs all — recompute PSI by hand
    val ev = Tables.events(spark, sf).select(col("event_type")).collect().map(_.getString(0))
    val shifted = ev.filter(_ == "purchase") ++ ev.take(50)
    def dist(xs: Seq[String], cats: Seq[String]) =
      cats.map(c => (xs.count(_ == c) + 0.5) / (xs.size + 0.5 * cats.size))
    val cats = ev.distinct.toSeq.sorted
    val (p, q) = (dist(ev.toSeq, cats), dist(shifted.toSeq, cats))
    val psiShift = p.zip(q).map { case (a, b) => (b - a) * math.log(b / a) }.sum
    assert(psiShift > 0.25, s"hand psi $psiShift") // the 'action' band
  }

  test("duplicate rows: every catalog table audited; counts recompute") {
    val rows = Quality.duplicateRows(spark, sf).collect()
    assert(rows.map(_.getAs[String]("table_name")).toSet == Tables.all.toSet)
    rows.foreach { r =>
      val t = r.getAs[String]("table_name")
      val n = r.getAs[Long]("n_rows")
      val nd = r.getAs[Long]("n_distinct_rows")
      assert(n == Tables.table(spark, sf, t).count(), t)
      assert(nd <= n && r.getAs[Long]("n_duplicate_rows") == n - nd, t)
      assert(r.getAs[Long]("dup_ppm") == (n - nd) * 1000000L / n, t)
      // keyed tables can't have full-row duplicates: a unary PK implies
      // row distinctness — events/orders/documents audit clean
      if (Set("orders", "documents", "events", "embeddings")(t))
        assert(nd == n, s"$t has unexpected duplicate rows")
    }
    // exact recompute of one table's distinct-row count via a different
    // mechanism (dropDuplicates over all columns)
    val li = Tables.lineitem(spark, sf)
    val ndLi = li.dropDuplicates().count()
    val got = rows.find(_.getAs[String]("table_name") == "lineitem").get
    assert(got.getAs[Long]("n_distinct_rows") == ndLi)
  }
}
