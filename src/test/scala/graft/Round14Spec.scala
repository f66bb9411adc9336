package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 specs: the canary split into six single-device gated keys
  * (r13 VERDICT #1 — the red SET is the diagnosis), the redactor's
  * fail-closed unknown-typed-cell rule (r13 ADVICE), and the
  * env_fingerprint self-description row (r13 VERDICT #6).
  */
class Round14Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  // --------------------------------------------- canary split identity

  test("six single-device canary keys jointly equal the combined grid") {
    val combined = operators.Stats.statsCastCanary(spark, sf)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(combined.size == 12)
    val devices = Seq(
      "canary_parse" -> Seq("src", "as_double"),
      "canary_floor" -> Seq("floor_ppb"),
      "canary_intdiv" -> Seq("intdiv_wide"),
      "canary_comp" -> Seq("comp_raw"),
      "canary_dec9_spark" -> Seq("dec9_spark"),
      "canary_dec9_duck" -> Seq("dec9_duck"))
    for ((key, cols) <- devices) {
      val rows = SparkEntry.queries(key)(spark, sf).collect()
      assert(rows.length == 12, s"$key row count")
      rows.foreach { r =>
        val c = combined(r.getAs[Long]("id"))
        cols.foreach { name =>
          assert(r.get(r.fieldIndex(name)) == c.get(c.fieldIndex(name)),
            s"$key.$name diverges from the combined grid")
        }
      }
      // every gated canary key must also carry its oracle twin
      assert(SparkEntry.oracleSql.contains(key), s"$key missing oracle")
    }
  }

  test("the four build-independent canary devices match a JVM recompute") {
    // These four must be green in ANY environment: parse and the
    // composition are correctly-rounded IEEE, floor is exact after an
    // identical multiply, the wide integer division is exact integer
    // algebra. A red on one of these in the driver gate is a REAL
    // defect, not build skew — this spec is the local proof.
    val parse = SparkEntry.queries("canary_parse")(spark, sf).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    val floor = SparkEntry.queries("canary_floor")(spark, sf).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("floor_ppb")).toMap
    val intdiv = SparkEntry.queries("canary_intdiv")(spark, sf).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("intdiv_wide")).toMap
    val comp = SparkEntry.queries("canary_comp")(spark, sf).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("comp_raw")).toMap
    parse.foreach { case (id, r) =>
      val d = r.getAs[String]("src").toDouble
      assert(r.getAs[Double]("as_double") == d)
      assert(floor(id) == math.floor(d * 1e9).toLong)
      assert(comp(id) == math.sqrt(math.abs(d)) / (1.0 + math.abs(d)))
      assert(intdiv(id) == id * 1000000007L / 97L)
    }
  }

  // ------------------------------------------ redactor fails closed

  test("redactArtifact masks header cells with no recorded ColumnInfo") {
    import graft.sources.Collector.{Artifact, ColumnInfo, TableInfo}
    import graft.profile.Redactor
    // A hand-edited/malformed artifact: the sample header carries a
    // credential-named column the columns list no longer records. The
    // pre-r14 behavior resolved its type to "" and passed the value
    // through unmasked in EVERY mode — the fail-open this pins shut.
    val t = TableInfo("t",
      columns = Seq(ColumnInfo("id", "int64", nullable = false)),
      rowCount = 1,
      sampleHeader = Seq("id", "password"),
      sampleRows = Seq(Seq("7", "hunter2")))
    val a = Artifact("1.3", "test", Seq(t))
    for (mode <- Seq(Redactor.Minimal, Redactor.Balanced,
        Redactor.Conservative)) {
      val out = Redactor.redactArtifact(a, mode).tables.head.sampleRows.head
      assert(out == Seq("7", Redactor.Redacted),
        s"unknown-typed credential cell must mask under $mode: $out")
    }
    // the int64-typed id still passes through (typed non-strings are
    // not maskable), and None_ mode still masks nothing by contract
    val none = Redactor.redactArtifact(a, Redactor.None_)
      .tables.head.sampleRows.head
    assert(none == Seq("7", "hunter2"))
  }

  // ------------------------------------------- seasonal decomposition

  test("stats_seasonal_decomp equals a textbook classical decomposition") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("stats_seasonal_decomp")(spark, sf)
      .collect().map(r => r.getAs[Long]("dow") -> r).toMap
    assert(got.size == 7)
    // driver-side recompute over the same gap-filled daily series
    val counts = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) DIV 86400000000").as("day"))
      .groupBy("day").count().collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Long]("count")).toMap
    val d0 = counts.keys.min; val d1 = counts.keys.max
    val x = (d0 to d1).map(d => d -> counts.getOrElse(d, 0L)).toMap
    val det7 = (d0 + 3 to d1 - 3).map { d =>
      d -> (7L * x(d) - (-3 to 3).map(j => x(d + j.toLong)).sum)
    }.toMap
    val fb = (d0 + 9) / 7; val lb = (d1 - 9) / 7
    val w = lb - fb + 1
    val inB = det7.filter { case (d, _) => d / 7 >= fb && d / 7 <= lb }
    val sNum = inB.groupBy(_._1 % 7).view.mapValues(_.values.sum).toMap
    val sAll = sNum.values.sum
    val numStar = (0L to 6L).map(j => j -> (7L * sNum(j) - sAll)).toMap
    (0L to 6L).foreach { j =>
      val r = got(j)
      assert(r.getAs[Long]("n_weeks") == w)
      assert(r.getAs[Long]("seas_num") == numStar(j))
      assert(r.getAs[Double]("seasonal") ==
        numStar(j).toDouble / (49.0 * w))
    }
    // strength: variance ratio of remainder vs detrended on the shared
    // 49W denominator (the ppb intdiv quantizes at 1e-9)
    val ps = inB.toSeq.map { case (d, dt) => 7L * w * dt - numStar(d % 7) }
    val qs = inB.toSeq.map { case (d, dt) => 7L * w * dt }
    def ssq(v: Seq[Long]): Double = {
      val n = v.length.toDouble
      val bd = v.map(BigInt(_))
      (BigInt(v.length) * bd.map(b => b * b).sum -
        bd.sum * bd.sum).toDouble / (n * n)
    }
    val expect = math.max(0.0, 1.0 - ssq(ps) / ssq(qs))
    val gotS = got(0L).getAs[Double]("seasonal_strength")
    assert(math.abs(gotS - expect) < 1e-6, s"strength $gotS vs $expect")
    assert(got(0L).getAs[Boolean]("strong_seasonality") == (gotS >= 0.64))
    // centered indices sum to zero by construction
    assert(numStar.values.sum == 0L)
  }

  test("stats_seasonal_decomp recovers a planted weekly rhythm; degrades clean") {
    import org.apache.spark.sql.functions._
    // 10 planted weeks: weekend lanes (epoch-dow 2 and 3) carry 5x the
    // traffic — strength must read strong
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r14_seasonal").toString
    val src = java.nio.file.Paths.get(TestSession.sf)
    java.nio.file.Files.list(src).forEach { p =>
      val n = p.getFileName.toString
      if (n != "events.parquet")
        java.nio.file.Files.copy(p, java.nio.file.Paths.get(dir, n))
    }
    val base = 10000L // epoch day
    val days = (0 until 70).flatMap { i =>
      val d = base + i
      val n = if (d % 7 == 2 || d % 7 == 3) 50 else 10
      Seq.fill(n)(d)
    }
    spark.createDataFrame(days.zipWithIndex.map { case (d, i) =>
        (i.toLong, new java.sql.Timestamp(d * 86400000L + 3600000L))
      }).toDF("event_id", "ts")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("stats_seasonal_decomp")(spark, dir)
      .collect().map(r => r.getAs[Long]("dow") -> r).toMap
    assert(rows(2L).getAs[Long]("seas_num") > 0 &&
      rows(4L).getAs[Long]("seas_num") < 0)
    assert(rows(0L).getAs[Double]("seasonal_strength") > 0.9)
    assert(rows(0L).getAs[Boolean]("strong_seasonality"))
    // short series (10 days): no complete trend-covered week -> 0 rows
    val shortDir = java.nio.file.Files
      .createTempDirectory("graft_r14_seasonal_short").toString
    java.nio.file.Files.list(src).forEach { p =>
      val n = p.getFileName.toString
      if (n != "events.parquet")
        java.nio.file.Files.copy(p, java.nio.file.Paths.get(shortDir, n))
    }
    spark.createDataFrame((0 until 10).map(i =>
        (i.toLong, new java.sql.Timestamp((base + i) * 86400000L))))
      .toDF("event_id", "ts")
      .coalesce(1).write.parquet(s"$shortDir/events.parquet")
    assert(SparkEntry.queries("stats_seasonal_decomp")(spark, shortDir)
      .count() == 0L)
  }

  // ------------------------------------------------------ ljung-box

  test("stats_ljung_box equals a textbook BigInt recompute") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("stats_ljung_box")(spark, sf)
      .collect().map(r => r.getAs[Int]("lag") -> r).toMap
    assert(got.size == 14)
    val counts = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) DIV 86400000000").as("day"))
      .groupBy("day").count().collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Long]("count")).toMap
    val d0 = counts.keys.min; val d1 = counts.keys.max
    val xs = (d0 to d1).map(d => BigInt(counts.getOrElse(d, 0L)))
    val n = xs.length
    val s = xs.sum
    // den = Σ(n·x_t − S)² — an independent per-term path that equals
    // the operator's n·(n·SS − S²) algebraically
    val den = xs.map(x => (BigInt(n) * x - s).pow(2)).sum
    val rho = (1 to 14).map { k =>
      val num = (k until n).map(t =>
        (BigInt(n) * xs(t) - s) * (BigInt(n) * xs(t - k) - s)).sum
      k -> (if (den == 0 || n <= k) None
            else Some(num.toDouble / den.toDouble))
    }.toMap
    val nd = n.toDouble
    (1 to 14).foreach { k =>
      val r = got(k)
      assert(r.getAs[Long]("n_days") == n.toLong)
      assert(r.getAs[Double]("rho") == rho(k).get, s"rho at lag $k")
      // Q_k replayed in the operator's pinned left-associated order
      val q = nd * (nd + 2.0) * (1 to k)
        .map(j => rho(j).get * rho(j).get / (nd - j.toDouble))
        .foldLeft(0.0)(_ + _)
      assert(r.getAs[Double]("q_stat") == q, s"Q at lag $k")
      assert(r.getAs[Boolean]("reject_whiteness") ==
        (q > r.getAs[Double]("crit_95")))
    }
    assert(SparkEntry.oracleSql.contains("stats_ljung_box"))
  }

  test("stats_ljung_box flags a planted weekly rhythm; degrades clean") {
    import org.apache.spark.sql.functions._
    def fixture(dayCounts: Seq[(Long, Int)]): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_r14_ljung").toString
      val src = java.nio.file.Paths.get(TestSession.sf)
      java.nio.file.Files.list(src).forEach { p =>
        val nme = p.getFileName.toString
        if (nme != "events.parquet")
          java.nio.file.Files.copy(p, java.nio.file.Paths.get(dir, nme))
      }
      val rows = dayCounts.flatMap { case (d, c) => Seq.fill(c)(d) }
      spark.createDataFrame(rows.zipWithIndex.map { case (d, i) =>
          (i.toLong, new java.sql.Timestamp(d * 86400000L + 3600000L))
        }).toDF("event_id", "ts")
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      dir
    }
    // 70 days, weekend lanes 5x: the lag-7 autocorrelation dominates
    // and the joint test must reject whiteness from lag 7 on
    val rhythm = fixture((0 until 70).map { i =>
      val d = 10000L + i
      d -> (if (d % 7 == 2 || d % 7 == 3) 50 else 10)
    })
    val rr = SparkEntry.queries("stats_ljung_box")(spark, rhythm)
      .collect().map(r => r.getAs[Int]("lag") -> r).toMap
    assert(rr(7).getAs[Double]("rho") > 0.5)
    assert(rr(7).getAs[Boolean]("reject_whiteness"))
    assert(rr(14).getAs[Boolean]("reject_whiteness"))
    // constant series: den = 0 -> every verdict NULL, never overstated
    val const = fixture((0 until 30).map(i => (10000L + i) -> 5))
    val cr = SparkEntry.queries("stats_ljung_box")(spark, const).collect()
    assert(cr.length == 14)
    cr.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("rho")))
      assert(r.isNullAt(r.fieldIndex("q_stat")))
      assert(r.isNullAt(r.fieldIndex("reject_whiteness")))
    }
    // single-day series: below the n >= 2 floor -> 0 rows
    val single = fixture(Seq(10000L -> 3))
    assert(SparkEntry.queries("stats_ljung_box")(spark, single)
      .count() == 0L)
  }

  // ------------------------------------------------- env fingerprint

  test("env_fingerprint is one self-describing row") {
    val rows = SparkEntry.queries("env_fingerprint")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("spark_version") == spark.version)
    assert(r.getAs[String]("scala_version").startsWith("2.13"))
    assert(r.getAs[String]("java_version").nonEmpty)
    // rows-only by purpose: a fingerprint can't hash-match an oracle
    assert(!SparkEntry.oracleSql.contains("env_fingerprint"))
  }
}
