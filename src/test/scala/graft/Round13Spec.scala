package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 specs: the presentation-reversal canary, the quality-score
  * metric history, and the artifact redact→render→load round-trip row.
  * (The ten migrated raw-double presentations are covered by the updated
  * Round11/Round12 recomputes + OracleParitySpec's full DuckDB replay.)
  */
class Round13Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // ------------------------------------------------------ cast canary

  test("stats_cast_canary: devices deterministic, rows 3/8 exhibit the engine split") {
    // r14: the combined grid is test-only (the gate carries the six
    // single-device projections); the device semantics asserted here
    // are unchanged.
    val rows = operators.Stats.statsCastCanary(spark, TestSession.sf)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(rows.size == 12)
    // the two recorded engine-disagreement exhibits: Spark's shortest-
    // repr HALF_UP vs DuckDB's binary rounding differ exactly there
    val split = rows.values.filter { r =>
      r.getAs[java.math.BigDecimal]("dec9_spark")
        .compareTo(r.getAs[java.math.BigDecimal]("dec9_duck")) != 0
    }.map(_.getAs[Long]("id")).toSet
    assert(split == Set(3L, 8L), s"engine-split rows: $split")
    // dec9_spark is COMPUTED by Spark here — it must equal the recorded
    // expectation the oracle presents (self-consistency of the grid)
    rows.values.foreach { r =>
      val d = r.getAs[Double]("as_double")
      // floor device: exact floor of the scaled double
      assert(r.getAs[Long]("floor_ppb") == math.floor(d * 1e9).toLong)
      // raw-double composition device
      val comp = math.sqrt(math.abs(d)) / (1.0 + math.abs(d))
      assert(r.getAs[Double]("comp_raw") == comp)
      // wide integer division device
      val id = r.getAs[Long]("id")
      assert(r.getAs[Long]("intdiv_wide") == id * 1000000007L / 97L)
    }
    // spot-check the HALF_UP-vs-binary discriminators
    assert(rows(3L).getAs[java.math.BigDecimal]("dec9_spark").toPlainString
      == "1.000000001")
    assert(rows(3L).getAs[java.math.BigDecimal]("dec9_duck").toPlainString
      == "1.000000000")
    assert(rows(8L).getAs[java.math.BigDecimal]("dec9_spark").toPlainString
      == "987654321.123456800")
    assert(rows(8L).getAs[java.math.BigDecimal]("dec9_duck").toPlainString
      == "987654321.123456896")
  }

  // ------------------------------------------------ score history

  test("quality_score_history equals a driver-side weekly recompute") {
    val sf = TestSession.sf
    val got = SparkEntry.queries("quality_score_history")(spark, sf)
      .collect()
    val ev = graft.Tables.events(spark, sf)
      .select(expr("unix_micros(date_trunc('DAY', ts)) DIV 86400000000 DIV 7")
        .as("w"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("w"), r.getAs[Long]("event_id"),
        Option(r.get(r.fieldIndex("value"))).map(_.toString.toDouble)))
    val byWeek = ev.groupBy(_._1).toSeq.sortBy(_._1)
    assert(got.length == byWeek.length && got.length > 1)
    def ppm(num: Long, den: Long): Long =
      (BigInt(num) * 1000000 / den).toLong
    var prev: Option[Long] = None
    got.sortBy(_.getAs[Long]("week_num")).zip(byWeek).foreach {
      case (row, (w, rows0)) =>
        assert(row.getAs[Long]("week_num") == w)
        val n = rows0.length.toLong
        val nv = rows0.count(_._3.isDefined).toLong
        val nd = rows0.map(_._2).distinct.length.toLong
        val nn = rows0.count(r => r._3.exists(_ >= 0)).toLong
        assert(row.getAs[Long]("n_rows") == n)
        val comp = ppm(nv, n)
        val uniq = ppm(nd, n)
        val cons = if (nv > 0) ppm(nn, nv) else 1000000L
        assert(row.getAs[Long]("completeness_ppm") == comp)
        assert(row.getAs[Long]("uniqueness_ppm") == uniq)
        assert(row.getAs[Long]("consistency_ppm") == cons)
        val score = (comp * 50 + uniq * 30 + cons * 20) / 100
        assert(row.getAs[Long]("score_ppm") == score)
        prev match {
          case None =>
            assert(row.getAs[Any]("score_delta_ppm") == null)
            assert(row.getAs[String]("status") == "baseline")
          case Some(p) =>
            val d = score - p
            assert(row.getAs[Long]("score_delta_ppm") == d)
            val want = if (d <= -10000) "degraded"
              else if (d >= 10000) "improved" else "stable"
            assert(row.getAs[String]("status") == want)
        }
        prev = Some(score)
    }
  }

  test("quality_score_history: planted NULL-era degrades the score, empty events degrade clean") {
    // plant: all values NULL in the last 2 weeks (fixture horizon is
    // weeks 2817-2821) -> completeness drops far past 1% there ->
    // 'degraded' verdict on the first NULL week
    val dir = cloneWithTable("qsh_null", "events") { df =>
      df.withColumn("value",
        when(expr("unix_micros(date_trunc('DAY', ts)) DIV 86400000000 DIV 7 >= 2820"),
          lit(null).cast(org.apache.spark.sql.types.DoubleType))
          .otherwise(col("value")))
    }
    val rows = SparkEntry.queries("quality_score_history")(spark, dir)
      .collect().sortBy(_.getAs[Long]("week_num"))
    val degraded = rows.filter(_.getAs[String]("status") == "degraded")
    assert(degraded.nonEmpty, rows.mkString("\n"))
    assert(degraded.head.getAs[Long]("week_num") == 2820L)
    assert(degraded.head.getAs[Long]("completeness_ppm") == 0L)
    // vacuous consistency on the all-NULL weeks: full score, no penalty
    rows.filter(_.getAs[Long]("completeness_ppm") == 0L)
      .foreach(r => assert(r.getAs[Long]("consistency_ppm") == 1000000L))
    val empty = cloneWithTable("qsh_empty", "events")(_.limit(0))
    assert(SparkEntry.queries("quality_score_history")(spark, empty)
      .count() == 0L)
  }

  // ------------------------------------------------ redact round-trip

  test("redact_rerender: masking semantics + exact render->load round-trip") {
    val sf = TestSession.sf
    val got = SparkEntry.queries("redact_rerender")(spark, sf).collect()
    // 3 modes x 2 string columns (the int64 key-named columns must NOT
    // appear: type-gated masking never touches them)
    assert(got.length == 6)
    assert(got.map(_.getAs[String]("column_name")).toSet
      == Set("c_name", "c_mktsegment"))
    assert(got.forall(_.getAs[Boolean]("roundtrip_exact")))
    assert(got.forall(_.getAs[Long]("n_sample") == 8L))
    // minimal/balanced: no customer string column matches the credential/
    // PII name patterns -> everything kept
    got.filter(r => Set("minimal", "balanced")(r.getAs[String]("mode")))
      .foreach { r =>
        assert(r.getAs[Long]("n_masked") == 0L, r.toString)
        assert(r.getAs[Long]("n_kept") == 8L, r.toString)
      }
    // conservative: masked unless the value carve-out (contains T/-/:)
    // fires; recompute from the same top-8 MostRecent sample
    val sample = graft.Tables.customer(spark, sf)
      .orderBy(col("c_custkey").desc).limit(8)
      .select(col("c_name"), col("c_mktsegment")).collect()
    def carve(s: String) =
      s.contains("T") || s.contains("-") || s.contains(":")
    val cons = got.filter(_.getAs[String]("mode") == "conservative")
      .map(r => r.getAs[String]("column_name") -> r).toMap
    val keptName = sample.map(_.getString(0)).count(carve).toLong
    val keptSeg = sample.map(_.getString(1)).count(carve).toLong
    assert(cons("c_name").getAs[Long]("n_kept") == keptName)
    assert(cons("c_name").getAs[Long]("n_masked") == 8L - keptName)
    assert(cons("c_mktsegment").getAs[Long]("n_kept") == keptSeg)
    assert(cons("c_mktsegment").getAs[Long]("n_masked") == 8L - keptSeg)
    // the carve-out is LIVE coverage at this fixture: AUTOMOBILE/
    // FURNITURE segments contain a capital T and survive conservative
    assert(keptSeg > 0L && keptSeg < 8L,
      s"fixture should exercise both carve-out branches: kept=$keptSeg")
  }

  test("redactArtifact: type gating and the NULL marker pass-through") {
    import graft.sources.Collector._
    val t = TableInfo("t",
      Seq(ColumnInfo("password_hint", "string", nullable = true),
        ColumnInfo("api_key", "int64", nullable = false),
        ColumnInfo("email", "string", nullable = true)),
      rowCount = 2L,
      sampleHeader = Seq("password_hint", "api_key", "email"),
      sampleRows = Seq(Seq("hunter2", "42", "a@b.c"),
        Seq("NULL", "7", "NULL")))
    val a = Artifact("1.3", "spec", Seq(t))
    val min = profile.Redactor.redactArtifact(a, profile.Redactor.Minimal)
      .tables.head.sampleRows
    // string credential masked; int64 "api_key" untouched despite the
    // name match; NULL marker passes through
    assert(min == Seq(Seq("[REDACTED]", "42", "a@b.c"),
      Seq("NULL", "7", "NULL")))
    val bal = profile.Redactor.redactArtifact(a, profile.Redactor.Balanced)
      .tables.head.sampleRows
    assert(bal == Seq(Seq("[REDACTED]", "42", "[REDACTED]"),
      Seq("NULL", "7", "NULL")))
  }

  // ------------------------------------------------ runs test

  test("stats_runs_test equals a brute-force Wald-Wolfowitz recompute") {
    val sf = TestSession.sf
    val row = SparkEntry.queries("stats_runs_test")(spark, sf)
      .collect().head
    val daily = graft.Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .groupBy(expr("unix_micros(date_trunc('DAY', ts)) DIV 86400000000")
        .as("day_num"))
      .agg(count(lit(1)).as("n_d"),
        expr("CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS DECIMAL(38,0))")
          .as("cents_d"))
      .collect().map(r => (r.getAs[Long]("day_num"),
        r.getAs[java.math.BigDecimal]("cents_d").toBigInteger.longValueExact()
          * 10000L / r.getAs[Long]("n_d")))
      .sortBy(_._1)
    val n = daily.length
    // nearest-rank median of the daily means
    val med = daily.map(_._2).sorted.apply((n + 1) / 2 - 1)
    val signs = daily.map(_._2).filter(_ != med).map(m => m > med)
    val n1 = signs.count(identity).toLong
    val n2 = signs.count(!_).toLong
    val runs = if (signs.isEmpty) 0L
      else 1L + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    assert(row.getAs[Long]("n_days") == n.toLong)
    assert(row.getAs[Long]("med_mu6") == med)
    assert(row.getAs[Long]("n_above") == n1)
    assert(row.getAs[Long]("n_below") == n2)
    assert(row.getAs[Long]("n_runs") == runs)
    val nn = (n1 + n2).toDouble
    if (n1 > 0 && n2 > 0 && nn > 1 && 2.0 * n1 * n2 * (2.0 * n1 * n2 - nn) > 0) {
      val mu = 2.0 * n1 * n2 / nn + 1.0
      val sig = math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - nn)
        / (nn * nn * (nn - 1.0)))
      val z = (runs - mu) / sig
      val zGot = row.getAs[Double]("z_runs")
      assert(math.abs(zGot - z) < 1e-9, s"z=$z vs $zGot")
      if (math.min(n1, n2) >= 10)
        assert(row.getAs[Boolean]("significant_95") == (math.abs(zGot) >= 1.96))
    }
  }

  test("stats_runs_test: planted regimes collapse runs; degrades clean") {
    // plant: first half of the horizon scaled down, second half up ->
    // two long regimes -> far fewer runs than chance -> significant
    val dir = cloneWithTable("runs_regime", "events") { df =>
      df.withColumn("value",
        when(expr("unix_micros(date_trunc('DAY', ts)) DIV 86400000000 < 19738"),
          col("value") * 0.5).otherwise(col("value") * 2.0))
    }
    val r = SparkEntry.queries("stats_runs_test")(spark, dir).collect().head
    assert(r.getAs[Long]("n_runs") <= 4L, r.toString)
    assert(r.getAs[Double]("z_runs") < 0, "regimes mean too FEW runs")
    // empty events -> NULL stats, no throw
    val empty = cloneWithTable("runs_empty", "events")(_.limit(0))
    val e = SparkEntry.queries("stats_runs_test")(spark, empty)
      .collect().head
    assert(e.getAs[Any]("z_runs") == null
      && e.getAs[Any]("significant_95") == null)
    // constant value -> every daily mean can still differ via counts;
    // force FULL ties: one event per day is not plantable, so all-NULL
    // values -> empty series -> NULL
    val nulls = cloneWithTable("runs_null", "events")(
      _.withColumn("value", lit(null)
        .cast(org.apache.spark.sql.types.DoubleType)))
    val nr = SparkEntry.queries("stats_runs_test")(spark, nulls)
      .collect().head
    assert(nr.getAs[Any]("z_runs") == null)
  }

  // ------------------------------------------------ jarque-bera

  test("stats_jarque_bera tracks a driver-side moment recompute") {
    val sf = TestSession.sf
    val row = SparkEntry.queries("stats_jarque_bera")(spark, sf)
      .collect().head
    // the op's dollar-truncated integer units: cents DIV 100 − 150000
    val xs = graft.Tables.orders(spark, sf)
      .select(col("o_totalprice")).na.drop().collect()
      .map(r => (BigDecimal(r.get(0).toString) * 100).toLongExact
        / 100 - 150000L)
      .map(_.toDouble)
    val n = xs.length.toDouble
    val m = xs.sum / n
    def cm(k: Int) = xs.map(x => math.pow(x - m, k)).sum / n
    val (m2, m3, m4) = (cm(2), cm(3), cm(4))
    val skew = m3 / (m2 * math.sqrt(m2))
    val kurt = m4 / (m2 * m2) - 3.0
    val jb = n / 6.0 * (skew * skew + kurt * kurt / 4.0)
    assert(row.getAs[Long]("n_rows") == n.toLong)
    // the op floors the raw power sums at 1e-4 (ladder device); the
    // driver recompute is full-precision — compare loosely
    assert(math.abs(row.getAs[Double]("skewness") - skew) < 1e-5,
      s"skew=$skew vs $row")
    assert(math.abs(row.getAs[Double]("kurtosis_excess") - kurt) < 1e-4)
    assert(math.abs(row.getAs[Double]("jb_stat") - jb)
      / math.max(jb, 1.0) < 1e-4, s"jb=$jb vs $row")
    if (n >= 2000)
      assert(row.getAs[Boolean]("significant_95")
        == (row.getAs[Double]("jb_stat") >= 5.991))
    else assert(row.getAs[Any]("significant_95") == null)
  }

  test("stats_jarque_bera degrades on empty/constant orders, never throws") {
    val empty = cloneWithTable("jb_empty", "orders")(_.limit(0))
    val e = SparkEntry.queries("stats_jarque_bera")(spark, empty)
      .collect().head
    assert(e.getAs[Long]("n_rows") == 0L && e.getAs[Any]("jb_stat") == null)
    // all values tied -> zero variance -> NULL statistics
    val const = cloneWithTable("jb_const", "orders")(
      _.withColumn("o_totalprice", lit(java.math.BigDecimal.valueOf(100.00))
        .cast(org.apache.spark.sql.types.DecimalType(12, 2))))
    val c = SparkEntry.queries("stats_jarque_bera")(spark, const)
      .collect().head
    assert(c.getAs[Any]("skewness") == null && c.getAs[Any]("jb_stat") == null
      && c.getAs[Any]("significant_95") == null)
  }

  /** sf0.001 clone with one table swapped (the Round12Spec device). */
  private def cloneWithTable(tag: String, table: String)
      (transform: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory(s"graft_r13_$tag").toString
    val src = Paths.get("/root/testdata/sf0.001")
    Files.list(src).forEach { p =>
      val name = p.getFileName.toString
      if (name != s"$table.parquet")
        Files.copy(p, Paths.get(dir, name), StandardCopyOption.REPLACE_EXISTING)
    }
    transform(spark.read.parquet(s"/root/testdata/sf0.001/$table.parquet"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$table.parquet")
    dir
  }
}
