package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational5

/** Driver-side recomputes for the fifth relational wave — each test
  * re-derives the answer through an independent (brute, unoptimized)
  * formulation and compares exactly, the Relational4Spec discipline.
  */
class Relational5Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  private def psCost() = {
    // independent recompute of the derived part-supplier cost relation
    val part = Tables.part(spark, sf)
      .filter(col("p_size") <= Relational5.q2SizeMax &&
        col("p_type") === Relational5.q2Type)
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val supp = Tables.supplier(spark, sf).as("s")
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === Relational5.q2Region)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .collect()
      .filter(r => part(r.getLong(0)) && supp(r.getLong(1)))
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) =>
        k -> rs.map(r => BigDecimal(r.getDouble(2))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).min
      }
  }

  test("q2: rows are exactly the per-part min-cost pairs of the derived relation") {
    val ps = psCost()
    val minByPart = ps.groupBy(_._1._1).map { case (p, m) => p -> m.values.min }
    val expected = ps.filter { case ((p, _), c) => c == minByPart(p) }
    val rows = Relational5.q2MinCostSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    // the op is top-100; on sf0.001 the full set fits, so compare sets
    if (expected.size <= 100) {
      val got = rows.map(r => (r.getAs[Long]("p_partkey"), r.getAs[Double]("supply_cost"))).toSet
      val want = expected.map { case ((p, _), c) => (p, c.toDouble) }.toSet
      assert(got == want)
    }
    // every reported cost IS its part's min
    rows.foreach { r =>
      assert(r.getAs[Double]("supply_cost") ==
        minByPart(r.getAs[Long]("p_partkey")).toDouble)
    }
  }

  test("q9: profit equals the exact per-line decimal recompute") {
    val retail = Tables.part(spark, sf)
      .filter(col("p_type") === Relational5.q9Type)
      .select(col("p_partkey"), col("p_retailprice")).collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).toMap
    val suppNation = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val lines = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"), year(col("l_shipdate")).as("y"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount")).collect()
    val expected = lines.filter(r => retail.contains(r.getLong(0)))
      .groupBy(r => (suppNation(r.getLong(1)), r.getInt(2)))
      .map { case (k, rs) =>
        k -> rs.map { r =>
          def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          val rev = d2(r.getDouble(4)) * (BigDecimal("1.00") - d2(r.getDouble(5)))
          val cost = retail(r.getLong(0)) * BigDecimal("0.5") * d2(r.getDouble(3))
          rev - cost
        }.sum
      }
    val rows = Relational5.q9ProductProfit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = (r.getAs[String]("n_name"), r.getAs[Int]("o_year"))
      assert(r.getAs[Double]("profit") == expected(k).toDouble,
        s"profit mismatch at $k")
    }
    assert(rows.length == expected.size)
  }

  test("q11: reported parts are exactly those above 0.1% of the regional total") {
    val rows = Relational5.q11ImportantParts(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent recompute through Spark SQL
    Tables.lineitem(spark, sf).createOrReplaceTempView("t_li")
    Tables.supplier(spark, sf).createOrReplaceTempView("t_s")
    Tables.nation(spark, sf).createOrReplaceTempView("t_n")
    Tables.region(spark, sf).createOrReplaceTempView("t_r")
    val brute = spark.sql(
      s"""WITH rs AS (SELECT s_suppkey FROM t_s JOIN t_n ON s_nationkey = n_nationkey
         |  JOIN t_r ON n_regionkey = r_regionkey AND r_name = '${Relational5.q11Region}'),
         |pp AS (SELECT l_partkey, sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
         |    CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS v
         |  FROM t_li JOIN rs ON l_suppkey = s_suppkey GROUP BY l_partkey),
         |t AS (SELECT sum(v) AS tv FROM pp)
         |SELECT l_partkey, CAST(v AS DOUBLE) AS v FROM pp, t WHERE v * 1000 > tv
         |""".stripMargin).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.length == brute.size)
    rows.foreach { r =>
      assert(r.getAs[Double]("value") == brute(r.getAs[Long]("p_partkey")))
    }
    // share_ppm is a floor quotient in [0, 1e6] and sums to <= 1e6
    val ppm = rows.map(_.getAs[Long]("share_ppm"))
    assert(ppm.forall(p => p >= 1000 && p <= 1000000))
  }

  test("gap histogram: buckets are exact log2 of driver-computed gaps") {
    import graft.operators.EventAnalytics
    val rows = EventAnalytics.qGapHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t_us"),
        col("event_id")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("t_us"), r.getAs[Long]("event_id")))
    val gaps = evs.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((_, t), es) =>
      val sorted = es.sortBy(e => (e._3, e._4)).map(_._3)
      sorted.zip(sorted.tail).map { case (a, b) => (t, (b - a) / 1000000L) }
    }
    def bucket(g: Long): Int = java.lang.Long.toBinaryString(g).length
    val want = gaps.groupBy { case (t, g) => (t, bucket(g)) }
      .map { case (k, xs) =>
        k -> (xs.size.toLong, xs.map(_._2).min, xs.map(_._2).max)
      }
    assert(rows.length == want.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Int]("gap_bucket"))
      val (n, lo, hi) = want(k)
      assert(r.getAs[Long]("n_gaps") == n, s"$k")
      assert(r.getAs[Long]("min_gap_s") == lo && r.getAs[Long]("max_gap_s") == hi)
      // bucket invariant: every gap in [2^(b-1), 2^b) except bucket 1 = [0,2)
      val b = k._2
      assert(lo >= (if (b == 1) 0L else 1L << (b - 1)) && hi < (1L << b))
    }
  }

  test("abc classification matches an exact integer cumsum recompute") {
    val rows = graft.operators.Relational5.qAbcParts(spark, sf).collect()
    assert(rows.map(_.getAs[String]("abc_class")).toSeq.sorted ==
      rows.map(_.getAs[String]("abc_class")).toSeq)
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val perPart = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount")).collect()
      .groupBy(_.getLong(0))
      .map { case (p, rs) =>
        p -> rs.map(r => (d2(r.getDouble(1)) *
          (BigDecimal("1.00") - d2(r.getDouble(2)))) * 10000).sum.toLongExact
      }
    val sorted = perPart.toSeq.sortBy { case (p, u) => (-u, p) }
    val total = sorted.map(_._2).sum
    var cum = 0L
    val classed = sorted.map { case (_, u) =>
      cum += u
      val c = if (cum * 20 <= total * 16) "A"
              else if (cum * 20 <= total * 19) "B" else "C"
      (c, u)
    }
    val want = classed.groupBy(_._1).map { case (c, xs) =>
      c -> (xs.size.toLong, xs.map(_._2).sum)
    }
    assert(rows.length == want.size)
    rows.foreach { r =>
      val (n, u) = want(r.getAs[String]("abc_class"))
      assert(r.getAs[Long]("n_parts") == n)
      assert(r.getAs[Double]("revenue") == u.toDouble / 10000.0)
      assert(r.getAs[Long]("share_ppm") ==
        (BigInt(u) * 1000000 / BigInt(total)).toLong)
    }
    // boundary sanity: class A revenue lands just under the 80% cut
    // (this corpus's near-uniform part revenue means fine granularity;
    // real Pareto skew would concentrate A into few parts, same math)
    val a = want("A")
    assert(a._2 * 20 <= total * 16 && a._2 * 20 >= total * 15)
  }

  test("supplier reliability: wilson bound matches a driver recompute, ranks sanely") {
    val rows = graft.operators.Relational5.qSupplierReliability(spark, sf).collect()
    assert(rows.nonEmpty)
    def wilson(k: Long, n: Long): Double = {
      val p = k.toDouble / n
      val z2 = 1.96 * 1.96
      BigDecimal((p + z2 / (2.0 * n) -
        1.96 * math.sqrt((p * (1.0 - p) + z2 / (4.0 * n * n)) / n)) /
        (1.0 + z2 / n)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("wilson_low") ==
        wilson(r.getAs[Long]("n_late"), r.getAs[Long]("n_lines")))
      // the bound is below the raw rate (uncertainty always subtracts)
      assert(r.getAs[Double]("wilson_low") <=
        r.getAs[Long]("n_late").toDouble / r.getAs[Long]("n_lines") + 1e-9)
    }
    val ws = rows.map(_.getAs[Double]("wilson_low"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
  }

  test("ewma forecast: fixed-point arithmetic matches an exact driver recompute") {
    import graft.operators.EventAnalytics
    val rows = EventAnalytics.qEwmaForecast(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        unix_micros(date_trunc("day", col("ts"))).as("d_us"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("d_us")) ->
        r.getAs[Long]("c")).toMap
    val mx = daily.keys.map(_._2).max
    val dayUs = 86400000000L
    val types = daily.keys.map(_._1).toSet
    assert(rows.map(_.getAs[String]("event_type")).toSet == types)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val want = (1 to EventAnalytics.ewmaHorizon).map { k =>
        daily.getOrElse((t, mx - k * dayUs), 0L) <<
          (EventAnalytics.ewmaHorizon - k)
      }.sum
      assert(r.getAs[Long]("ewma_x65536") == want, s"type $t")
      val actual = daily.getOrElse((t, mx), 0L)
      assert(r.getAs[Long]("actual") == actual)
      assert(r.getAs[Boolean]("spike") == (actual * 65536 > want * 2))
      assert(r.getAs[Boolean]("stall") == (actual * 65536 * 2 < want))
      assert(r.getAs[Double]("forecast") == want.toDouble / 65536.0)
    }
  }

  test("basket pairs: support/confidence/lift match a driver-side tally") {
    val rows = Relational5.qBasketPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    val baskets = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val single = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = byOrder.size.toLong
    val pairSup = byOrder.values.toSeq
      .flatMap(ps => ps.toSeq.sorted.combinations(2).map(c => (c(0), c(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val k = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
      val s = pairSup(k)
      assert(s == r.getAs[Long]("support_ab") && s >= Relational5.basketMinSup)
      assert(r.getAs[Long]("s_a") == single(k._1))
      assert(r.getAs[Long]("s_b") == single(k._2))
      assert(r.getAs[Long]("conf_ppm") == s * 1000000L / single(k._1))
      assert(r.getAs[Long]("lift_ppm") ==
        s * n * 1000000L / (single(k._1) * single(k._2)))
    }
    // top-100 by lift: every reported lift >= the best unreported one
    val reported = rows.map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))).toSet
    if (rows.length == 100) {
      val minReported = rows.map(_.getAs[Long]("lift_ppm")).min
      val bestUnreported = pairSup.collect {
        case (k, s) if s >= Relational5.basketMinSup && !reported(k) =>
          s * n * 1000000L / (single(k._1) * single(k._2))
      }
      if (bestUnreported.nonEmpty) assert(minReported >= bestUnreported.max)
    }
  }

  test("q20: dominators shipped more than half of a contested part-year total") {
    val rows = Relational5.q20DominantShippers(spark, sf).collect()
    assert(rows.nonEmpty)
    val part = Tables.part(spark, sf).filter(col("p_type") === Relational5.q20Type)
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val lines = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit(Relational5.q20Year._1).cast("timestamp") &&
        col("l_shipdate") < lit(Relational5.q20Year._2).cast("timestamp"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity")).collect()
      .filter(r => part(r.getLong(0)))
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val ps = lines.groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) => k -> rs.map(r => d2(r.getDouble(2))).sum }
    val tot = ps.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val nSupp = ps.groupBy(_._1._1).map { case (p, m) => p -> m.size }
    val expected = ps.filter { case ((p, _), q) => nSupp(p) > 1 && q * 2 > tot(p) }
      .groupBy(_._1._2).map { case (s, m) => s -> (m.size.toLong, m.values.sum) }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, q) = expected(r.getAs[Long]("s_suppkey"))
      assert(r.getAs[Long]("n_parts_dominated") == n)
      assert(r.getAs[Double]("qty_dominated") == q.toDouble)
    }
  }
}
