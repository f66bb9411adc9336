package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational3

class Relational3Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("q14: promo + rest reconciles to total; ppm bounded and exact") {
    val rows = Relational3.q14PromoRevenue(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, t) = (r.getAs[Double]("promo_revenue"), r.getAs[Double]("total_revenue"))
      val ppm = r.getAs[Long]("promo_ppm")
      assert(p >= 0.0 && p <= t)
      assert(ppm >= 0L && ppm <= 1000000L)
      // truncation contract: ppm = floor(promo * 1e6 / total) on exact cents
      val pc = BigDecimal(p).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      val tc = BigDecimal(t).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(ppm) == (pc * 1000000 / tc).setScale(0, BigDecimal.RoundingMode.DOWN),
        s"ppm $ppm vs ${pc * 1000000 / tc}")
    }
    // months cover the whole lineitem span (no month silently dropped)
    val nMonths = Tables.lineitem(spark, sf)
      .select(date_trunc("month", col("l_shipdate"))).distinct().count()
    assert(rows.length == nMonths)
  }

  test("q18: every emitted order really exceeds the threshold; none missed") {
    val rows = Relational3.q18LargeVolume(spark, sf).collect()
    val brute = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
      .filter(col("q") > Relational3.q18QtyThreshold).count()
    assert(rows.length == math.min(brute, 100L))
    rows.foreach(r => assert(r.getAs[Double]("sum_qty") > Relational3.q18QtyThreshold))
    // ordered by o_totalprice desc with orderkey tiebreak
    val prices = rows.map(r => (-r.getAs[Double]("o_totalprice"), r.getAs[Long]("o_orderkey")))
    assert(prices.sameElements(prices.sorted))
  }

  test("q7: matrix covers every lineitem exactly once; flags consistent") {
    val rows = Relational3.q7VolumeShipping(spark, sf).collect()
    assert(rows.nonEmpty)
    // every line lands in exactly one (supp_nation, cust_nation, year) cell
    assert(rows.map(_.getAs[Long]("n_lines")).sum == Tables.lineitem(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Boolean]("cross_border") ==
        (r.getAs[String]("supp_nation") != r.getAs[String]("cust_nation")))
      assert(r.getAs[Double]("revenue") > 0.0)
    }
    // spot-check one cell against a brute-force recompute
    val f = rows.maxBy(_.getAs[Long]("n_lines"))
    val nk = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))
    val brute = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(nk.select(col("n_nationkey").as("snk"), col("n_name").as("sn")), col("s_nationkey") === col("snk"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(nk.select(col("n_nationkey").as("cnk"), col("n_name").as("cn")), col("c_nationkey") === col("cnk"))
      .filter(col("sn") === f.getAs[String]("supp_nation") &&
        col("cn") === f.getAs[String]("cust_nation") &&
        year(col("l_shipdate")) === f.getAs[Int]("l_year"))
      .count()
    assert(f.getAs[Long]("n_lines") == brute)
  }

  test("q8: market-share ppm equals an exact driver-side decimal recompute") {
    val rows = Relational3.q8MarketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent recompute of the qualifying-line universe
    val nk = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))
    val lines = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_type") === Relational3.q8PartType),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(nk.select(col("n_nationkey").as("snk"), col("n_name").as("sn")),
        col("s_nationkey") === col("snk"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf).select(col("n_nationkey").as("cnk"),
        col("n_regionkey").as("crk")), col("c_nationkey") === col("cnk"))
      .join(Tables.region(spark, sf).filter(col("r_name") === Relational3.q8Region),
        col("crk") === col("r_regionkey"))
      .select(year(col("o_orderdate")).as("y"), col("sn"),
        col("l_extendedprice"), col("l_discount"))
      .collect()
    def money(ext: Double, disc: Double): BigDecimal =
      BigDecimal(ext).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
        (BigDecimal(1.00) - BigDecimal(disc).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    val byYear = lines.groupBy(_.getAs[Int]("y"))
    assert(rows.map(_.getAs[Int]("o_year")).toSet == byYear.keySet)
    rows.foreach { r =>
      val g = byYear(r.getAs[Int]("o_year"))
      val tot = g.map(x => money(x.getDouble(2), x.getDouble(3))).sum
      val nat = g.filter(_.getAs[String]("sn") == Relational3.q8Nation)
        .map(x => money(x.getDouble(2), x.getDouble(3))).sum
      assert(r.getAs[Long]("n_lines") == g.length)
      assert(r.getAs[Double]("total_revenue") == tot.toDouble)
      assert(r.getAs[Double]("nation_revenue") == nat.toDouble)
      // ppm is the exact integer floor quotient (the HUGEINT device:
      // both sums are exact in 1e-4 units)
      val natU = (nat * 10000).toBigIntExact.get
      val totU = (tot * 10000).toBigIntExact.get
      val ppm = natU * 1000000 / totU
      assert(BigInt(r.getAs[Long]("nation_ppm")) == ppm,
        s"year ${r.getAs[Int]("o_year")}: ${r.getAs[Long]("nation_ppm")} vs $ppm")
    }
    // at least one year carries target-nation signal on every test SF
    assert(rows.exists(_.getAs[Long]("nation_ppm") > 0L))
  }
}
