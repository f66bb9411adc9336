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
}
