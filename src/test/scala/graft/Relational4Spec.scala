package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational4

class Relational4Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("q4: semi-join equals EXISTS recompute; priorities total to qualifying orders") {
    val rows = Relational4.q4OrderPriority(spark, sf).collect()
    assert(rows.nonEmpty)
    val brute = Tables.orders(spark, sf).as("o")
      .join(
        Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_shipdate")).as("l"),
        col("l.l_orderkey") === col("o.o_orderkey") &&
          col("l.l_shipdate") > col("o.o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("o.o_orderkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("order_count")).sum == brute)
  }

  test("q6: revenue equals an exact driver-side BigDecimal recompute; filters push down") {
    val row = Relational4.q6ForecastRevenue(spark, sf).collect().head
    val rows = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit(Relational4.q6Window._1).cast("timestamp") &&
        col("l_shipdate") < lit(Relational4.q6Window._2).cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select(col("l_extendedprice"), col("l_discount")).collect()
    val exact = rows.map { r =>
      BigDecimal(r.getDouble(0)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    assert(row.getAs[Long]("n_lines") == rows.length)
    assert(row.getAs[Double]("revenue") == exact.toDouble)
    // every predicate reaches the parquet scan (formatted mode prints the
    // full PushedFilters list; toString truncates it)
    val plan = Relational4.q6ForecastRevenue(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("GreaterThanOrEqual(l_discount") &&
      plan.contains("LessThanOrEqual(l_discount") &&
      plan.contains("LessThan(l_quantity"), plan)
  }

  test("q12: buckets partition the joined fact; high+low = total lines") {
    val rows = Relational4.q12ShipLatency(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val total = rows.map(r => r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("q13: distribution masses to |customer|; zero bucket present") {
    val rows = Relational4.q13CustDist(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("custdist")).sum == Tables.customer(spark, sf).count())
    assert(rows.exists(_.getAs[Long]("c_count") == 0L),
      "urgent-only filter should leave some customers with zero orders")
    // weighted count-mass equals the number of urgent orders from known customers
    val urgentMass = rows.map(r => r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    assert(urgentMass == urgent)
  }

  test("q15: emitted suppliers hold the exact max quarterly revenue (ties kept)") {
    val rows = Relational4.q15TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, s"all emitted rows must tie at the max, got ${revs.toList}")
  }

  test("q17: every counted line is under 20% of its part's average quantity") {
    val rows = Relational4.q17SmallQuantity(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute the qualifying-line count brand-free with the operator's
    // exact decimal cross-multiplication (qty*5*n < sum — no double mean,
    // so a quantity exactly at the 20% boundary cannot flip the count)
    val qtyD = col("l_quantity").cast(DecimalType(12, 2))
    val perPart = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(qtyD).as("sum_q"), count(lit(1)).as("n"))
    val brute = Tables.lineitem(spark, sf)
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(qtyD * lit(5) * col("n") < col("sum_q"))
      .count()
    assert(rows.map(_.getAs[Long]("n_small_lines")).sum == brute)
  }

  test("q19: disjunctive revenue equals the union of the three bands") {
    val row = Relational4.q19Disjunctive(spark, sf).collect().head
    val li = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
    def bandCount(brand: String, sizeHi: Int, qLo: Int, qHi: Int): Long =
      li.filter(col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)).count()
    val bands = bandCount("Brand#12", 15, 1, 11) + bandCount("Brand#23", 25, 10, 20) +
      bandCount("Brand#3", 35, 20, 30)
    // bands are quantity-disjoint except possible [10,11] and [20,20] overlaps
    // across brands — brands are distinct so the union IS the sum
    assert(row.getAs[Long]("n_lines") == bands)
  }

  test("q21: aggregation rewrite equals the textbook EXISTS/NOT-EXISTS form") {
    // run the oracle SQL text itself through Spark SQL on the same data —
    // the rewrite (per-(order,supplier) fold, n_supp>1, n_late=1) must
    // reproduce the correlated-subquery original row for row. The data
    // DOES contain multi-late-line (order, supplier) pairs, so this also
    // proves the COUNT(DISTINCT l_orderkey) granularity is the right one.
    Tables.supplier(spark, sf).createOrReplaceTempView("supplier")
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    Tables.orders(spark, sf).createOrReplaceTempView("orders")
    val brute = spark.sql(Relational4.q21Sql).collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[String]("s_name"), r.getAs[Long]("numwait")))
    val rows = Relational4.q21WaitingSupplier(spark, sf).collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[String]("s_name"), r.getAs[Long]("numwait")))
    assert(rows.nonEmpty)
    assert(rows.sameElements(brute))
    // ordered by numwait desc, suppkey tiebreak
    val k = rows.map(r => (-r._3, r._1))
    assert(k.sameElements(k.sorted))
  }

  test("q22: dormant set is above-mean balance with no recent orders") {
    val rows = Relational4.q22DormantCustomers(spark, sf).collect()
    assert(rows.nonEmpty)
    // mirror the operator's decimal cross-multiplication (bal*n_pos >
    // sum_bal) — a balance exactly at the mean must not flip under a
    // double-rounded mean
    val cust = Tables.customer(spark, sf)
    val balD = col("c_acctbal").cast(DecimalType(12, 2))
    val stats = cust.filter(balD > 0)
      .agg(sum(balD).as("sum_bal"), count(lit(1)).as("n_pos")).head
    val sumBal = stats.getAs[java.math.BigDecimal]("sum_bal")
    val nPos = stats.getAs[Long]("n_pos")
    val brute = cust.filter(balD * lit(nPos) > lit(sumBal))
      .join(Tables.orders(spark, sf)
          .filter(col("o_orderdate") >= lit(Relational4.q22Cutoff).cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(rows.map(_.getAs[Long]("numcust")).sum == brute)
  }

  test("q16: per-family counts match a driver-side distinct-supplier tally") {
    val rows = Relational4.q16SupplierVariety(spark, sf).collect()
    val excl = Tables.supplier(spark, sf).filter(col("s_acctbal") < 1000.0)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val parts = Tables.part(spark, sf)
      .select("p_partkey", "p_brand", "p_type", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getInt(3))).toMap
    val tally = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey").collect()
      .flatMap { r =>
        val (b, t, s) = parts(r.getLong(0))
        if (b == "Brand#1" || excl.contains(r.getLong(1))) None
        else Some(((b, t, s), r.getLong(1)))
      }.distinct
      .groupBy(_._1).map { case (k, vs) => (k, vs.length.toLong) }
    assert(rows.length == tally.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
        r.getAs[Int]("p_size"))
      assert(r.getAs[Long]("supplier_cnt") == tally(k), s"family $k")
    }
    // ordering: non-increasing counts with the declared tiebreak
    val keys = rows.map(r => (r.getAs[Long]("supplier_cnt"), r.getAs[String]("p_brand"),
      r.getAs[String]("p_type"), r.getAs[Int]("p_size")))
    keys.zip(keys.tail).foreach { case (a, b) =>
      assert(a._1 > b._1 || (a._1 == b._1 &&
        Ordering[(String, String, Int)].lteq((a._2, a._3, a._4), (b._2, b._3, b._4))))
    }
  }
}
