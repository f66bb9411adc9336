package graft

import org.apache.spark.sql.functions._
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
    // recompute the qualifying-line count brand-free and compare totals
    val perPart = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey").as("pk"))
      .agg(avg(col("l_quantity")).as("avg_q"))
    val brute = Tables.lineitem(spark, sf)
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("avg_q") * 0.2)
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

  test("q21: late (order,supplier) pairs are line-unique — the oracle-parity precondition") {
    // the DuckDB oracle counts per qualifying l1 LINE; the Spark side per
    // (order, supplier). They coincide iff no supplier ships two late
    // lines in one order at the 90-day threshold. Assert that, so a data
    // regeneration that breaks it fails HERE, not at the hash gate.
    val lateLines = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_orderkey"), col("l_suppkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(lateLines == 0L,
      "a supplier with 2+ late lines in one order breaks the q21 oracle contract")
    val rows = Relational4.q21WaitingSupplier(spark, sf).collect()
    rows.foreach(r => assert(r.getAs[Long]("numwait") >= 1L))
    // ordered by numwait desc, suppkey tiebreak
    val k = rows.map(r => (-r.getAs[Long]("numwait"), r.getAs[Long]("s_suppkey")))
    assert(k.sameElements(k.sorted))
  }

  test("q22: dormant set is above-mean balance with no recent orders") {
    val rows = Relational4.q22DormantCustomers(spark, sf).collect()
    assert(rows.nonEmpty)
    val cust = Tables.customer(spark, sf)
    val meanPos = cust.filter(col("c_acctbal") > 0).agg(avg(col("c_acctbal"))).head.getDouble(0)
    val brute = cust.filter(col("c_acctbal") > meanPos)
      .join(Tables.orders(spark, sf)
          .filter(col("o_orderdate") >= lit(Relational4.q22Cutoff).cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(rows.map(_.getAs[Long]("numcust")).sum == brute)
  }
}
