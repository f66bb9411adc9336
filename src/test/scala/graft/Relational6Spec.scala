package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational6

/** Independent driver-side recomputes of the round-8 analytics wave —
  * each op's semantics re-derived from the raw rows in plain Scala
  * (BigInt arithmetic where the op is integer-exact), never through the
  * op's own SQL. The DuckDB oracle gate cross-checks the SQL; this spec
  * cross-checks the MATH.
  */
class Relational6Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("changepoint: CUSUM argmax and split means match a BigInt recompute") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        unix_micros(date_trunc("day", col("ts"))).as("d_us"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("d_us"), r.getAs[Long]("c")))
    val expected = daily.groupBy(_._1).map { case (et, rows) =>
      val days = rows.sortBy(_._2)
      val n = BigInt(days.length)
      val total = BigInt(days.map(_._3).sum)
      var cum = BigInt(0)
      val devs = days.zipWithIndex.map { case ((_, dUs, c), i) =>
        cum += c
        val k = BigInt(i + 1)
        (dUs, k, cum, (n * cum - k * total).abs)
      }
      val best = devs.maxBy(d => (d._4, -d._1)) // max |dev|, earliest day
      val (cpD, k, cumAt, ndev) = best
      val after = total - cumAt
      val nAfter = n - k
      et -> (n.toLong, total.toLong, cpD, ndev.toLong, k.toLong,
        (cumAt * 1000000 / k).toLong,
        if (nAfter == 0) None else Some((after * 1000000 / nAfter).toLong))
    }
    val got = Relational6.eventsChangepoint(spark, sf).collect()
    assert(got.nonEmpty && got.length == expected.size)
    got.foreach { r =>
      val et = r.getAs[String]("event_type")
      val e = expected(et)
      assert((r.getAs[Long]("n_days"), r.getAs[Long]("total_events"),
        r.getAs[Long]("cp_d_us"), r.getAs[Long]("ndev_max"),
        r.getAs[Long]("n_days_before"), r.getAs[Long]("mean_before_ppm"),
        Option(r.get(r.fieldIndex("mean_after_ppm"))).map(_.asInstanceOf[Long]))
        == e, s"changepoint mismatch for $et")
    }
  }

  test("supplier hhi: BigInt share recompute; index bounds hold") {
    val rows = Relational6.qSupplierHhi(spark, sf).collect()
    assert(rows.length > 0)
    // independent recompute from raw per-(nation, supplier) revenue units
    val raw = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_suppkey"))
      .agg(expr("""CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
                  |  CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
                  |  AS DECIMAL(18,4))) * 10000 AS BIGINT)""".stripMargin).as("rev_u"))
      .collect()
      .map(r => (r.getAs[String]("n_name"), r.getAs[Long]("rev_u")))
    val byNation = raw.groupBy(_._1)
    rows.foreach { r =>
      val nation = r.getAs[String]("n_name")
      val revs = byNation(nation).map(x => BigInt(x._2))
      val total = revs.sum
      val shares = revs.map(v => v * 1000000 / total)
      val hhi = shares.map(s => s * s).sum
      assert(r.getAs[Long]("n_suppliers") == revs.length)
      assert(r.getAs[Long]("hhi_e12") == hhi.toLong, s"hhi mismatch for $nation")
      assert(r.getAs[Long]("top_share_ppm") == shares.max.toLong)
      assert(r.getAs[Long]("effective_suppliers_e3") ==
        (BigInt("1000000000000000") / hhi).toLong)
      // bounds: 1e12/n <= hhi <= 1e12 (up to flooring slack on the left)
      assert(hhi <= BigInt("1000000000000"))
      assert(hhi >= BigInt("1000000000000") / revs.length - revs.length * 2000000L)
    }
  }

  test("elasticity: exact normal equations match a BigInt recompute") {
    val xy = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("x"),
        expr("CAST(l_quantity AS BIGINT)").as("y"))
      .collect()
      .map(r => (r.getAs[String]("p_brand"), BigInt(r.getAs[Long]("x")),
        BigInt(r.getAs[Long]("y"))))
    val rows = Relational6.qDiscountElasticity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[String]("p_brand")
      val pts = xy.filter(_._1 == b)
      val n = BigInt(pts.length)
      val sx = pts.map(_._2).sum; val sy = pts.map(_._3).sum
      val sxy = pts.map(p => p._2 * p._3).sum
      val sxx = pts.map(p => p._2 * p._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      assert(r.getAs[Long]("n_lines") == pts.length)
      assert(r.getAs[Double]("num") == num.toDouble)
      assert(r.getAs[Double]("den") == den.toDouble)
      assert(r.getAs[Double]("slope_qty_per_pct") == num.toDouble / den.toDouble)
      val num2 = sy * sxx - sx * sxy
      assert(r.getAs[Double]("intercept_qty") == num2.toDouble / den.toDouble)
    }
  }

  test("segment transitions: a well-formed Markov matrix over cross-era customers") {
    val rows = Relational6.qSegmentTransitions(spark, sf).collect()
    assert(rows.nonEmpty)
    // deciles in range
    rows.foreach { r =>
      assert((1 to 10).contains(r.getAs[Int]("dec_from")))
      assert((1 to 10).contains(r.getAs[Int]("dec_to")))
    }
    // total matrix mass = customers present in BOTH eras
    val split = Relational6.eraSplit
    val both = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        (col("o_orderdate") < lit(split).cast("timestamp")).as("in_from"))
      .groupBy(col("o_custkey"))
      .agg(max(when(col("in_from"), 1).otherwise(0)).as("f"),
        max(when(!col("in_from"), 1).otherwise(0)).as("t"))
      .filter(col("f") === 1 && col("t") === 1)
      .count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == both)
    // per-row share is the exact floor quotient of the from-decile total
    val byFrom = rows.groupBy(_.getAs[Int]("dec_from"))
    byFrom.values.foreach { rs =>
      val rowTotal = rs.map(_.getAs[Long]("n_customers")).sum
      rs.foreach { r =>
        assert(r.getAs[Long]("row_share_ppm") ==
          r.getAs[Long]("n_customers") * 1000000L / rowTotal)
      }
    }
  }
}
