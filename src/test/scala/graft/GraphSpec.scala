package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("pagerank top-20 matches an exact driver-side fixed-point recompute") {
    val got = GraphOps.pageRank(spark, sf).collect()
      .map(r => (r.getAs[String]("node"), r.getAs[Long]("rank_e9")))
    assert(got.length == 20)
    // exact recompute with the same Long arithmetic
    val pairs = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().collect()
      .map(r => (s"c:${r.getLong(0)}", s"s:${r.getLong(1)}"))
    val edges = pairs.flatMap { case (c, s) => Seq((c, s), (s, c)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nodes = deg.keys.toSeq
    val n = nodes.size
    var rank = nodes.map(_ -> GraphOps.unit / n).toMap
    val baseU = (GraphOps.unit -
      GraphOps.unit * GraphOps.dampingNum / GraphOps.dampingDen) / n
    for (_ <- 1 to GraphOps.defaultIters) {
      val in = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      edges.foreach { case (src, dst) => in(dst) += rank(src) / deg(src) }
      rank = nodes.map(v =>
        v -> (baseU + GraphOps.dampingNum * in(v) / GraphOps.dampingDen)).toMap
    }
    val expect = rank.toSeq.sortBy { case (v, r) => (-r, v) }.take(20)
    assert(got.toSeq == expect)
    // structural sanity: mass stays ~1 (floor losses only), suppliers
    // (high degree) dominate the top ranks
    assert(rank.values.sum <= GraphOps.unit)
    assert(rank.values.sum > GraphOps.unit * 9 / 10)
    assert(got.head._1.startsWith("s:"))
  }
}
