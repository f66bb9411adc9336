package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.profile.Sequences
import graft.sources.FdInference

class SequencesFdSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("sequence profile matches a driver-side recompute; arithmetic exact") {
    val rows = Sequences.profileSequences(spark, sf).collect()
    assert(rows.length == Sequences.keyCols.length)
    rows.foreach { r =>
      val (t, c) = (r.getAs[String]("table_name"), r.getAs[String]("key_column"))
      val ids = Tables.table(spark, sf, t).select(col(c).cast("long"))
        .collect().map(_.getLong(0))
      val span = ids.max - ids.min + 1
      assert(r.getAs[Long]("n_rows") == ids.length, s"$t rows")
      assert(r.getAs[Long]("n_distinct") == ids.distinct.length, s"$t distinct")
      assert(r.getAs[Long]("min_id") == ids.min && r.getAs[Long]("max_id") == ids.max)
      assert(r.getAs[Long]("span") == span)
      assert(r.getAs[Long]("n_missing") == span - ids.distinct.length)
      assert(r.getAs[Long]("n_dup_rows") == ids.length - ids.distinct.length)
      assert(r.getAs[Long]("contiguity_ppm") == ids.distinct.length * 1000000L / span)
    }
    val byTable = rows.map(r => r.getAs[String]("table_name") -> r).toMap
    // dense dimension: no holes; fact FK: duplicate rows expected
    assert(byTable("customer").getAs[Long]("n_missing") == 0L)
    assert(byTable("lineitem").getAs[Long]("n_dup_rows") > 0L)
  }

  test("FD verdicts match a driver-side recompute; trivial FDs flagged") {
    val rows = FdInference.inferFunctionalDeps(spark, sf).collect()
    assert(rows.length == FdInference.fdPairs.length)
    rows.foreach { r =>
      val (t, det, dep) = (r.getAs[String]("table_name"),
        r.getAs[String]("determinant"), r.getAs[String]("dependent"))
      val pairs = Tables.table(spark, sf, t)
        .select(col(det).cast("string"), col(dep).cast("string"))
        .filter(col(det).isNotNull)
        .collect().map(x => (x.getString(0), x.getString(1)))
      val byDet = pairs.distinct.groupBy(_._1)
      assert(r.getAs[Long]("n_det") == byDet.size, s"$t.$det n_det")
      assert(r.getAs[Long]("n_pairs") == pairs.distinct.length)
      assert(r.getAs[Long]("n_violating_dets") == byDet.count(_._2.length > 1))
      assert(r.getAs[Long]("max_fanout") == byDet.values.map(_.length).max)
      assert(r.getAs[Boolean]("holds") == byDet.forall(_._2.length == 1))
      assert(r.getAs[Boolean]("det_is_keylike") == (byDet.size == pairs.length))
    }
    // the unique-name FD holds but is key-like (trivial), and the verdictor says so
    val nName = rows.find(r => r.getAs[String]("determinant") == "n_name").get
    assert(nName.getAs[Boolean]("holds") && nName.getAs[Boolean]("det_is_keylike"))
  }
}
