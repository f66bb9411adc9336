package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{CatalogSurvey, Collector}

/** Catalog-object surfaces: views, type inventory, routines, and
  * multi-database enumeration.
  */
class CatalogSurveySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("standard views resolve and are queryable after registration") {
    CatalogSurvey.registerStandardViews(spark, sf)
    CatalogSurvey.standardViews.foreach { case (name, _) =>
      assert(spark.table(name).count() > 0, name)
    }
    // resolved aggregation types follow the shared-dialect contract
    val vc = spark.table("v_customer_orders").schema
    assert(vc("n_orders").dataType.simpleString == "bigint")
    assert(vc("total_spent").dataType.simpleString == "double")
  }

  test("catalog_views surveys every standard view's resolved schema") {
    val rows = CatalogSurvey.catalogViews(spark, sf).collect()
    val byView = rows.groupBy(_.getAs[String]("view_name"))
    assert(byView.keySet == CatalogSurvey.standardViews.map(_._1).toSet)
    assert(rows.exists(r => r.getAs[String]("view_name") == "v_doc_stats" &&
      r.getAs[String]("column_name") == "total_chars" &&
      r.getAs[String]("data_type") == "int64"))
  }

  test("catalog_types inventories the lake's type usage") {
    val types = CatalogSurvey.catalogTypes(spark, sf).collect()
      .map(r => r.getAs[String]("data_type") ->
        (r.getAs[Long]("n_columns"), r.getAs[Long]("n_tables"))).toMap
    assert(types.contains("array<float32>")) // the embedding column
    assert(types("array<float32>") == (1L, 1L))
    assert(types("string")._1 > 10)
    assert(types("timestamp")._2 >= 3) // orders, lineitem, events
  }

  test("catalog_routines lists the registered graft functions") {
    val fns = CatalogSurvey.catalogRoutines(spark, sf).collect()
      .map(_.getAs[String]("function_name"))
    CatalogSurvey.routineNames.foreach(n => assert(fns.contains(n), n))
    // and they actually compute
    CatalogSurvey.registerRoutines(spark)
    val r = spark.sql(
      "SELECT graft_norm_text('  A  b\tC ') AS t, graft_token_count('a b  c') AS n")
      .collect()(0)
    assert(r.getAs[String]("t") == "a b c")
    assert(r.getAs[Int]("n") == 3)
  }

  test("key inference degrades to empty results on catalogs with no eligible columns") {
    import spark.implicits._
    import graft.sources.KeyInference
    val stringOnly = Seq(("a", "b"), ("c", "d")).toDF("x", "y")
    val fk = KeyInference.foreignKeysFor(Seq("t1" -> stringOnly))
    assert(fk.count() == 0)
    assert(fk.columns.toSeq == Seq("child_table", "child_column",
      "parent_table", "parent_column", "n_values", "coverage", "is_likely_fk"))
    val arrayOnly = Seq(Tuple1(Seq(1.0))).toDF("v")
    val pk = KeyInference.primaryKeysFor(Seq("t2" -> arrayOnly))
    assert(pk.count() == 0 && pk.columns.contains("is_pk_candidate"))
    // and collect(withKeys) over such a source must not abort
    val src = new graft.sources.TableSource {
      def name = "stringy"
      def tableNames = Seq("only")
      def load(t: String) = stringOnly
    }
    val a = Collector.collect(src, sampleSize = 1, withKeys = true)
    assert(a.foreignKeys.isEmpty && Collector.validate(a).isEmpty)
  }

  test("composite keys: catalog truths hold and minimality fires on a planted key") {
    import graft.sources.KeyInference
    import org.apache.spark.sql.functions.col
    val rows = KeyInference.inferCompositeKeys(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPair = rows.map(r => (r.getAs[String]("table_name"),
      r.getAs[String]("col_a"), r.getAs[String]("col_b")) -> r).toMap
    // the synthetic lineitem REUSES line numbers within an order (checked
    // against the raw data below) — the honest answer is "no composite
    // key", and the op must say so rather than bless the TPC-H folklore
    val li = byPair(("lineitem", "l_orderkey", "l_linenumber"))
    assert(!li.getAs[Boolean]("is_composite_key"))
    val dp = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber")).distinct().count()
    assert(li.getAs[Long]("n_distinct_pairs") == dp)
    assert(dp < li.getAs[Long]("n_rows"))
    // (o_orderkey, o_custkey) IS a key but NOT minimal: o_orderkey keys alone
    val ord = byPair(("orders", "o_orderkey", "o_custkey"))
    assert(ord.getAs[Boolean]("is_composite_key") && !ord.getAs[Boolean]("is_minimal"))
    // no pair claims minimality while one side is a unary key
    rows.filter(_.getAs[Boolean]("is_minimal")).foreach { r =>
      assert(r.getAs[Long]("n_distinct_a") < r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("n_distinct_b") < r.getAs[Long]("n_rows"))
    }
    // planted fixture: (part, seq) is a genuine MINIMAL composite key —
    // both columns repeat alone, the pair is unique
    import spark.implicits._
    val planted = Seq((1L, 1), (1L, 2), (2L, 1), (2L, 2))
      .toDF("part", "seq")
    val p = KeyInference.compositeKeysFor(Seq("planted" -> planted)).collect()
    assert(p.length == 1)
    assert(p.head.getAs[Boolean]("is_composite_key") &&
      p.head.getAs[Boolean]("is_minimal"))
  }

  test("enumerateLakes finds every sf database under the testdata root") {
    val lakes = Collector.enumerateLakes(spark, "/root/testdata")
    assert(lakes.size >= 3)
    assert(lakes.map(_.name).exists(_.endsWith("sf0.001")))
    assert(lakes.map(_.name).exists(_.endsWith("sf0.01")))
  }

  test("collectAll surveys multiple databases into one multi-artifact") {
    val lakes = Collector.enumerateLakes(spark, "/root/testdata")
      .filter(l => l.name.endsWith("sf0.001") || l.name.endsWith("sf0.01"))
    val multi = Collector.collectAll(lakes, sampleSize = 1)
    assert(multi.databases.size == 2)
    multi.databases.foreach { a =>
      assert(a.tables.size == 10)
      assert(Collector.validate(a).isEmpty)
    }
    // row counts grow with scale factor
    def rows(suffix: String) = multi.databases
      .find(_.source.endsWith(suffix)).get
      .tables.find(_.name == "lineitem").get.rowCount
    assert(rows("sf0.01") > rows("sf0.001"))
  }
}
