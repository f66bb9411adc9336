package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.functions._
import graft.sources.{Collector, JdbcSource, HiveDialect}
import graft.output.{ArtifactJson, MarkdownDoc, SqlDdlDoc}
import scala.jdk.CollectionConverters._

/** JDBC collection end-to-end against a SECOND live engine: an
  * in-process `HiveThriftServer2` speaking the HiveServer2 wire protocol
  * over `hive-jdbc` — zero network egress, both jars ship in
  * /opt/spark/jars. Derby (JdbcCollectSpec) proves the seam on a
  * catalog-rich SQL-standard engine; this proves it on an engine with a
  * DIFFERENT dialect surface, asserting the documented degrades rather
  * than working around them:
  *
  *  - no PK/FK/index catalog (HiveServer2 exposes none through JDBC
  *    metadata) → keyProvenance = "inferred", the inference path;
  *  - different identifier quoting (backticks; double quotes are string
  *    literals) → the HiveDialect registration, behaviorally asserted
  *    on a reserved-word column;
  *  - different type vocabulary (STRING, not VARCHAR);
  *  - view definitions not wired for this dialect → collected empty.
  *
  * The reference ships one adapter per engine (postgres/mysql/mssql/
  * sqlite/mongodb); the JDBC-neutral seam + per-dialect degrade is the
  * sandbox substitution, and with this spec it is a two-engine fact.
  */
class HiveCollectSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSession.spark

  private var server: Option[org.apache.hive.service.server.HiveServer2] = None
  private var url: String = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_hive")
    spark.sql("DROP TABLE IF EXISTS graft_hive.graft_people")
    spark.sql("DROP TABLE IF EXISTS graft_hive.graft_orders")
    spark.sql("DROP VIEW IF EXISTS graft_hive.graft_adults")
    // a killed previous run leaves managed-table locations behind with
    // no catalog entry (in-memory catalog) — clear them or CREATE fails
    // with LOCATION_ALREADY_EXISTS
    val wh = java.nio.file.Paths.get("spark-warehouse", "graft_hive.db")
    if (java.nio.file.Files.exists(wh)) {
      java.nio.file.Files.walk(wh).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
    // `date` is the reserved-word column the quoting assertion rides on
    spark.sql(
      """CREATE TABLE graft_hive.graft_people USING PARQUET AS
        |SELECT id, concat('person_', id) AS name,
        |       CAST(20 + id % 50 AS INT) AS age,
        |       concat('2024-01-', lpad(CAST(1 + id % 28 AS STRING), 2, '0')) AS `date`
        |FROM range(20)""".stripMargin)
    spark.sql(
      """CREATE TABLE graft_hive.graft_orders USING PARQUET AS
        |SELECT id AS order_id, id % 20 AS person_id,
        |       CAST(id * 7 % 100 AS DOUBLE) AS amount
        |FROM range(60)""".stripMargin)
    spark.sql(
      "CREATE VIEW graft_hive.graft_adults AS " +
        "SELECT id, name FROM graft_hive.graft_people WHERE age >= 21")
    // ephemeral port; HiveConf picks matching system properties up
    System.setProperty("hive.server2.thrift.port", "0")
    System.setProperty("hive.server2.thrift.bind.host", "localhost")
    val srv = org.apache.spark.sql.hive.thriftserver.GraftThriftAccess
      .start(spark.sqlContext)
    server = Some(srv)
    val port = {
      var p = 0
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (p <= 0 && System.nanoTime() < deadline) {
        p = srv.getServices.asScala.collectFirst {
          case t: org.apache.hive.service.cli.thrift.ThriftCLIService
              if t.getPortNumber > 0 => t.getPortNumber
        }.getOrElse { Thread.sleep(100); 0 }
      }
      assert(p > 0, "thrift server did not open a port")
      p
    }
    url = s"jdbc:hive2://localhost:$port/graft_hive"
    // wait until the server accepts sessions
    var ok = false
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var last: Throwable = null
    while (!ok && System.nanoTime() < deadline) {
      try { java.sql.DriverManager.getConnection(url).close(); ok = true }
      catch { case e: Throwable => last = e; Thread.sleep(250) }
    }
    assert(ok, s"could not connect to $url: $last")
  }

  override def afterAll(): Unit = {
    try server.foreach(_.stop())
    finally {
      spark.sql("DROP VIEW IF EXISTS graft_hive.graft_adults")
      spark.sql("DROP TABLE IF EXISTS graft_hive.graft_people")
      spark.sql("DROP TABLE IF EXISTS graft_hive.graft_orders")
      spark.sql("DROP DATABASE IF EXISTS graft_hive")
      super.afterAll()
    }
  }

  private def source: JdbcSource =
    new JdbcSource(spark, url, Seq("graft_people", "graft_orders", "graft_adults"))

  /** Test-topology device: server and client share ONE local[4]
    * scheduler here, so any single action that scans several hive-JDBC
    * relations in parallel (KeyInference's union) fills every task slot
    * with outer scans that are themselves WAITING on the in-process
    * server — which then cannot get a slot to run their queries: a
    * slot-starvation deadlock that does not exist in the real topology
    * (the server is a remote cluster with its own scheduler). The spec
    * source therefore materializes each load eagerly, one table at a
    * time, so at most one task slot ever waits on the server.
    */
  private class EagerJdbcSource extends JdbcSource(spark, url,
      Seq("graft_people", "graft_orders", "graft_adults")) {
    private val cache = new scala.collection.concurrent.TrieMap[String, org.apache.spark.sql.DataFrame]()
    override def load(table: String): org.apache.spark.sql.DataFrame =
      cache.getOrElseUpdate(table, {
        val df = super.load(table).cache()
        df.count()
        df
      })
  }

  lazy val artifact = Collector.collect(new EagerJdbcSource, sampleSize = 2,
    withKeys = true)

  test("engine identity: the hive2 endpoint reports Spark SQL, not Derby") {
    val (engine, version) = source.engine
    assert(engine == "Spark SQL", engine)
    assert(version.nonEmpty)
    assert(artifact.server.get.tableCount == 3)
  }

  test("reserved-word column survives pruned reads (backtick dialect)") {
    // without HiveDialect, Spark quotes the projection as "date" — a
    // string LITERAL to this engine — and every row comes back 'date'
    val vals = spark.read.jdbc(url, "graft_people", new java.util.Properties())
      .select(col("date")).collect().map(_.getString(0)).toSet
    assert(!vals.contains("date"), s"projection collapsed to a literal: $vals")
    assert(vals.forall(_.startsWith("2024-01-")), vals.take(3).toString)
  }

  test("no engine key catalog -> the documented degrade to inference") {
    val people = artifact.tables.find(_.name == "graft_people").get
    assert(people.keyProvenance == "inferred", people.keyProvenance)
    // the inference path still finds the unique not-null id column
    assert(people.pkCandidates.contains("id"), people.pkCandidates)
    // and no engine-collected FK edges exist; any person->order edge is
    // inference-provenance only
    assert(artifact.foreignKeys.forall(_.provenance != "collected"))
    // the per-surface degrades are RECORDED, not silent: the missing
    // key/index surfaces land as table warnings
    assert(people.warnings.exists(_.contains("not collected")),
      people.warnings.mkString("; "))
  }

  test("dialect type vocabulary differs from Derby's (STRING, not VARCHAR)") {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getColumns(null, "graft_hive", "graft_people", null)
      val types = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => r.getString("COLUMN_NAME") -> r.getString("TYPE_NAME"))
        .toMap
      rs.close()
      assert(types("name") == "STRING", types)
      assert(types("age") == "INT", types)
    } finally conn.close()
  }

  test("views discover with view type and an empty (unwired) definition") {
    val v = artifact.tables.find(_.name == "graft_adults").get
    assert(v.tableType == "view")
    assert(v.viewDefinition.isEmpty) // no hive2 view-SQL dialect wired
    assert(v.rowCount > 0) // the view still loads and samples as data
  }

  test("schema, rows and samples collect through the Spark JDBC relation") {
    val orders = artifact.tables.find(_.name == "graft_orders").get
    assert(orders.rowCount == 60)
    assert(orders.columns.map(_.name) == Seq("order_id", "person_id", "amount"))
    assert(orders.columns.find(_.name == "amount").get.dataType == "float64")
    assert(orders.sampleRows.nonEmpty)
  }

  test("artifact renders in every format and round-trips exactly") {
    val md = MarkdownDoc.render(artifact)
    assert(md.contains("graft_people") && md.contains("graft_orders"))
    assert(SqlDdlDoc.render(artifact).contains("graft_people"))
    assert(graft.output.HtmlDoc.render(artifact).contains("graft_people"))
    val loaded = graft.output.ArtifactLoad.load(ArtifactJson.render(artifact))
    assert(loaded == artifact)
    assert(Collector.validate(artifact).isEmpty)
  }

  test("degrade matrix: every HiveServer2 surface pins its documented degrade (r12 VERDICT #6)") {
    // the dialect-poor engine: catalog surfaces degrade exactly as
    // documented — keys fall back to inference, views are visible
    // without bodies, and every pure-catalog surface is absent. The
    // matrix makes the degrades a TABLE a third dialect extends, not
    // behavior scattered across assertions.
    // NB suite-order fact: the in-process Hive metastore (DataNucleus on
    // embedded Derby) must initialize BEFORE any jdbc:derby:memory:* use
    // in the same JVM — `sbt test` runs suites sequentially in one
    // forked JVM with H < J, so this holds; a hand-ordered
    // `testOnly Jdbc... Hive...` wedges the metastore (pre-existing,
    // observed r13).
    SurfaceMatrix.assertMatrix("hive2", artifact, Map(
      "primary_keys"      -> "inferred",  // withKeys inference path
      "foreign_keys"      -> "inferred",  // no FK catalog; KeyInference
                                          // proposes the person_id edge
      "indexes"           -> "absent",    // no index catalog
      "views"             -> "discovered-no-definition",
      "routines"          -> "absent",    // getProcedures yields nothing
      "custom_types"      -> "absent",    // no getUDTs surface
      "triggers"          -> "absent",    // engine has no DML triggers
      "check_constraints" -> "absent",    // no constraint catalog
      "identity_defaults" -> "absent",    // no identity/defaults via JDBC
      "samples"           -> "collected",
      "row_counts"        -> "collected"))
  }

  test("partition-bounded parallel read works through the hive2 dialect") {
    // 2 slices, not 4: outer JDBC slices wait on the in-process server,
    // which needs a free slot of the SAME local[4] scheduler (see
    // EagerJdbcSource) — 2 leaves room; a real deployment has disjoint
    // schedulers and runs any width
    val df = source.loadPartitioned("graft_orders", "order_id", 2)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 60)
    assert(df.agg(sum(col("order_id"))).collect()(0).getLong(0) == (0L until 60L).sum)
  }
}
