package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Collector, JdbcSource}
import graft.output.{ArtifactJson, MarkdownDoc, SqlDdlDoc}

/** JDBC collection end-to-end against an EMBEDDED in-memory Derby
  * database — a real SQL engine with a real catalog, so the collected
  * (not inferred) metadata path is exercised for real: primary keys,
  * composite keys, indexes and foreign keys read through JDBC
  * `DatabaseMetaData`, the engine-neutral face of the reference's
  * dialect catalog queries (postgres/schema_collection.rs:1-877,
  * mysql/schema_collection.rs:1-733).
  */
class JdbcCollectSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val ready: Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // Derby has no DROP IF EXISTS — ignore first-run failures
      Seq("DROP VIEW emp_pay", "DROP TRIGGER emp_upd_audit",
        "DROP TRIGGER emp_del_gate", "DROP TABLE assign", "DROP TABLE emp",
        "DROP TABLE dept", "DROP FUNCTION tax_of",
        "DROP PROCEDURE grant_raise", "DROP TYPE money_t RESTRICT").foreach(s =>
        try st.execute(s) catch { case _: Exception => })
      st.execute(
        "CREATE TABLE dept(dept_id INT NOT NULL PRIMARY KEY, dept_name VARCHAR(40) NOT NULL)")
      st.execute(
        """CREATE TABLE emp(
          |  emp_id INT NOT NULL PRIMARY KEY,
          |  dept_id INT NOT NULL REFERENCES dept(dept_id),
          |  emp_name VARCHAR(60),
          |  salary DOUBLE,
          |  CONSTRAINT emp_sal_ck CHECK (salary > 0))""".stripMargin)
      // DML triggers: an AFTER/row and a BEFORE/statement one (Derby
      // forbids DML actions in NO CASCADE BEFORE triggers — VALUES is
      // the engine's own no-op action form). Collection reads the
      // catalog; nothing ever fires them.
      st.execute(
        "CREATE TRIGGER emp_upd_audit AFTER UPDATE ON emp FOR EACH ROW VALUES 1")
      st.execute(
        "CREATE TRIGGER emp_del_gate NO CASCADE BEFORE DELETE ON emp FOR EACH STATEMENT VALUES 1")
      st.execute("CREATE UNIQUE INDEX dept_name_ux ON dept(dept_name)")
      // NB: an index on emp(dept_id) would be absorbed into Derby's
      // FK backing index — index a non-constrained column instead
      st.execute("CREATE INDEX emp_salary_ix ON emp(salary)")
      st.execute(
        """CREATE TABLE assign(
          |  emp_id INT NOT NULL,
          |  project VARCHAR(20) NOT NULL,
          |  hours INT,
          |  PRIMARY KEY (emp_id, project),
          |  CONSTRAINT assign_emp_fk FOREIGN KEY (emp_id)
          |    REFERENCES emp(emp_id) ON DELETE CASCADE)""".stripMargin)
      // stored routines: a function and a procedure with typed params
      // (the external procedure body is only resolved at CALL time —
      // metadata collection never executes it)
      st.execute(
        """CREATE FUNCTION tax_of(amount DOUBLE) RETURNS DOUBLE
          |PARAMETER STYLE JAVA NO SQL LANGUAGE JAVA
          |EXTERNAL NAME 'java.lang.Math.sqrt'""".stripMargin)
      st.execute(
        """CREATE PROCEDURE grant_raise(IN empid INT, IN pct DOUBLE)
          |PARAMETER STYLE JAVA LANGUAGE JAVA NO SQL
          |EXTERNAL NAME 'graft.NoSuchProcs.grantRaise'""".stripMargin)
      // a custom (user-defined) type for the getUDTs surface
      st.execute(
        "CREATE TYPE money_t EXTERNAL NAME 'java.util.BitSet' LANGUAGE JAVA")
      st.execute("INSERT INTO dept VALUES (1, 'eng'), (2, 'sales')")
      st.execute("INSERT INTO emp VALUES (10, 1, 'ada', 120000.0), " +
        "(11, 1, 'grace', 130000.0), (12, 2, 'edsger', 90000.0)")
      st.execute("INSERT INTO assign VALUES (10, 'alpha', 30), (10, 'beta', 10), (11, 'alpha', 40)")
      st.close()
    } finally conn.close()
  }

  def source: JdbcSource = { ready; new JdbcSource(spark, url, Seq("dept", "emp", "assign")) }

  lazy val artifact = Collector.collect(source, sampleSize = 2)

  test("engine identity is collected from the driver") {
    val (engine, version) = source.engine
    assert(engine == "Apache Derby" && version.nonEmpty)
    val s = artifact.server.get
    assert(s.engine == "Apache Derby" && s.tableCount == 3)
  }

  test("collected primary keys land with collected provenance") {
    val emp = artifact.tables.find(_.name == "emp").get
    assert(emp.keyProvenance == "collected")
    assert(emp.pkCandidates == Seq("EMP_ID"))
    // composite key, in KEY_SEQ order
    val asg = artifact.tables.find(_.name == "assign").get
    assert(asg.keyProvenance == "collected")
    assert(asg.pkCandidates == Seq("EMP_ID", "PROJECT"))
  }

  test("collected indexes carry columns and uniqueness") {
    val dept = artifact.tables.find(_.name == "dept").get
    val ux = dept.indexes.find(_.name == "DEPT_NAME_UX").get
    assert(ux.unique && ux.columns == Seq("DEPT_NAME"))
    val emp = artifact.tables.find(_.name == "emp").get
    val ix = emp.indexes.find(_.name == "EMP_SALARY_IX").get
    assert(!ix.unique && ix.columns == Seq("SALARY"))
    // the FK's system-named backing index is collected too
    assert(emp.indexes.exists(i => i.columns == Seq("DEPT_ID") && !i.unique))
  }

  test("collected foreign keys are engine-declared, coverage pinned to 1.0") {
    val fk = artifact.foreignKeys.find(f => f.childTable == "emp").get
    assert(fk.childColumn == "DEPT_ID" && fk.parentTable == "dept" &&
      fk.parentColumn == "DEPT_ID" && fk.provenance == "collected" &&
      fk.coverage == 1.0 && fk.likely)
    // referential actions ride along: emp->dept is declared bare (SQL
    // default), assign->emp declares ON DELETE CASCADE
    assert(fk.onUpdate == "no_action" && fk.onDelete == "no_action")
    val cas = artifact.foreignKeys.find(_.childTable == "assign").get
    assert(cas.parentTable == "emp" && cas.onDelete == "cascade" &&
      cas.onUpdate == "no_action" && cas.provenance == "collected")
    // the CASCADE renders in the reconstructed DDL; NO ACTION stays
    // implicit (SQL default)
    val ddl = SqlDdlDoc.render(artifact)
    assert(ddl.contains("ALTER TABLE assign ADD FOREIGN KEY (EMP_ID) " +
      "REFERENCES emp (EMP_ID) ON DELETE CASCADE; -- collected"))
  }

  test("stored routines collect with typed parameters and render in docs") {
    val fn = artifact.routines.find(_.name.equalsIgnoreCase("TAX_OF")).get
    assert(fn.routineType == "function")
    assert(fn.returns == "DOUBLE")
    assert(fn.parameters.map(p => (p.name, p.dataType, p.mode)) ==
      Seq(("AMOUNT", "DOUBLE", "in")))
    val proc = artifact.routines.find(_.name.equalsIgnoreCase("GRANT_RAISE")).get
    assert(proc.routineType == "procedure" && proc.returns.isEmpty)
    assert(proc.parameters.map(p => (p.name, p.dataType, p.mode)) ==
      Seq(("EMPID", "INTEGER", "in"), ("PCT", "DOUBLE", "in")))
    // system routines (SYSCS_UTIL, SQLJ) are excluded like SYS tables
    assert(artifact.routines.forall(r => !r.name.toUpperCase.startsWith("SYSCS")))
    // rendered in every doc format + exact json round-trip
    val md = MarkdownDoc.render(artifact)
    assert(md.contains("## Stored routines") && md.contains("TAX_OF"))
    assert(SqlDdlDoc.render(artifact)
      .contains("-- FUNCTION TAX_OF(AMOUNT DOUBLE) RETURNS DOUBLE"))
    assert(graft.output.HtmlDoc.render(artifact).contains("<h2>Stored routines</h2>"))
    val loaded = graft.output.ArtifactLoad.load(ArtifactJson.render(artifact))
    assert(loaded == artifact)
    assert(Collector.validate(artifact).isEmpty)
  }

  test("engine triggers and CHECK constraints are collected end-to-end (r6)") {
    val emp = artifact.tables.find(_.name == "emp").get
    // trigger metadata: event/timing enums + orientation + action SQL
    val upd = emp.triggers.find(_.name == "EMP_UPD_AUDIT").get
    assert(upd.event == "update" && upd.timing == "after" &&
      upd.orientation == "row")
    assert(upd.definition.toUpperCase.contains("VALUES 1"))
    val del = emp.triggers.find(_.name == "EMP_DEL_GATE").get
    assert(del.event == "delete" && del.timing == "before" &&
      del.orientation == "statement")
    // engine CHECK clause: collected provenance, real clause text
    val ck = emp.constraints.find(_.kind == "check").get
    assert(ck.name == "EMP_SAL_CK" && ck.provenance == "collected")
    assert(ck.detail.toLowerCase.contains("salary"))
    // renders in every doc format
    val ddl = SqlDdlDoc.render(artifact)
    assert(ddl.contains("CONSTRAINT EMP_SAL_CK CHECK"))
    assert(ddl.contains("-- collected"))
    assert(ddl.contains(
      "-- TRIGGER EMP_UPD_AUDIT AFTER UPDATE ON emp FOR EACH ROW"))
    assert(ddl.contains(
      "-- TRIGGER EMP_DEL_GATE BEFORE DELETE ON emp FOR EACH STATEMENT"))
    val md = MarkdownDoc.render(artifact)
    assert(md.contains("### Triggers") && md.contains("EMP_UPD_AUDIT"))
    assert(graft.output.HtmlDoc.render(artifact).contains("<h3>Triggers</h3>"))
    // exact json round-trip + validation
    val loaded = graft.output.ArtifactLoad.load(ArtifactJson.render(artifact))
    assert(loaded == artifact)
    assert(Collector.validate(artifact).isEmpty)
  }

  test("engine custom types surface through getUDTs into the artifact") {
    val ct = artifact.customTypes.find(_.name.equalsIgnoreCase("MONEY_T")).get
    assert(ct.kind == "java_object" && ct.className == "java.util.BitSet")
    assert(MarkdownDoc.render(artifact).contains("## Custom types"))
    assert(SqlDdlDoc.render(artifact).contains("-- TYPE MONEY_T (java_object) backed by java.util.BitSet"))
  }

  test("column catalog details: identity + defaults collect, render, round-trip (r6)") {
    val url2 = "jdbc:derby:memory:graftcols;create=true"
    val conn = java.sql.DriverManager.getConnection(url2)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE audit_log") catch { case _: Exception => }
      st.execute(
        """CREATE TABLE audit_log(
          |  log_id INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
          |  note VARCHAR(30) DEFAULT 'none',
          |  amount DOUBLE)""".stripMargin)
      st.execute("INSERT INTO audit_log(note, amount) VALUES ('a', 1.5), ('b', 2.5)")
      st.close()
    } finally conn.close()
    val a = Collector.collect(new JdbcSource(spark, url2, Seq("audit_log")), sampleSize = 2)
    val cols = a.tables.head.columns.map(c => c.name -> c).toMap
    // identity flag + catalog ordinals (models.rs:71-77 parity)
    assert(cols("LOG_ID").autoIncrement && cols("LOG_ID").ordinal == 1)
    assert(!cols("NOTE").autoIncrement && cols("NOTE").ordinal == 2)
    assert(cols("AMOUNT").ordinal == 3)
    // the engine-reported default expression, verbatim
    assert(cols("NOTE").defaultValue == "'none'", cols("NOTE").defaultValue)
    assert(cols("AMOUNT").defaultValue == "")
    // identity defaults are Derby's AUTOINCREMENT bookkeeping, not a
    // user DEFAULT — the DDL renders GENERATED, not DEFAULT
    val ddl = SqlDdlDoc.render(a)
    assert(ddl.contains("LOG_ID INTEGER GENERATED ALWAYS AS IDENTITY"), ddl)
    assert(ddl.contains("DEFAULT 'none'"), ddl)
    assert(MarkdownDoc.render(a).contains("IDENTITY"))
    // exact artifact round-trip with the new fields
    assert(graft.output.ArtifactLoad.load(ArtifactJson.render(a)) == a)
  }

  test("schema + samples collect through the Spark JDBC relation") {
    val emp = artifact.tables.find(_.name == "emp").get
    assert(emp.rowCount == 3)
    assert(emp.columns.map(_.name) == Seq("EMP_ID", "DEPT_ID", "EMP_NAME", "SALARY"))
    assert(emp.columns.find(_.name == "EMP_ID").get.dataType == "int32")
    assert(!emp.columns.find(_.name == "EMP_ID").get.nullable) // NOT NULL collected
    // MostRecent over the collected PK: highest ids first
    assert(emp.samplingStrategy == "most_recent" && emp.samplingKey == "EMP_ID")
    assert(emp.sampleRows.map(_.head) == Seq("12", "11"))
    assert(Collector.validate(artifact).isEmpty)
  }

  test("ddl doc renders the collected constraints for real") {
    val ddl = SqlDdlDoc.render(artifact)
    assert(ddl.contains("EMP_ID INTEGER NOT NULL PRIMARY KEY"))
    assert(ddl.contains("PRIMARY KEY (EMP_ID, PROJECT)")) // composite
    assert(ddl.contains("CREATE UNIQUE INDEX DEPT_NAME_UX ON dept (DEPT_NAME);"))
    assert(ddl.contains("CREATE INDEX EMP_SALARY_IX ON emp (SALARY);"))
    assert(ddl.contains("ALTER TABLE emp ADD FOREIGN KEY (DEPT_ID) REFERENCES dept (DEPT_ID); -- collected"))
    assert(ddl.contains("-- engine: Apache Derby"))
    val md = MarkdownDoc.render(artifact)
    assert(md.contains("Primary key (collected): `EMP_ID`"))
    assert(md.contains("Engine: Apache Derby"))
    val json = ArtifactJson.render(artifact)
    assert(json.contains("\"key_provenance\": \"collected\""))
    assert(json.contains("\"engine\": \"Apache Derby\""))
    assert(json.contains("\"provenance\": \"collected\""))
  }

  test("a failing engine FK read degrades but is recorded, not silent") {
    val flakyMeta = new graft.sources.TableSource with graft.sources.MetadataSource {
      val inner = source
      def name = inner.name
      def tableNames = inner.tableNames
      def load(t: String) = inner.load(t)
      override def engine = inner.engine
      def tableMetadata(t: String) = inner.tableMetadata(t)
      def collectedForeignKeys = throw new RuntimeException("catalog gone away")
    }
    val a = Collector.collect(flakyMeta, sampleSize = 2)
    assert(a.foreignKeys.isEmpty)
    assert(a.warnings.exists(_.contains("foreign-key metadata read failed")))
    // warnings survive the json round-trip and downgrade the outcome
    val loaded = graft.output.ArtifactLoad.load(graft.output.ArtifactJson.render(a))
    assert(loaded == a)
    assert(Collector.CollectionOutcome.fromResults(Seq(a)).exitCode == 4)
  }

  test("a ghost jdbc table degrades instead of aborting the artifact") {
    val bad = { ready; new JdbcSource(spark, url, Seq("dept", "ghost")) }
    val a = Collector.collect(bad, sampleSize = 2)
    val ghost = a.tables.find(_.name == "ghost").get
    assert(ghost.sampleStatus == "failed" && ghost.warnings.nonEmpty)
    assert(a.tables.find(_.name == "dept").get.sampleStatus == "success")
    // a degraded table downgrades the run's access level (r6)
    assert(a.server.get.accessLevel == "limited")
    assert(Collector.validate(a).isEmpty)
  }

  test("empty table list discovers user tables AND views from the catalog") {
    ready
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP VIEW emp_pay") catch { case _: Exception => }
      st.execute("CREATE VIEW emp_pay AS SELECT emp_id, salary FROM emp")
      st.close()
    } finally conn.close()
    val auto = new JdbcSource(spark, url)
    // discovery finds the three tables + the view, no SYS catalog noise
    assert(auto.tableNames.map(_.toUpperCase).toSet ==
      Set("DEPT", "EMP", "ASSIGN", "EMP_PAY"))
    val a = Collector.collect(auto, sampleSize = 2)
    assert(Collector.validate(a).isEmpty)
    val view = a.tables.find(_.name.equalsIgnoreCase("EMP_PAY")).get
    assert(view.tableType == "view")
    assert(view.columns.map(_.name) == Seq("EMP_ID", "SALARY"))
    assert(view.rowCount == 3) // views read through the same relation
    assert(a.tables.filter(_.name.equalsIgnoreCase("EMP")).head.tableType == "table")
    // the view's DEFINING SQL is collected (SYS.SYSVIEWS), not just its
    // resolved schema, and renders as a real CREATE VIEW in the ddl
    assert(view.viewDefinition.toLowerCase.replaceAll("\\s+", " ")
      .contains("select emp_id, salary from emp"))
    val ddl = SqlDdlDoc.render(a)
    assert(ddl.contains("definition collected"))
    assert(ddl.toUpperCase.contains("CREATE VIEW EMP_PAY AS"))
    // an auto-discovered survey must carry the engine's FK edges too —
    // the discovered set (not the empty constructor list) is walked, so
    // collected provenance + referential actions survive discovery mode
    val empFk = a.foreignKeys.find(f =>
      f.childTable.equalsIgnoreCase("EMP") && f.provenance == "collected").get
    assert(empFk.parentTable.equalsIgnoreCase("DEPT") &&
      empFk.childColumn == "DEPT_ID" && empFk.coverage == 1.0)
    val casFk = a.foreignKeys.find(f =>
      f.childTable.equalsIgnoreCase("ASSIGN") && f.provenance == "collected").get
    assert(casFk.parentTable.equalsIgnoreCase("EMP") && casFk.onDelete == "cascade")
    assert(ddl.contains("ON DELETE CASCADE"))
    // the discovered relationship graph renders in mermaid too
    val mm = graft.output.MermaidDoc.render(a)
    assert(mm.contains("}o--||"))
    assert(mm.toUpperCase.contains("EMP }O--|| DEPT") ||
      mm.contains("EMP }o--|| DEPT"))
    // FK-dependency load order: dept(0) -> emp(1) -> assign(2), and the
    // rendered DDL creates parents before children so it executes as-is
    val layers = Collector.loadOrder(a)
      .map { case (t, l) => t.toUpperCase -> l }.toMap
    assert(layers("DEPT") == 0 && layers("EMP") == 1 && layers("ASSIGN") == 2)
    val ddlU = ddl.toUpperCase
    val depts = ddlU.indexOf("CREATE TABLE DEPT")
    val emps = ddlU.indexOf("CREATE TABLE EMP ")
    val assigns = ddlU.indexOf("CREATE TABLE ASSIGN")
    assert(depts >= 0 && emps >= 0 && assigns >= 0 && depts < emps && emps < assigns)
    assert(ddl.contains("-- load order: layer 2"))
    // type survives json round-trip and renders in the ddl
    val loaded = graft.output.ArtifactLoad.load(graft.output.ArtifactJson.render(a))
    assert(loaded == a)
  }

  test("partitioned jdbc read slices on the key and preserves the rows") {
    val df = source.loadPartitioned("emp", "emp_id", 2)
    assert(df.rdd.getNumPartitions == 2)
    val plain = source.load("emp")
    assert(df.count() == 3)
    assert(df.exceptAll(plain).count() == 0 && plain.exceptAll(df).count() == 0)
  }

  test("inference agrees with the engine catalog on the same data") {
    // run the INFERRED path over the same JDBC tables: data-driven PK
    // candidates must include every collected PK column set's head
    val inferred = Collector.collect(source, sampleSize = 2, withKeys = true)
    val emp = inferred.tables.find(_.name == "emp").get
    // collected metadata still wins (provenance stays collected)...
    assert(emp.keyProvenance == "collected" && emp.pkCandidates == Seq("EMP_ID"))
    // ...and the inferred FK edges dedup against the collected one
    val empFks = inferred.foreignKeys.filter(f =>
      f.childTable == "emp" && f.childColumn == "DEPT_ID" &&
        f.parentTable == "dept" && f.parentColumn == "DEPT_ID")
    assert(empFks.size == 1 && empFks.head.provenance == "collected")
  }

  test("degrade matrix: every Derby metadata surface collects (r12 VERDICT #6)") {
    ready
    // widen the fixture to cover EVERY surface in one artifact: the view
    // (discovery test creates it too — idempotent) and an identity +
    // default table in the SAME database
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP VIEW emp_pay") catch { case _: Exception => }
      st.execute("CREATE VIEW emp_pay AS SELECT emp_id, salary FROM emp")
      try st.execute("DROP TABLE audit_trail") catch { case _: Exception => }
      st.execute(
        """CREATE TABLE audit_trail(
          |  log_id INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
          |  note VARCHAR(30) DEFAULT 'none')""".stripMargin)
      st.execute("INSERT INTO audit_trail(note) VALUES ('a')")
      st.close()
    } finally conn.close()
    val a = Collector.collect(
      new JdbcSource(spark, url, Seq("dept", "emp", "assign", "emp_pay",
        "audit_trail")), sampleSize = 2)
    // the SQL-standard catalog-rich engine: every surface answers
    SurfaceMatrix.assertMatrix("derby", a, Map(
      "primary_keys"      -> "collected",
      "foreign_keys"      -> "collected",
      "indexes"           -> "collected",
      "views"             -> "collected", // SYS.SYSVIEWS has the text
      "routines"          -> "collected",
      "custom_types"      -> "collected",
      "triggers"          -> "collected",
      "check_constraints" -> "collected",
      "identity_defaults" -> "collected",
      "samples"           -> "collected",
      "row_counts"        -> "collected"))
  }

  test("connection test probes the engine without collecting; failures degrade") {
    val urlT = "jdbc:derby:memory:graftprobe;create=true"
    val c = java.sql.DriverManager.getConnection(urlT)
    c.createStatement().execute("CREATE TABLE probe_t (id INT PRIMARY KEY)")
    c.close()
    val ok = Collector.testConnection(new JdbcSource(spark, urlT))
    assert(ok.ok, ok.error)
    assert(ok.engine == "Apache Derby" && ok.version.nonEmpty)
    assert(ok.nTables > 0)
    // a bad URL reports, never throws — the CLI exit-code contract
    val bad = Collector.testConnection(
      new JdbcSource(spark, "jdbc:derby:/nonexistent/nope;create=false"))
    assert(!bad.ok && bad.error.nonEmpty && bad.nTables == 0)
    // `list` names every supported source family with its format
    val kinds = Collector.supportedSources.map(_._1)
    assert(kinds.contains("parquet-lake") && kinds.contains("jdbc-derby"))
    assert(Collector.supportedSources.forall(_._2.nonEmpty))
  }
}
