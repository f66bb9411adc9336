package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 specs: the canary split into six single-device gated keys
  * (r13 VERDICT #1 — the red SET is the diagnosis), the redactor's
  * fail-closed unknown-typed-cell rule (r13 ADVICE), and the
  * env_fingerprint self-description row (r13 VERDICT #6).
  */
class Round14Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  // --------------------------------------------- canary split identity

  test("six single-device canary keys jointly equal the combined grid") {
    val combined = operators.Stats.statsCastCanary(spark, sf)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(combined.size == 12)
    val devices = Seq(
      "canary_parse" -> Seq("src", "as_double"),
      "canary_floor" -> Seq("floor_ppb"),
      "canary_intdiv" -> Seq("intdiv_wide"),
      "canary_comp" -> Seq("comp_raw"),
      "canary_dec9_spark" -> Seq("dec9_spark"),
      "canary_dec9_duck" -> Seq("dec9_duck"))
    for ((key, cols) <- devices) {
      val rows = SparkEntry.queries(key)(spark, sf).collect()
      assert(rows.length == 12, s"$key row count")
      rows.foreach { r =>
        val c = combined(r.getAs[Long]("id"))
        cols.foreach { name =>
          assert(r.get(r.fieldIndex(name)) == c.get(c.fieldIndex(name)),
            s"$key.$name diverges from the combined grid")
        }
      }
      // every gated canary key must also carry its oracle twin
      assert(SparkEntry.oracleSql.contains(key), s"$key missing oracle")
    }
  }

  test("the four build-independent canary devices match a JVM recompute") {
    // These four must be green in ANY environment: parse and the
    // composition are correctly-rounded IEEE, floor is exact after an
    // identical multiply, the wide integer division is exact integer
    // algebra. A red on one of these in the driver gate is a REAL
    // defect, not build skew — this spec is the local proof.
    val parse = SparkEntry.queries("canary_parse")(spark, sf).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    val floor = SparkEntry.queries("canary_floor")(spark, sf).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("floor_ppb")).toMap
    val intdiv = SparkEntry.queries("canary_intdiv")(spark, sf).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("intdiv_wide")).toMap
    val comp = SparkEntry.queries("canary_comp")(spark, sf).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("comp_raw")).toMap
    parse.foreach { case (id, r) =>
      val d = r.getAs[String]("src").toDouble
      assert(r.getAs[Double]("as_double") == d)
      assert(floor(id) == math.floor(d * 1e9).toLong)
      assert(comp(id) == math.sqrt(math.abs(d)) / (1.0 + math.abs(d)))
      assert(intdiv(id) == id * 1000000007L / 97L)
    }
  }

  // ------------------------------------------ redactor fails closed

  test("redactArtifact masks header cells with no recorded ColumnInfo") {
    import graft.sources.Collector.{Artifact, ColumnInfo, TableInfo}
    import graft.profile.Redactor
    // A hand-edited/malformed artifact: the sample header carries a
    // credential-named column the columns list no longer records. The
    // pre-r14 behavior resolved its type to "" and passed the value
    // through unmasked in EVERY mode — the fail-open this pins shut.
    val t = TableInfo("t",
      columns = Seq(ColumnInfo("id", "int64", nullable = false)),
      rowCount = 1,
      sampleHeader = Seq("id", "password"),
      sampleRows = Seq(Seq("7", "hunter2")))
    val a = Artifact("1.3", "test", Seq(t))
    for (mode <- Seq(Redactor.Minimal, Redactor.Balanced,
        Redactor.Conservative)) {
      val out = Redactor.redactArtifact(a, mode).tables.head.sampleRows.head
      assert(out == Seq("7", Redactor.Redacted),
        s"unknown-typed credential cell must mask under $mode: $out")
    }
    // the int64-typed id still passes through (typed non-strings are
    // not maskable), and None_ mode still masks nothing by contract
    val none = Redactor.redactArtifact(a, Redactor.None_)
      .tables.head.sampleRows.head
    assert(none == Seq("7", "hunter2"))
  }

  // ------------------------------------------------- env fingerprint

  test("env_fingerprint is one self-describing row") {
    val rows = SparkEntry.queries("env_fingerprint")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("spark_version") == spark.version)
    assert(r.getAs[String]("scala_version").startsWith("2.13"))
    assert(r.getAs[String]("java_version").nonEmpty)
    // rows-only by purpose: a fingerprint can't hash-match an oracle
    assert(!SparkEntry.oracleSql.contains("env_fingerprint"))
  }
}
