package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JsonSchema

/** Document-store schema inference over a deliberately heterogeneous
  * corpus (the testdata's events.props is uniform `{"k": int}`, so the
  * driver oracle only proves the plumbing — this spec proves the
  * inference semantics: mixed types, missing keys, nulls, nesting,
  * malformed docs).
  */
class JsonSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  lazy val profile: Map[String, org.apache.spark.sql.Row] = {
    import spark.implicits._
    val docs = Seq(
      """{"id": 1, "name": "a", "score": 1.5, "tags": [1,2], "meta": {"x": 1}, "active": true}""",
      """{"id": 2, "name": "b", "score": 2, "extra": null}""",
      """{"id": "three", "name": "c"}""",
      """not json at all""",
      null
    ).toDF("j")
    JsonSchema.inferColumn(docs, "j").collect()
      .map(r => r.getAs[String]("key") -> r).toMap
  }

  test("per-key presence counts ignore malformed and null documents") {
    assert(profile("id").getAs[Long]("n_present") == 3)
    assert(profile("name").getAs[Long]("n_present") == 3)
    assert(profile("score").getAs[Long]("n_present") == 2)
    assert(profile("extra").getAs[Long]("n_present") == 1)
    // presence denominator is ALL documents (5), including unparseable
    assert(profile("id").getAs[Double]("presence") == 3.0 / 5)
  }

  test("type histograms separate int/float/string/bool/null/array/object") {
    val id = profile("id")
    assert(id.getAs[Long]("n_int") == 2 && id.getAs[Long]("n_string") == 1)
    // mixed int-dominant key: ties broken by taxonomy order
    assert(id.getAs[String]("dominant_type") == "int")
    val score = profile("score")
    assert(score.getAs[Long]("n_float") == 1 && score.getAs[Long]("n_int") == 1)
    // float vs int tie -> float (earlier in taxonomy)
    assert(score.getAs[String]("dominant_type") == "float")
    assert(profile("tags").getAs[String]("dominant_type") == "array")
    assert(profile("meta").getAs[String]("dominant_type") == "object")
    assert(profile("active").getAs[String]("dominant_type") == "bool")
    assert(profile("extra").getAs[String]("dominant_type") == "null")
    assert(profile("name").getAs[String]("dominant_type") == "string")
  }

  test("whole numbers beyond int64 classify as int (uint64 parity range)") {
    import spark.implicits._
    // 2^63 = 9223372036854775808 parses as DECIMAL(19,0)/UBIGINT
    val docs = Seq("""{"big": 9223372036854775808, "neg": -1, "frac": 1.5}""").toDF("j")
    val prof = JsonSchema.inferColumn(docs, "j").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("dominant_type")).toMap
    assert(prof("big") == "int")
    assert(prof("neg") == "int")
    assert(prof("frac") == "float")
  }

  test("events.props infers the single uniform int key") {
    val rows = JsonSchema.inferEventsProps(spark, TestSession.sf).collect()
    assert(rows.length == 1)
    val k = rows(0)
    assert(k.getAs[String]("key") == "k")
    assert(k.getAs[String]("dominant_type") == "int")
    assert(k.getAs[Double]("presence") == 1.0)
  }
}
