package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Document-store schema inference — the Spark re-expression of the
  * reference's mongodb adapter (`adapters/mongodb/schema_inference.rs`,
  * 453 lines: unify a schema from semi-structured documents). Over a
  * JSON string column, infer the per-key profile: presence counts and
  * the type histogram (null/bool/int/float/string/array/object) with a
  * dominant type per key.
  *
  * Spark-first shape: `from_json(col, 'map<string,variant>')` parses each
  * document once into Spark 4 VARIANT values; `schema_of_variant` reads
  * each value's type per row (all codegen'd builtins); one explode + one
  * groupBy(key). The DuckDB oracle derives the same histogram from
  * `json_keys` + `json_type`, each engine's native type names mapped to
  * the shared neutral taxonomy. Keys are assumed flat (top-level, no '.'
  * in names) — the document-store top-level-field case; malformed JSON
  * documents parse to NULL and drop out on both engines.
  *
  * Dominant type: the max-count type; ties resolve by the fixed taxonomy
  * order below (both engines evaluate the identical CASE chain).
  */
object JsonSchema {

  /** Tiebreak priority for dominant_type (first max in this order wins). */
  private val taxonomy =
    Seq("object", "array", "string", "float", "int", "bool", "null")

  /** Spark variant schema string -> neutral type name. Whole JSON
    * numbers beyond int64 parse as DECIMAL(p,0) in Spark's variant and
    * as UBIGINT in DuckDB up to 2^64 — both classify as int here;
    * integers beyond uint64 are engine-dependent (DuckDB degrades to
    * DOUBLE) and out of the parity contract.
    */
  private def classify(st: Column): Column =
    when(st.startsWith("OBJECT"), "object")
      .when(st.startsWith("ARRAY"), "array")
      .when(st === "STRING", "string")
      .when(st.startsWith("DECIMAL") && st.endsWith(",0)"), "int")
      .when(st.startsWith("DECIMAL") || st === "DOUBLE" || st === "FLOAT", "float")
      .when(st === "BIGINT" || st === "INT" || st === "SMALLINT" || st === "TINYINT", "int")
      .when(st === "BOOLEAN", "bool")
      .when(st === "VOID", "null")
      .otherwise("other")

  /** Per-key schema profile of a JSON string column. */
  def inferColumn(df: DataFrame, jsonCol: String): DataFrame = {
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val typed = df
      .select(explode(map_entries(
        from_json(col(jsonCol), "map<string,variant>", Map.empty[String, String])))
        .as("e"))
      .select(col("e.key").as("key"),
        classify(schema_of_variant(col("e.value"))).as("tp"))
    val typeCounts = taxonomy.map(t =>
      sum(when(col("tp") === t, 1L).otherwise(0L)).as(s"n_$t"))
    val dominant = taxonomy.foldRight(lit("none")) { (t, rest) =>
      when(taxonomy.filter(_ != t)
        .map(o => col(s"n_$t") >= col(s"n_$o")).reduce(_ && _), t).otherwise(rest)
    }
    typed.groupBy(col("key"))
      .agg(count(lit(1)).as("n_present"), typeCounts: _*)
      .crossJoin(broadcast(nDocs))
      .select(Seq(col("key"), col("n_present"),
        (col("n_present").cast("double") / col("n_docs")).as("presence")) ++
        taxonomy.map(t => col(s"n_$t")) :+ dominant.as("dominant_type"): _*)
      .orderBy(col("key"))
  }

  def inferEventsProps(spark: SparkSession, dir: String): DataFrame =
    inferColumn(Tables.events(spark, dir), "props")

  val inferEventsPropsSql: String = {
    // The JSON path is built by splicing the key into '$."<key>"', so a
    // key containing a double-quote or backslash must be escaped or the
    // path would be invalid/wrong (type NULL -> 'other') while the Spark
    // side classifies the real value. The Spark side iterates parsed map
    // entries directly and needs no escaping.
    val classifySql =
      """CASE json_type(props, '$."' || replace(replace(key, '\', '\\'), '"', '\"') || '"')
        |  WHEN 'OBJECT' THEN 'object'
        |  WHEN 'ARRAY' THEN 'array'
        |  WHEN 'VARCHAR' THEN 'string'
        |  WHEN 'DOUBLE' THEN 'float'
        |  WHEN 'BIGINT' THEN 'int'
        |  WHEN 'UBIGINT' THEN 'int'
        |  WHEN 'BOOLEAN' THEN 'bool'
        |  WHEN 'NULL' THEN 'null'
        |  ELSE 'other' END""".stripMargin
    val typeCounts = taxonomy.map(t =>
      s"CAST(sum(CASE WHEN tp = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t").mkString(",\n    ")
    // identical tiebreak chain to the Spark side: first max in taxonomy order
    val dominant = taxonomy.map { t =>
      val geAll = taxonomy.filter(_ != t).map(o => s"n_$t >= n_$o").mkString(" AND ")
      s"WHEN $geAll THEN '$t'"
    }.mkString("CASE\n      ", "\n      ", "\n      ELSE 'none' END")
    s"""WITH n AS (SELECT count(*) AS n_docs FROM events),
       |typed AS (
       |  SELECT key, $classifySql AS tp
       |  FROM (
       |    SELECT unnest(json_keys(props)) AS key, props
       |    FROM events WHERE props IS NOT NULL AND json_valid(props))
       |), agg AS (
       |  SELECT key, count(*) AS n_present,
       |    $typeCounts
       |  FROM typed GROUP BY key)
       |SELECT key, n_present,
       |  CAST(n_present AS DOUBLE) / n.n_docs AS presence,
       |  ${taxonomy.map(t => s"n_$t").mkString(", ")},
       |  $dominant AS dominant_type
       |FROM agg, n
       |ORDER BY key""".stripMargin
  }
}
