package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document-store collection path — the Spark re-expression of the
  * reference's mongodb adapter (`adapters/mongodb/schema_inference.rs`:
  * sample documents per collection, unify a schema, serialize it into
  * the artifact like any relational table). A "database" here is a set
  * of named COLLECTIONS, each a DataFrame with one JSON-document string
  * column.
  *
  * Spark-first shape: `load()` parses a collection through
  * `spark.read.json`, so Spark's own distributed JSON schema inference
  * produces the per-key typed column list — the artifact's schema IS
  * the inferred schema, and every downstream surface (sampling,
  * row counts, docs, validation) works unchanged. The finer-grained
  * per-key profile (presence fraction + dominant type from the
  * variant-based JsonSchema engine, the piece a union schema can't
  * express) rides along as collected `presence` constraints, one per
  * key, rendered in every doc format.
  *
  * Scale: both the inference pass and the profile are single scans of
  * the collection producing key-count-sized output; at 100 TB you'd
  * point this at a bounded sample of each collection (the reference
  * samples too — mongodb adapter infers from a document sample), which
  * is a `.limit()` on the input DataFrame, not a code change.
  */
class DocumentSource(spark: SparkSession, sourceName: String,
    collections: Seq[(String, DataFrame)], jsonCol: String = "doc")
    extends TableSource with MetadataSource {
  import Collector.{CollectedTableMeta, ConstraintInfo}

  private val byName = collections.toMap

  def name: String = s"documents:$sourceName"
  def tableNames: Seq[String] = collections.map(_._1)
  override def engine: (String, String) = ("json-documents", spark.version)

  private def rawDocs(table: String) = {
    import spark.implicits._
    byName(table).select(col(jsonCol).cast("string")).as[String]
  }

  /** The collection as a typed DataFrame under Spark's inferred union
    * schema (keys sorted, types unified across documents).
    */
  def load(table: String): DataFrame = spark.read.json(rawDocs(table))

  /** Per-key presence + dominant-type profile as collected metadata:
    * a key present (and never JSON-null) in every document is NOT NULL;
    * every key gets a `presence` constraint whose detail is a small
    * JSON object {"presence": fraction, "dominant": type} — the
    * document-store profile the reference's mongodb adapter serializes.
    */
  def tableMetadata(table: String): CollectedTableMeta = {
    val profile = JsonSchema
      .inferColumn(byName(table).select(col(jsonCol).cast("string").as(jsonCol)), jsonCol)
      .collect().toSeq
    val nDocs = byName(table).count()
    val notNull = profile.collect {
      case r if r.getAs[Long]("n_present") == nDocs && r.getAs[Long]("n_null") == 0L =>
        r.getAs[String]("key")
    }
    val presence = profile.map { r =>
      val k = r.getAs[String]("key")
      val frac = r.getAs[Double]("presence")
      val dom = r.getAs[String]("dominant_type")
      ConstraintInfo(s"presence_${table}_$k", "presence", Seq(k),
        detail = f"""{"presence": $frac%.4f, "dominant": "$dom"}""",
        provenance = "collected")
    }.sortBy(_.name)
    CollectedTableMeta(Nil, Nil, notNull = notNull, constraints = presence)
  }

  def collectedForeignKeys: Seq[Collector.FkEdge] = Nil
}
