package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Referential-integrity validation — the checking half of the key story
  * (KeyInference DISCOVERS edges; this VALIDATES declared or inferred
  * edges against the data): per FK edge, child rows/keys, orphan keys
  * (child values absent from the parent), orphan rows and the orphan-row
  * ppm. A lake has no engine to reject a dangling key, so the survey has
  * to count them — the reference records declared FKs but never audits
  * them (models.rs stops at metadata; this is the data-side audit).
  *
  * Shape per edge: child side aggregates to one row PER DISTINCT KEY
  * (map-side partial — the shuffle carries (key, count), bounded by key
  * cardinality) before the left-anti join against the parent's distinct
  * keys; dimension parents broadcast, fact-sized parents stay shuffled
  * equi-joins under AQE. Orphan rows come from summing the pre-aggregated
  * counts, so no second child scan.
  */
object Referential {

  /** Declared/inferred FK edges of the lake (child, childCol, parent, parentCol). */
  val edges: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"))

  /** One edge's audit over arbitrary frames (spec plants orphan fixtures
    * through this seam).
    */
  private[graft] def auditEdge(child: DataFrame, childCol: String,
                               parent: DataFrame, parentCol: String): DataFrame = {
    val keyed = child.filter(col(childCol).isNotNull)
      .groupBy(col(childCol).cast("long").as("k"))
      .agg(count(lit(1)).as("n_rows_key"))
    val parents = parent.select(col(parentCol).cast("long").as("k")).distinct()
    val orphans = keyed.join(parents, Seq("k"), "left_anti")
      .agg(coalesce(count(lit(1)), lit(0L)).as("n_orphan_keys"),
        coalesce(sum(col("n_rows_key")), lit(0L)).as("n_orphan_rows"))
    val totals = keyed
      .agg(count(lit(1)).as("n_child_keys"), sum(col("n_rows_key")).as("n_child_rows"))
    totals.crossJoin(orphans) // two 1-row frames
  }

  def qualityReferential(spark: SparkSession, dir: String): DataFrame = {
    edges.map { case (ct, cc, pt, pc) =>
      auditEdge(Tables.table(spark, dir, ct), cc, Tables.table(spark, dir, pt), pc)
        .select(lit(ct).as("child_table"), lit(cc).as("child_column"),
          lit(pt).as("parent_table"), lit(pc).as("parent_column"),
          col("n_child_rows"), col("n_child_keys"),
          col("n_orphan_keys"), col("n_orphan_rows"),
          expr("CAST(n_orphan_rows * 1000000 DIV n_child_rows AS BIGINT)")
            .as("orphan_row_ppm"))
    }.reduce(_ unionByName _)
      .orderBy(col("child_table"), col("child_column"))
  }

  /** JOIN-CARDINALITY profile per FK edge — the fan-out statistics an
    * optimizer (and a capacity planner) wants before joining two tables
    * it has never seen: per parent key, how many children? Emits
    * parents, matched parents, childless ppm, min/max fan-out over
    * matched parents, average fan-out in exact ppm and the max/avg skew
    * ratio in ppm — the number that says "this join has a hot key"
    * (skew ≫ 1e6 ⇒ salting / AQE skew-join territory; the q_salted_agg
    * connection). Every cell is integer-exact (DECIMAL(38,0) products
    * before the floor division — no long overflow at lake scale).
    *
    * Shape per edge: the SAME child pre-aggregation as the referential
    * audit (one row per distinct key rides the shuffle), LEFT-joined
    * FROM the parent's distinct keys so childless parents count; one
    * 1-row aggregate. Orphan child keys (referential's domain) are
    * excluded by construction.
    */
  private[graft] def fanoutEdge(child: DataFrame, childCol: String,
                                parent: DataFrame, parentCol: String): DataFrame = {
    val keyed = child.filter(col(childCol).isNotNull)
      .groupBy(col(childCol).cast("long").as("k"))
      .agg(count(lit(1)).as("n_children"))
    val parents = parent.filter(col(parentCol).isNotNull)
      .select(col(parentCol).cast("long").as("k")).distinct()
    parents.join(keyed, Seq("k"), "left_outer")
      .select(coalesce(col("n_children"), lit(0L)).as("n_children"))
      .agg(count(lit(1)).as("n_parents"),
        sum(when(col("n_children") > 0, 1L).otherwise(0L)).as("n_matched_parents"),
        sum(col("n_children")).as("n_child_rows"),
        min(when(col("n_children") > 0, col("n_children"))).as("min_f"),
        max(col("n_children")).as("max_f"))
  }

  def profileJoinCardinality(spark: SparkSession, dir: String): DataFrame = {
    edges.map { case (ct, cc, pt, pc) =>
      fanoutEdge(Tables.table(spark, dir, ct), cc, Tables.table(spark, dir, pt), pc)
        .select(lit(ct).as("child_table"), lit(cc).as("child_column"),
          lit(pt).as("parent_table"), lit(pc).as("parent_column"),
          col("n_parents"), col("n_matched_parents"),
          expr("""CAST(CAST((n_parents - n_matched_parents) AS DECIMAL(38,0)) * 1000000
                 |  DIV n_parents AS BIGINT)""".stripMargin).as("childless_ppm"),
          coalesce(col("min_f"), lit(0L)).as("min_fanout"),
          col("max_f").as("max_fanout"),
          expr("""CAST(coalesce(CAST(n_child_rows AS DECIMAL(38,0)) * 1000000
                 |  DIV nullif(n_matched_parents, 0), 0) AS BIGINT)""".stripMargin)
            .as("avg_fanout_ppm"),
          expr("""CAST(coalesce(CAST(max_f AS DECIMAL(38,0)) * n_matched_parents * 1000000
                 |  DIV nullif(n_child_rows, 0), 0) AS BIGINT)""".stripMargin)
            .as("max_over_avg_ppm"))
    }.reduce(_ unionByName _)
      .orderBy(col("child_table"), col("child_column"))
  }

  val profileJoinCardinalitySql: String =
    edges.map { case (ct, cc, pt, pc) =>
      val matched = "sum(CASE WHEN n_children > 0 THEN 1 ELSE 0 END)"
      s"""SELECT '$ct' AS child_table, '$cc' AS child_column,
         |  '$pt' AS parent_table, '$pc' AS parent_column,
         |  count(*) AS n_parents,
         |  CAST($matched AS BIGINT) AS n_matched_parents,
         |  CAST(((count(*) - $matched) * 1000000) // count(*) AS BIGINT) AS childless_ppm,
         |  CAST(coalesce(min(CASE WHEN n_children > 0 THEN n_children END), 0) AS BIGINT) AS min_fanout,
         |  CAST(max(n_children) AS BIGINT) AS max_fanout,
         |  CAST(coalesce((CAST(sum(n_children) AS HUGEINT) * 1000000)
         |    // nullif($matched, 0), 0) AS BIGINT) AS avg_fanout_ppm,
         |  CAST(coalesce((CAST(max(n_children) AS HUGEINT) * $matched * 1000000)
         |    // nullif(sum(n_children), 0), 0) AS BIGINT) AS max_over_avg_ppm
         |FROM (
         |  SELECT coalesce(c.n_children, 0) AS n_children
         |  FROM (SELECT DISTINCT CAST($pc AS BIGINT) AS k FROM $pt WHERE $pc IS NOT NULL) p
         |  LEFT JOIN (SELECT CAST($cc AS BIGINT) AS k, count(*) AS n_children
         |             FROM $ct WHERE $cc IS NOT NULL GROUP BY 1) c USING (k))""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY child_table, child_column")

  val qualityReferentialSql: String =
    edges.map { case (ct, cc, pt, pc) =>
      s"""SELECT '$ct' AS child_table, '$cc' AS child_column,
         |  '$pt' AS parent_table, '$pc' AS parent_column,
         |  CAST(sum(n_rows_key) AS BIGINT) AS n_child_rows,
         |  count(*) AS n_child_keys,
         |  CAST(sum(CASE WHEN orphan THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_keys,
         |  CAST(coalesce(sum(CASE WHEN orphan THEN n_rows_key ELSE 0 END), 0) AS BIGINT) AS n_orphan_rows,
         |  CAST((coalesce(sum(CASE WHEN orphan THEN n_rows_key ELSE 0 END), 0) * 1000000)
         |    // sum(n_rows_key) AS BIGINT) AS orphan_row_ppm
         |FROM (
         |  SELECT CAST($cc AS BIGINT) AS k, count(*) AS n_rows_key,
         |    CAST($cc AS BIGINT) NOT IN (SELECT CAST($pc AS BIGINT) FROM $pt WHERE $pc IS NOT NULL) AS orphan
         |  FROM $ct WHERE $cc IS NOT NULL GROUP BY 1)""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY child_table, child_column")
}
