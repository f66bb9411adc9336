package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Key-sequence continuity profile — the "are there holes in this id
  * space" survey row (reference surveys stop at row counts + PK flags;
  * an auditor's next question is whether the key range is dense or
  * whether deletes/failed loads left gaps, and whether a fact key
  * duplicates because it's a degenerate dimension).
  *
  * Per declared integer key column: rows, exact distincts, [min,max],
  * span, missing ids (span − distinct), duplicate rows (rows − distinct)
  * and a contiguity ratio in ppm — every cell BIGINT-exact (integer
  * division, no doubles anywhere).
  *
  * Scale shape: one aggregation per table, each scan pruned to the single
  * key column (the profileEntropy branch pattern — never N countDistincts
  * in one agg, which plans an (N+1)× Expand; see PLANS.md risk #1). The
  * exact distinct is the surveyor contract; at 100 TB swap
  * `approx_count_distinct` per branch, same plan minus the expand.
  */
object Sequences {

  /** (table, key column) rows surveyed — the catalog's declared keys
    * (PK-ish for dimensions, the order FK on the lineitem fact, where
    * duplicate rows are expected and reported as such).
    */
  val keyCols: Seq[(String, String)] = Seq(
    ("region", "r_regionkey"), ("nation", "n_nationkey"),
    ("customer", "c_custkey"), ("supplier", "s_suppkey"),
    ("part", "p_partkey"), ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey"), ("events", "event_id"),
    ("documents", "doc_id"), ("embeddings", "vec_id"))

  def profileSequences(spark: SparkSession, dir: String): DataFrame = {
    keyCols.map { case (t, c) =>
      Tables.table(spark, dir, t)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("long").as("min_id"),
          max(col(c)).cast("long").as("max_id"))
        .select(lit(t).as("table_name"), lit(c).as("key_column"),
          col("n_rows"), col("n_distinct"), col("min_id"), col("max_id"),
          expr("max_id - min_id + 1").as("span"),
          expr("max_id - min_id + 1 - n_distinct").as("n_missing"),
          expr("n_rows - n_distinct").as("n_dup_rows"),
          expr("CAST(n_distinct * 1000000 DIV (max_id - min_id + 1) AS BIGINT)")
            .as("contiguity_ppm"))
    }.reduce(_ unionByName _).orderBy(col("table_name"))
  }

  val profileSequencesSql: String =
    keyCols.map { case (t, c) =>
      s"""SELECT '$t' AS table_name, '$c' AS key_column,
         |  count(*) AS n_rows, count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS BIGINT) AS min_id, CAST(max($c) AS BIGINT) AS max_id,
         |  CAST(max($c) - min($c) + 1 AS BIGINT) AS span,
         |  CAST(max($c) - min($c) + 1 - count(DISTINCT $c) AS BIGINT) AS n_missing,
         |  CAST(count(*) - count(DISTINCT $c) AS BIGINT) AS n_dup_rows,
         |  CAST((count(DISTINCT $c) * 1000000) // (max($c) - min($c) + 1) AS BIGINT) AS contiguity_ppm
         |FROM $t""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
}
