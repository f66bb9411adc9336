package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Key/constraint discovery — the Spark-native re-expression of the
  * reference's deepest schema-metadata surface: primary keys, foreign
  * keys and unique constraints (dbsurveyor-core/src/models.rs:98-175;
  * adapters/postgres/schema_collection.rs, mysql/schema_collection.rs).
  * The reference reads them from catalog tables; a parquet lake has no
  * catalog, so graft INFERS them from the data itself:
  *
  *  - primary-key candidates: exact per-column uniqueness + non-nullness
  *    (one pruned single-column aggregation branch per column, the same
  *    Expand-safe shape as Profiler.profileTable);
  *  - foreign-key candidates: unary inclusion dependencies over the
  *    integer-typed columns — the distributed set-containment join of the
  *    IND-discovery literature (SPIDER/Sindy style: per-column DISTINCT
  *    value sets, then one equi-join on the value), never an all-pairs
  *    comparison. Fan-out per value is bounded by catalog width (number
  *    of integer columns), not by data size, so the shape survives 100 TB.
  *
  * Containment alone over-reports (any dense 0..n id range includes every
  * smaller dense range), so each candidate also carries COVERAGE — the
  * fraction of the parent key space the child references. Genuine FKs
  * reference most of their parent (TPC-H: >= 98%); coincidental range
  * inclusions reference a sliver. `is_likely_fk` = full containment AND
  * coverage >= 0.8. Identical key ranges (two 0..n surrogate spaces) are
  * indistinguishable from data alone — those few false positives are
  * inherent to data-driven discovery and left flagged for review.
  */
object KeyInference {

  /** Static catalog column lists for the DuckDB oracle (the testdata
    * schema); the Spark side enumerates dynamically from the real schema.
    * embeddings.embedding (array) is excluded: complex types can't key.
    */
  private val catalogColumns: Seq[(String, Seq[String])] = Seq(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "label"))

  private val intColumns: Seq[(String, String)] = Seq(
    ("region", "r_regionkey"), ("nation", "n_nationkey"), ("nation", "n_regionkey"),
    ("customer", "c_custkey"), ("customer", "c_nationkey"),
    ("supplier", "s_suppkey"), ("supplier", "s_nationkey"),
    ("part", "p_partkey"), ("part", "p_size"),
    ("orders", "o_orderkey"), ("orders", "o_custkey"),
    ("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"), ("lineitem", "l_linenumber"),
    ("events", "event_id"), ("events", "user_id"),
    ("documents", "doc_id"), ("documents", "n_chars"),
    ("embeddings", "vec_id"), ("embeddings", "label"))

  private def keyable(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

  private def isIntType(dt: DataType): Boolean =
    dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType

  // ------------------------------------------------------------ primary keys

  /** Per-column PK-candidate profile over named tables: exact row /
    * non-null / distinct counts; a column is a candidate iff it is fully
    * non-null and fully unique. One pruned aggregation branch per column.
    */
  /** Empty result with the given schema — the degrade-don't-abort path
    * when a catalog has no columns eligible for key inference.
    */
  private def emptyResult(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(ddl))

  def primaryKeysFor(tables: Seq[(String, DataFrame)]): DataFrame = {
    // r14 optimization round: the 51-branch per-column union (each
    // branch one agg mixing count + countDistinct → a 2× Expand, and
    // each adding an exchange AQE re-plans the whole union for) is
    // replaced by the ConstraintInference.statsForExact shape — ONE
    // plain per-table agg for n_rows/n_nonnull and one deduplicating
    // (cid, v) exchange per type family for the exact distinct counts.
    // Identical output: countDistinct(c) ≡ distinct-(cid,v) count (same
    // grouping-key normalization, NULLs excluded both ways).
    val eligible = tables.filter(_._2.schema.fields.exists(f => keyable(f.dataType)))
    if (eligible.isEmpty)
      return emptyResult(tables.head._2.sparkSession,
        "table_name STRING, column_name STRING, n_rows BIGINT, " +
          "n_nonnull BIGINT, n_distinct BIGINT, is_pk_candidate BOOLEAN")
    ConstraintInference.columnStatsExact(eligible)
      .select(col("table_name"), col("column_name"),
        col("n_rows"), col("n_nonnull"), col("n_distinct"),
        (col("n_nonnull") === col("n_rows") &&
          col("n_distinct") === col("n_rows")).as("is_pk_candidate"))
      .orderBy(col("table_name"), col("column_name"))
  }

  def inferPrimaryKeys(spark: SparkSession, dir: String): DataFrame =
    primaryKeysFor(Tables.all.map(t => t -> Tables.table(spark, dir, t)))

  val inferPrimaryKeysSql: String = {
    catalogColumns.flatMap { case (t, cols) =>
      cols.map { c =>
        // events.ts is ns in parquet but truncated to us by the Spark
        // reader — count distinct microseconds on the oracle side too
        val e = if (t == "events" && c == "ts") "epoch_us(ts)" else c
        s"""SELECT '$t' AS table_name, '$c' AS column_name,
           |  count(*) AS n_rows, count($e) AS n_nonnull,
           |  count(DISTINCT $e) AS n_distinct,
           |  (count($e) = count(*) AND count(DISTINCT $e) = count(*)) AS is_pk_candidate
           |FROM $t""".stripMargin
      }
    }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name, column_name")
  }

  // ------------------------------------------------------------ foreign keys

  /** Inclusion-dependency FK discovery over integer columns of named
    * tables. Emits every full containment (child values ⊆ parent key,
    * parent fully unique + non-null) with parent-coverage and the
    * likely-FK flag. All joins are equi-joins on the 64-bit value or on
    * (table, column) — no quadratic step anywhere.
    */
  def foreignKeysFor(tables: Seq[(String, DataFrame)]): DataFrame = {
    // integer columns get dense ids so every shuffle carries (int, long)
    // pairs instead of table/column strings; names rejoin at the end via
    // a tiny broadcast.
    val intCols: Seq[((String, String), Int)] = tables.flatMap { case (t, df) =>
      df.schema.fields.filter(f => isIntType(f.dataType)).map(f => (t, f.name))
    }.zipWithIndex
    val spark = tables.head._2.sparkSession
    if (intCols.isEmpty)
      return emptyResult(spark,
        "child_table STRING, child_column STRING, parent_table STRING, " +
          "parent_column STRING, n_values BIGINT, coverage DOUBLE, is_likely_fk BOOLEAN")
    val byTable = intCols.groupBy(_._1._1)
    import spark.implicits._
    val names = intCols.map { case ((t, c), i) => (i, t, c) }
      .toDF("cid", "tbl", "col_name")
    // ONE scan per table emits (cid, v) for all its integer columns at
    // once (posexplode of a struct array), then ONE global distinct —
    // a single wide shuffle on the near-unique (cid, v) key with map-side
    // partial dedup, instead of a distinct shuffle per column. Persisted:
    // it feeds the child side, the parent side and the per-column counts.
    // The cache outlives the returned (lazy) DataFrame by design — it is
    // MEMORY_AND_DISK (LRU-evictable); long-lived sessions running many
    // unrelated queries can reclaim it with spark.catalog.clearCache().
    val vals = tables.flatMap { case (t, df) =>
      byTable.get(t).map { cols =>
        val pairs = cols.map { case ((_, c), i) =>
          struct(lit(i).as("cid"), col(c).cast(LongType).as("v"))
        }
        df.select(explode(array(pairs: _*)).as("p"))
          .select(col("p.cid").as("cid"), col("p.v").as("v"))
          .filter(col("v").isNotNull)
      }
    }.reduce(_ unionByName _).distinct().persist()
    // per-table single-pass row/non-null counts (no countDistinct -> no
    // Expand, no per-column scan); distinct counts come from `vals`
    val counts = tables.flatMap { case (t, df) =>
      byTable.get(t).map { cols =>
        val aggs = count(lit(1)).as("n_rows") +:
          cols.map { case ((_, c), i) => count(col(c)).as(s"nn_$i") }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val rows = cols.map { case (_, i) =>
          struct(lit(i).as("cid"), col("n_rows"), col(s"nn_$i").as("n_nonnull"))
        }
        one.select(inline(array(rows: _*)))
      }
    }.reduce(_ unionByName _)
    val nDistinct = vals.groupBy(col("cid")).agg(count(lit(1)).as("n_distinct"))
    // one row per integer column; persisted because both the parent
    // filter and the child-count broadcast consume it (the per-table
    // count scans behind it would otherwise run twice)
    val stats = counts.join(nDistinct, Seq("cid")).persist()
    val parents = stats
      .filter(col("n_nonnull") === col("n_rows") && col("n_distinct") === col("n_rows"))
      .select(col("cid").as("pid"), col("n_distinct").as("n_parent"))
    val pvals = vals.join(broadcast(parents.select(col("pid"))),
        vals("cid") === col("pid"))
      .select(col("pid"), col("v"))
    val matched = vals.join(pvals, vals("v") === pvals("v") && vals("cid") =!= pvals("pid"))
      .groupBy(col("cid"), col("pid"))
      .agg(count(lit(1)).as("n_matched"))
    matched
      .join(broadcast(stats.select(col("cid"), col("n_distinct").as("n_child"))), Seq("cid"))
      .filter(col("n_matched") === col("n_child"))
      .join(broadcast(parents), Seq("pid"))
      .join(broadcast(names), Seq("cid"))
      .join(broadcast(names.select(col("cid").as("pid"), col("tbl").as("p_tbl"),
        col("col_name").as("p_col"))), Seq("pid"))
      .select(col("tbl").as("child_table"), col("col_name").as("child_column"),
        col("p_tbl").as("parent_table"), col("p_col").as("parent_column"),
        col("n_matched").as("n_values"),
        (col("n_matched").cast(DoubleType) / col("n_parent")).as("coverage"),
        (col("n_matched").cast(DoubleType) / col("n_parent") >= 0.8).as("is_likely_fk"))
      .orderBy(col("child_table"), col("child_column"),
        col("parent_table"), col("parent_column"))
  }

  def inferForeignKeys(spark: SparkSession, dir: String): DataFrame =
    foreignKeysFor(Tables.all.map(t => t -> Tables.table(spark, dir, t)))

  val inferForeignKeysSql: String = {
    val vals = intColumns.map { case (t, c) =>
      s"SELECT DISTINCT '$t' AS tbl, '$c' AS col_name, CAST($c AS BIGINT) AS v FROM $t WHERE $c IS NOT NULL"
    }.mkString("\nUNION ALL\n")
    val stats = intColumns.map { case (t, c) =>
      s"SELECT '$t' AS tbl, '$c' AS col_name, count(*) AS n_rows, count($c) AS n_nonnull, count(DISTINCT $c) AS n_distinct FROM $t"
    }.mkString("\nUNION ALL\n")
    s"""WITH vals AS ($vals),
       |stats AS ($stats),
       |parents AS (
       |  SELECT tbl, col_name, n_distinct AS n_parent FROM stats
       |  WHERE n_nonnull = n_rows AND n_distinct = n_rows),
       |pvals AS (
       |  SELECT v.tbl AS p_tbl, v.col_name AS p_col, p.n_parent, v.v
       |  FROM vals v JOIN parents p ON v.tbl = p.tbl AND v.col_name = p.col_name),
       |child_counts AS (SELECT tbl, col_name, count(*) AS n_child FROM vals GROUP BY 1, 2),
       |matched AS (
       |  SELECT c.tbl AS child_table, c.col_name AS child_column,
       |    p.p_tbl AS parent_table, p.p_col AS parent_column,
       |    p.n_parent, count(*) AS n_matched
       |  FROM vals c JOIN pvals p
       |    ON c.v = p.v AND NOT (c.tbl = p.p_tbl AND c.col_name = p.p_col)
       |  GROUP BY 1, 2, 3, 4, 5)
       |SELECT m.child_table, m.child_column, m.parent_table, m.parent_column,
       |  CAST(m.n_matched AS BIGINT) AS n_values,
       |  CAST(m.n_matched AS DOUBLE) / m.n_parent AS coverage,
       |  CAST(m.n_matched AS DOUBLE) / m.n_parent >= 0.8 AS is_likely_fk
       |FROM matched m JOIN child_counts cc
       |  ON m.child_table = cc.tbl AND m.child_column = cc.col_name
       |WHERE m.n_matched = cc.n_child
       |ORDER BY child_table, child_column, parent_table, parent_column""".stripMargin
  }

  // ------------------------------------------------------------ composite keys

  /** Composite (2-column) key inference — the layer single-column PK
    * discovery can't reach: a fact table like lineitem has NO unary key,
    * its identity is (l_orderkey, l_linenumber). Tests every pair of
    * integer-typed columns per table (candidate space bounded by catalog
    * width², ~C(4,2) per table here — never by data) for exact pair
    * uniqueness + non-nullness, and flags MINIMALITY (a pair is only
    * interesting as a key if neither column alone is one — (o_orderkey,
    * anything) is a key but a redundant one).
    *
    * Scale shape: the FdInference discipline — one PRUNED two-column
    * DISTINCT branch per pair and one single-column DISTINCT branch per
    * involved column, never a multi-countDistinct aggregate (whose
    * Expand multiplies the scan); each branch's result is a 1-row frame,
    * assembled by 1-row crossJoins. At catalog scale the exact DISTINCT
    * branches swap for HLL sketches exactly as infer_constraints_approx
    * demonstrates for the unary case.
    */
  /** r14 fused shape (the qualityReferential / family-distinct device):
    * the per-pair branch union planned ~4 aggregate subtrees PER PAIR
    * (55 Spark jobs for ZERO shuffle bytes at sf0.1 — pure AQE stage
    * scheduling, each table scanned ~6×). Now three shared passes:
    * (1) ONE plain aggregate per table emits n_rows + every pair's
    *     nonnull-pair count (sums of when() — no countDistinct, no
    *     Expand);
    * (2) every pair's exact distinct-pair count rides ONE deduplicating
    *     (pid, va, vb) exchange — pair ids keep the value spaces
    *     disjoint, so the per-pid count is exactly the per-pair
    *     `SELECT DISTINCT a, b` count (int→long injective, NULL-pair
    *     rows filtered exactly as before);
    * (3) every involved column's unary distinct rides ONE (cid, v)
    *     exchange — NULLs are KEPT (the old per-column
    *     `select(c).distinct()` counted the NULL group, and the oracle
    *     does too).
    * Results assemble over a broadcast pair-metadata frame; values and
    * flags are unchanged by construction, and the compositeKeysFor spec
    * seam + oracle gate both pin it.
    */
  def compositeKeysFor(tables: Seq[(String, DataFrame)]): DataFrame = {
    val spark = tables.head._2.sparkSession
    val perTable = tables.map { case (t, df) =>
      (t, df, df.schema.fields.filter(f => isIntType(f.dataType))
        .map(_.name).toSeq)
    }.filter(_._3.length >= 2)
    if (perTable.isEmpty)
      return emptyResult(spark,
        "table_name STRING, col_a STRING, col_b STRING, n_rows BIGINT, " +
          "n_nonnull_pairs BIGINT, n_distinct_pairs BIGINT, n_distinct_a BIGINT, " +
          "n_distinct_b BIGINT, is_composite_key BOOLEAN, is_minimal BOOLEAN")
    val pairIdx: Seq[((String, String, String), Int)] = perTable.flatMap {
      case (t, _, ints) =>
        for { i <- ints.indices; j <- (i + 1) until ints.length }
          yield (t, ints(i), ints(j))
    }.zipWithIndex
    val colIdx: Seq[((String, String), Int)] = perTable.flatMap {
      case (t, _, ints) => ints.map(c => (t, c))
    }.zipWithIndex
    val colId = colIdx.toMap
    val plain = perTable.map { case (t, df, _) =>
      val pids = pairIdx.filter(_._1._1 == t)
      val aggs = count(lit(1)).as("n_rows") +: pids.map { case ((_, a, b), i) =>
        sum(when(col(a).isNotNull && col(b).isNotNull, 1L).otherwise(0L))
          .as(s"nn_$i")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val rows = pids.map { case (_, i) =>
        struct(lit(i).as("pid"), col("n_rows"),
          col(s"nn_$i").as("n_nonnull_pairs"))
      }
      one.select(inline(array(rows: _*)))
    }.reduce(_ unionByName _)
    val dPairs = perTable.map { case (t, df, _) =>
      val structs = pairIdx.filter(_._1._1 == t).map { case ((_, a, b), i) =>
        struct(lit(i).as("pid"), col(a).cast(LongType).as("va"),
          col(b).cast(LongType).as("vb"))
      }
      df.select(explode(array(structs: _*)).as("p"))
        .select(col("p.pid").as("pid"), col("p.va").as("va"),
          col("p.vb").as("vb"))
        .filter(col("va").isNotNull && col("vb").isNotNull)
    }.reduce(_ unionByName _).distinct()
      .groupBy(col("pid")).agg(count(lit(1)).as("n_distinct_pairs"))
    val dCols = perTable.map { case (t, df, _) =>
      val structs = colIdx.filter(_._1._1 == t).map { case ((_, c), i) =>
        struct(lit(i).as("cid"), col(c).cast(LongType).as("v"))
      }
      df.select(explode(array(structs: _*)).as("p"))
        .select(col("p.cid").as("cid"), col("p.v").as("v"))
    }.reduce(_ unionByName _).distinct()
      .groupBy(col("cid")).agg(count(lit(1)).as("nd"))
    import spark.implicits._
    val meta = pairIdx.map { case ((t, a, b), i) =>
      (i, t, a, b, colId((t, a)), colId((t, b)))
    }.toDF("pid", "table_name", "col_a", "col_b", "cid_a", "cid_b")
    broadcast(meta)
      .join(plain, Seq("pid"))
      .join(dPairs, Seq("pid"), "left_outer")
      .join(dCols.select(col("cid").as("cid_a"), col("nd").as("n_distinct_a")),
        Seq("cid_a"), "left_outer")
      .join(dCols.select(col("cid").as("cid_b"), col("nd").as("n_distinct_b")),
        Seq("cid_b"), "left_outer")
      .select(col("table_name"), col("col_a"), col("col_b"),
        col("n_rows"), col("n_nonnull_pairs"),
        coalesce(col("n_distinct_pairs"), lit(0L)).as("n_distinct_pairs"),
        coalesce(col("n_distinct_a"), lit(0L)).as("n_distinct_a"),
        coalesce(col("n_distinct_b"), lit(0L)).as("n_distinct_b"))
      .select(col("table_name"), col("col_a"), col("col_b"),
        col("n_rows"), col("n_nonnull_pairs"), col("n_distinct_pairs"),
        col("n_distinct_a"), col("n_distinct_b"),
        (col("n_nonnull_pairs") === col("n_rows") &&
          col("n_distinct_pairs") === col("n_rows")).as("is_composite_key"),
        (col("n_nonnull_pairs") === col("n_rows") &&
          col("n_distinct_pairs") === col("n_rows") &&
          col("n_distinct_a") < col("n_rows") &&
          col("n_distinct_b") < col("n_rows")).as("is_minimal"))
      .orderBy(col("table_name"), col("col_a"), col("col_b"))
  }

  def inferCompositeKeys(spark: SparkSession, dir: String): DataFrame =
    compositeKeysFor(Tables.all.map(t => t -> Tables.table(spark, dir, t)))

  val inferCompositeKeysSql: String = {
    val byTable = intColumns.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = for {
      (t, cols0) <- intColumns.map(_._1).distinct.map(t => t -> byTable(t))
      cols = cols0
      i <- cols.indices; j <- (i + 1) until cols.length
    } yield {
      val (a, b) = (cols(i), cols(j))
      s"""SELECT '$t' AS table_name, '$a' AS col_a, '$b' AS col_b,
         |  (SELECT count(*) FROM $t) AS n_rows,
         |  (SELECT count(*) FROM $t
         |     WHERE $a IS NOT NULL AND $b IS NOT NULL) AS n_nonnull_pairs,
         |  (SELECT count(*) FROM (SELECT DISTINCT $a, $b FROM $t
         |     WHERE $a IS NOT NULL AND $b IS NOT NULL)) AS n_distinct_pairs,
         |  (SELECT count(*) FROM (SELECT DISTINCT $a FROM $t)) AS n_distinct_a,
         |  (SELECT count(*) FROM (SELECT DISTINCT $b FROM $t)) AS n_distinct_b""".stripMargin
    }
    s"""WITH raw AS (
       |${rows.mkString("\nUNION ALL\n")})
       |SELECT table_name, col_a, col_b, n_rows, n_nonnull_pairs,
       |  n_distinct_pairs, n_distinct_a, n_distinct_b,
       |  (n_nonnull_pairs = n_rows AND n_distinct_pairs = n_rows)
       |    AS is_composite_key,
       |  (n_nonnull_pairs = n_rows AND n_distinct_pairs = n_rows
       |    AND n_distinct_a < n_rows AND n_distinct_b < n_rows) AS is_minimal
       |FROM raw ORDER BY table_name, col_a, col_b""".stripMargin
  }
}
