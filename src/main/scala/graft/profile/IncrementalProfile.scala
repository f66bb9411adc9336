package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.Tables

/** Incremental (slice-mergeable) profiling — HOW a 100 TB table is
  * actually profiled: never in one monolithic pass, but per ingest slice
  * (here: ship-month), with slice profiles MERGED into the table profile.
  * The merge algebra is what makes the profile maintainable — a new
  * slice lands, one small profile is computed, the rollup is updated;
  * nothing rescans history. (The sketch twin of this idea is
  * profile_table_approx's HLL merge; this operator is the EXACT-stats
  * half: counts, min/max and decimal sums are all associative, so the
  * merged result is provably identical to a direct whole-table pass.)
  *
  * The operator emits, per numeric column, the slice-merged stats AND a
  * `merge_ok` proof bit comparing every merged stat to a direct
  * whole-table aggregation — decimal sums compared exactly (DECIMAL all
  * the way; double only at the output edge), so the self-check is
  * bit-strict, not tolerance-based.
  *
  * Scale shape: one groupBy(slice) aggregation (the per-slice profile —
  * the thing that runs per ingest at scale), one tiny merge over
  * slice-count rows, one direct aggregation (here for the proof; at
  * scale you obviously skip it — that's the point), one 1-row cross
  * join. No Expand, no per-column scans.
  */
object IncrementalProfile {

  val profCols: Seq[String] = Seq("l_quantity", "l_extendedprice", "l_discount")

  def profileIncremental(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val slice = unix_micros(date_trunc("month", col("l_shipdate"))).as("slice")
    val sliceAggs = count(lit(1)).as("s_rows") +: profCols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"), min(col(c)).as(s"mn_$c"),
        max(col(c)).as(s"mx_$c"),
        sum(col(c).cast(DecimalType(18, 4))).as(s"sm_$c"))
    }
    val perSlice = li.groupBy(slice).agg(sliceAggs.head, sliceAggs.tail: _*)
    val mergeAggs = Seq(count(lit(1)).as("n_slices"),
      sum(col("s_rows")).as("m_rows")) ++ profCols.flatMap { c =>
      Seq(sum(col(s"nn_$c")).as(s"m_nn_$c"), min(col(s"mn_$c")).as(s"m_mn_$c"),
        max(col(s"mx_$c")).as(s"m_mx_$c"), sum(col(s"sm_$c")).as(s"m_sm_$c"))
    }
    val merged = perSlice.agg(mergeAggs.head, mergeAggs.tail: _*)
    val directAggs = count(lit(1)).as("d_rows") +: profCols.flatMap { c =>
      Seq(count(col(c)).as(s"d_nn_$c"), min(col(c)).as(s"d_mn_$c"),
        max(col(c)).as(s"d_mx_$c"),
        sum(col(c).cast(DecimalType(18, 4))).as(s"d_sm_$c"))
    }
    val direct = li.agg(directAggs.head, directAggs.tail: _*)
    val structs = profCols.map { c =>
      struct(lit(c).as("column_name"),
        col("n_slices"),
        col("m_rows").as("n_rows"),
        col(s"m_nn_$c").as("n_nonnull"),
        col(s"m_mn_$c").as("min_v"),
        col(s"m_mx_$c").as("max_v"),
        col(s"m_sm_$c").cast(DoubleType).as("sum_v"),
        (col("m_rows") === col("d_rows") &&
          col(s"m_nn_$c") === col(s"d_nn_$c") &&
          col(s"m_mn_$c") === col(s"d_mn_$c") &&
          col(s"m_mx_$c") === col(s"d_mx_$c") &&
          col(s"m_sm_$c") === col(s"d_sm_$c")).as("merge_ok"))
    }
    merged.crossJoin(direct)
      .select(inline(array(structs: _*)))
      .orderBy(col("column_name"))
  }

  val profileIncrementalSql: String = {
    val sliceCols = profCols.map { c =>
      s"""count($c) AS nn_$c, min($c) AS mn_$c, max($c) AS mx_$c,
         |    sum(CAST($c AS DECIMAL(18,4))) AS sm_$c""".stripMargin
    }.mkString(",\n    ")
    val mergeCols = profCols.map { c =>
      s"""CAST(sum(nn_$c) AS BIGINT) AS m_nn_$c, min(mn_$c) AS m_mn_$c,
         |    max(mx_$c) AS m_mx_$c, sum(sm_$c) AS m_sm_$c""".stripMargin
    }.mkString(",\n    ")
    val directCols = profCols.map { c =>
      s"""count($c) AS d_nn_$c, min($c) AS d_mn_$c, max($c) AS d_mx_$c,
         |    sum(CAST($c AS DECIMAL(18,4))) AS d_sm_$c""".stripMargin
    }.mkString(",\n    ")
    val branches = profCols.map { c =>
      s"""SELECT '$c' AS column_name, n_slices, n_rows,
         |  m_nn_$c AS n_nonnull, m_mn_$c AS min_v, m_mx_$c AS max_v,
         |  CAST(m_sm_$c AS DOUBLE) AS sum_v,
         |  (n_rows = d_rows AND m_nn_$c = d_nn_$c AND m_mn_$c = d_mn_$c
         |   AND m_mx_$c = d_mx_$c AND m_sm_$c = d_sm_$c) AS merge_ok
         |FROM merged CROSS JOIN direct""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH per_slice AS (
       |  SELECT epoch_us(date_trunc('month', l_shipdate)) AS slice,
       |    count(*) AS s_rows,
       |    $sliceCols
       |  FROM lineitem GROUP BY 1),
       |merged AS (
       |  SELECT count(*) AS n_slices, CAST(sum(s_rows) AS BIGINT) AS n_rows,
       |    $mergeCols
       |  FROM per_slice),
       |direct AS (
       |  SELECT count(*) AS d_rows,
       |    $directCols
       |  FROM lineitem)
       |$branches
       |ORDER BY column_name""".stripMargin
  }
}
