package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables

/** Relational analytics core (SURVEY §2A) over the TPC-H-ish tables.
  *
  * Oracle-parity rules (SURVEY §6): money math is done in exact DECIMAL and
  * only converted to double at the very end, so Spark and DuckDB produce
  * bit-identical doubles regardless of partial-aggregation order; every
  * result has a deterministic ORDER BY on a unique key.
  */
object Relational {

  /** decimal casts shared by the money queries */
  private def dec(c: String, p: Int, s: Int): Column = col(c).cast(DecimalType(p, s))
  private val one = lit(1.00).cast(DecimalType(3, 2))

  /** TPC-H Q1-style pricing summary.
    * Exact-decimal sums → double; avg = decimal-sum/count in IEEE double.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val price = dec("l_extendedprice", 12, 2)
    val disc  = dec("l_discount", 4, 2)
    val tax   = dec("l_tax", 4, 2)
    val qty   = dec("l_quantity", 12, 2)
    val discounted = (price * (one - disc).cast(DecimalType(4, 2))).cast(DecimalType(18, 4))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).cast(DoubleType).as("sum_qty"),
        sum(price).cast(DoubleType).as("sum_base_price"),
        sum(discounted).cast(DoubleType).as("sum_disc_price"),
        sum(discounted * (one + tax).cast(DecimalType(4, 2))).cast(DoubleType).as("sum_charge"),
        (sum(qty).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(price).cast(DoubleType) / count(lit(1))).as("avg_price"),
        (sum(disc).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4)) * CAST(1.00 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
