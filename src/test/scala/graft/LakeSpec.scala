package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.output.Lake

class LakeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("daily agg writes a day-partitioned layout and reads prune partitions") {
    val dir = Files.createTempDirectory("graft_lake").toString
    Lake.writeDailyAgg(spark, sf, dir)
    // physical layout: one directory per day
    val dayDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("day="))
    assert(dayDirs.length > 5)

    val oneDay = Lake.readDay(spark, dir, "2024-01-03")
    // partition pruning visible in the plan: the day predicate appears as
    // a PartitionFilter on the scan, and no other day's rows are read
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"))
    assert(oneDay.select("day").distinct().count() == 1)

    // totals survive the roundtrip
    val total = spark.read.parquet(dir).agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("bucketed tables co-locate the join: no exchange, no pre-join sort") {
    Lake.writeBucketed(spark, sf, buckets = 8)
    try {
      val joined = Lake.bucketedJoin(spark)
      // the non-adaptive physical plan: bucketing satisfies the merge
      // join's distribution AND ordering, so there is no shuffle and no
      // sort anywhere before the join
      val plan = joined.queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      // correctness: totals match the unbucketed join
      val want = Tables.orders(spark, sf).count()
      val got = joined.agg(org.apache.spark.sql.functions.sum("n_orders"))
        .collect()(0).getLong(0)
      assert(got == want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS g_customer_bucketed")
    }
  }
}
