package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage: the engine reads and writes the formats
  * a survey tool meets in the wild (parquet is the native testdata; CSV,
  * JSON, ORC roundtrips verified here), plus streaming dedup.
  */
class SourceFormatSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  private def totals(df: org.apache.spark.sql.DataFrame) =
    df.agg(count(lit(1)), sum(col("o_totalprice").cast("decimal(14,2)")))
      .collect()(0)

  test("csv / json / orc roundtrips preserve row counts and exact sums") {
    val orders = Tables.orders(spark, sf)
      .withColumn("o_orderdate", col("o_orderdate").cast("string"))
    val want = totals(orders)
    for (fmt <- Seq("csv", "json", "orc")) {
      val dir = Files.createTempDirectory(s"graft_$fmt").toString
      val writer = orders.write.mode("overwrite")
      (if (fmt == "csv") writer.option("header", "true") else writer)
        .format(fmt).save(dir)
      val reader = spark.read
      val back = (fmt match {
        case "csv" => reader.option("header", "true").option("inferSchema", "true").csv(dir)
        case "json" => reader.json(dir)
        case "orc" => reader.orc(dir)
      })
      val got = totals(back)
      assert(got.getLong(0) == want.getLong(0), s"$fmt row count")
      assert(got.getDecimal(1) == want.getDecimal(1), s"$fmt sum")
    }
  }

  test("streaming dropDuplicates dedups a replayed stream with duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val rows = (1L to 100L).map(i => (i, s"doc$i"))
    mem.addData(rows ++ rows.take(40))  // 40 duplicate ids replayed
    val q = mem.toDF().toDF("doc_id", "text")
      .dropDuplicates("doc_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream_out").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_stream_out").count() == 100)
  }
}
