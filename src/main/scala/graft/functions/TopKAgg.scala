package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed `Aggregator` extension surface (the guide's fourth tier, next to
  * native Expressions, SessionExtensions functions, and custom plans):
  * grouped top-k as a BOUNDED partial aggregate.
  *
  * Why not a window: `row_number().over(partitionBy(k).orderBy(v))` sorts
  * every group's full row set. This aggregator keeps only k (value, id)
  * pairs per group per partition and merges map-side — shuffle volume is
  * k rows per (group × partition) instead of the whole table, the shape
  * that wins when groups are large. Determinism: ordering is
  * (value desc, id asc), ties always resolve to the smaller id.
  */
object TopKAgg {

  type Entry = (Double, Long) // (value, id)

  /** IN is the full (user_id, value, event_id) row; the key is handled by
    * groupByKey, the aggregator keeps (value, id) pairs.
    */
  class TopK(k: Int) extends Aggregator[(Long, Double, Long), Seq[Entry], Seq[Entry]] {
    private def order(e: Entry): (Double, Long) = (-e._1, e._2)
    private def trim(s: Seq[Entry]): Seq[Entry] = s.sortBy(order).take(k)
    def zero: Seq[Entry] = Seq.empty
    def reduce(b: Seq[Entry], r: (Long, Double, Long)): Seq[Entry] = trim(b :+ ((r._2, r._3)))
    def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] = trim(a ++ b)
    def finish(r: Seq[Entry]): Seq[Entry] = r
    // opaque buffer: the heap never needs a relational schema mid-flight
    def bufferEncoder: Encoder[Seq[Entry]] = Encoders.kryo[Seq[Entry]]
    def outputEncoder: Encoder[Seq[Entry]] = Encoders.kryo[Seq[Entry]]
  }

  /** Top-3 events by value per user through the typed aggregator. */
  def qTopkAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = new TopK(3)
    Tables.events(spark, dir)
      .select(col("user_id"), col("value"), col("event_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .agg(agg.toColumn)
      .flatMap { (pair: (Long, Seq[Entry])) =>
        pair._2.zipWithIndex.map { case ((v, id), i) => (pair._1, i + 1, id, v) }
      }
      .toDF("user_id", "rank", "event_id", "value")
      .orderBy(col("user_id"), col("rank"))
  }

  val qTopkAggSql: String =
    """SELECT user_id, rn AS rank, event_id, value FROM (
      |  SELECT user_id, event_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
      |  FROM events)
      |WHERE rn <= 3
      |ORDER BY user_id, rank""".stripMargin
}
