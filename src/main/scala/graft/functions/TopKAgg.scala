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
  class TopK(k: Int)(implicit enc: Encoder[Seq[Entry]])
      extends Aggregator[(Long, Double, Long), Seq[Entry], Seq[Entry]] {
    // buffer invariant: sorted by (value desc, id asc), length <= k
    private def beats(a: Entry, b: Entry): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    def zero: Seq[Entry] = Seq.empty
    def reduce(b: Seq[Entry], r: (Long, Double, Long)): Seq[Entry] = {
      val e = (r._2, r._3)
      // common case on a full buffer: the row doesn't make the cut —
      // return the buffer untouched, zero allocation per input row
      if (b.length == k && !beats(e, b(k - 1))) b
      else {
        val i = b.indexWhere(x => beats(e, x))
        val at = if (i < 0) b.length else i
        ((b.take(at) :+ e) ++ b.drop(at)).take(k)
      }
    }
    def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] = {
      // linear merge of two sorted bounded buffers
      val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
      var i = 0; var j = 0
      while (out.length < k && (i < a.length || j < b.length)) {
        if (j >= b.length || (i < a.length && beats(a(i), b(j)))) { out += a(i); i += 1 }
        else { out += b(j); j += 1 }
      }
      out.toSeq
    }
    def finish(r: Seq[Entry]): Seq[Entry] = r
    // product encoder (tungsten array-of-struct), not Kryo blobs: the
    // buffer stays unboxed in the aggregation hash map
    def bufferEncoder: Encoder[Seq[Entry]] = enc
    def outputEncoder: Encoder[Seq[Entry]] = enc
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
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INTEGER) AS rn
      |  FROM events)
      |WHERE rn <= 3
      |ORDER BY user_id, rank""".stripMargin
}
