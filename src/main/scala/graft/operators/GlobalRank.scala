package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global ranking — the scale-safe replacement for
  * `ntile(k).over(Window.orderBy(...))`. An empty-partitionBy window plans
  * a SINGLE-partition WindowExec: every row of a data-sized frame funnels
  * through one task's sort — the canonical scale-killer (the reference's
  * sampling layer enforces the same "never sort the world" discipline,
  * dbsurveyor postgres/sampling.rs).
  *
  * Shape here: `repartitionByRange` on the sort key — the SAME sampled,
  * fully parallel range exchange a global ORDER BY uses — then a
  * per-partition sort, then `zipWithIndex`, which runs one lightweight
  * count-job over the partitions and assigns contiguous per-partition
  * offsets (bounded driver state: one Long per partition). Ranks are a
  * pure function of the total order, so the sampled boundary placement
  * cannot change the answer — callers must include a unique tiebreak
  * column so the order IS total. The result is `localCheckpoint`ed (the
  * repo's lineage discipline, as in BpeTrainer/GraphOps) so chained
  * rankings and the downstream aggregate don't recompute the range
  * exchange once per action.
  *
  * This is one of the rare justified `.rdd` drops: Spark exposes no
  * declarative "global contiguous rank without a single-partition window"
  * (SPARK-? zipWithIndex remains the idiomatic answer); everything before
  * and after stays DataFrame/codegen.
  */
object GlobalRank {

  /** Adds a 1-based contiguous global rank column under the given total
    * order. `keys` must include a unique tiebreak (e.g. the entity key).
    */
  def withGlobalRank(df: DataFrame, rankCol: String, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, keys: _*).sortWithinPartitions(keys: _*)
    val schema = StructType(sorted.schema :+ StructField(rankCol, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(ranked, schema).localCheckpoint()
  }

  /** FUSED multi-ordering rank assignment (r13 VERDICT #2 — the
    * q_rfm_segmentation isolate): chaining three `withGlobalRank` calls
    * paid, PER PASS, a range-sampling job + zipWithIndex's count job +
    * an eager localCheckpoint job (~9 scheduler round-trips), which is
    * what a loaded driver box inflates 4.5× (min≈median — latency, not
    * compute). This fusion keeps the identical rank semantics (same
    * sampled range exchange + per-partition sort + contiguous offsets
    * per ordering — ranks are a pure function of each total order) but:
    *
    *   - sizes the exchange from the caller's known row count: a frame
    *     of n rows gets ceil(n / 64k) partitions capped at the session
    *     parallelism — a 15k-row per-customer frame becomes ONE
    *     single-task sort per ordering (and RangePartitioner skips its
    *     sampling job entirely at 1 partition) instead of 32 near-empty
    *     tasks × 3 passes; at cluster scale the cap restores full
    *     parallelism, so the adaptation is strictly about not
    *     over-partitioning small aggregates;
    *   - persists each pass's sorted RDD so the count pass and the next
    *     ordering's exchange read it instead of recomputing the chain,
    *     and localCheckpoints ONCE at the end (one materialization job
    *     instead of three).
    *
    * `specs` = (rankCol, ordering keys) pairs; each ordering must embed
    * a unique tiebreak, as in withGlobalRank.
    */
  def withGlobalRanks(df: DataFrame, n: Long,
      specs: Seq[(String, Seq[Column])]): DataFrame = {
    val spark = df.sparkSession
    val maxParts = spark.sessionState.conf.numShufflePartitions
    val parts = math.max(1L, math.min(maxParts.toLong,
      (n + RowsPerRankPartition - 1) / RowsPerRankPartition)).toInt
    var cur = df
    val persisted = scala.collection.mutable.ListBuffer
      .empty[org.apache.spark.rdd.RDD[Row]]
    for ((rankCol, keys) <- specs) {
      val sorted = cur.repartitionByRange(parts, keys: _*)
        .sortWithinPartitions(keys: _*)
      val rdd = sorted.rdd
      rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      persisted += rdd
      val counts = rdd.mapPartitionsWithIndex { case (pid, it) =>
        var c = 0L; it.foreach(_ => c += 1); Iterator((pid, c))
      }.collect().sortBy(_._1).map(_._2)
      val offsets = counts.scanLeft(0L)(_ + _)
      val schema = StructType(sorted.schema :+
        StructField(rankCol, LongType, nullable = false))
      val ranked = rdd.mapPartitionsWithIndex { case (pid, it) =>
        var r = offsets(pid)
        it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
      }
      cur = spark.createDataFrame(ranked, schema)
    }
    val out = cur.localCheckpoint()
    persisted.foreach(_.unpersist(blocking = false))
    out
  }

  /** Target rows per partition for the size-aware rank exchange: exact
    * ranking is cheap per row, so 64k rows is a light task — the point
    * is the LOWER bound (1 partition for small aggregates), not an
    * upper bound on parallelism (capped at the session setting).
    */
  private val RowsPerRankPartition = 65536L

  /** Adds an inclusive global PREFIX SUM of `valueCol` (must be LONG)
    * under the given total order — the scale-safe replacement for
    * `sum(x).over(Window.orderBy(...))`, which plans the same
    * single-partition WindowExec the rank case does. `keys` must include
    * a unique tiebreak so the order is total.
    *
    * Shape: the identical sampled range exchange + per-partition sort as
    * withGlobalRank, then the zipWithIndex two-pass device applied to
    * SUMS instead of counts: pass 1 folds one Long per partition
    * (bounded driver state — #partitions Longs), pass 2 streams each
    * partition once adding its offset. Both passes read the SAME shuffle
    * output (Spark reuses the exchange's files), so the data moves once.
    * This is the primitive that makes exact global sequence packing /
    * Lorenz accumulation legal at 100 TB: no task ever holds more than
    * its partition, and the only driver state is the per-partition sum
    * vector.
    */
  def withGlobalCumsum(df: DataFrame, valueCol: String, cumCol: String,
      keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, keys: _*).sortWithinPartitions(keys: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val partSums = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
      Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // offsets(pid) = Σ earlier partitions
    val schema = StructType(sorted.schema :+ StructField(cumCol, LongType, nullable = false))
    val summed = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var run = offsets(pid)
      it.map { r => run += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ run) }
    }
    spark.createDataFrame(summed, schema).localCheckpoint()
  }

  /** SQL-standard NTILE(k) as a closed-form expression over a contiguous
    * 1-based rank: with q = n DIV k and r = n MOD k, tiles 1..r hold q+1
    * rows and tiles r+1..k hold q — exactly Spark's and DuckDB's `ntile`
    * semantics, so parity with a real ntile window over the same total
    * order is bit-exact. All bounds are folded literals (n comes from a
    * single driver-side count — one Long of driver state), so the score
    * assignment is pure codegen'd arithmetic, no window at all.
    */
  def ntileFromRank(k: Int, n: Long, rankCol: String): Column = {
    require(k > 0, "ntile bucket count must be positive")
    val q = n / k
    val r = n % k
    // rows whose (rank-1) falls below r*(q+1) land in the first r (fat)
    // tiles; the rest spread over the remaining thin tiles of size q.
    // q==0 (n < k) keeps the ELSE branch unreachable; max(q,1) guards the
    // division anyway.
    expr(
      s"""CAST(CASE WHEN ($rankCol - 1) < ${r * (q + 1)}
         |  THEN ($rankCol - 1) DIV ${q + 1}
         |  ELSE $r + (($rankCol - 1) - ${r * (q + 1)}) DIV ${math.max(q, 1L)}
         |END + 1 AS INT)""".stripMargin)
  }
}
