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
    *
    * r14 optimization round (guide §2.4 "remove shuffles outright" +
    * §5 caching): the r13-shape call paid, per invocation, a
    * RangePartitioner SAMPLING job that re-evaluated the caller's whole
    * upstream plan (often a full scan + aggregate), then zipWithIndex's
    * count job, then the eager localCheckpoint — the upstream lineage
    * ran 2-3×. Now the input is persisted and counted ONCE (one upstream
    * evaluation; the count doubles as the size probe), the exchange is
    * sized from that count exactly like [[withGlobalRanks]] (ceil(n/64k)
    * capped at session parallelism — a small aggregate frame sorts as
    * ONE task and RangePartitioner SKIPS its sampling job entirely at 1
    * partition, and zipWithIndex skips its count job at ≤1 partition;
    * at cluster scale the cap restores full parallelism), and the input
    * is unpersisted once the checkpoint is materialized. Ranks are a
    * pure function of the total order, so partition sizing cannot change
    * the result (the q_rfm fusion precedent, oracle-proven).
    */
  def withGlobalRank(df: DataFrame, rankCol: String, keys: Column*): DataFrame =
    rankImpl(df, rankCol, None, keys)

  /** Known-count variant: callers that have already materialized and
    * counted the input (localCheckpoint + count for an ntile bound)
    * pass n and skip the persist + count probe entirely.
    */
  def withGlobalRank(df: DataFrame, rankCol: String, n: Long,
      keys: Column*): DataFrame =
    rankImpl(df, rankCol, Some(n), keys)

  private def rankImpl(df: DataFrame, rankCol: String, nKnown: Option[Long],
      keys: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val weCache = nKnown.isEmpty &&
      df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val input = if (weCache)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df
    val n = nKnown.getOrElse(input.count())
    val parts = partsFor(spark, n)
    val sorted = input.repartitionByRange(parts, keys: _*).sortWithinPartitions(keys: _*)
    val schema = StructType(sorted.schema :+ StructField(rankCol, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    val out = spark.createDataFrame(ranked, schema).localCheckpoint()
    if (weCache) input.unpersist(blocking = false)
    out
  }

  /** Size-aware rank-exchange partition count (shared by every rank /
    * cumsum entry point): ceil(n / 64k) in [1, session parallelism].
    */
  private def partsFor(spark: org.apache.spark.sql.SparkSession, n: Long): Int = {
    val maxParts = spark.sessionState.conf.numShufflePartitions
    math.max(1L, math.min(maxParts.toLong,
      (n + RowsPerRankPartition - 1) / RowsPerRankPartition)).toInt
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
      keys: Column*): DataFrame =
    cumsumImpl(df, valueCol, cumCol, None, keys)

  /** Known-count variant (see withGlobalRank's): skips persist + count. */
  def withGlobalCumsum(df: DataFrame, valueCol: String, cumCol: String,
      n: Long, keys: Column*): DataFrame =
    cumsumImpl(df, valueCol, cumCol, Some(n), keys)

  private def cumsumImpl(df: DataFrame, valueCol: String, cumCol: String,
      nKnown: Option[Long], keys: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    // r14 optimization round: same persist + size-aware exchange as
    // withGlobalRank (see its scaladoc) — one upstream evaluation, no
    // sampling job at 1 partition, and the per-partition offset job is
    // skipped outright when there is only one partition (offset 0).
    val weCache = nKnown.isEmpty &&
      df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val input = if (weCache)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df
    val n = nKnown.getOrElse(input.count())
    val parts = partsFor(spark, n)
    val sorted = input.repartitionByRange(parts, keys: _*).sortWithinPartitions(keys: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val offsets: Array[Long] =
      if (parts <= 1) Array(0L)
      else {
        val partSums = rdd.mapPartitionsWithIndex { case (pid, it) =>
          var s = 0L
          it.foreach(r => s += r.getLong(vIdx))
          Iterator((pid, s))
        }.collect().sortBy(_._1).map(_._2)
        partSums.scanLeft(0L)(_ + _) // offsets(pid) = Σ earlier partitions
      }
    val schema = StructType(sorted.schema :+ StructField(cumCol, LongType, nullable = false))
    val summed = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var run = offsets(pid)
      it.map { r => run += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ run) }
    }
    val out = spark.createDataFrame(summed, schema).localCheckpoint()
    if (weCache) input.unpersist(blocking = false)
    out
  }

  /** Exact order statistics WITHOUT materializing a ranked frame
    * (r14 optimization round). The rank-then-filter consumers
    * (profile_shape_robust, profile_histogram, events_session_stats,
    * events_conversion_lag) only ever read the rows at a handful of
    * target ranks, yet the withGlobalRank path localCheckpointed the
    * ENTIRE ranked frame (a Row conversion + storage write per input
    * row) just to filter ~7-18 rows back out of it. This primitive
    * sorts once (the same size-aware range exchange), folds ONE
    * per-partition (count, sum) pass — bounded driver state, one pair
    * per partition — and then collects ONLY the rows at the requested
    * 1-based global ranks with a job over just the partitions that hold
    * a target. Values at a rank are a pure function of the total order,
    * exactly as for withGlobalRank, so results are unchanged.
    *
    * Returns (n, sum of `sumCol` over all rows (0 when None), rank →
    * row). `ranksFor(n)` produces the wanted ranks once n is known;
    * out-of-range ranks are ignored; n == 0 short-circuits to an empty
    * map with no sort at all.
    */
  def orderStats(df: DataFrame, keys: Seq[Column], sumCol: Option[String],
      ranksFor: Long => Seq[Long]): (Long, Long, Map[Long, Row]) = {
    val spark = df.sparkSession
    val weCache = df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val input = if (weCache)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df
    val n = input.count()
    if (n == 0L) {
      if (weCache) input.unpersist(blocking = false)
      return (0L, 0L, Map.empty)
    }
    val parts = partsFor(spark, n)
    val sorted = input.repartitionByRange(parts, keys: _*).sortWithinPartitions(keys: _*)
    val sIdx: Option[Int] = sumCol.map(sorted.schema.fieldIndex)
    val rdd = sorted.rdd
    // both passes (count+sum, targeted collect) read the sorted rows —
    // persist so the within-partition sort runs once, not per job
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var c = 0L; var s = 0L
      it.foreach { r => c += 1L; sIdx.foreach(i => s += r.getLong(i)) }
      Iterator((pid, c, s))
    }.collect().sortBy(_._1)
    val offsets = stats.map(_._2).scanLeft(0L)(_ + _)
    val total = stats.map(_._3).sum
    val wanted = ranksFor(n).distinct.filter(r => r >= 1L && r <= n).sorted
    // rank r lives in partition p with offsets(p) < r <= offsets(p+1)
    val byPid: Map[Int, Seq[Long]] = wanted
      .map { r =>
        val p = offsets.lastIndexWhere(_ < r) // offsets(0)=0 ⇒ p ≥ 0
        (p, r - offsets(p)) // 1-based local index
      }
      .groupBy(_._1).map { case (p, rs) => p -> rs.map(_._2).sorted }
    val offsetsB = offsets
    val results =
      if (byPid.isEmpty) Array.empty[Array[(Long, Row)]]
      else spark.sparkContext.runJob(
        rdd,
        (ctx: org.apache.spark.TaskContext, it: Iterator[Row]) => {
          val pid = ctx.partitionId()
          val locals = byPid(pid)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
          var i = 0L; var k = 0
          while (it.hasNext && k < locals.length) {
            val row = it.next(); i += 1L
            if (i == locals(k)) { out += ((offsetsB(pid) + i, row)); k += 1 }
          }
          out.toArray
        },
        byPid.keys.toSeq.sorted)
    rdd.unpersist(blocking = false)
    if (weCache) input.unpersist(blocking = false)
    (n, total, results.flatten.toMap)
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
