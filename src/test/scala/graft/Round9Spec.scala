package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventAnalytics
import graft.text.{Dedup, Search}

/** Round-9 regression wave: the ADVICE/VERDICT fixes — pre-1970 heatmap
  * arithmetic, degrade-don't-throw empty paths, the exact-rational prefix
  * ceiling at a non-binary τ, the sparse-cosine dfCap guard, the shared
  * components fixpoint memo, and the Decimal(38) skew arithmetic.
  */
class Round9Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  /** events.parquet clone with `ts` shifted back 60 years — every
    * timestamp lands pre-1970, where truncating division and sign-keeping
    * modulo would silently diverge from floor semantics. */
  lazy val pre1970Dir: String = {
    val dir = Files.createTempDirectory("graft_pre1970").toString
    Tables.events(spark, sf)
      .withColumn("ts", timestamp_micros(unix_micros(col("ts")) -
        lit(60L * 365 * 86400L * 1000000L)))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("weekly heatmap: pre-1970 dow/hod match java.time floor semantics") {
    val got = EventAnalytics.eventsWeeklyHeatmap(spark, pre1970Dir)
      .select(col("dow"), col("hod"), col("n_events")).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // independent recompute: java.time in UTC, DAY_OF_WEEK normalized to
    // 0=Sunday — the calendar library is the ground truth for pre-1970
    val want = Tables.events(spark, pre1970Dir)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0))
      .map { us =>
        val i = java.time.Instant.EPOCH.plus(us,
          java.time.temporal.ChronoUnit.MICROS)
        val z = i.atZone(java.time.ZoneOffset.UTC)
        (z.getDayOfWeek.getValue % 7, z.getHour) // ISO Mon=1..Sun=7 → Sun=0
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.keySet == want.keySet)
    want.foreach { case (k, n) => assert(got(k) == n, s"cell $k") }
    // and every emitted dow/hod is in range (the non-negative-mod claim)
    got.keys.foreach { case (d, h) =>
      assert(d >= 0 && d <= 6 && h >= 0 && h <= 23)
    }
  }

  /** events log where every user has exactly one event: no transitions,
    * and (separately) an empty log: no sessions. */
  lazy val degenerateDirs: (String, String) = {
    val one = Files.createTempDirectory("graft_oneev").toString
    Tables.events(spark, sf).dropDuplicates("user_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$one/events.parquet")
    val empty = Files.createTempDirectory("graft_noev").toString
    Tables.events(spark, sf).filter(lit(false))
      .coalesce(1).write.mode("overwrite").parquet(s"$empty/events.parquet")
    (one, empty)
  }

  test("markov stationary degrades to an empty typed frame with no transitions") {
    val df = EventAnalytics.eventsMarkovStationary(spark, degenerateDirs._1)
    assert(df.columns.toSeq == Seq("event_type", "pi_e9"))
    assert(df.count() == 0)
  }

  test("session stats degrade to an empty typed frame with no sessions") {
    val df = EventAnalytics.eventsSessionStats(spark, degenerateDirs._2)
    assert(df.columns.toSeq == Seq("n_sessions", "mean_us", "p10_us",
      "p25_us", "p50_us", "p75_us", "p90_us", "p99_us"))
    assert(df.count() == 0)
  }

  test("prefix join at τ=3/5 equals brute-force Jaccard (integer ceiling)") {
    // brute force from RAW TEXT (independent of the shingling helper):
    // word-3-gram string sets, all-pairs exact Jaccard. split(_, -1)
    // mirrors Spark's split(), which keeps trailing empty tokens.
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .collect { case (d, t) if t.length >= 3 =>
        d -> t.sliding(3).map(_.mkString(" ")).toSet
      }.toMap
    val setSeq = sets.toSeq // Map yields would collapse same-left pairs
    val want = (for {
      (a, sa) <- setSeq; (b, sb) <- setSeq if a < b
      common = (sa & sb).size
      union = sa.size + sb.size - common
      if union > 0 && common * 5L >= union * 3L
    } yield (a, b)).toSet
    val got = Dedup.ngramPrefixJoin(spark, sf, 3L, 5L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("sparse-cosine dfCap is a no-op at test SF and guards the join") {
    // the guard constant exists and no posting list reaches it here —
    // the degCap discipline: capped semantics proven by the gate, the
    // cap itself binding only at scale
    val maxDf = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("token"))
      .distinct()
      .groupBy(col("token")).count()
      .agg(max(col("count"))).collect().head.getLong(0)
    assert(maxDf < Search.sparseDfCap,
      s"test corpus df $maxDf should stay below the cap ${Search.sparseDfCap}")
    assert(Search.sparseCosineSql.contains(Search.sparseDfCap.toString))
  }

  test("componentsTable artifact: one lake write, stable across free/evict") {
    def artifactPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Seq.empty
          }
      }.flatten
    val a = Dedup.componentsTable(spark, sf)
    val b = Dedup.componentsTable(spark, sf)
    // both consumers scan the SAME materialized parquet artifact — one
    // derivation, zero resident executor state (no pinned RDD blocks)
    val pa = artifactPaths(a)
    assert(pa.nonEmpty && pa == artifactPaths(b),
      "both calls must scan one shared lake artifact")
    assert(pa.head.contains("components"), pa.toString)
    val rows = a.collect().map(r => (r.getLong(1), r.getLong(0))).sorted.toSeq
    // the honest-cold boundary frees every persistent RDD — the lake
    // artifact is untouched by construction and keeps serving
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val c = Dedup.componentsTable(spark, sf)
    assert(c.collect().map(r => (r.getLong(1), r.getLong(0))).sorted.toSeq
      == rows)
    // evicting the FILES forces a re-derivation (never a dead read)
    val root = java.nio.file.Paths.get(pa.head.stripPrefix("file:"))
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.forEach(rm(_)) finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    rm(root)
    val d = Dedup.componentsTable(spark, sf)
    assert(d.collect().map(r => (r.getLong(1), r.getLong(0))).sorted.toSeq
      == rows)
  }

  test("skew ppm arithmetic survives Long-wrapping magnitudes") {
    // the Decimal(38,0) device on a magnitude where Long wraps:
    // 1e8 rows of one key over 1e8 keys → max·keys·1e6 = 1e22 ≫ 2^63
    val r = spark.sql(
      """SELECT CAST(CAST(100000000 AS DECIMAL(38,0)) * 100000000
        |  * 1000000 DIV 200000000 AS BIGINT) AS f""".stripMargin)
      .collect().head.getLong(0)
    assert(r == 50000000000000L) // 1e22 / 2e8 = 5e13, exactly
  }
}
