package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-events regression — EdgeCaseSpec's twin for the events
  * path: corpora the synthetic testdata can't produce (an EMPTY log, a
  * single event, total timestamp ties, null values/types). Every
  * events-path query must degrade — empty or sane output — never throw.
  */
class EventsEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** sf0.001 clone with events.parquet swapped for an adversarial log
    * (dimension tables stay, so joins still resolve). */
  private def cloneWithEvents(tag: String,
      rows: Seq[(Long, java.sql.Timestamp, Long, String, java.lang.Double,
        String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft_evedge_$tag").toString
    val src = Paths.get("/root/testdata/sf0.001")
    Files.list(src).forEach { p =>
      val name = p.getFileName.toString
      if (name != "events.parquet")
        Files.copy(p, Paths.get(dir, name), StandardCopyOption.REPLACE_EXISTING)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val t0 = java.sql.Timestamp.valueOf("2024-01-05 12:00:00")

  lazy val emptyDir: String = cloneWithEvents("empty", Seq.empty)
  lazy val oneDir: String = cloneWithEvents("one",
    Seq((1L, t0, 7L, "click", 1.5, "{}")))
  lazy val tiesDir: String = cloneWithEvents("ties",
    (1L to 50L).map(i => (i, t0, i % 3, if (i % 2 == 0) "click" else "view",
      2.0: java.lang.Double, "{}")))
  lazy val nullsDir: String = cloneWithEvents("nulls",
    (1L to 20L).map(i => (i,
      new java.sql.Timestamp(t0.getTime + i * 1000),
      i % 4, "click", if (i % 2 == 0) null else (1.0: java.lang.Double),
      if (i % 3 == 0) null else "{\"k\": 1}")))

  private val eventQueries = Seq(
    "q_pivot_events", "q_tumbling_window", "q_sessionize",
    "sample_most_recent", "sample_random_det", "sample_stratified",
    "q_funnel", "q_retention", "q_resample_ffill", "q_histogram",
    "q_user_paths", "q_sliding_distinct", "scd2_history",
    "events_rate_anomaly", "events_seasonality", "events_gap_histogram",
    "events_ewma_forecast", "events_markov_stationary",
    "events_attribution", "events_session_stats", "events_weekly_heatmap",
    "events_changepoint", "events_burstiness", "events_activity_gini",
    "profile_key_growth", "quality_psi", "events_transition_entropy",
    "events_conversion_lag",
    // r11: the pareto grid (its empty-log n_top_users seam was ADVICE
    // r10) and the inferential panel (NULL z / χ² degrade paths)
    "events_pareto_share", "stats_funnel_ztest", "stats_chisq_independence",
    "stats_mannwhitney")

  for ((tag, dirF) <- Seq[(String, () => String)](
      ("empty log", () => emptyDir), ("single event", () => oneDir),
      ("all-tie timestamps", () => tiesDir), ("null values", () => nullsDir)))
    test(s"every events-path query survives: $tag") {
      val dir = dirF()
      eventQueries.foreach { k =>
        val n = SparkEntry.queries(k)(spark, dir).count()
        assert(n >= 0, k) // materialization itself is the assertion
      }
    }
}
