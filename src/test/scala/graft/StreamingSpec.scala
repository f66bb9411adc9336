package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamOps

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("streaming tumbling agg equals the batch tumbling agg on a replayed log") {
    import spark.implicits._
    val batch = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val rows = batch.as[(Long, java.sql.Timestamp, Long, String, Double)].collect()
    mem.addData(rows.toSeq)
    val streamDf = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.tumblingAgg(streamDf).writeStream
      .outputMode("complete").format("memory").queryName("tumbling_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("tumbling_out")
      .select(col("hour"), col("event_type"), col("n_events"), col("sum_value"))
    val want = StreamOps.tumblingAgg(batch)
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming quality monitor equals the same profile computed in batch") {
    import spark.implicits._
    val batch = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    mem.addData(batch.as[(Long, java.sql.Timestamp, Long, String, Double)].collect().toSeq)
    val streamDf = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.qualityMonitor(streamDf).writeStream
      .outputMode("complete").format("memory").queryName("qm_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("qm_out")
    val want = StreamOps.qualityMonitor(batch)
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // the monitor actually measures: totals reconcile with the raw log
    val totalEvents = got.agg(sum("n_events")).collect()(0).getLong(0)
    assert(totalEvents == batch.count())
  }

  test("streaming contamination monitor flags the copied-run doc via the static gram table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val run = (1 to 12).map(i => s"tok$i").mkString(" ") // 12-token eval run
    // static eval-suite gram table from a batch frame
    val evalDocs = Seq((100L, s"$run eval tail words")).toDF("doc_id", "text")
    val evalGrams = graft.text.Decontaminate.withGrams(evalDocs)
      .select(col("g")).distinct()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:15:00")
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    mem.addData(Seq(
      (1L, t0, s"prefix $run suffix"),                                // 5 shared 8-grams
      (2L, t0, (1 to 20).map(i => s"clean$i").mkString(" ")),         // disjoint
      (3L, t0, "too short for any gram")))
    val streamDf = mem.toDF().toDF("doc_id", "ts", "text")
    val q = StreamOps.contaminationMonitor(streamDf, evalGrams).writeStream
      .outputMode("complete").format("memory").queryName("contam_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("contam_out").collect()
    assert(got.length == 1) // one active hourly window
    assert(got(0).getAs[Long]("n_gram_hits") == 5L)
    assert(got(0).getAs[Long]("approx_contaminated_docs") == 1L)
    // replay equality: the same monitor over the same data as a batch frame
    val batchDf = Seq(
      (1L, t0, s"prefix $run suffix"),
      (2L, t0, (1 to 20).map(i => s"clean$i").mkString(" ")),
      (3L, t0, "too short for any gram")).toDF("doc_id", "ts", "text")
    val want = StreamOps.contaminationMonitor(batchDf, evalGrams)
    assert(spark.table("contam_out").exceptAll(want).count() == 0 &&
      want.exceptAll(spark.table("contam_out")).count() == 0)
  }

  test("streaming pii monitor counts planted pii per window and source") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:05:00")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 11:20:00")
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    mem.addData(Seq(
      (1L, t0, "web", "reach me at ada@example.com or 415-555-0001 ok"),
      (2L, t0, "web", "clean document no identifiers here"),
      (3L, t0, "books", "server at 10.0.0.1 and 192.168.1.2 responded"),
      (4L, t1, "web", "second window mail bob@corp.io")))
    val streamDf = mem.toDF().toDF("doc_id", "ts", "source", "text")
    val q = StreamOps.piiMonitor(streamDf).writeStream
      .outputMode("complete").format("memory").queryName("pii_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("pii_out").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("hour").toString, r.getAs[String]("source")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_docs_with_pii"),
          r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"), r.getAs[Long]("n_ips"))).toMap
    assert(got(("2026-01-01 10:00:00.0", "web")) == ((2L, 1L, 1L, 1L, 0L)))
    assert(got(("2026-01-01 10:00:00.0", "books")) == ((1L, 1L, 0L, 0L, 2L)))
    assert(got(("2026-01-01 11:00:00.0", "web")) == ((1L, 1L, 1L, 0L, 0L)))
    // totals reconcile: 2 emails, 1 phone, 2 ips across all windows
    assert(got.values.map(_._3).sum == 2L)
    assert(got.values.map(_._4).sum == 1L)
    assert(got.values.map(_._5).sum == 2L)
  }

  test("streaming rate monitor flags a planted per-minute spike against the baseline") {
    import spark.implicits._
    import graft.operators.EventAnalytics
    // history: type "click", minutes 0-9, 5 events each (flat rate);
    // ...but with mild variation so std > 0: counts 4,6 alternating
    def ts(min: Int, k: Int) =
      new java.sql.Timestamp(1700000000000L + min * 60000L + k * 100L)
    val hist = (0 until 10).flatMap { m =>
      (0 until (if (m % 2 == 0) 4 else 6)).map(k => (ts(m, k), "click"))
    }.toDF("ts", "event_type")
    val baseline = EventAnalytics.rateBaselineOf(hist)
    val b = baseline.collect().head
    assert(b.getAs[Double]("mean_cnt") == 5.0 && b.getAs[Double]("std_cnt") == 1.0)
    // live stream: minute 20 is normal (5), minute 21 spikes to 30
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    mem.addData((0 until 5).map(k => (ts(20, k), "click")) ++
      (0 until 30).map(k => (ts(21, k), "click")))
    val q = StreamOps.rateMonitor(mem.toDF().toDF("ts", "event_type"), baseline)
      .writeStream.outputMode("complete").format("memory")
      .queryName("rate_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("rate_out").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("minute").getTime, r.getAs[Boolean]("is_anomaly"),
        r.getAs[Double]("z"))).sortBy(_._1)
    assert(got.length == 2)
    assert(!got(0)._2 && got(0)._3 == 0.0)       // minute 20: z = (5-5)/1
    assert(got(1)._2 && got(1)._3 == 25.0)       // minute 21: z = (30-5)/1
  }

  test("streaming mix monitor flags the window where a source goes missing") {
    import spark.implicits._
    def ts(hour: Int, k: Int) =
      new java.sql.Timestamp(1700000000000L + hour * 3600000L + k * 1000L)
    val targets = Map("web" -> 0.5, "books" -> 0.5)
    // hour 0 on-target (5/5); hour 1 books drops out (8 web, 2 books)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    mem.addData(
      (0 until 5).map(k => (ts(0, k), "web")) ++
        (0 until 5).map(k => (ts(0, k), "books")) ++
        (0 until 8).map(k => (ts(1, k), "web")) ++
        (0 until 2).map(k => (ts(1, k), "books")))
    val q = StreamOps.mixMonitor(mem.toDF().toDF("ts", "source"), targets)
      .writeStream.outputMode("complete").format("memory")
      .queryName("mix_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("mix_out").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("hour").getTime,
        r.getAs[Long]("n_docs"), r.getAs[Double]("worst_drift"),
        r.getAs[Boolean]("drifted"))).sortBy(_._1)
    assert(got.length == 2)
    assert(got(0)._2 == 10 && got(0)._3 == 0.0 && !got(0)._4)
    assert(got(1)._2 == 10 && math.abs(got(1)._3 - 0.3) < 1e-12 && got(1)._4)
  }

  test("streaming referential monitor alarms the window the orphans arrive") {
    import spark.implicits._
    def ts(hour: Int, k: Int) =
      new java.sql.Timestamp(1700000000000L + hour * 3600000L + k * 1000L)
    implicit val sqlCtx = spark.sqlContext
    val parents = Seq(1L, 2L, 3L).toDF("k")
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    // hour 0: all known keys; hour 1: 4 of 10 rows orphaned (key 99)
    mem.addData(
      (0 until 10).map(k => (ts(0, k), (k % 3 + 1).toLong)) ++
        (0 until 6).map(k => (ts(1, k), (k % 3 + 1).toLong)) ++
        (0 until 4).map(k => (ts(1, 6 + k), 99L)))
    val q = StreamOps.referentialMonitor(mem.toDF().toDF("ts", "user_id"), parents)
      .writeStream.outputMode("complete").format("memory")
      .queryName("ref_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ref_out").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("hour").getTime,
        r.getAs[Long]("n_rows"), r.getAs[Long]("n_orphan_rows"),
        r.getAs[Long]("orphan_ppm"), r.getAs[Boolean]("alarm"))).sortBy(_._1)
    assert(got.length == 2)
    assert(got(0)._2 == 10 && got(0)._3 == 0 && got(0)._4 == 0 && !got(0)._5)
    assert(got(1)._2 == 10 && got(1)._3 == 4 && got(1)._4 == 400000 && got(1)._5)
  }

  test("streaming incremental dedup drops corpus dups and in-stream dups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq("settled doc one", "settled doc two").toDF("text")
      .select(md5(col("text")).as("fp"))
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    mem.addData(Seq(
      (1L, t0, "settled doc one"),     // corpus dup -> dropped
      (2L, t0, "fresh doc"),           // kept
      (3L, t0, "fresh doc"),           // in-stream dup -> dropped
      (4L, t0, "another fresh doc")))  // kept
    val q = StreamOps.incrementalDedup(
        mem.toDF().toDF("doc_id", "ts", "text"), corpus)
      .writeStream.outputMode("append").format("memory")
      .queryName("incdedup_out").start()
    q.processAllAvailable(); q.stop()
    val kept = spark.table("incdedup_out").collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(2L, 4L))
  }

  test("streaming nll gate scores like the batch LM; OOV is counted not scored") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lp = graft.text.TextStats.unigramLp(spark, sf)
    // batch truth for a few real docs
    val batch = graft.text.TextStats.unigramNll(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_nll"))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    mem.addData(docs.map { case (id, t) => (id, t0, t) }.toSeq :+
      ((9999L, t0, "zzzunseen qqqnovel wwwstrange")))
    val q = StreamOps.nllGate(mem.toDF().toDF("doc_id", "ts", "text"), lp,
        ceiling = 8.0)
      .writeStream.outputMode("complete").format("memory")
      .queryName("nllgate_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("nllgate_out").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.foreach { case (id, _) =>
      val (n, nll) = batch(id)
      assert(got(id).getAs[Long]("n_tokens") == n)
      assert(got(id).getAs[Long]("n_oov") == 0L)
      assert(got(id).getAs[Double]("avg_nll") == nll, s"doc $id")
    }
    // the all-OOV doc: counted, unscored, not rejected (nothing to judge)
    val oov = got(9999L)
    assert(oov.getAs[Long]("n_oov") == 3L && !oov.getAs[Boolean]("reject"))
  }

  test("streaming containment gate flags re-crawls of settled content") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // settled corpus: two docs of 12 tokens each -> 10 shingles each
    val settled = Seq(
      "a b c d e f g h i j k l",
      "m n o p q r s t u v w x").toDF("text")
    val corpusShingles = settled
      .select(split(col("text"), " ").as("toks"))
      .select(explode(expr(
        """array_distinct(transform(sequence(1, size(toks) - 2),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1),
          |              ' ', element_at(toks, i + 2))))""".stripMargin)).as("s"))
      .select(expr("cast(conv(substring(md5(s), 1, 12), 16, 10) as bigint)").as("h"))
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    mem.addData(Seq(
      // exact re-crawl: containment 1.0 -> contained
      (1L, t0, "a b c d e f g h i j k l"),
      // settled content wrapped in fresh boilerplate: 10 of its 14
      // shingles hit (10/14 < 0.8) -> NOT contained at tau=0.8
      (2L, t0, "zz yy a b c d e f g h i j k l xx ww"),
      // novel doc -> 0 hits
      (3L, t0, "one two three four five six seven"),
      // prefix slice of a settled doc: all 6 shingles hit -> contained
      (4L, t0, "m n o p q r s t")))
    val q = StreamOps.containmentGate(
        mem.toDF().toDF("doc_id", "ts", "text"), corpusShingles)
      .writeStream.outputMode("complete").format("memory")
      .queryName("contain_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("contain_out").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sh"), r.getAs[Long]("n_hits"),
          r.getAs[Boolean]("is_contained"))).toMap
    assert(got(1L) == ((10L, 10L, true)))
    assert(got(2L) == ((14L, 10L, false)))
    assert(got(3L) == ((5L, 0L, false)))
    assert(got(4L) == ((6L, 6L, true)))
  }

  test("streaming cluster assign: member, bridge, and novel docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two settled clusters: canon 10 owns "a..l"'s shingles, canon 20 "m..x"'s
    val settled = Seq(
      (10L, "a b c d e f g h i j k l"),
      (20L, "m n o p q r s t u v w x")).toDF("canon", "text")
    val idx = settled
      .select(col("canon"), split(col("text"), " ").as("toks"))
      .select(col("canon"), explode(expr(
        """array_distinct(transform(sequence(1, size(toks) - 2),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1),
          |              ' ', element_at(toks, i + 2))))""".stripMargin)).as("s"))
      .select(expr("cast(conv(substring(md5(s), 1, 12), 16, 10) as bigint)")
        .as("h"), col("canon"))
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    mem.addData(Seq(
      // exact member re-crawl -> one qualifying row on canon 10
      (1L, t0, "a b c d e f g h i j k l"),
      // bridge doc: 5 shingles in each cluster, 2 novel (12 total) ->
      // TWO qualifying rows at tau=0.4 — the merge-precursor signal
      (2L, t0, "a b c d e f g m n o p q r s"),
      // novel doc -> a single null-cluster row carrying all its shingles
      (3L, t0, "one two three four five six")))
    val q = StreamOps.clusterAssignGate(
        mem.toDF().toDF("doc_id", "ts", "text"), idx, tauPpm = 400000L)
      .writeStream.outputMode("complete").format("memory")
      .queryName("assign_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("assign_out").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        if (r.isNullAt(1)) -1L else r.getAs[Long]("cluster_canon")) ->
        (r.getAs[Long]("n_sh"), r.getAs[Long]("n_shared"),
          r.getAs[Boolean]("qualifies"))).toMap
    assert(got((1L, 10L)) == ((10L, 10L, true)))
    assert(got((2L, 10L)) == ((12L, 5L, true)))
    assert(got((2L, 20L)) == ((12L, 5L, true)))
    assert(got((2L, -1L)) == ((12L, 2L, false))) // novel-shingle mass
    assert(got((3L, -1L)) == ((4L, 4L, false)))
    // the bridge doc's two qualifying clusters are exactly what the
    // batch merge (incrementalComponents) would join next run
    assert(got.keys.count { case (d, c) => d == 2L && c > 0 &&
      got((d, c))._3 } == 2)
  }

  test("streaming new-users gate counts each user's first arrival once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2026-01-0$d $h%02d:00:00")
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    mem.addData(Seq(
      (ts(1, 1), 100L), (ts(1, 2), 101L), (ts(1, 3), 100L), // 100 repeats
      (ts(2, 1), 102L), (ts(2, 2), 100L), (ts(2, 3), 101L), // only 102 new
      (ts(3, 1), 103L), (ts(3, 2), 104L)))
    val q = StreamOps.newUsersGate(mem.toDF().toDF("ts", "user_id"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("newusers_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("newusers_out").collect()
      .map(r => r.getTimestamp(0).toString.take(10) -> r.getLong(1)).toMap
    assert(got == Map("2026-01-01" -> 2L, "2026-01-02" -> 1L,
      "2026-01-03" -> 2L))
  }

  test("streaming ewma gate applies the batch fixed-point rule per closing day") {
    import spark.implicits._
    import graft.operators.EventAnalytics
    implicit val sqlCtx = spark.sqlContext
    def day(d: Int, k: Int) =
      new java.sql.Timestamp(1700000000000L / 86400000L * 86400000L
        + d * 86400000L + k * 1000L)
    // 16 days of flat 8/day history -> baseline = 8 * (2^16 - 1) = 524280
    val hist = (0 until 16).flatMap { d =>
      (0 until 8).map(k => (day(d, k), "click"))
    }.toDF("ts", "event_type")
    val baseline = EventAnalytics.ewmaBaselineOf(hist)
    val b = baseline.collect()
    assert(b.length == 1 && b.head.getAs[Long]("ewma_x65536") == 8L * 65535L)
    // live: day 20 normal (8), day 21 spike (20), day 22 stall (3)
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    mem.addData(
      (0 until 8).map(k => (day(20, k), "click")) ++
        (0 until 20).map(k => (day(21, k), "click")) ++
        (0 until 3).map(k => (day(22, k), "click")))
    val q = StreamOps.ewmaGate(mem.toDF().toDF("ts", "event_type"), baseline)
      .writeStream.outputMode("complete").format("memory")
      .queryName("ewma_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ewma_out").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("day").getTime,
        r.getAs[Long]("actual"), r.getAs[Boolean]("spike"),
        r.getAs[Boolean]("stall"))).sortBy(_._1)
    assert(got.length == 3)
    assert(got(0)._2 == 8 && !got(0)._3 && !got(0)._4)
    // 20·65536 = 1310720 > 2·524280 = 1048560 -> spike
    assert(got(1)._2 == 20 && got(1)._3 && !got(1)._4)
    // 2·3·65536 = 393216 < 524280 -> stall
    assert(got(2)._2 == 3 && !got(2)._3 && got(2)._4)
  }

  test("streaming funnel z gate flags a planted conversion shift per closing day") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def day(d: Int, k: Int) =
      new java.sql.Timestamp(1700000000000L / 86400000L * 86400000L
        + d * 86400000L + k * 1000L)
    // settled-era baseline: 1000 trials, 100 conversions (10%)
    val (nBase, xBase) = (1000L, 100L)
    // day 5: 100 trials at the baseline rate (10 conv) -> not shifted;
    // day 6: 100 trials, 30 conv (a planted 3x shift) -> shifted
    val mem = MemoryStream[(java.sql.Timestamp, Boolean)]
    mem.addData(
      (0 until 100).map(k => (day(5, k), k < 10)) ++
        (0 until 100).map(k => (day(6, k), k < 30)))
    val q = StreamOps.funnelZGate(mem.toDF().toDF("ts", "converted"),
        nBase, xBase)
      .writeStream.outputMode("complete").format("memory")
      .queryName("funnelz_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("funnelz_out").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("day").getTime,
        r.getAs[Long]("n_w"), r.getAs[Long]("x_w"),
        r.getAs[Long]("conv_ppm"), r.getAs[Double]("z_score"),
        r.getAs[Boolean]("shifted"))).sortBy(_._1)
    assert(got.length == 2)
    // the batch op's pooled-z arithmetic, recomputed by hand per window
    def zOf(n: Long, x: Long): Double = {
      val p = (x + xBase).toDouble / (n + nBase).toDouble
      (x.toDouble / n - xBase.toDouble / nBase) /
        math.sqrt(p * (1 - p) * (1.0 / n + 1.0 / nBase))
    }
    assert(got(0)._2 == 100 && got(0)._3 == 10 && got(0)._4 == 100000L)
    assert(math.abs(got(0)._5 - zOf(100, 10)) < 1e-12 && !got(0)._6)
    assert(got(1)._2 == 100 && got(1)._3 == 30 && got(1)._4 == 300000L)
    assert(math.abs(got(1)._5 - zOf(100, 30)) < 1e-12 && got(1)._6)
    assert(math.abs(got(0)._5) < 1.96 && math.abs(got(1)._5) >= 1.96)
  }

  test("streaming psi gate scores each window like the batch PSI formula") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(hour: Int, k: Int) =
      new java.sql.Timestamp(1700000000000L + hour * 3600000L + k * 1000L)
    // frozen reference: uniform over [0, 10) -> 8 per bin
    val refCounts = Seq.fill(10)(8L)
    val (vmin, vmax) = (0.0, 10.0)
    // hour 0 mirrors the reference (one value per bin); hour 1 collapses
    // onto bin 0 (a hard upstream distribution break)
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    mem.addData(
      (0 until 10).map(k => (ts(0, k), k + 0.5)) ++
        (0 until 10).map(k => (ts(1, k), 0.5)))
    val q = StreamOps.psiGate(mem.toDF().toDF("ts", "value"),
        refCounts, vmin, vmax)
      .writeStream.outputMode("complete").format("memory")
      .queryName("psi_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("psi_out").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("hour").getTime,
        r.getAs[Long]("n_events"), r.getAs[Double]("psi"),
        r.getAs[Boolean]("drifted"))).sortBy(_._1)
    assert(got.length == 2)
    // replay the batch formula in the driver for both windows
    def psiOf(cur: Seq[Long]): Double = {
      val refTotal = refCounts.sum.toDouble
      val curTotal = cur.sum.toDouble
      (0 until 10).map { b =>
        val pr = (refCounts(b) + 0.5) / (refTotal + 5.0)
        val pc = (cur(b) + 0.5) / (curTotal + 5.0)
        (pc - pr) * math.log(pc / pr)
      }.sum
    }
    val flat = Seq.fill(10)(1L)
    val spike = 10L +: Seq.fill(9)(0L)
    assert(got(0)._2 == 10 && math.abs(got(0)._3 - psiOf(flat)) < 1e-12)
    assert(!got(0)._4 && got(0)._3 < 0.25)
    assert(got(1)._2 == 10 && math.abs(got(1)._3 - psiOf(spike)) < 1e-12)
    assert(got(1)._4)
  }

  test("streaming funnel conversions match the batch definition per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("t_us"), col("user_id"),
        col("event_type"))
      .as[StreamOps.FunnelEv].collect().sortBy(e => (e.user_id, e.t_us, e.event_id))
    val mem = MemoryStream[StreamOps.FunnelEv]
    mem.addData(evs.toSeq)
    val q = StreamOps.funnel(mem.toDS()).writeStream
      .outputMode("append").format("memory").queryName("funnel_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("funnel_out")
      .select(col("user_id"), col("t_signup"), col("t_purchase")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch definition: first signup per user, first purchase at/after it
    val signup = evs.filter(_.event_type == "signup").groupBy(_.user_id)
      .map { case (u, es) => u -> es.map(_.t_us).min }
    val want = signup.flatMap { case (u, ts) =>
      evs.filter(e => e.user_id == u && e.event_type == "purchase" && e.t_us >= ts)
        .map(_.t_us).minOption.map(tp => (u, ts, tp))
    }.toSet
    assert(got == want && got.nonEmpty)
    // exactly one conversion per converted user
    assert(got.map(_._1).size == got.size)
  }

  test("streaming sessionization closed-session counts match batch sessionize") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("t_us"), col("user_id"),
        col("value"))
      .as[StreamOps.Ev].collect().sortBy(e => (e.user_id, e.t_us, e.event_id))
    val mem = MemoryStream[StreamOps.Ev]
    mem.addData(evs.toSeq)
    val q = StreamOps.sessionize(mem.toDS()).writeStream
      .outputMode("append").format("memory").queryName("sess_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sess_out")
    // one micro-batch: every session except each user's last is emitted
    val batchSessions = graft.operators.Relational.qSessionize(spark, sf)
    val expectedClosed = batchSessions.count() -
      batchSessions.select("user_id").distinct().count()
    assert(got.count() == expectedClosed)
    // closed-session event counts must agree exactly with the batch op
    val diff = got.toDF("user_id", "session_id", "n_events")
      .join(batchSessions.select(col("user_id"), col("session_id"), col("n_events").as("want")),
        Seq("user_id", "session_id"))
      .filter(col("n_events") =!= col("want")).count()
    assert(diff == 0)
  }

  test("streaming ann lookup flags a re-ingested corpus vector; a random one stays clean") {
    import spark.implicits._
    import graft.sim.Similarity
    val index = Similarity.corpusBucketIndex(spark, sf)
    // query 1: an exact copy of corpus vector 7 — must come back as its
    // own nearest neighbor at cosine 1.0 and trip the near-dup gate
    val v7 = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") === 7L).collect().head
      .getSeq[Float](1).map(_.toDouble)
    // query 2: a seeded random vector — whatever bucket it probes, no
    // corpus cosine approaches the 0.9 gate
    val rnd = new scala.util.Random(7)
    val noise = Seq.fill(64)(rnd.nextDouble() * 2 - 1)
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Seq[Double])]
    mem.addData(Seq((1L, ts(0), v7), (2L, ts(1), noise)))
    val q = StreamOps.annLookup(mem.toDF().toDF("query_id", "ts", "v"), index)
      .writeStream.outputMode("complete").format("memory")
      .queryName("ann_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ann_out").collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("nearest_id"), r.getAs[Double]("best_cosine"),
          r.getAs[Long]("n_candidates"), r.getAs[Boolean]("is_near_dup"))).toMap
    val (nid, cos, nCand, flagged) = got(1L)
    assert(nid == 7L && cos == 1.0 && nCand >= 1 && flagged)
    // the random query either found no candidates (no row) or nothing
    // near the gate
    got.get(2L).foreach { case (_, c, _, f) => assert(!f && c < 0.9) }
  }

  test("stream-stream attribution join equals the batch interval join on a replay") {
    import spark.implicits._
    val batch = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    mem.addData(batch.as[(Long, java.sql.Timestamp, Long, String, Double)].collect().toSeq)
    val streamDf = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.attributionJoin(streamDf).writeStream
      .outputMode("append").format("memory").queryName("attr_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("attr_out")
    // batch recompute: same API runs in batch mode (watermarks are no-ops)
    val want = StreamOps.attributionJoin(batch)
    assert(got.count() > 0, "the replay must produce attributions")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // semantics: every pair is same-user, within [0, 30) minutes
    got.collect().foreach { r =>
      val lag = r.getAs[Long]("purchase_us") - r.getAs[Long]("view_us")
      assert(lag >= 0 && lag < 30L * 60 * 1000000)
      assert(r.getAs[Long]("lag_minutes") == lag / 60000000L)
    }
  }

  test("streaming top-k leaderboard converges to the batch top-k across triggers") {
    import spark.implicits._
    import graft.streaming.StreamOps.{TopEv, TopOut}
    val all = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, String, Double)].collect()
      .map(t => TopEv(t._1, t._2, t._3, t._4))
    val (chunk1, chunk2) = all.splitAt(all.length / 2)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TopEv]
    val q = StreamOps.streamTopK(mem.toDS()).writeStream
      .outputMode("update").format("memory").queryName("tk_out").start()
    mem.addData(chunk1.toSeq)
    q.processAllAvailable()
    val snap1 = spark.table("tk_out").as[TopOut].collect()
    mem.addData(chunk2.toSeq)
    q.processAllAvailable(); q.stop()
    val snap2 = spark.table("tk_out").as[TopOut].collect()

    def topk(evs: Seq[TopEv]): Map[String, Seq[(Int, Long, Double)]] =
      evs.groupBy(_.event_type).map { case (t, es) =>
        (t, es.map(e => (e.value, e.event_id))
          .sortBy { case (v, id) => (-v, id) }.take(StreamOps.streamTopN)
          .zipWithIndex.map { case ((v, id), i) => (i + 1, id, v) })
      }
    // trigger 1 emitted exactly the chunk-1 leaderboard
    val got1 = snap1.groupBy(_.event_type).map { case (t, rs) =>
      (t, rs.sortBy(_.rank).map(r => (r.rank, r.event_id, r.value)).toSeq) }
    assert(got1 == topk(chunk1.toSeq))
    // final state per type: its last-trigger rows (types untouched by
    // chunk 2 keep their trigger-1 board) == batch top-k over everything
    val added = snap2.drop(snap1.length)
    val finalBoard = got1 ++ added.groupBy(_.event_type).map { case (t, rs) =>
      (t, rs.sortBy(_.rank).map(r => (r.rank, r.event_id, r.value)).toSeq) }
    assert(finalBoard == topk(all.toSeq))
    // bounded state: never more than k rows per type per trigger
    assert(snap1.groupBy(_.event_type).values.forall(_.length <= StreamOps.streamTopN))
  }

  test("streaming mask gate flags novel-format windows against the static dictionary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(hour: Int, k: Int) =
      new java.sql.Timestamp(1700000000000L + hour * 3600000L + k * 1000L)
    // dictionary = the batch profiler's masks for this field
    val known = Seq("Aa#9").toDF("mask")
    // hour 0: 8 conforming IDs; hour 1: 6 conforming + 3 novel-format +
    // 1 null (null keeps its own <null> mask, also novel here)
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    mem.addData(
      (0 until 8).map(k => (ts(0, k), f"Customer#$k%09d")) ++
        (0 until 6).map(k => (ts(1, k), f"Customer#$k%09d")) ++
        Seq((ts(1, 6), "cust-42"), (ts(1, 7), "cust-43"),
          (ts(1, 8), "CUST 44"), (ts(1, 9), null)))
    val q = StreamOps.maskGate(mem.toDF().toDF("ts", "v"), known,
        ceilingPpm = 100000L)
      .writeStream.outputMode("complete").format("memory")
      .queryName("mask_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("mask_out").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("hour").getTime,
        r.getAs[Long]("n_rows"), r.getAs[Long]("n_novel"),
        r.getAs[Long]("novel_ppm"), r.getAs[Boolean]("gate"))).sortBy(_._1)
    assert(got.length == 2)
    def hourFloor(t: Long) = t / 3600000L * 3600000L
    assert(got(0) == (hourFloor(ts(0, 0).getTime), 8L, 0L, 0L, false))
    // 4 novel of 10 -> 400000 ppm > the 100000 ceiling
    assert(got(1) == (hourFloor(ts(1, 0).getTime), 10L, 4L, 400000L, true))
  }

  test("streaming importance gate scores like the batch DSIR weights") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lam = graft.text.Importance.lambdaTable(spark, sf)
    val batch = graft.text.Importance.curationImportance(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("per_bigram_nats")))
      .toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    mem.addData(docs.map { case (id, t) => (id, t0, t) }.toSeq :+
      ((9999L, t0, "single")))  // < 2 tokens -> filtered, no row
    val q = StreamOps.importanceGate(
        mem.toDF().toDF("doc_id", "ts", "text"), lam, floor = -1.0)
      .writeStream.outputMode("complete").format("memory")
      .queryName("impgate_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("impgate_out").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!got.contains(9999L))
    docs.foreach { case (id, _) =>
      val (nb, per) = batch(id)
      assert(got(id).getAs[Long]("n_bigrams") == nb, s"doc $id")
      assert(got(id).getAs[Double]("per_bigram_nats") == per, s"doc $id")
      assert(got(id).getAs[Boolean]("reject") == (per < -1.0), s"doc $id")
    }
  }

  test("streaming paragraph gate scores block novelty against the settled index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // settled corpus: one 32-token doc -> exactly two 16-token blocks
    val settledText = (1 to 32).map(i => s"w$i").mkString(" ")
    val settled = Seq((0L, settledText, "en", "src0", settledText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_pblk").toString
    settled.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val index = graft.text.Dedup.paragraphBlockIndex(spark, dir)
    assert(index.count() == 2)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val freshBlock = (1 to 16).map(i => s"z$i").mkString(" ")
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    mem.addData(Seq(
      // exact re-ingest: both blocks known -> novelty 0
      (1L, t0, settledText),
      // half old, half new: first block settled, second fresh
      (2L, t0, (1 to 16).map(i => s"w$i").mkString(" ") + " " + freshBlock),
      // fully novel
      (3L, t0, freshBlock),
      // a short tail (5 tokens) -> one short novel block
      (4L, t0, "a b c d e")))
    val q = StreamOps.paragraphGate(
        mem.toDF().toDF("doc_id", "ts", "text"), index)
      .writeStream.outputMode("complete").format("memory")
      .queryName("pgate_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("pgate_out").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("novel_blocks"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("novel_tokens"),
          r.getAs[Long]("novelty_ppm"))).toMap
    assert(got(1L) == ((2L, 0L, 32L, 0L, 0L)))
    assert(got(2L) == ((2L, 1L, 32L, 16L, 500000L)))
    assert(got(3L) == ((1L, 1L, 16L, 16L, 1000000L)))
    assert(got(4L) == ((1L, 1L, 5L, 5L, 1000000L)))
  }

  test("streaming pack spans: batch-split invariant and span-exact per lane") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val seqLen = 16L
    // two lanes; doc token counts chosen to straddle sequence
    // boundaries (10+10 crosses at 16; 32 spans two full sequences)
    val arrivals = Seq(
      (1L, 1000L, 0L, 10L), (2L, 2000L, 0L, 10L), (3L, 3000L, 0L, 32L),
      (4L, 1500L, 1L, 16L), (5L, 2500L, 1L, 5L), (6L, 3500L, 1L, 0L))
    def run(batches: Seq[Seq[(Long, Long, Long, Long)]],
        name: String): Seq[(Long, Long, Long, Long, Long, Long, Boolean, Boolean)] = {
      val mem = MemoryStream[(Long, Long, Long, Long)]
      val q = StreamOps.packSpans(
          mem.toDF().toDF("doc_id", "t_us", "lane", "toks")
            .as[StreamOps.PackDoc], seqLen)
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getBoolean(6), r.getBoolean(7))).toSeq
        .sortBy(t => (t._1, t._2, t._4))
    }
    val oneShot = run(Seq(arrivals), "pspan_one")
    val split = run(Seq(arrivals.take(3), arrivals.drop(3)), "pspan_split")
    // the cursor carries across micro-batches: any split of the same
    // arrival order emits identical spans
    assert(oneShot == split)
    // driver recompute of the span arithmetic (the batch op's formula)
    val want = arrivals.groupBy(_._3).toSeq.flatMap { case (lane, ds) =>
      var cur = 0L
      ds.sortBy(d => (d._2, d._1)).filter(_._4 > 0).flatMap { d =>
        val start = cur; val end = cur + d._4; cur = end
        (start / seqLen to (end - 1) / seqLen).map { seq =>
          val s = math.max(start, seq * seqLen)
          val e = math.min(end, (seq + 1) * seqLen)
          (lane, seq, d._1, s - seq * seqLen, e - seq * seqLen, e - s,
            start / seqLen == seq, (end - 1) / seqLen == seq)
        }
      }
    }.sortBy(t => (t._1, t._2, t._4))
    assert(oneShot == want)
    // lane 0: doc 3 (32 toks at offset 20) must span three sequences
    assert(oneShot.count(t => t._3 == 3L) == 3)
    // zero-token doc 6 emits nothing
    assert(!oneShot.exists(_._3 == 6L))
  }

  test("streaming cusum gate: batch-split invariant, textbook registers, planted drift fires") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // frozen baseline: mean 1000 µ, slack 50 µ, alarm at h = 500 µ
    val (mu6Base, slack6, h6) = (1000L, 50L, 500L)
    // lane 0: noise around the baseline, then a sustained +200 µ shift
    // from day 10 (fires the UP detector after ~4 shifted days:
    // 4·(200−50) = 600 ≥ 500); lane 1: a mirrored DOWNWARD shift
    val lane0 = (0 until 10).map(d => (0L, d.toLong,
      1000L + (if (d % 2 == 0) 40L else -40L))) ++
      (10 until 16).map(d => (0L, d.toLong, 1200L))
    val lane1 = (0 until 10).map(d => (1L, d.toLong,
      1000L + (if (d % 3 == 0) 30L else -15L))) ++
      (10 until 16).map(d => (1L, d.toLong, 800L))
    val arrivals = (lane0 ++ lane1).sortBy(t => (t._2, t._1))
    def run(batches: Seq[Seq[(Long, Long, Long)]], name: String) = {
      val mem = MemoryStream[(Long, Long, Long)]
      val q = StreamOps.cusumGate(
          mem.toDF().toDF("lane", "day_num", "mu6")
            .as[StreamOps.CusumDay], mu6Base, slack6, h6)
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
        .toSeq.sortBy(t => (t._1, t._2))
    }
    val oneShot = run(Seq(arrivals), "cusum_one")
    val split = run(Seq(arrivals.take(11), arrivals.slice(11, 20),
      arrivals.drop(20)), "cusum_split")
    // the four per-lane registers carry across micro-batches: any split
    // of the same per-lane day order emits identical rows
    assert(oneShot == split)
    // driver recompute: the batch op's virtual-zero textbook recursion
    val want = (lane0 ++ lane1).groupBy(_._1).toSeq.flatMap { case (lane, ds) =>
      var (cup, cdn, mn, mx) = (0L, 0L, 0L, 0L)
      ds.sortBy(_._2).map { case (_, d, m) =>
        cup += (m - mu6Base) - slack6; cdn += (m - mu6Base) + slack6
        mn = math.min(mn, cup); mx = math.max(mx, cdn)
        (lane, d, cup - mn, mx - cdn, cup - mn >= h6, mx - cdn >= h6)
      }
    }.sortBy(t => (t._1, t._2))
    assert(oneShot == want)
    // the planted shifts fire the matching detector and not the other
    val l0 = oneShot.filter(_._1 == 0L)
    assert(!l0.take(10).exists(_._5), "no UP alarm before the shift")
    assert(l0.drop(10).exists(_._5), "UP alarm after the +200 shift")
    assert(!l0.exists(_._6), "downward detector stays quiet on lane 0")
    val l1 = oneShot.filter(_._1 == 1L)
    assert(l1.drop(10).exists(_._6), "DOWN alarm after the -200 shift")
    assert(!l1.exists(_._5), "upward detector stays quiet on lane 1")
  }

  test("streaming score gate: batch-split invariant, matches the batch op's ppm algebra") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // lane 0: healthy weeks, then a completeness collapse (NULL era);
    // lane 1: a duplicate-flood week (uniqueness drop), then recovery
    val lane0 = Seq(
      (0L, 100L, 1000L, 990L, 1000L, 990L),
      (0L, 101L, 1200L, 1190L, 1200L, 1190L),
      (0L, 102L, 1100L, 0L, 1100L, 0L),     // all values NULL
      (0L, 103L, 900L, 890L, 900L, 890L))
    val lane1 = Seq(
      (1L, 100L, 800L, 800L, 800L, 800L),
      (1L, 101L, 1600L, 1600L, 400L, 1600L), // 4x duplicated ids
      (1L, 102L, 700L, 700L, 700L, 700L))
    val arrivals = (lane0 ++ lane1).sortBy(t => (t._2, t._1))
    def run(batches: Seq[Seq[(Long, Long, Long, Long, Long, Long)]],
        name: String) = {
      val mem = MemoryStream[(Long, Long, Long, Long, Long, Long)]
      val q = StreamOps.scoreGate(
          mem.toDF().toDF("lane", "week_num", "n_rows", "n_value",
            "n_distinct", "n_nonneg").as[StreamOps.ScoreWeek])
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getString(4))).toSeq.sortBy(t => (t._1, t._2))
    }
    val oneShot = run(Seq(arrivals), "score_one")
    val split = run(Seq(arrivals.take(3), arrivals.slice(3, 5),
      arrivals.drop(5)), "score_split")
    // the one-Long register carries across micro-batches
    assert(oneShot == split)
    // driver recompute with the batch op's exact ppm algebra
    def ppm(n: Long, d: Long) = (BigInt(n) * 1000000 / d).toLong
    val want = (lane0 ++ lane1).groupBy(_._1).toSeq.flatMap {
      case (lane, ws) =>
        var prev: Option[Long] = None
        ws.sortBy(_._2).map { case (_, w, n, nv, nd, nn) =>
          val score = (ppm(nv, n) * 50 + ppm(nd, n) * 30 +
            (if (nv > 0) ppm(nn, nv) else 1000000L) * 20) / 100
          val delta = prev.map(score - _)
          val status = delta match {
            case None => "baseline"
            case Some(d) if d <= -10000 => "degraded"
            case Some(d) if d >= 10000 => "improved"
            case _ => "stable"
          }
          prev = Some(score)
          (lane, w, score, delta, status)
        }
    }.sortBy(t => (t._1, t._2))
    assert(oneShot == want)
    // the planted incidents read as the right verdicts
    val l0 = oneShot.filter(_._1 == 0L).map(_._5)
    assert(l0 == Seq("baseline", "stable", "degraded", "improved"))
    val l1s = oneShot.filter(_._1 == 1L).map(_._5)
    assert(l1s == Seq("baseline", "degraded", "improved"))
  }
}
