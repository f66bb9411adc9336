package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 regression specs for the SharedArtifacts hardening:
  * per-memoKey locking (r11 VERDICT #5 — the object-level `synchronized`
  * serialized UNRELATED artifact derivations and blocked memo hits behind
  * a long derivation) and the cluster-visibility guard for the
  * driver-local tmpdir default (r11 VERDICT #6).
  */
class Round12Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def mkCorpus(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r12").toString
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "src0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("materialized: concurrent consumers of DIFFERENT artifacts never serialize") {
    import spark.implicits._
    val dir = mkCorpus(Seq("one two three", "four five six"))
    val inSlowDerivation = new CountDownLatch(1)
    val releaseSlow = new CountDownLatch(1)
    @volatile var slowErr: Throwable = null
    val slow = new Thread(() =>
      try {
        SharedArtifacts.materialized(spark, dir, "r12_slow_artifact") {
          inSlowDerivation.countDown()
          // hold the per-key monitor mid-derivation until released
          assert(releaseSlow.await(30, TimeUnit.SECONDS), "spec deadlock")
          Seq((1L, "slow")).toDF("id", "tag")
        }.count()
      } catch { case t: Throwable => slowErr = t })
    slow.start()
    assert(inSlowDerivation.await(30, TimeUnit.SECONDS))
    // with the r11 object-level lock this call would block until
    // releaseSlow fires; per-key locking must let it derive + read NOW
    val fast = SharedArtifacts.materialized(spark, dir, "r12_fast_artifact") {
      Seq((1L, "fast"), (2L, "fast")).toDF("id", "tag")
    }
    assert(fast.count() == 2L)
    releaseSlow.countDown()
    slow.join(30000)
    assert(!slow.isAlive && slowErr == null,
      s"slow consumer must complete cleanly: $slowErr")
    // and the slow artifact memo-hits afterwards (no re-derivation)
    val hit = SharedArtifacts.materialized(spark, dir, "r12_slow_artifact") {
      fail("memo hit must not re-derive"); null
    }
    assert(hit.count() == 1L)
  }

  test("artifactRoot guard: non-local master + unset GRAFT_ARTIFACT_DIR fails fast") {
    // local master: default root fine, configured root fine
    SharedArtifacts.requireClusterVisibleRoot(isLocalMaster = true,
      rootConfigured = false)
    SharedArtifacts.requireClusterVisibleRoot(isLocalMaster = true,
      rootConfigured = true)
    // cluster master: configured root fine, unset root must throw
    SharedArtifacts.requireClusterVisibleRoot(isLocalMaster = false,
      rootConfigured = true)
    val e = intercept[IllegalArgumentException] {
      SharedArtifacts.requireClusterVisibleRoot(isLocalMaster = false,
        rootConfigured = false)
    }
    assert(e.getMessage.contains("GRAFT_ARTIFACT_DIR"))
  }

  test("materialized: artifact paths are Hadoop-visible (scheme-preserving, memo liveness via FileSystem)") {
    // the r11 ADVICE bug: java.nio Paths.get collapses `s3a://bucket` to
    // `s3a:/bucket` and Files.exists is constant-false off-local-fs, so a
    // remote root never memo-hit. Assert the Hadoop path algebra the fix
    // relies on preserves URI roots end-to-end.
    val child = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path("s3a://bucket/artifacts", "app-123"),
      "deadbeef_components.parquet")
    assert(child.toString ==
      "s3a://bucket/artifacts/app-123/deadbeef_components.parquet")
    // and the local round-trip still memo-hits (liveness probe finds the
    // written artifact through FileSystem.exists)
    import spark.implicits._
    val dir = mkCorpus(Seq("alpha beta"))
    val first = SharedArtifacts.materialized(spark, dir, "r12_liveness") {
      Seq((7L, "x")).toDF("id", "tag")
    }
    assert(first.count() == 1L)
    val second = SharedArtifacts.materialized(spark, dir, "r12_liveness") {
      fail("second consumer must memo-hit"); null
    }
    assert(second.count() == 1L)
  }
}
