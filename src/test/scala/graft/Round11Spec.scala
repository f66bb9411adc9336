package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 regression specs: the shared-artifact memo key must keep
  * `dir` alongside the content fingerprint (VERDICT r10 #2 / ADVICE
  * medium — a `cp -r`'d corpus preserves relative layout, sizes and
  * mtimes, so its fingerprint COLLIDES with the original's; a
  * fingerprint-only key would then serve corpus A's trained artifacts
  * to corpus B, and any non-java.nio-visible dir degrades to the shared
  * "absent" sentinel with the same effect).
  */
class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def mkCorpus(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r11").toString
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "src0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Byte-identical copy preserving sizes AND mtimes — the fingerprint
    * collision a plain `cp -r -p` produces. */
  private def cloneCorpus(src: String): String = {
    val dst = Files.createTempDirectory("graft_r11c").toString
    val root = Paths.get(src)
    val s = Files.walk(root)
    try s.forEach { p =>
      val q = Paths.get(dst).resolve(root.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(q)
      else {
        Files.copy(p, q, StandardCopyOption.COPY_ATTRIBUTES,
          StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(q, Files.getLastModifiedTime(p))
      }
    } finally s.close()
    dst
  }

  private def artifactPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten

  test("byte-identical corpus dirs get DISTINCT shared artifacts") {
    val a = mkCorpus(Seq("alpha beta gamma delta", "alpha beta gamma delta",
      "epsilon zeta eta theta"))
    val b = cloneCorpus(a)
    // the collision precondition: identical content fingerprints
    assert(SharedArtifacts.tableFingerprint(a, "documents") ==
      SharedArtifacts.tableFingerprint(b, "documents"),
      "clone must reproduce the fingerprint for this test to bite")
    // the fix: the memo key still distinguishes them
    assert(SharedArtifacts.memoKey(spark, a, "components") !=
      SharedArtifacts.memoKey(spark, b, "components"))
    // and each dir materializes its OWN artifact file
    val compA = graft.text.Dedup.componentsTable(spark, a)
    val compB = graft.text.Dedup.componentsTable(spark, b)
    assert(artifactPaths(compA).nonEmpty)
    assert(artifactPaths(compA).intersect(artifactPaths(compB)).isEmpty,
      s"dirs must not share an artifact: ${artifactPaths(compA)}")
    assert(compA.count() == 3 && compB.count() == 3)
  }

  test("a non-java.nio-visible dir cannot alias another via 'absent'") {
    // both fingerprints degrade to the shared "absent" sentinel; the
    // dir component keeps the keys distinct
    assert(SharedArtifacts.tableFingerprint("/nonexistent/x", "documents")
      == "absent")
    assert(SharedArtifacts.memoKey(spark, "/nonexistent/x", "bpe-toks") !=
      SharedArtifacts.memoKey(spark, "/nonexistent/y", "bpe-toks"))
  }

  test("shared artifacts pin no executor storage (lake spill path)") {
    val dir = mkCorpus(Seq("one two three four", "five six seven eight",
      "one two three four"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    graft.text.Dedup.componentsTable(spark, dir).count()
    graft.text.BpeTrainer.bpeTokensTable(spark, dir).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"shared artifacts must live in the lake, not executor storage: $leaked")
  }
}
