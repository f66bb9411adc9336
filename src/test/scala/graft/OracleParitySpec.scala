package graft

import org.scalatest.funsuite.AnyFunSuite

/** The gate-of-the-gate (r6 VERDICT next-round #8): replays the driver's
  * correctness pipeline — Verify dump + scripts/oracle_check.py's
  * TYPE-sensitive DuckDB compare — for every `SparkEntry.oracleSql`
  * entry at sf0.001, inside `sbt test`. A HUGEINT-vs-BIGINT seam or a
  * semantic drift between a query and its oracle (the r6 q12/q21
  * failure class) goes red HERE, not in the round driver.
  *
  * Runs the exact same python script the builder uses locally, so the
  * compare semantics (columns sorted by name, rows sorted, floats via
  * repr, declared DuckDB types) cannot drift from the tooling.
  */
class OracleParitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("every oracleSql entry passes the driver's type-sensitive DuckDB compare") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    assume(new java.io.File("scripts/oracle_check.py").isFile,
      "run from the repo root (sbt loads the project there)")
    val out = java.nio.file.Files.createTempDirectory("oracle_parity").toString
    Verify.dump(spark, sfDir, out)
    val pb = new ProcessBuilder("python3", "scripts/oracle_check.py", sfDir, out)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val log = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    val code = proc.waitFor()
    val fails = log.linesIterator.filter(_.startsWith("FAIL")).toSeq
    assert(code == 0 && fails.isEmpty,
      s"oracle_check.py exit $code:\n${fails.mkString("\n")}\n" +
        log.linesIterator.toSeq.takeRight(2).mkString("\n"))
  }
}
