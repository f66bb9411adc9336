package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.sources.{Collector, ParquetSource}
import graft.output.{ArtifactJson, MarkdownDoc}

/** CLI-equivalent of the reference's two binaries in one pass:
  * collect (dbsurveyor-collect) then generate (dbsurveyor generate):
  * writes `<outDir>/schema.graft.json` and `<outDir>/schema.md`.
  *
  * Usage: runMain graft.Generate <sfDir> <outDir> [sampleSize]
  */
object Generate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_out"
    val sampleSize = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val artifact = Collector.collect(new ParquetSource(spark, sfDir), sampleSize)
    val errors = Collector.validate(artifact)
    if (errors.nonEmpty) {
      errors.foreach(e => System.err.println(s"[generate] validation: $e"))
      sys.exit(1)
    }
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(s"$outDir/schema.graft.json"), ArtifactJson.render(artifact))
    Files.writeString(Paths.get(s"$outDir/schema.md"), MarkdownDoc.render(artifact))
    println(s"[generate] wrote $outDir/schema.graft.json and $outDir/schema.md " +
      s"(${artifact.tables.size} tables)")
    spark.stop()
  }
}
