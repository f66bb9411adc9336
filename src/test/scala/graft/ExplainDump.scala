package graft

/** Builder-local diagnostic: print the executed plan of named queries
  * (condensed to the structural operators) for PLANS.md audits.
  * Usage: sbt "Test/runMain graft.ExplainDump q2_min_cost_supplier ..."
  * Optional first arg full=1 prints complete plans.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val full = args.headOption.contains("full")
    val names = if (full) args.tail else args
    val spark = GraftSession("local[4]", shufflePartitions = 4)
    val sf = "/root/testdata/sf0.001"
    for (q <- names) {
      println(s"===== $q")
      val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      if (full) println(p)
      else println(p.linesIterator.filter(l =>
          Seq("Exchange", "Scan", "Join", "HashAggregate", "ObjectHashAggregate",
            "SortAggregate", "Window", "TakeOrdered", "Expand", "Sort ")
            .exists(l.contains))
        .map(_.replaceAll("#\\d+L?", "").take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
