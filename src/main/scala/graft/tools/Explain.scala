package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time and/or explain individual SparkEntry queries.
  * Usage: runMain graft.tools.Explain <sfDir> [--explain] name...
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val doExplain = args.contains("--explain")
    val names = args.drop(1).filterNot(_ == "--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.ui.showConsoleProgress", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm up
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (doExplain) fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val n = df.count()
        println(f"[explain] $name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        // post-execution plan: AQE stage reuse (ReusedQueryStage /
        // ReusedExchange) only shows up in the FINAL adaptive plan of a
        // plan that actually ran — execute THIS df via a noop sink,
        // then print its materialized adaptive plan
        if (doExplain && i == 1) {
          // collect() runs THIS QueryExecution, so its
          // AdaptiveSparkPlanExec is materialized in place (a count()
          // or write() would execute a different derived plan)
          val df2 = fn(spark, sfDir)
          df2.queryExecution.executedPlan // force planning
          df2.collect()
          println(df2.queryExecution.executedPlan.toString)
        }
      }
    }
    spark.stop()
  }
}
