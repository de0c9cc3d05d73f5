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
        val n = fn(spark, sfDir).count()
        println(f"[explain] $name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
