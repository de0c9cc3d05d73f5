package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: per-query scan census. Executes every SparkEntry query
  * at a small SF and prints how many FileScans the FINAL adaptive plan
  * ran and which tables they hit — the quick way to spot a query that
  * reads a table twice where a ReusedExchange or a per-row rewrite
  * (e.g. round 8's c8 fingerprint fold) could make it one pass.
  * Usage: runMain graft.tools.ScanAudit <sfDir> [name ...]
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tablePat = "([a-z_]+)\\.parquet".r
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          df.collect() // materialize so AQE reuse shows in the final plan
          val p = df.queryExecution.executedPlan.toString
            .split("== Initial Plan ==").head
          val scans = "FileScan".r.findAllIn(p).size
          val reused = "ReusedExchange".r.findAllIn(p).size
          val tables = tablePat.findAllMatchIn(p).map(_.group(1)).toSeq
            .groupBy(identity).map { case (t, xs) => s"$t×${xs.size}" }
            .toSeq.sorted.mkString(" ")
          println(f"[scan-audit] $name%-22s scans=$scans reused=$reused  $tables")
        } catch {
          case e: Throwable =>
            println(s"[scan-audit] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
