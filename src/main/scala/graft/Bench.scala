package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional args: query names restrict the run (dev loop; the driver
    // passes none and gets the full suite)
    val only = args.toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // aggressive periodic GC so finished broadcasts/shuffles are
      // reclaimed between queries instead of piling up in the one JVM
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: spin up executors, codegen, parquet reader paths
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Three INTERLEAVED repetitions of the whole suite, reported as the
    // per-query median: interleaving decorrelates a query's samples from
    // whatever the shared JVM was doing right then (JIT, GC, the local
    // VM's occasional scheduler stalls), and the median rejects a single
    // stalled sample without hiding a real regression the way min can.
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    // 5 interleaved reps: this VM's scheduler randomly stalls ~30% of
    // task sets for seconds regardless of query; the median of 5 rejects
    // up to two stalled samples per query where a median of 3 is
    // contaminated by one bad pair.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to reps; (name, fn) <- names)
      samples(name) = once(fn) :: samples.getOrElse(name, Nil)
    val results = names.map { case (name, _) =>
      name -> samples(name).sorted.apply(reps / 2) // median
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // all raw samples ride along so a surprising median is explainable
    // from the artifact alone (stall vs real regression)
    val raw = names.map { case (k, _) =>
      s"\"" + k + "\":" + samples(k).reverse.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"samples":$raw,"sf":"$sfDir"}""")
    spark.stop()
  }
}
