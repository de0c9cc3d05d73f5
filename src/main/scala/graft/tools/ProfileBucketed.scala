package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.TextOps

/** Decade evidence for x_neardup_bucketed's layout claim: once the
  * posting index is materialized `bucketBy(fp)`, the per-run pair
  * query should beat the inline c25 by roughly the cost of the fp
  * exchange it no longer pays (the bucketed scan provides the join's
  * required partitioning). Times the bucketed CONSUMER (index built
  * once, untimed separately) against inline c25, reps each, min
  * reported next to all samples (the box's additive-stall model —
  * see Bench.scala).
  *
  * Usage: runMain graft.tools.ProfileBucketed [srcDir]
  */
object ProfileBucketed {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    var tbl: String = null
    val build = timed { tbl = TextOps.buildBucketedPostings(spark, sfDir) }
    val consumer = (1 to reps).map(_ =>
      timed(drain(TextOps.neardupFromFps(spark.table(tbl)))))
    println(f"[prof-bkt] corpus=$sfDir build=$build%.2fs " +
      f"consumer_min=${consumer.min}%.2fs " +
      s"consumer_all=${consumer.map(x => f"$x%.2f").mkString(",")}")
    val inline = (1 to reps).map(_ =>
      timed(drain(TextOps.c25_winnowNeardup(spark, sfDir))))
    println(f"[prof-bkt] baseline inline c25 min=${inline.min}%.2fs " +
      s"all=${inline.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
