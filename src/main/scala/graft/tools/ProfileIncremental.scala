package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.{Tables, TextOps}

/** Decade evidence for x_neardup_incremental's scaling claim: the
  * per-ingest cost (delta fingerprinting + index-probe pairing) must
  * scale with the DELTA, not the corpus — that is the entire point of
  * maintaining the standing posting index instead of re-running c25
  * over the lake per day.
  *
  * For each delta fraction f, the boundary is placed so `doc_id > mid`
  * selects ~f of the corpus; the index build (the amortized
  * once-per-corpus cost) is run UNTIMED-separately, then the ingest
  * phase is timed alone, repeated `reps` times (min reported next to
  * all samples — the box's additive-stall noise model, see
  * Bench.scala). The full inline c25 is timed as the
  * what-a-daily-rerun-would-pay baseline.
  *
  * Usage: runMain graft.tools.ProfileIncremental [srcDir] [frac ...]
  */
object ProfileIncremental {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val fracs = if (args.length > 1) args.drop(1).map(_.toDouble).toSeq
                else Seq(0.5, 0.1, 0.01)
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

    val docs = Tables.documents(spark, sfDir)
    val r = docs.agg(org.apache.spark.sql.functions.min("doc_id"),
      org.apache.spark.sql.functions.max("doc_id")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val n = docs.count()
    println(s"[prof-inc] corpus=$sfDir docs=$n ids=[$lo,$hi] reps=$reps")

    for (frac <- fracs) {
      val mid = hi - math.round((hi - lo + 1) * frac)
      val dir = Tables.scratchDir("prof_inc", sfDir)
      val build = timed(TextOps.neardupIndexBuild(spark, sfDir, dir, mid))
      val ingests = (1 to reps).map(_ =>
        timed(drain(TextOps.neardupIngest(spark, sfDir, dir, mid))))
      val deltaDocs = docs.filter(
        org.apache.spark.sql.functions.col("doc_id") > mid).count()
      println(f"[prof-inc] frac=$frac%.3f delta_docs=$deltaDocs " +
        f"build=$build%.2fs ingest_min=${ingests.min}%.2fs " +
        s"ingest_all=${ingests.map(x => f"$x%.2f").mkString(",")}")
    }
    val fulls = (1 to reps).map(_ =>
      timed(drain(TextOps.c25_winnowNeardup(spark, sfDir))))
    println(f"[prof-inc] baseline c25 full-corpus min=${fulls.min}%.2fs " +
      s"all=${fulls.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
