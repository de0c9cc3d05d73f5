package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness for the x_minhash 1.5s investigation
  * (round-8 item 2): times each prefix of the minhash pipeline so the
  * expensive stage is identified from measurement, not guesswork.
  * Run: sbt "Test/runMain graft.ProfileMinhash /root/testdata/sf0.1"
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    import graft.ops._
    def time(name: String)(f: => Long): Unit = {
      // 3 reps, report all
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-28s ${ts.map(t => f"${t._1}%.2f").mkString(" ")}  rows=${ts.head._2}")
    }

    val sh = TextOps.hashedShingles(spark, d)
    time("full c2")(TextOps.c2_dedupJaccard(spark, d).count())
    time("full x_minhash")(TextOps.minhashLsh(spark, d).count())
    time("hashedShingles")(sh.count())
    time("cappedShingles")(TextOps.cappedShingles(sh).count())
    time("signatures")(TextOps.minhashSignatures(sh).count())
    time("bands")(TextOps.lshBands(TextOps.minhashSignatures(sh)).count())
    time("candidates (pre-dedup)")(
      TextOps.lshCandidates(TextOps.lshBands(TextOps.minhashSignatures(sh))).count())
    time("candidates (deduped)")(
      TextOps.lshCandidates(TextOps.lshBands(TextOps.minhashSignatures(sh)))
        .dropDuplicates("a_id", "b_id").count())
    spark.stop()
  }
}
