package graft.tools

/** A/B a registered query under the default session vs a non-adaptive
  * child session with a small fixed shuffle-partition count — the s14
  * micro-session shape, applied to the WHOLE query. Measures the upper
  * bound of moving a composite's maintenance plans onto such a session
  * (opt guide §1: measure before changing).
  *
  * Usage: runMain graft.tools.AbMicro <dir> <parts> <query> [query...]
  */
object AbMicro {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: AbMicro <dir> <parts> <query>...")
    val d = args(0)
    val parts = args(1)
    val names = args.drop(2)
    val spark = ToolSession.session()
    val sp = spark.newSession()
    if (sys.env.get("AB_KEEP_AQE").isEmpty)
      sp.conf.set("spark.sql.adaptive.enabled", "false")
    sp.conf.set("spark.sql.shuffle.partitions", parts)
    graft.functions.GraftFunctions.register(sp)
    val reg = graft.SparkEntry.queries
    def run(s: org.apache.spark.sql.SparkSession, n: String): Double = {
      val t0 = System.nanoTime()
      reg(n)(s, d).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (n <- names) {
      run(spark, n); run(sp, n) // warm both (memo/standing state, codegen)
      // interleaved samples + second-smallest: Bench's estimator — this
      // box randomly stalls task sets, so uninterleaved small medians
      // are routinely contaminated (BENCH_NOTES)
      val as = scala.collection.mutable.ListBuffer.empty[Double]
      val bs = scala.collection.mutable.ListBuffer.empty[Double]
      for (_ <- 1 to 5) { as += run(spark, n); bs += run(sp, n) }
      val a = as.sorted.apply(1)
      val b = bs.sorted.apply(1)
      println(f"[ab] $n%-30s base=$a%7.3f micro=$b%7.3f  (${b / a * 100}%.0f%%)")
    }
    spark.stop()
  }
}
