package graft.tools

/** Dump `.explain("formatted")` for registered queries into files —
  * the plans/rNN/<query>_{before,after}.txt evidence the optimization
  * rounds commit. Composite queries run their side-effecting build
  * steps while planning the returned frame; the dumped plan is the
  * final consumer plan, exactly what `df.explain("formatted")` prints.
  *
  * Usage: runMain graft.tools.DumpPlans <dir> <outDir> <suffix> <query>...
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: DumpPlans <dir> <outDir> <suffix> <query>...")
    val d = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    val spark = ToolSession.session()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val reg = graft.SparkEntry.queries
    for (n <- names) {
      val df = reg(n)(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      println(s"[plans] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
