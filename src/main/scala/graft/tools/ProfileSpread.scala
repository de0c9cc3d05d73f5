package graft.tools

import org.apache.spark.sql.functions._

/** A/B the unsplittable-input remedy (opt guide §2.5): heavy per-row
  * kernels over the single-file/single-row-group fixture scan run as
  * ONE task; measure each kernel as-is vs hash-redistributed to
  * defaultParallelism first. Usage: runMain graft.tools.ProfileSpread <dir>
  */
object ProfileSpread {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = ToolSession.session()
    import graft.ops.{CorpusOps, Tables, TextOps}
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def bench(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      noop(mk) // warm
      val ts = (1 to 3).map { _ => ToolSession.timed(noop(mk))._2 }
      println(f"[spread] $name%-28s ${ts.sorted.apply(1)}%.3f s (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    val docs = Tables.documents(spark, d)
    val docsR = docs.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    val emb = Tables.embeddings(spark, d)
    val embR = emb.repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
    println("docs scan partitions: " + docs.rdd.getNumPartitions)
    bench("winnowFps")(TextOps.winnowFps(docs))
    bench("winnowFps+spread")(TextOps.winnowFps(docsR))
    bench("corpusArrivalState")(CorpusOps.corpusArrivalState(docs))
    bench("corpusArrivalState+spread")(CorpusOps.corpusArrivalState(docsR))
    bench("docShingles")(TextOps.docShingles(docs))
    bench("docShingles+spread")(TextOps.docShingles(docsR))
    spark.stop()
  }
}
