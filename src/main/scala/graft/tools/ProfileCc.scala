package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off timing breakdown of the iterative-CC consumers: pair
  * generation vs the cluster sweep tail, per query, at a given
  * fixture. Usage: runMain graft.tools.ProfileCc [dir]
  */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = ToolSession.session()
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[cc] $tag rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // warm the JIT/scan path once
    graft.ops.Tables.documents(spark, d).count()
    timed("c2_pairs")(graft.ops.TextOps.c2_dedupJaccard(spark, d).count())
    timed("c15_full")(graft.ops.TextOps.c15_dedupClusters(spark, d).count())
    timed("clustersOf(c2)") {
      graft.ops.TextOps.clustersOf(graft.ops.TextOps.c2_dedupJaccard(spark, d)).count()
    }
    timed("c7_pairs")(graft.ops.VectorOps.c7_cosineNeardup(spark, d).count())
    timed("x_semantic_dedup")(graft.ops.VectorOps.x_semanticDedup(spark, d).count())
    timed("c16_full")(graft.ops.CorpusOps.c16_corpusPipeline(spark, d).count())
    spark.stop()
  }
}
