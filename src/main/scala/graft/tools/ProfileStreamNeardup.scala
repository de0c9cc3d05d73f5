package graft.tools

import org.apache.spark.sql.SparkSession

/** Decade profile of the arrival-path dedup: s14 (one micro-batch per
  * part file — the CorpusDecade dirs are 32-file directory layouts, so
  * 32 batches) against the one-shot x_neardup_incremental on the same
  * corpus. What it measures: the per-batch index fold reads base ∪ all
  * prior epochs, so a B-batch drain does O(B²) epoch-census work — the
  * compaction question this profile quantifies (a production stream
  * folds epochs into the base census every K batches; the fixture's
  * B=32 shows whether that matters before lake scale).
  *
  * Usage: runMain graft.tools.ProfileStreamNeardup <dir> [dir ...]
  * (not concurrently with Bench)
  */
object ProfileStreamNeardup {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileStreamNeardup <dir> [dir ...]")
    val spark = ToolSession.session()
    for (d <- args) {
      val n = graft.ops.Tables.documents(spark, d).count()
      val (sRows, sSec) = ToolSession.timed(
        graft.streaming.StreamOps.s14_streamNeardup(spark, d).count())
      val (bRows, bSec) = ToolSession.timed(
        graft.ops.TextOps.x_neardupIncremental(spark, d).count())
      println(f"[s14] $d docs=$n stream_sec=$sSec%.2f stream_rows=$sRows " +
        f"oneshot_sec=$bSec%.2f oneshot_rows=$bRows")
    }
    spark.stop()
  }
}
