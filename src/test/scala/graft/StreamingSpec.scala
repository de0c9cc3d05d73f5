package graft

import org.apache.spark.sql.functions._

/** Streaming-adjacent semantics that stay out of the t2 oracle gate:
  * batch session_window (the engine behind streaming session windows)
  * agrees with the hand-rolled b6 sessionization.
  */
class StreamingSpec extends SparkSpec {

  test("session_window(30 min) session count matches b6 sessionize") {
    val ev = graft.ops.Tables.events(spark, sf0001)
    val viaSessionWindow = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .count()
    val viaB6 = graft.ops.Features.b6_sessionize(spark, sf0001).count()
    assert(viaSessionWindow === viaB6)
  }

  test("s2 window totals equal the raw event count") {
    val total = graft.streaming.StreamOps.s2_streamWindow(spark, sf0001)
      .agg(sum(col("cnt"))).collect()(0).getLong(0)
    assert(total === graft.ops.Tables.events(spark, sf0001).count())
  }
}
