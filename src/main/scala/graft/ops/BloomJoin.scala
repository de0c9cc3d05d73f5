package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.{Bloom, BloomBuildAgg, BloomMightContain}

/** Sketch-based semi-join scan pruning — the "runtime filter" a lake
  * engine applies when the dimension side of a join is selective but
  * too large for a literal IN-list: build a Bloom filter over the dim
  * keys (distributed, map-side-combined OR of bitsets), broadcast the
  * sketch into a scan-side predicate on the fact, and let the real
  * equi-join absorb the false positives — the final result is exactly
  * the plain join, which is the DuckDB oracle.
  *
  * Scale (100 TB): the sketch is bits-per-key-sized — 12 bits per dim
  * key, so 1M filtered dim keys ride in a 1.5 MB broadcast (size to
  * the FILTERED dim; a dim too big to sketch is a dim the filter
  * wasn't selective on). It rides the plan as one reference object,
  * and the probe is a
  * codegen'd two-instruction call inside the scan's WholeStageCodegen
  * span. What it buys is shuffle mass: a selective dim prunes the fact
  * BEFORE the exchange feeding a sort-merge join — at 1/5 selectivity
  * that is 80% of the fact shuffle gone for an 8 KB broadcast. Spark's
  * own AQE runtime bloom (`spark.sql.optimizer.runtime.bloomFilter.
  * enabled`) injects the same shape automatically when statistics
  * justify it; this operator is the explicit, statistics-independent
  * form (and works where AQE's injection declines, e.g. derived dim
  * frames with no stats).
  *
  * Cost accounting (fixture scale): two extra driver round-trips — the
  * dim-key count that sizes the sketch and the one-row sketch collect —
  * both O(dim partial-agg), the IVF-codebook pattern (Extras
  * scaladoc). False negatives are impossible (BloomBuildAgg sets every
  * probe bit of every key; NewOpsSpec pins it), so pruning is exact.
  */
object BloomJoin {

  /** Build the (bits, numHashes) sketch over a frame's non-null BIGINT
    * key column, sized from the observed key count.
    */
  def sketchOf(df: DataFrame, keyCol: String): (Array[Long], Int) = {
    val keys = df.select(col(keyCol)).filter(col(keyCol).isNotNull)
    val words = Bloom.wordsFor(keys.count())
    val build = udaf(new BloomBuildAgg(words, Bloom.NumHashes), Encoders.scalaLong)
    val bits = keys.agg(build(col(keyCol))).head().getAs[Seq[Long]](0).toArray
    (bits, Bloom.NumHashes)
  }

  /** Scan-side membership probe Column for `keyCol` against a sketch. */
  def probe(keyCol: String, bits: Array[Long], k: Int): Column =
    ColumnBridge.column(BloomMightContain(UnresolvedAttribute(keyCol), bits, k))

  /** b27: revenue per nation from BUILDING-segment customers — orders
    * pruned by a Bloom sketch of the filtered customer keys before the
    * join. Result ≡ the plain join (the oracle); PlanSpec pins the
    * probe into the orders scan's codegen span.
    */
  def b27_bloomJoin(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_nationkey"))
    val (bits, k) = sketchOf(cust, "c_custkey")
    Tables.orders(spark, d)
      .filter(probe("o_custkey", bits, k))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        expr("CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").as("total"))
      .orderBy(col("n_name"))
  }

  val oracles: Map[String, String] = Map(
    "b27_bloom_join" ->
      """SELECT n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b27_bloom_join" -> b27_bloomJoin _,
  )
}
