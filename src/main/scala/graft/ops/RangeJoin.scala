package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pure range (interval) join — the non-equi join family b8's theta row
  * only touches. The reference has no joins at all (SURVEY §2A tail);
  * this is the engine-addition a feature store needs for "events within
  * a window of an anchor event" questions, here: purchases in the hour
  * after each signup (conversion-attribution shape, same event domain
  * as the reference's `InAppPurchase` flow,
  * ConsumerMultiThread.java:26,117).
  *
  * Spark plans a bare non-equi condition as BroadcastNestedLoopJoin —
  * fine while one side broadcasts, quadratic the moment both sides are
  * data-sized. The scalable plan implemented here is the classic
  * bucket-fan-out rewrite:
  *
  *   - discretize time into buckets of exactly the window width W;
  *   - a point lands in ONE bucket; a (t, t+W] window overlaps at most
  *     TWO — explode the anchor side to those two buckets;
  *   - equi-join on the bucket (shuffle hash/sort-merge — no nested
  *     loop), then re-apply the EXACT range predicate.
  *
  * Scale (100 TB): both sides shuffle once on the bucket key; per-task
  * pair work is bounded by (events per window-width)² per bucket, i.e.
  * by arrival rate, not corpus size. Bucket skew == burst skew, and AQE
  * skew-join splitting applies to the equi-join as usual. LEFT-joining
  * on the bucket and folding the exact range predicate into conditional
  * aggregates keeps zero-match anchors alive through the ONE map-side-
  * combinable groupBy — no third scan, no join-back shuffle. A BNLJ at
  * this shape would scan purchases once PER EXECUTOR-SLICE of signups —
  * the rewrite is the difference between a join and a cartesian pass.
  *
  * Determinism: all comparisons in the integer µs domain
  * (`unix_micros` ≡ DuckDB `epoch_us`), amounts as integer cents
  * (b21's idiom), anchors validated (event_id/ts NOT NULL — a7's gate)
  * so the group key is unique and the left-join-back key never null.
  */
object RangeJoin {

  /** Window width: one hour, in µs. The bucket width MUST equal the
    * window width for the two-bucket overlap bound to hold.
    */
  val WindowUs: Long = 3600L * 1000 * 1000

  /** Floor-aligned bucket key: the µs timestamp rounded down to its
    * window start, computed as `t - pmod(t, W)` — pure LONG arithmetic
    * (`pmod` returns the non-negative remainder, so this IS floor
    * alignment for negative timestamps too). The earlier
    * `floor(t / W)` form went through double division, which is exact
    * only while |t| < 2^53 (~year 2255); this is exact over the whole
    * µs long domain except within W of Long.MinValue (year ~292269 BC),
    * where the subtraction would wrap.
    */
  private def bucketStart(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    t - pmod(t, lit(WindowUs))

  /** b26: purchases within (signup.ts, signup.ts + 1h], per signup —
    * bucketed equi-join plan, byte-equal to the naive non-equi form
    * (NewOpsSpec pins equality; PlanSpec pins the census: no
    * BroadcastNestedLoopJoin anywhere).
    */
  def b26_rangeJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val signups = ev
      .filter(col("event_type") === "signup" &&
        col("event_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("su"))
    val purchases = ev
      .filter(col("event_type") === "purchase" && col("ts").isNotNull)
      .select(col("event_id").as("p_event_id"), unix_micros(col("ts")).as("pu"),
        Tables.cents.as("p_cents"))
      .withColumn("bucket", bucketStart(col("pu")))
    // anchor fan-out: the (su, su+W] window overlaps the buckets
    // starting at bucketStart(su) and bucketStart(su)+W — never more,
    // because W == bucket width. 2× duplication of the slim anchor
    // projection only.
    val anchorBuckets = signups
      .withColumn("bucket", explode(array(
        bucketStart(col("su")), bucketStart(col("su")) + WindowUs)))
    // LEFT on the bucket + conditional aggregates (instead of an inner
    // join, a filter, and a join-back to recover zero-match anchors):
    // every anchor survives in its 2 bucket rows, a matched purchase is
    // in-range in exactly ONE of them (its own bucket is unique), and
    // the unmatched copies aggregate to zero — so one map-side-
    // combinable groupBy replaces the third events scan and a whole
    // join-back shuffle the two-phase form paid.
    val inRange = col("pu") > col("su") && col("pu") <= col("su") + WindowUs
    anchorBuckets
      .join(purchases, Seq("bucket"), "left")
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(when(inRange, col("p_event_id"))).as("n_purchases"),
        coalesce(sum(when(inRange, col("p_cents"))), lit(0L)).as("cents_1h"))
      .orderBy(col("event_id"))
  }

  /** The naive non-equi formulation (BroadcastNestedLoopJoin) — the
    * executable spec b26 is equality-pinned against in NewOpsSpec.
    * Not registered as a query: it IS the oracle, DuckDB runs the same
    * SQL shape.
    */
  def naiveRangeJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val signups = ev
      .filter(col("event_type") === "signup" &&
        col("event_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("su"))
    val purchases = ev
      .filter(col("event_type") === "purchase" && col("ts").isNotNull)
      .select(col("event_id").as("p_event_id"), unix_micros(col("ts")).as("pu"),
        Tables.cents.as("p_cents"))
    signups
      .join(purchases,
        col("pu") > col("su") && col("pu") <= col("su") + WindowUs, "left")
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(col("p_event_id")).as("n_purchases"),
        coalesce(sum(col("p_cents")), lit(0L)).as("cents_1h"))
      .select(col("event_id"), col("user_id"), col("n_purchases"), col("cents_1h"))
      .orderBy(col("event_id"))
  }

  val oracles: Map[String, String] = Map(
    "b26_range_join" ->
      s"""WITH s AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS su FROM events
         |  WHERE event_type = 'signup' AND event_id IS NOT NULL AND ts IS NOT NULL),
         |p AS (
         |  SELECT event_id AS p_event_id, epoch_us(ts) AS pu,
         |    ${Tables.CentsSql} AS p_cents
         |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL)
         |SELECT s.event_id, s.user_id,
         |  count(p.p_event_id) AS n_purchases,
         |  CAST(coalesce(sum(p.p_cents), 0) AS BIGINT) AS cents_1h
         |FROM s LEFT JOIN p
         |  ON p.pu > s.su AND p.pu <= s.su + ${WindowUs}
         |GROUP BY s.event_id, s.user_id
         |ORDER BY s.event_id""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b26_range_join" -> b26_rangeJoin _,
  )
}
