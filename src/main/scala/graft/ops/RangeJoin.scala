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
    *
    * Regime note: work here is O(candidate pairs) — the right plan
    * while per-bucket density is bounded (the decade ladder's 1.19
    * exponent is the workload's pair growth, not the plan's). When
    * density itself grows with the corpus, switch models to
    * [[b26b_attributionCounters]], whose join is hour-grain and
    * density-independent.
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

  /** Attribution horizon for [[b26b_attributionCounters]]: 6 hour
    * buckets, decay weight 2^(5 − age_hours) (exact integer — b21's
    * fixed-point idiom; denominator 2^5, so the `_x32` columns are the
    * counter scaled by 32 at age 0).
    */
  val AttribHours = 6

  /** b26b: the conversion question b26 answers per-PAIR, answered as
    * per-signup-hour DECAYED COUNTERS — the windowed-aggregate regime
    * BENCH_NOTES' b26 decade note argues for. b26's bucket-fan-out is
    * the right plan while matches stay sparse, but its work is
    * O(candidate pairs): at genuine density growth (events per hour
    * rising with corpus size) pairs grow quadratically in density and
    * NO join plan fixes that — the model has to change. Here both
    * streams first collapse to hour grain (two map-side-combinable
    * groupBys — the only data-sized work, linear in events), and
    * attribution joins HOUR rows: each signup hour takes the following
    * [[AttribHours]] purchase-hour buckets weighted 2^(5 − age_hours),
    * so the join is bounded by hours×6 regardless of how dense the log
    * gets. The trade is granularity: attribution is by hour bucket
    * (the signup's own bucket counts at full weight), not by each
    * signup's exact (t, t+1h] window — see [[b26_rangeJoin]] for the
    * exact-window form and its regime.
    *
    * Determinism: hour buckets and weights are pure LONG arithmetic
    * ([[bucketStart]] + shiftleft), cents are exact integers — every
    * output column is BIGINT, bit-identical across engines.
    *
    * Scale (100 TB): the two hour-grain aggregates partial-combine on
    * the map side, the fan-out×6 and the attribution join touch only
    * hour-grain rows (≤ 8.8k rows/decade/stream), and nothing after
    * the first aggregates is data-sized. Density ×100 changes the
    * aggregate input, not the join.
    */
  def b26b_attributionCounters(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val signupHours = ev
      .filter(col("event_type") === "signup" && col("ts").isNotNull)
      .select(bucketStart(unix_micros(col("ts"))).as("hour_us"))
      .groupBy(col("hour_us")).agg(count(lit(1)).as("n_signups"))
    val purchaseHours = ev
      .filter(col("event_type") === "purchase" && col("ts").isNotNull)
      .select(bucketStart(unix_micros(col("ts"))).as("p_hour"),
        Tables.cents.as("p_cents"))
      .groupBy(col("p_hour"))
      .agg(count(lit(1)).as("n_p"), coalesce(sum(col("p_cents")), lit(0L)).as("c_p"))
    // fan the signup hour to its 6 target buckets with the decay weight
    // baked in, then LEFT equi-join purchase hours: a zero-conversion
    // hour survives with zero counters, and both join sides are already
    // hour-grain — the b26 pair explosion never happens here.
    signupHours
      .withColumn("off", explode(sequence(lit(0), lit(AttribHours - 1))))
      .withColumn("w", expr(s"shiftleft(CAST(1 AS BIGINT), ${AttribHours - 1} - off)"))
      .withColumn("p_hour", col("hour_us") + col("off") * WindowUs)
      .join(purchaseHours, Seq("p_hour"), "left")
      .groupBy(col("hour_us"))
      .agg(max(col("n_signups")).as("n_signups"),
        coalesce(sum(col("n_p") * col("w")), lit(0L)).as("decayed_purchases_x32"),
        coalesce(sum(col("c_p") * col("w")), lit(0L)).as("decayed_cents_x32"))
      .orderBy(col("hour_us"))
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
    // floor-aligned hour bucket: epoch_us − non-negative-mod(epoch_us, W)
    // — DuckDB's % follows the dividend's sign, so ((x % W) + W) % W is
    // Spark's pmod exactly (negative pre-epoch timestamps included).
    // The attribution join is written as the naive BETWEEN range (tiny:
    // hour-grain rows only); (p.hour − s.hour) is a non-negative
    // multiple of W, so // W is exact and the shift weight matches
    // Spark's shiftleft bit-for-bit.
    "b26b_attribution_counters" ->
      s"""WITH s AS (
         |  SELECT epoch_us(ts) - ((epoch_us(ts) % ${WindowUs} + ${WindowUs}) % ${WindowUs}) AS hour_us,
         |    COUNT(*) AS n_signups
         |  FROM events WHERE event_type = 'signup' AND ts IS NOT NULL
         |  GROUP BY 1),
         |p AS (
         |  SELECT epoch_us(ts) - ((epoch_us(ts) % ${WindowUs} + ${WindowUs}) % ${WindowUs}) AS p_hour,
         |    COUNT(*) AS n_p,
         |    CAST(coalesce(SUM(${Tables.CentsSql}), 0) AS BIGINT) AS c_p
         |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
         |  GROUP BY 1)
         |SELECT s.hour_us, s.n_signups,
         |  CAST(coalesce(SUM(p.n_p * (1 << (${AttribHours - 1} - (p.p_hour - s.hour_us) // ${WindowUs}))), 0) AS BIGINT) AS decayed_purchases_x32,
         |  CAST(coalesce(SUM(p.c_p * (1 << (${AttribHours - 1} - (p.p_hour - s.hour_us) // ${WindowUs}))), 0) AS BIGINT) AS decayed_cents_x32
         |FROM s LEFT JOIN p
         |  ON p.p_hour >= s.hour_us AND p.p_hour < s.hour_us + ${AttribHours.toLong * WindowUs}
         |GROUP BY s.hour_us, s.n_signups
         |ORDER BY s.hour_us""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b26_range_join" -> b26_rangeJoin _,
    "b26b_attribution_counters" -> b26b_attributionCounters _,
  )
}
