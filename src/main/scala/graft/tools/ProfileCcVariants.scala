package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the iterative-CC round structure (round-16 bench
  * creep: c15/c16 regressed ~0.6 s vs the round-14 plain-sweep code on
  * a same-box control; the suspect is per-round fixed overhead — jobs,
  * checkpoints, exchanges — not propagation work). Variants share one
  * materialized pair list so only the sweep tail is timed.
  * Usage: runMain graft.tools.ProfileCcVariants [dir]
  */
object ProfileCcVariants {
  /** Row count + an order-free content checksum over (id, lab) — a
    * count alone would pass any WRONG labeling of the right node set,
    * making the cross-variant require() vacuous (round-16 review).
    */
  def finish(labels: DataFrame): (Long, Long) = {
    // bit_xor, not sum: summing uniform 64-bit hashes overflows under
    // ANSI; XOR is order-free, and (id, lab) rows are unique per id
    val r = labels
      .select(count(lit(1)).as("n"),
        expr("bit_xor(xxhash64(id, lab))").as("h"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** V0: whatever clustersOf currently ships (since the round-16 fix
    * that is the V4 escalation ladder — v0 vs v4 now measures live
    * code against the harness's frozen copy, a drift tripwire rather
    * than an algorithm A/B; the historical two-checkpoint hop²+jump
    * this slot originally held lives on only in (bj)'s table).
    */
  def v0(pairs: DataFrame): (Long, Long) = finish(
    graft.ops.TextOps.clustersOf(pairs).select(
      col("doc_id").as("id"), col("cluster_id").as("lab")))

  /** V1: lookup-jump — jump dereferences the ROUND-START labels (already
    * checkpointed) instead of the fresh hop output, so the round needs
    * ONE checkpoint, not two, and no subplan is ever joined to itself
    * un-materialized. Depth still ~doubles per round (hop² gives d+2,
    * composing with the start labels' depth-d pointers gives ~2d+2).
    */
  def v1(pairs: DataFrame): (Long, Long) = {
    val p = pairs.select(col("a_id"), col("b_id"))
    val edges = p.union(p.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .localCheckpoint()
    var labels = edges.select(col("a_id").as("id")).distinct()
      .select(col("id"), col("id").as("lab")).localCheckpoint()
    def hop(ls: DataFrame): DataFrame = {
      val nmin = edges
        .join(ls.select(col("id").as("b_id"), col("lab").as("nl")), "b_id")
        .groupBy(col("a_id")).agg(min(col("nl")).as("nmin"))
      ls.join(nmin.select(col("a_id").as("id"), col("nmin")), Seq("id"), "left")
        .select(col("id"),
          least(col("lab"), coalesce(col("nmin"), col("lab"))).as("lab"),
          col("prev"))
    }
    var sweep = 0
    var done = labels.isEmpty
    while (!done && sweep < 20) {
      val start = labels
      val hopped = hop(hop(start.select(col("id"), col("lab"), col("lab").as("prev"))))
      val next = hopped
        .join(start.select(col("id").as("lab"), col("lab").as("lab2")), Seq("lab"))
        .select(col("id"), col("lab2").as("lab"), col("prev"))
        .localCheckpoint()
      done = next.filter(col("lab") =!= col("prev")).isEmpty
      labels = next.select(col("id"), col("lab"))
      sweep += 1
    }
    println(s"[ccv] v1 rounds=$sweep")
    finish(labels)
  }

  /** V3: the round-14 plain one-hop sweep (the same-box control's code
    * path), for the floor.
    */
  def v3(pairs: DataFrame): (Long, Long) = {
    val p = pairs.select(col("a_id"), col("b_id"))
    val edges = p.union(p.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .localCheckpoint()
    var labels = edges.select(col("a_id").as("id")).distinct()
      .select(col("id"), col("id").as("lab")).localCheckpoint()
    var sweep = 0
    var done = labels.isEmpty
    while (!done && sweep < 40) {
      val nmin = edges
        .join(labels.select(col("id").as("b_id"), col("lab").as("nl")), "b_id")
        .groupBy(col("a_id")).agg(min(col("nl")).as("nmin"))
      val next = labels
        .join(nmin.select(col("a_id").as("id"), col("nmin")), Seq("id"), "left")
        .select(col("id"),
          least(col("lab"), coalesce(col("nmin"), col("lab"))).as("lab"),
          col("lab").as("prev"))
        .localCheckpoint()
      done = next.filter(col("lab") =!= col("prev")).isEmpty
      labels = next.select(col("id"), col("lab"))
      sweep += 1
    }
    println(s"[ccv] v3 sweeps=$sweep")
    finish(labels)
  }

  /** V4: escalation ladder — plain one-hop sweeps (cheapest per round)
    * while the graph converges fast, hop²+lookup-jump rounds (depth
    * doubling) once it hasn't, starLabels past the total budget.
    */
  def v4(pairs: DataFrame): (Long, Long) = {
    val p = pairs.select(col("a_id"), col("b_id"))
    val edges = p.union(p.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .localCheckpoint()
    var labels = edges.select(col("a_id").as("id")).distinct()
      .select(col("id"), col("id").as("lab")).localCheckpoint()
    def hop(ls: DataFrame): DataFrame = {
      val nmin = edges
        .join(ls.select(col("id").as("b_id"), col("lab").as("nl")), "b_id")
        .groupBy(col("a_id")).agg(min(col("nl")).as("nmin"))
      ls.join(nmin.select(col("a_id").as("id"), col("nmin")), Seq("id"), "left")
        .select(col("id"),
          least(col("lab"), coalesce(col("nmin"), col("lab"))).as("lab"),
          col("prev"))
    }
    var sweep = 0
    var done = labels.isEmpty
    while (!done && sweep < 20) {
      val start = labels.select(col("id"), col("lab"), col("lab").as("prev"))
      val stepped =
        if (sweep < 4) hop(start)
        else hop(hop(start))
          .join(labels.select(col("id").as("lab"), col("lab").as("lab2")), Seq("lab"))
          .select(col("id"), col("lab2").as("lab"), col("prev"))
      val next = stepped.localCheckpoint()
      done = next.filter(col("lab") =!= col("prev")).isEmpty
      labels = next.select(col("id"), col("lab"))
      sweep += 1
    }
    println(s"[ccv] v4 rounds=$sweep")
    finish(labels)
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = ToolSession.session()
    val variants: Seq[(String, DataFrame => (Long, Long))] =
      Seq("v0" -> v0 _, "v1" -> v1 _, "v3" -> v3 _, "v4" -> v4 _)
    val sources: Seq[(String, DataFrame)] = Seq(
      "c2" -> graft.ops.TextOps.c2_dedupJaccard(spark, d).localCheckpoint(),
      "c7" -> graft.ops.VectorOps.c7_cosineNeardup(spark, d)
        .select(col("a_id"), col("b_id")).localCheckpoint())
    for ((src, pairs) <- sources) {
      println(s"[ccv] src=$src pairs=${pairs.count()}")
      // expected (rows, content hash), cross-checked across variants
      var expect: Option[(Long, Long)] = None
      for (rep <- 1 to 5; (tag, f) <- variants) {
        val t0 = System.nanoTime()
        val nh = f(pairs)
        if (expect.isEmpty) expect = Some(nh)
        require(expect.contains(nh), s"$tag $nh != ${expect.get}")
        println(f"[ccv] rep=$rep $src/$tag rows=${nh._1} sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
