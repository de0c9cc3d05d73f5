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
    */
  private def hashedShingles(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t)-3), i -> xxhash64(t[i], t[i+1], t[i+2]))"))
        .as("h"))
      .distinct()

  /** Document-frequency cap for candidate generation: shingles shared by
    * more than this many documents are stop-shingles and generate no
    * candidate pairs. Applied identically in the oracle SQL, and far
    * above the fixture's max df (7) — it exists as the 100 TB safety
    * valve against quadratic blowup on boilerplate shingles.
    */
  val DfCap = 1000

  /** c2: exact shingle-Jaccard near-dup pairs (τ = 0.5).
    *
    * Shape: df-capped shingle self-equi-join → per-pair intersection
    * counts → exact Jaccard. The candidate join runs on the 8-byte
    * shingle hash with the `a_id < b_id` residual, so the whole pair
    * expansion is whole-stage-codegen'd (no interpreted lambdas) and
    * spreads across tasks by shingle hash instead of materializing a
    * hot shingle's pairs inside one row. Both join inputs are the same
    * capped relation hash-partitioned on `h`, so Spark's ReuseExchange
    * ships its shuffle once. [[DfCap]] bounds the worst-case fan-out of
    * any single shingle; candidates are exactly the pairs with J > 0,
    * so recall is 1 by construction.
    */
  def c2_dedupJaccard(spark: SparkSession, d: String): DataFrame = {
    val sh = hashedShingles(spark, d)
    // BOTH per-doc cardinality and the df-cap are count windows over the
    // SAME relation — not separate aggregate+join subtrees. Every row of
    // the capped relation then carries its doc's shingle count n, so the
    // Jaccard denominator falls out of the pair aggregation itself and
    // the plan needs exactly ONE corpus scan. (The aggregate+join
    // formulation executed the scan+explode+distinct FOUR times: AQE
    // broadcast one self-join side — breaking subtree reuse — and each
    // cardinality join rebuilt the relation again.)
    // Skew note for lake scale: the h-window buffers each shingle's
    // rows in one group BEFORE the cap filter, so a boilerplate shingle
    // shared by millions of docs makes one spilling straggler. The
    // per-doc window is safe (bounded by doc length). If the corpus has
    // such mass, compute df with a map-side-combining aggregate and
    // join it back (AQE skew-split handles the hot key) — costs one
    // more pass of the relation; the window form is the minimum-scan
    // shape when the df distribution is benign.
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val byH = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val shf = sh
      .withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("df", count(lit(1)).over(byH))
      .filter(col("df").between(2, DfCap))
      .select(col("doc_id"), col("h"), col("n"))
    // hint the self-join to sort-merge: its key IS the h-window's
    // partitioning, so both sides resolve to the one existing exchange
    // (ReuseExchange) and the join adds no shuffle. Left to AQE, a
    // small side gets broadcast, which both recomputes the relation
    // and would be the wrong strategy for a corpus-sized relation.
    val pairs = shf.as("a").join(shf.as("b").hint("SHUFFLE_MERGE"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"),
        min(col("a.n")).as("na"), min(col("b.n")).as("nb"))
    pairs
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), col("inter"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** MinHash + banded LSH near-dup candidates with exact verification —
    * the sketch-based scale path (no oracle; recall vs c2 is a test).
    * 64 minhashes, 16 bands × 4 rows.
    */
  val NumHashes = 64
  val NumBands = 16 // × 4 rows per band

  def minhashLsh(spark: SparkSession, d: String): DataFrame = {
    val sh = hashedShingles(spark, d)
    // signature = 64 wide min-aggregate columns over codegen'd xxhash64
    // of the (already 64-bit) shingle hash — the per-row hot path is 64
    // long-hashes, no string re-hashing, no interpreted lambdas
    val minCols = (0 until NumHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"h$i"))
    val sig = sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until NumHashes).map(i => col(s"h$i")): _*).as("sig"))
    // band keys: 16 longs per doc (xxhash of the band's 4 rows; a hash
    // collision can only add a candidate, and candidates are verified)
    val bands = sig.select(col("doc_id"), explode(expr(
      s"""transform(sequence(0, ${NumBands - 1}), b -> struct(b AS band,
         |  xxhash64(sig[b*4], sig[b*4+1], sig[b*4+2], sig[b*4+3]) AS bsig))"""
        .stripMargin)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bsig").as("bsig"))
    // candidate pairs: same (band, band-signature) bucket — the same
    // codegen'd self-equi-join shape as c2: bucket-size cap via a count
    // window so both join sides are the identical subtree (one
    // signature computation + one exchange, ReuseExchange-shared; no
    // interpreted lambda pair expansion)
    val byBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bsig"))
    val bf = bands.withColumn("bn", count(lit(1)).over(byBucket))
      .filter(col("bn").between(2, DfCap))
      .select(col("doc_id"), col("band"), col("bsig"))
    val cand = bf.as("a").join(bf.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    // exact verification via array intersection on per-doc shingle-hash sets
    val docSh = sh.groupBy(col("doc_id")).agg(collect_set(col("h")).as("ss"))
    cand
      .join(docSh.select(col("doc_id").as("a_id"), col("ss").as("ssa")), "a_id")
      .join(docSh.select(col("doc_id").as("b_id"), col("ss").as("ssb")), "b_id")
      .withColumn("inter", size(array_intersect(col("ssa"), col("ssb"))).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("ssa")) + size(col("ssb")) - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), col("inter"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
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

  val oracles: Map[String, String] = Map(
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
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_dedup_exact"   -> c1_dedupExact _,
    "c2_dedup_minhash" -> c2_dedupJaccard _,
    "x_minhash_lsh"    -> minhashLsh _,
    "c4_text_stats"    -> c4_textStats _,
    "c4b_top_terms"    -> c4b_topTerms _,
  )
}
