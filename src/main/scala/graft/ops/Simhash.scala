package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** c6: SimHash near-duplicate detection over documents.
  *
  * 60-bit SimHash from md5-derived token hashes (md5 is identical in
  * Spark and DuckDB, so the oracle reproduces the signatures exactly;
  * 60 bits = 15 hex chars keeps the value inside a signed BIGINT for
  * both engines). Per-document signature: for each bit b, sum +cnt/-cnt
  * over tokens by whether bit b of the token hash is set; the sign of
  * the sum is the signature bit.
  *
  * Near-dup pairs = hamming distance ≤ [[HamMax]]. The Spark side finds
  * candidates by the pigeonhole banding trick — 4 chunks of 15 bits;
  * any pair within distance 3 must agree on ≥1 whole chunk — so the
  * equi-join on chunks is exhaustive (recall 1), never O(n²). The
  * oracle brute-forces all pairs, which is exactly equivalent.
  */
object Simhash {

  val Bits = 60
  val Chunks = 4 // 15 bits each; exhaustive for hamming <= Chunks-1
  val HamMax: Int = Chunks - 1

  /** token-hash → 60-bit bigint, shared with the oracle via md5
    * (the one contract definition: [[graft.functions.CrossEngineHash]]).
    */
  private def h60(c: Column): Column = graft.functions.CrossEngineHash.md5_60(c)

  /** Signature via the typed [[graft.functions.SimHashAgg]] buffer:
    * one explode + ONE aggregation consuming every token occurrence
    * (±1 per occurrence ≡ the oracle's ±cnt per distinct term, so the
    * (doc, tok) pre-count shuffle the declarative form needed is gone
    * entirely). The previous 60-column `sum(CASE)` form was correct
    * but generated a codegen class so large Janino took ~10 s to
    * compile it — recurring cost whenever the 100-entry codegen cache
    * evicted it (every bench repetition). See SimHashAgg's scaladoc.
    */
  def signatures(spark: SparkSession, d: String): DataFrame = {
    val simhash = udaf(graft.functions.SimHashAgg)
    Tables.documents(spark, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), h60(col("tok")).as("h"))
      .groupBy(col("doc_id"))
      .agg(simhash(col("h")).as("simhash"))
  }

  def c6_simhash(spark: SparkSession, d: String): DataFrame = {
    val sig = signatures(spark, d)
    // one exploded (chunk-index, chunk-value) relation + ONE equi-join,
    // instead of Chunks separate self-joins unioned: the signature
    // relation is shuffled once (ReuseExchange covers both join sides)
    // rather than rescanned/reshuffled 2×Chunks times.
    val chunked = sig.select(col("doc_id"), col("simhash"), explode(expr(
      s"""transform(sequence(0, ${Chunks - 1}), j ->
         |  struct(j AS cj, shiftright(simhash, 15 * j) & 32767 AS cv))"""
        .stripMargin)).as("c"))
      .select(col("doc_id"), col("simhash"),
        col("c.cj").as("cj"), col("c.cv").as("cv"))
    // hamming filter BEFORE the dedup shuffle: ham is a pure function of
    // the pair, so filtering first is equivalent and the dropDuplicates
    // exchange carries only true near-dups, not every shared-chunk
    // candidate.
    chunked.as("a").join(chunked.as("b"),
        col("a.cj") === col("b.cj") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("ham"))
      .filter(col("ham") <= HamMax)
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"), col("ham"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Oracle: identical signatures, brute-force pair scan. */
  private val sigSql: String = {
    val weights = (0 until Bits).map(b =>
      s"SUM(cnt * CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS w$b").mkString(",\n    ")
    val bits = (Bits - 1 to 0 by -1).map(b =>
      s"(CASE WHEN w$b >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
    s"""WITH toks AS (
       |  SELECT doc_id, tok, COUNT(*) AS cnt,
       |    CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
       |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY doc_id, tok),
       |w AS (
       |  SELECT doc_id,
       |    $weights
       |  FROM toks GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST('0b' || ($bits) AS BIGINT) AS simhash FROM w)
       |""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "c6_simhash" ->
      (sigSql +
        s"""SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS ham
           |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.simhash, b.simhash)) <= $HamMax
           |ORDER BY a_id, b_id""".stripMargin),
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c6_simhash" -> c6_simhash _,
  )
}
