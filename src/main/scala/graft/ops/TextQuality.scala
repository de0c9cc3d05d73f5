package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** c8: training-data text analysis per document — language-ID heuristic,
  * quality scoring, BPE-ish regex token counting, and rolling-hash
  * document fingerprinting (SURVEY.md §2B extension; the four text ops
  * a 100 TB pretraining pipeline filters with).
  *
  * Every feature is built from integer counts, exact divisions, or
  * md5-derived 60-bit hashes, so the DuckDB oracle matches bit-for-bit.
  */
object TextQuality {

  /** stopword list for the language-ID vote + stop-ratio quality signal */
  private val Stops = Seq("the", "a", "of", "and", "is")
  private val stopsSql = Stops.map(s => s"'$s'").mkString(", ")

  /** BPE-ish tokenizer: letter runs, digit runs, single non-space symbols */
  private val BpePat = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def c8_textQuality(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d).select(
      col("doc_id"), col("lang"),
      split(col("text"), " ").as("t"),
      length(col("text")).cast("long").as("n_char"),
      size(regexp_extract_all(col("text"), lit(BpePat), lit(0))).cast("long").as("n_tok_bpe"))
      .withColumn("n_tok", size(col("t")).cast("long"))
      .withColumn("stop_hits",
        size(expr(s"filter(t, x -> x IN ($stopsSql))")).cast("long"))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tok"))
      .withColumn("mean_tok_len",
        (col("n_char") - (col("n_tok") - 1)).cast("double") / col("n_tok"))
      .withColumn("lang_guess",
        when(col("stop_ratio") >= 0.02, "en").otherwise("unk"))
      .withColumn("quality",
        when(col("n_tok").between(5, 1000) && col("mean_tok_len").between(2.0, 12.0), 0.5)
          .otherwise(0.0) + col("stop_ratio"))
      // rolling-hash fingerprint over 3-token shingles: min-hash
      // (winnowing with a whole-document window) + order-independent
      // xor-fold. Both folds stay INSIDE the row via higher-order
      // functions — the fingerprint needs no explode, no shuffle, and
      // no join-back, so the whole query is one scan + one pure map
      // (the only exchange left is the presentation sort). xor's
      // identity is 0, so the fold seeds with 0L; a document with
      // fewer than 3 tokens has no shingles → null array → both
      // fingerprints null, exactly the old left-join's miss behavior.
      .withColumn("sh", expr(
        "CASE WHEN size(t) >= 3 THEN transform(sequence(0, size(t)-3)," +
          " i -> cast(conv(substr(md5(concat_ws(' ', t[i], t[i+1], t[i+2])), 1, 15), 16, 10) as bigint)) END"))
      .withColumn("fp_min", expr("array_min(sh)"))
      .withColumn("fp_xor", expr("aggregate(sh, 0L, (a, x) -> a ^ x)"))
      .select(col("doc_id"), col("lang"), col("lang_guess"), col("n_tok"),
        col("n_tok_bpe"), col("n_char"), col("stop_hits"), col("stop_ratio"),
        col("mean_tok_len"), col("quality"), col("fp_min"), col("fp_xor"))
      .orderBy(col("doc_id"))

  val oracles: Map[String, String] = Map(
    "c8_text_quality" ->
      s"""WITH base AS (
         |  SELECT doc_id, lang,
         |    str_split(text, ' ') AS t,
         |    CAST(length(text) AS BIGINT) AS n_char,
         |    CAST(len(regexp_extract_all(text, '$BpePat')) AS BIGINT) AS n_tok_bpe
         |  FROM documents),
         |feats AS (
         |  SELECT doc_id, lang, n_char, n_tok_bpe,
         |    CAST(len(t) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(t, x -> x IN ($stopsSql))) AS BIGINT) AS stop_hits
         |  FROM base),
         |sh AS (
         |  SELECT doc_id,
         |    CAST('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 15) AS BIGINT) AS h
         |  FROM (SELECT doc_id, str_split(text, ' ') AS t FROM documents
         |        WHERE len(str_split(text, ' ')) >= 3), unnest(range(1, len(t) - 1)) AS r(i)),
         |fp AS (SELECT doc_id, MIN(h) AS fp_min, bit_xor(h) AS fp_xor FROM sh GROUP BY doc_id)
         |SELECT f.doc_id, f.lang,
         |  CASE WHEN CAST(stop_hits AS DOUBLE) / n_tok >= 0.02 THEN 'en' ELSE 'unk' END AS lang_guess,
         |  n_tok, n_tok_bpe, n_char, stop_hits,
         |  CAST(stop_hits AS DOUBLE) / n_tok AS stop_ratio,
         |  CAST(n_char - (n_tok - 1) AS DOUBLE) / n_tok AS mean_tok_len,
         |  (CASE WHEN n_tok BETWEEN 5 AND 1000
         |        AND CAST(n_char - (n_tok - 1) AS DOUBLE) / n_tok BETWEEN 2.0 AND 12.0
         |        THEN 0.5 ELSE 0.0 END) + CAST(stop_hits AS DOUBLE) / n_tok AS quality,
         |  fp.fp_min, CAST(fp.fp_xor AS BIGINT) AS fp_xor
         |FROM feats f LEFT JOIN fp ON fp.doc_id = f.doc_id
         |ORDER BY f.doc_id""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c8_text_quality" -> c8_textQuality _,
  )
}
