package graft

import org.apache.spark.sql.functions._

/** Dirty-corpus sweep: every documents/embeddings query executed against
  * a fixture full of the inputs a 100 TB lake actually contains — null
  * and empty text, sub-shingle documents, repeated tokens, unicode,
  * quotes/backslashes, exact duplicates, null/empty/zero/ragged/NaN
  * embedding vectors. The driver fixtures are clean, so without this
  * sweep a null-handling regression in any C-tier operator would ship
  * silently and only surface on real data.
  *
  * Assertions are deliberately light (no crash + cheap invariants):
  * exact semantics live in the oracle gate and the per-operator specs;
  * this spec pins TOTALITY over hostile inputs.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  /** Fixture dir, written once on first use (SparkSpec has no
    * BeforeAndAfterAll; a lazy val gives the same once-per-suite setup).
    */
  private lazy val dir: String = {
    val d = s"${graft.ops.Tables.scratch}/edgecase_fixture"
    graft.ops.Tables.rmrf(d)
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    embs.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private val longDoc = (0 until 500).map(i => s"w${i % 40}").mkString(" ")
  private val docs: Seq[(Long, String, String, String, java.lang.Long)] = Seq(
    (0L, null, null, null, null),
    (1L, "", "en", "web", 0L: java.lang.Long),
    (2L, "one", "en", "web", 3L: java.lang.Long),
    (3L, "one two", null, "web", 7L: java.lang.Long),
    (4L, "the the the the the", "en", "books", 19L: java.lang.Long),
    (5L, "héllo wörld ünïcode 日本語 🙂 mixed", "ja", "web", 33L: java.lang.Long),
    (6L, "it's \"quoted\" back\\slash comma,semi;", "en", "web", 36L: java.lang.Long),
    (7L, "alpha beta gamma delta epsilon zeta", "en", "web", 35L: java.lang.Long),
    (8L, "alpha beta gamma delta epsilon zeta", "en", "crawl", 35L: java.lang.Long),
    (9L, longDoc, "en", "books", longDoc.length.toLong: java.lang.Long))

  private def vec(seed: Int): Seq[Option[Float]] =
    (0 until 8).map(j => Some(((seed * 31 + j * 7) % 13 - 6).toFloat / 3f))
  private val embs: Seq[(Long, Seq[Option[Float]], java.lang.Integer)] =
    Seq(
      (0L, null, null),
      (1L, Seq.empty[Option[Float]], 0: java.lang.Integer),
      (2L, Seq.fill(8)(Some(0f)), 1: java.lang.Integer), // zero norm
      (13L, Seq(Some(1f), Some(2f), Some(3f)), 2: java.lang.Integer), // ragged
      (14L, vec(14).updated(3, None), 1: java.lang.Integer), // null element
      (15L, vec(15).updated(5, Some(Float.NaN)), 0: java.lang.Integer),
      (16L, vec(16).updated(2, Some(Float.PositiveInfinity)), 2: java.lang.Integer)
    ) ++ (3L to 12L).map(i => (i, vec(i.toInt), (i % 3).toInt: java.lang.Integer))

  /** Every C-tier / x_* query that reads only documents/embeddings. */
  private val corpusQueries = Seq(
    "c1_dedup_exact", "c2_dedup_minhash", "c3_sim_topk", "c4_text_stats",
    "c4b_top_terms", "c5_multimodal_cols", "c6_simhash", "c7_cosine_neardup",
    "c8_text_quality", "c9_multimodal_decode", "c10_stopword_filter",
    "c11_hash_sample", "c12_tfidf_top_terms", "c13_stratified_sample",
    "c14_pack_sequences", "c15_dedup_clusters", "c16_corpus_pipeline",
    "c17_multimodal_resize", "c18_frame_sample", "c19_heavy_hitters",
    "x_minhash_lsh", "x_ann_lsh",
    "x_ann_ivf", "x_label_centroids", "x_stratified_prefilter",
    "x_corpus_from_clusters", "x_pack_twophase",
    "c20_bigram_stats", "c21_embedding_quantize", "x_ann_quantized",
    "c35_lm_score",
    "c22_vocab_coverage", "x_ann_pq", "x_ann_ivfpq", "x_ann_from_index",
    "c23_lang_id", "c24_winnow_fingerprint", "c25_winnow_neardup",
    "c26_bpe_token_stats", "c27_contamination", "x_contain_from_postings",
    "c28_pack_bpe", "x_neardup_bucketed", "x_neardup_incremental",
    "x_neardup_lifecycle", "x_neardup_compact", "x_neardup_prune",
    // x_neardup_delete: the retention rewrite over dirty/empty corpora
    // (id-addressed requests never match null ids; empty early-returns)
    "x_neardup_delete",
    "x_bpe_train", "x_bpe_coverage",
    "c29_repetition_stats", "c30_quality_gate", "c31_pii_redact",
    "c32_domain_stats", "c33_rarity_score", "c34_encoding_stats",
    "x_semantic_dedup", "x_semantic_ann", "x_select_by_rarity",
    // x_semantic_incremental: ragged/NaN/zero-norm vectors leave the
    // similarity domain in BOTH the standing build and the delta
    // postings (finiteNorm); an untrainable/empty base early-returns
    "x_semantic_incremental",
    "x_ann_append", "x_ann_compact", "x_ann_drift",
    // x_ann_rebuild: a trainable dirty base implies a trainable union
    // (the sample only grows), so the retrain + generation swap must
    // survive ragged/NaN vectors; an empty corpus early-returns before
    // any training
    "x_ann_rebuild",
    // x_ann_delete: the retention rewrite must survive dirty vectors
    // (the delete slice is id-addressed; codes rows are slim) and
    // early-return on empty/untrainable corpora
    "x_ann_delete",
    // the LM family's held-out/update forms: the dirty corpus has NO
    // src0 shard, so the standing LM is EMPTY — held-out scoring must
    // take the OOV fallback on every bigram, and the update fold must
    // degrade to fold(∅, delta) ≡ retrain (additivity's empty-base arm)
    "x_lm_heldout", "x_lm_update",
    // x_lm_prune over the no-src0 corpus: the standing LM is empty, the
    // prune of an empty table is empty, every transition is OOV with
    // n_tot = 0 (cost length(bin(0)) = 1 bit) — totality of the
    // degenerate pruned model
    "x_lm_prune",
    // s9/s10 read documents, not events — the streaming queries that
    // belong in the corpus sweep (dirty text through the classifier /
    // audit stream; empty corpus must drain to an empty sink)
    "s9_stream_lang_id", "s10_stream_contamination",
    "s11_stream_quality_gate", "s12_stream_pii", "s13_stream_funnel",
    "s14_stream_neardup", "s15_stream_fingerprint", "s16_stream_lm_score",
    "s17_stream_lm_heldout", "s18_stream_lm_update",
    // the round-17 arrival forms: the composed corpus build and the
    // vector-index ingest must drain dirty/empty corpora to sane
    // manifests/searches (s19's cut over a corpus where near-dups,
    // null text and sub-shingle docs all occur; s20's assignment over
    // ragged/NaN/zero-norm vectors)
    "s19_stream_corpus_pipeline", "s20_stream_ann_ingest",
    // x_corpus_epochs: dirty docs split into two arrival epochs; the
    // final close must re-cut the union to the same manifest c16 makes
    // of it; an empty corpus drains (possibly zero batches) to an
    // empty manifest
    "x_corpus_epochs",
    // s21: the semantic ingest's arrival twin — dirty vectors leave the
    // similarity domain in the state extraction; empty/untrainable
    // corpora early-return before the drain
    "s21_stream_semantic_ingest",
    // x_semantic_bucketed: the bucketed-layout twin — same domain
    // posture as x_semantic_incremental through the CTAS path
    "x_semantic_bucketed",
    // s22: the retention stream over dirty/empty corpora — requests
    // are id-addressed (null ids never match); empty drains to an
    // empty audit
    "s22_stream_retention",
    // the round-19 retention/maintenance ladder: erasure rewrites over
    // dirty state (requests id-addressed; ragged/NaN vectors already
    // outside the similarity domain), untrainable/empty early-returns
    "x_semantic_delete", "x_semantic_compact", "x_semantic_rebuild",
    "x_semantic_drift", "x_lm_delete", "x_corpus_retention",
    "s23_stream_semantic_retention", "s24_stream_lm_retention",
    "s25_stream_corpus_retention", "s26_stream_ann_retention",
    // the round-20 tokenizer lifecycle: the dirty corpus has NO src0
    // shard, so the standing census is empty — fold(∅, delta) and
    // delete(∅, ∅) must both degrade cleanly
    "x_bpe_update", "x_bpe_delete",
    // the mixture family: null sources are excluded up front, null
    // text sizes to 0 tokens, and the prefix guard must hold on every
    // real source
    "c36_mixture_sample", "c37_mixture_pack", "x_mixture_prefilter",
    // s27: the mixture's arrival twin — dirty sizing per batch, cut at
    // close; empty corpora drain (possibly zero batches) to an empty mix
    "s27_stream_mixture")

  corpusQueries.foreach { name =>
    test(s"$name survives the dirty corpus") {
      val rows = SparkEntry.queries(name)(spark, dir).collect()
      assert(rows != null) // totality is the point; row counts may be 0
    }
  }

  /** Zero-row tables with the real schemas: the empty-partition /
    * first-run case a scheduled lake job must return empty from, not
    * die in (schema inference over no files, untrainable IVF, …).
    */
  private lazy val emptyDir: String = {
    val d = s"${graft.ops.Tables.scratch}/edgecase_empty_corpus"
    graft.ops.Tables.rmrf(d)
    docs.toDF("doc_id", "text", "lang", "source", "n_chars").limit(0)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    embs.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .limit(0)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  corpusQueries.foreach { name =>
    test(s"$name returns empty from an empty corpus") {
      assert(SparkEntry.queries(name)(spark, emptyDir).collect().isEmpty)
    }
  }

  test("x_retention_audit reports all-zero artifacts on dirty and empty corpora, never dies") {
    // the audit is the one query whose EMPTY-corpus contract is NOT an
    // empty frame: its oracle's UNION ALL always emits the 8 artifact
    // rows, with every census 0 — an auditor reports "nothing stands",
    // not nothing
    val dirty = SparkEntry.queries("x_retention_audit")(spark, dir).collect()
    assert(dirty.length === 8)
    assert(dirty.forall(_.getAs[Long]("n_surviving") === 0L))
    val empty = SparkEntry.queries("x_retention_audit")(spark, emptyDir).collect()
    assert(empty.length === 8)
    assert(empty.forall(r => r.getAs[Long]("n_rows") === 0L &&
      r.getAs[Long]("n_surviving") === 0L))
  }

  test("c8 invariants on the dirty corpus") {
    val out = SparkEntry.queries("c8_text_quality")(spark, dir).collect()
    assert(out.length === docs.length, "one feature row per document, nulls included")
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // sub-shingle docs (null, <3 tokens) carry null fingerprints
    Seq(0L, 1L, 2L, 3L).foreach { id =>
      assert(byId(id).isNullAt(byId(id).fieldIndex("fp_min")), s"doc $id fp_min")
    }
    // identical texts fingerprint identically
    assert(byId(7L).getAs[Long]("fp_min") === byId(8L).getAs[Long]("fp_min"))
    assert(byId(7L).getAs[Long]("fp_xor") === byId(8L).getAs[Long]("fp_xor"))
  }

  test("c11 assigns every document, null text or not, to exactly one split") {
    val out = SparkEntry.queries("c11_hash_sample")(spark, dir).collect()
    assert(out.length === docs.length)
    assert(out.forall(r => Set("train", "val", "test")(r.getAs[String]("split"))))
  }

  test("c10 never grows a document and tolerates null text") {
    val out = SparkEntry.queries("c10_stopword_filter")(spark, dir).collect()
    out.filter(r => !r.isNullAt(r.fieldIndex("n_orig"))).foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_orig"))
    }
  }

  test("c1 collapses the exact-duplicate pair") {
    val out = SparkEntry.queries("c1_dedup_exact")(spark, dir).collect()
    // docs 7 and 8 share text: min-id representative survives with both
    // counted, and id 8 must not appear as its own representative
    assert(out.exists(r =>
      r.getAs[Long]("keep_id") == 7L && r.getAs[Long]("dups") == 2L))
    assert(!out.exists(_.getAs[Long]("keep_id") == 8L))
  }

  test("c3 ranks are contiguous from 1 per probe even with degenerate vectors") {
    val out = SparkEntry.queries("c3_sim_topk")(spark, dir).collect()
    out.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, rows) =>
      val rnks = rows.map(_.getAs[Long]("rnk")).sorted.toSeq
      assert(rnks === (1L to rnks.length).toSeq, s"probe $p ranks: $rnks")
    }
  }
}
