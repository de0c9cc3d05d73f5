package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._
import graft.streaming.StreamOps

/** Driver-contract consistency pins. SparkEntry assembles its maps by
  * `++` over fifteen per-module maps — which silently OVERWRITES on a
  * duplicate name (one operator would shadow another and the shadowed
  * one would vanish from the gate without any failure), and an oracle
  * whose name doesn't match a query is silently never compared. Both
  * classes of drift become a red test here.
  */
class ContractSpec extends AnyFunSuite {

  private val moduleQueries = Seq(
    "Ingest" -> Ingest.queries, "Sources" -> Sources.queries,
    "Features" -> Features.queries, "Relational" -> Relational.queries,
    "Extras" -> Extras.queries, "RangeJoin" -> RangeJoin.queries,
    "BloomJoin" -> BloomJoin.queries, "CorpusOps" -> CorpusOps.queries,
    "TextOps" -> TextOps.queries, "BpeTrain" -> BpeTrain.queries,
    "VectorOps" -> VectorOps.queries,
    "Simhash" -> Simhash.queries, "TextQuality" -> TextQuality.queries,
    "Multimodal" -> Multimodal.queries,
    "RetentionAudit" -> RetentionAudit.queries,
    "StreamOps" -> StreamOps.queries)

  test("no query name is defined by two modules (++ would silently shadow one)") {
    val all = moduleQueries.flatMap { case (m, qs) => qs.keys.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicate query names: ${dups.map { case (k, ms) =>
      s"$k in ${ms.map(_._2).mkString("+")}" }.mkString(", ")}")
    assert(all.size === SparkEntry.queries.size)
  }

  test("every oracle names an existing query (an orphan oracle never runs)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("the rows-only set is exactly the twenty-five declared sketch/ANN/trainer variants") {
    // The other four x_* variants (x_asof_bucketed, x_stratified_prefilter,
    // x_corpus_from_clusters, x_pack_twophase) are byte-equal to their
    // oracled twins (scalatest-pinned), so they carry the twin's oracle
    // and are driver-hash-checked like any other query.
    // s8 is x_hll_rollup's streaming twin: sketch binaries are
    // engine-specific, and its merge ≡ batch equality is pinned in
    // StreamingSpec instead.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set("x_approx_distinct", "x_minhash_lsh", "x_ann_lsh",
      "x_ann_ivf", "x_label_centroids", "x_ann_quantized", "x_ann_pq",
      "x_ann_ivfpq", "x_ann_from_index", "x_ann_append", "x_ann_compact",
      "x_ann_drift", "x_ann_rebuild", "x_ann_delete", "s20_stream_ann_ingest", "x_semantic_ann",
      "x_semantic_drift", "s26_stream_ann_retention",
      "x_approx_percentiles", "x_hll_rollup", "s8_stream_hll_rollup",
      "x_bpe_train", "x_bpe_coverage", "x_bpe_update", "x_bpe_delete"),
      "a query lost its oracle (or a new one shipped without one): " + rowsOnly)
  }

  test("the byte-equal twin variants share their twin's oracle verbatim") {
    val twins = Seq(
      "x_asof_bucketed" -> "b7_asof_join",
      "x_stratified_prefilter" -> "c13_stratified_sample",
      // prefix-exact census-then-filter (guard-enforced) ≡ c36
      "x_mixture_prefilter" -> "c36_mixture_sample",
      "x_corpus_from_clusters" -> "c16_corpus_pipeline",
      "x_pack_twophase" -> "c14_pack_sequences",
      // stream ≡ batch for the stateless classifier (s9 is c23's
      // streaming twin, like s1/a14 — same rows, same order)
      "s9_stream_lang_id" -> "c23_lang_id",
      // the materialized-posting-list consumer is byte-equal to c27
      "x_contain_from_postings" -> "c27_contamination",
      // the bucketed-index consumer is byte-equal to c25
      "x_neardup_bucketed" -> "c25_winnow_neardup",
      // stream ≡ batch for the stateless audit (s10 is c27's streaming
      // twin, like s9/c23 — same rows, same order)
      "s10_stream_contamination" -> "c27_contamination",
      // stream ≡ batch for the stateless quality gate (s11 is c30's
      // streaming twin — same rows, same order)
      "s11_stream_quality_gate" -> "c30_quality_gate",
      // stream ≡ batch for the stateless scrub (s12 is c31's twin)
      "s12_stream_pii" -> "c31_pii_redact",
      // merge-of-exact-partials ≡ batch for the funnel rollup (s13 is
      // c32's twin — BIGINT partials merge exactly, unlike s8's HLL)
      "s13_stream_funnel" -> "c32_domain_stats",
      // per-batch ingests tile the one-shot ingest (s14 is
      // x_neardup_incremental's streaming twin — the tiling lemma)
      "s14_stream_neardup" -> "x_neardup_incremental",
      // stream ≡ batch for the stateless fingerprint map (s15 is c24's
      // streaming twin — the index build on arrival)
      "s15_stream_fingerprint" -> "c24_winnow_fingerprint",
      // score-on-arrival vs the standing LM ≡ the batch scorer (s16 is
      // c35's twin — a doc's score depends only on its row + the LM)
      "s16_stream_lm_score" -> "c35_lm_score",
      // held-out score-on-arrival ≡ the batch held-out scorer (s17 is
      // x_lm_heldout's twin — per-row vs the standing LM tables)
      "s17_stream_lm_heldout" -> "x_lm_heldout",
      // compact-mid-lifecycle ≡ the lifecycle (the compaction identity)
      "x_neardup_compact" -> "x_neardup_lifecycle",
      // prune-mid-lifecycle ≡ the lifecycle (df monotonicity: over-cap
      // fps never pair again, so dropping their postings is invisible)
      "x_neardup_prune" -> "x_neardup_lifecycle",
      // fold-then-score ≡ retrain-then-score (bigram-census additivity)
      "x_lm_update" -> "c35_lm_score",
      // fold-on-arrival ≡ retrain, however batches tile (additivity)
      "s18_stream_lm_update" -> "c35_lm_score",
      // extract-on-arrival + cut-at-close ≡ the batch pipeline (per-doc
      // state lands whole in one batch; reduces run over the union)
      "s19_stream_corpus_pipeline" -> "c16_corpus_pipeline",
      // the final multi-epoch close re-cuts over ALL arrived state =
      // the batch pipeline over the full corpus
      "x_corpus_epochs" -> "c16_corpus_pipeline",
      // standing state = the batch backfill's exact base pairs; the
      // delta net covers every exact delta-touching pair at the gated
      // scales (SemIncNprobe's margin) — full post-fold state ≡ batch
      "x_semantic_incremental" -> "x_semantic_dedup",
      // extract-on-arrival + resolve-at-close ≡ the batch dedup (per-
      // vector state lands whole in one batch; pair/label reduces run
      // over the union)
      "s21_stream_semantic_ingest" -> "x_semantic_dedup",
      // same candidate set through the bucketed join legs
      "x_semantic_bucketed" -> "x_semantic_dedup",
      // compaction identity (fold preserves the base ∪ explode(epochs)
      // view) + day tiling — byte-equal to the one-shot dedup
      "x_semantic_compact" -> "x_semantic_dedup",
      // pair state survives the retrain (exact facts); coverage holds
      // under each day's model — byte-equal to the one-shot dedup
      "x_semantic_rebuild" -> "x_semantic_dedup",
      // log-on-arrival + apply-at-close ≡ the batch delete (union of
      // request batches; deletion is order-free idempotent removal)
      "s22_stream_retention" -> "x_neardup_delete",
      // the same cadence against the semantic standing state
      "s23_stream_semantic_retention" -> "x_semantic_delete",
      // union-of-batches decrement ≡ the batch delete (additivity)
      "s24_stream_lm_retention" -> "x_lm_delete",
      // one close-time rewrite + re-cut over the union ≡ the batch rung
      "s25_stream_corpus_retention" -> "x_corpus_retention",
      // size-on-arrival + cut-at-close ≡ the batch sample (per-row
      // sizing; retroactive prefix cut over the union)
      "s27_stream_mixture" -> "c36_mixture_sample")
    for ((x, twin) <- twins)
      assert(SparkEntry.oracleSql(x) eq SparkEntry.oracleSql(twin),
        s"$x must share $twin's oracle string (same object — no drift)")
  }

  test("the inventory holds all SURVEY §2 queries") {
    // round-20 additions: the tokenizer lifecycle rungs (x_bpe_update +
    // x_bpe_delete, rows-only trainer contract), the mixture family
    // (c36_mixture_sample + c37_mixture_pack + x_mixture_prefilter, all
    // oracled) and x_retention_audit (oracled compliance sweep) on top
    // of round-19's 155
    // + s27_stream_mixture (c36's arrival twin)
    assert(SparkEntry.queries.size === 162)
    assert(SparkEntry.oracleSql.size === 137)
  }

  /** Round-13 ADVICE lint: every scratch path an operator writes must
    * be keyed by its dataset (`sanitize(d)` or the generation-suffixed
    * `scratchDir`) — a fixed name makes two fixtures' runs overwrite
    * each other's sinks (and a streaming checkpoint PINS its source
    * path, so the second dataset would silently re-drain the first's
    * files). Enforced at the source level so the next fixed-name
    * scratch dir is a red test, not a latent cross-dataset bug.
    */
  test("scratch-path lint: every main-source scratch dir is dataset-keyed") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val files = java.nio.file.Files.walk(root)
    val offenders = try {
      files.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .filterNot(_.getFileName.toString == "Tables.scala") // the namers themselves
        .flatMap { p =>
          java.nio.file.Files.readAllLines(p).asScala.zipWithIndex.collect {
            case (line, i) if line.contains("Tables.scratch}") &&
              !line.contains("sanitize(") && !line.contains("scratchDir(") &&
              // the one sanctioned fixed name: Derby's JVM-wide error
              // log location (a global system property, not a sink)
              !line.contains("derby.log") =>
              s"$p:${i + 1}: ${line.trim}"
          }
        }.toList
    } finally files.close()
    assert(offenders.isEmpty,
      "scratch paths without dataset keying:\n  " + offenders.mkString("\n  "))
  }

  /** The round-10 red: two new oracles left a DuckDB `sum(...)` un-cast,
    * DuckDB widened BIGINT sums to HUGEINT, and the driver's typed hash
    * diverged from Spark's BIGINT even though every value matched. The
    * house rule — every aggregate that feeds an output column is wrapped
    * in an explicit CAST — is enforced here as a build-time lint: find
    * each `sum(`/`avg(` in every oracle, balance its parentheses, and
    * require an enclosing CAST(... AS <type>) (or an explicit division /
    * comparison that re-types the value) within the same expression.
    */
  test("oracle lint: every sum()/avg() result is explicitly re-typed (HUGEINT drift guard)") {
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq
      up = sql.toUpperCase
      m <- "(?i)\\b(SUM|AVG)\\s*\\(".r.findAllMatchIn(sql)
      if !aggIsRetyped(up, m.start)
    } yield s"$name @ char ${m.start}: ${sql.substring(m.start, math.min(sql.length, m.start + 60)).replace('\n', ' ')}"
    assert(offenders.isEmpty,
      "oracle aggregates whose type DuckDB may widen (wrap in CAST(... AS BIGINT/DOUBLE)):\n  " +
        offenders.mkString("\n  "))
  }

  /** True when the aggregate starting at `at` cannot leak a widened
    * DuckDB type into an output column:
    *  1. it is inside an enclosing CAST(...) — the b26/b28 house rule;
    *  2. its argument is already DOUBLE (`AS DOUBLE` cast inside) —
    *     DuckDB sum(DOUBLE) stays DOUBLE, nothing widens;
    *  3. the balanced call (plus any OVER window) is directly followed
    *     by `/`/comparison — division re-types, comparison consumes;
    *  4. it is aliased `AS <name>` and EVERY downstream use of <name>
    *     is itself inside a CAST or followed by `/`/comparison (the
    *     intermediate-column case: c14/c16's tok_end, c6's bit votes).
    */
  private def aggIsRetyped(up: String, at: Int): Boolean = {
    def insideCast(pos: Int): Boolean = {
      // walk left counting depth; an unmatched '(' headed by CAST means
      // pos is inside that cast; any other unmatched opener (COALESCE,
      // ROUND, …) keeps walking — a CAST may still wrap it.
      var i = pos - 1
      var depth = 0
      while (i >= 0) {
        up(i) match {
          case ')' => depth += 1
          case '(' =>
            if (depth > 0) depth -= 1
            else if (up.substring(math.max(0, i - 8), i).contains("CAST")) return true
          case _ =>
        }
        i -= 1
      }
      false
    }
    def balancedClose(open: Int): Int = {
      var i = open
      var depth = 0
      while (i < up.length) {
        if (up(i) == '(') depth += 1
        else if (up(i) == ')') { depth -= 1; if (depth == 0) return i }
        i += 1
      }
      -1
    }
    def skipWs(from: Int): Int = {
      var j = from
      while (j < up.length && up(j).isWhitespace) j += 1
      j
    }
    def opAt(j: Int): Boolean = j < up.length && "/<>=".contains(up(j))
    val open = up.indexOf('(', at)
    val close = balancedClose(open)
    if (close < 0) return false
    if (insideCast(at)) return true
    if (up.substring(open, close).contains("AS DOUBLE")) return true
    // position just past the call and any OVER (...) window spec
    var j = skipWs(close + 1)
    if (up.startsWith("OVER", j)) {
      j = skipWs(j + 4)
      if (j < up.length && up(j) == '(') {
        val wClose = balancedClose(j)
        if (wClose < 0) return false
        j = skipWs(wClose + 1)
      } else j = skipWs(up.indexWhere(!_.isLetterOrDigit, j)) // named window
    }
    if (opAt(j)) return true
    // rule 4: AS <alias>, every other use re-typed or consumed
    if (!up.startsWith("AS", j)) return false
    val aliasStart = skipWs(j + 2)
    var aliasEnd = aliasStart
    while (aliasEnd < up.length && (up(aliasEnd).isLetterOrDigit || up(aliasEnd) == '_')) aliasEnd += 1
    if (aliasEnd == aliasStart) return false
    val alias = up.substring(aliasStart, aliasEnd)
    val uses = s"\\b$alias\\b".r.findAllMatchIn(up).map(_.start)
      .filter(_ != aliasStart).toList
    uses.nonEmpty && uses.forall { u =>
      insideCast(u) || opAt(skipWs(u + alias.length))
    }
  }
}
