package graft

import org.apache.spark.sql.functions._
import graft.ops.BpeTrain

/** Tokenizer-induction pins: the BPE trainer against hand-computable
  * corpora (exact merge tables, deterministic tie-breaks, leftmost
  * non-overlapping application) and the coverage join's budget
  * arithmetic including the OOV fallback.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def writeDocs(sub: String, docs: Seq[(Long, String)]): String = {
    val d = s"${graft.ops.Tables.scratch}/bpe_$sub"
    graft.ops.Tables.rmrf(d)
    docs.map { case (id, t) => (id, t, "en", "web",
        Option(t).map(_.length.toLong).getOrElse(0L).asInstanceOf[java.lang.Long]) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("x_bpe_train learns the exact merge table on a hand-computed corpus") {
    // words: ab ×5, abc ×3. Pair census: (a,b)=8, (b,c)=3.
    // merge 0: (a,b,8) → [ab], [ab,c]; merge 1: (ab,c,3) → [abc]; stop.
    val d = writeDocs("exact", Seq((1L, "ab ab ab ab ab abc"), (2L, "abc abc")))
    val rules = BpeTrain.x_bpeTrain(spark, d).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count"))).toSeq
    assert(rules === Seq((0L, "a", "b", "ab", 8L), (1L, "ab", "c", "abc", 3L)))
  }

  test("x_bpe_train ties break lexicographically — bit-stable across reruns") {
    // (x,y) and (q,r) both count 2: (q,r) must merge first
    val d = writeDocs("ties", Seq((1L, "xy xy qr qr")))
    val rules = BpeTrain.x_bpeTrain(spark, d).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    assert(rules === Seq(("q", "r"), ("x", "y")))
    // and a rerun produces the identical table
    val again = BpeTrain.x_bpeTrain(spark, d).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    assert(again === rules)
  }

  test("merge application is leftmost non-overlapping; a pair must occur twice") {
    // 'aaa' ×2: (a,a) counts 4 (two overlapping occurrences × freq 2);
    // leftmost application gives [aa, a], then (aa,a)=2 merges to [aaa]
    val d = writeDocs("overlap", Seq((1L, "aaa aaa")))
    val rules = BpeTrain.x_bpeTrain(spark, d).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"),
        r.getAs[Long]("pair_count"))).toSeq
    assert(rules === Seq(("a", "a", 4L), ("aa", "a", 2L)))
    // singleton pairs never merge: a lone word contributes nothing
    val d2 = writeDocs("single", Seq((1L, "pq")))
    assert(BpeTrain.x_bpeTrain(spark, d2).collect().isEmpty)
  }

  test("x_bpe_coverage: trained words cost their piece count, OOV words their chars") {
    // training corpus makes 'ab' one piece and 'abc' one piece; 'zz' is
    // in the census too (1 occurrence → no merges involve it, 2 pieces)
    val d = writeDocs("cov", Seq(
      (1L, "ab ab ab ab ab abc"), (2L, "abc abc"), (3L, "ab zz")))
    val got = BpeTrain.x_bpeCoverage(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("n_pieces"),
          r.getAs[Long]("n_oov")))).toMap
    // doc 3: ab=1 piece, zz census-resident with 2 single-char pieces
    assert(got(3L) === ((2L, 3L, 0L)))
    assert(got(1L) === ((6L, 6L, 0L))) // five 'ab' + one 'abc', all 1 piece
    assert(got(2L) === ((2L, 2L, 0L)))
  }

  test("x_bpe_coverage OOV fallback: a word beyond the census costs its char count") {
    // model trained on one corpus, coverage read on the SAME corpus
    // always finds its words; OOV is reachable via the cap — simulate
    // by checking the piece table directly + the join's coalesce arm
    val census = Array(("ab", 1L))
    val pieces = BpeTrain.pieceTable(census).toMap
    assert(pieces("ab") === 2) // weighted (a,b) count 1 < 2: no merge
    // empty-census trainer and coverage are total
    assert(BpeTrain.trainMerges(Array.empty).isEmpty)
    val d = writeDocs("empty", Seq((1L, null)))
    assert(BpeTrain.x_bpeTrain(spark, d).collect().isEmpty)
    assert(BpeTrain.x_bpeCoverage(spark, d).collect().isEmpty)
  }

  test("x_bpe_update: census fold ≡ from-scratch census; folded merge table ≡ x_bpe_train") {
    import graft.ops.{BpeTrain => B, Tables, CorpusOps}
    val docs = Tables.documents(spark, sf0001)
    val base = docs.filter(col("source") === CorpusOps.LmTrainSource)
    val delta = docs.filter(!(col("source") <=> lit(CorpusOps.LmTrainSource)))
    // the additivity lemma at the census level (three arms: base census,
    // delta docs, from-scratch census over the union)
    val folded = B.bpeFoldCounts(B.wordCountsOf(base), delta)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val scratch = B.wordCountsOf(docs)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(delta.limit(1).count() === 1L, "fixture must have a non-train delta")
    assert(folded === scratch)
    // fold-≡-retrain: the registered rung's merge table is byte-equal
    // to the one-shot trainer over the full corpus
    assert(B.x_bpeUpdate(spark, sf0001).collect().map(_.toSeq).toSeq ===
      B.x_bpeTrain(spark, sf0001).collect().map(_.toSeq).toSeq)
  }

  test("x_bpe_delete: decrement ≡ retrain on survivors; fold ∘ delete round-trips") {
    import graft.ops.{BpeTrain => B, Tables, CorpusOps}
    val docs = Tables.documents(spark, sf0001)
    val train = docs.filter(col("source") === CorpusOps.LmTrainSource)
    val hit = pmod(col("doc_id"), lit(CorpusOps.LmDeleteMod)) === CorpusOps.LmDeleteRes
    val deleted = train.filter(hit)
    val survivors = train.filter(col("doc_id").isNull || !hit)
    assert(deleted.limit(1).count() === 1L, "the request slice must be non-empty")
    val baseCensus = B.wordCountsOf(train)
    val baseSet = baseCensus.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // decrement ≡ retrain on survivors, at the census level
    val dec = B.bpeDeleteCounts(baseCensus, deleted)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val retrain = B.wordCountsOf(survivors)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dec === retrain)
    assert(dec !== baseSet, "erasure must bite: the deleted docs carry words")
    // the registered rung's merge table ≡ a from-scratch train on the
    // surviving train docs (never-ingested semantics for the tokenizer)
    assert(B.x_bpeDelete(spark, sf0001).collect().map(_.toSeq).toSeq ===
      B.mergeTableDf(spark, B.cappedCensus(B.wordCountsOf(survivors)))
        .collect().map(_.toSeq).toSeq)
    // fold ∘ delete round-trips to the standing census (NewOpsSpec's
    // round-trip shape at word grain)
    val rt = B.bpeFoldCounts(B.bpeDeleteCounts(baseCensus, deleted), deleted)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rt === baseSet)
  }

  test("trainer invariants on the fixture: ranks dense, merges reconstruct, census bounded") {
    val rules = BpeTrain.x_bpeTrain(spark, sf0001).collect()
    assert(rules.nonEmpty)
    // dense ranks from 0; every merged symbol is left+right
    rules.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rank") === i.toLong)
      assert(r.getAs[String]("merged") ===
        r.getAs[String]("left") + r.getAs[String]("right"))
      assert(r.getAs[Long]("pair_count") >= 2L)
    }
    // coverage: pieces never exceed characters, and n_oov ≤ n_tok
    val cov = BpeTrain.x_bpeCoverage(spark, sf0001).collect()
    assert(cov.nonEmpty)
    cov.foreach { r =>
      assert(r.getAs[Long]("n_pieces") >= 1L)
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tok"))
    }
  }
}
