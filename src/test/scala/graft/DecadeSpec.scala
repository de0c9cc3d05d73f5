package graft

import org.apache.spark.sql.functions._
import graft.ops._
import graft.tools.CorpusDecade

/** Pins the replica-linearity property CorpusDecade's scaling
  * measurement rests on (BENCH_NOTES (x)): at factor F the corpus is F
  * shingle-disjoint copies of the source, so the near-dup workload
  * (pairs, clusters) is EXACTLY F shifted copies of the source
  * workload — scaled data, identical characteristics. If a generator
  * change ever let replicas share a shingle (e.g. suffixing only some
  * tokens), cross-replica pairs would appear, the measured workload
  * would grow quadratically in F, and these equalities would break.
  */
class DecadeSpec extends SparkSpec {
  import spark.implicits._

  private val factor = 3
  private lazy val dir = {
    val d = s"${Tables.scratch}/decade_spec_x$factor"
    Tables.rmrf(d)
    CorpusDecade.replicate(spark, sf0001, factor)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }
  private lazy val stride =
    Tables.documents(spark, sf0001).agg(max(col("doc_id"))).head.getLong(0) + 1

  test("decade corpus: F replicas, replica 0 byte-equal, ids disjoint") {
    val src = Tables.documents(spark, sf0001)
    val rep = Tables.documents(spark, dir)
    assert(rep.count() === factor * src.count())
    // replica 0 (ids < stride) is the source corpus verbatim
    assert(rep.filter(col("doc_id") < stride).exceptAll(src).count() === 0)
    assert(src.exceptAll(rep.filter(col("doc_id") < stride)).count() === 0)
    assert(rep.groupBy(col("doc_id")).count().filter(col("count") > 1).count() === 0)
  }

  test("decade corpus: c2 pair list is exactly F shifted copies of the source's") {
    val srcPairs = TextOps.c2_dedupJaccard(spark, sf0001)
      .select(col("a_id"), col("b_id"), col("inter"), col("jaccard"))
    val repPairs = TextOps.c2_dedupJaccard(spark, dir)
      .select(col("a_id"), col("b_id"), col("inter"), col("jaccard"))
    // expected: for every source pair, one copy per replica at +r*stride
    val expected = srcPairs.crossJoin(spark.range(factor).toDF("r"))
      .select((col("a_id") + col("r") * stride).as("a_id"),
        (col("b_id") + col("r") * stride).as("b_id"),
        col("inter"), col("jaccard"))
    assert(repPairs.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(repPairs).count() === 0)
  }

  test("decade corpus: c35 LM scores are exactly F shifted copies of the source's") {
    // the token bijection is a bigram bijection, replicas share no
    // bigram, and counts within a replica mirror the source — so every
    // replica doc's (n_bi, bits_sum, avg) row equals its source doc's
    // exactly. A generator regression that let replicas share bigrams
    // would inflate counts and shift every surprise value.
    val src = CorpusOps.c35_lmScore(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val rep = CorpusOps.c35_lmScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rep.size === factor * src.size)
    val expected = (0 until factor).flatMap(r =>
      src.map { case (id, n, s, a) => (id + r * stride, n, s, a) }).toSet
    assert(rep === expected, "replica LM scores must be shifted copies of the source's")
  }

  test("decade corpus: null text replicates as null, never as empty string") {
    // concat_ws folds a null token array to "" — the generator must
    // short-circuit so every replica of a null doc is still null
    val d = s"${Tables.scratch}/decade_nulls"
    Tables.rmrf(d)
    Seq((0L, "a b c", "en", "s0", 5L), (1L, null.asInstanceOf[String], "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rep = CorpusDecade.replicate(spark, d, factor)
    assert(rep.filter(col("text").isNull).count() === factor)
    assert(rep.filter(col("text") === "").count() === 0)
  }

  test("decade corpus: x_pack_twophase stays byte-equal to c14 at 3x scale") {
    // the decade bench swaps c14's one-task-per-source window for the
    // two-phase form; equality must hold on the scaled corpus too
    val got = CorpusOps.x_packTwophase(spark, dir).collect().map(_.toSeq).toSeq
    val exp = CorpusOps.c14_packSequences(spark, dir).collect().map(_.toSeq).toSeq
    assert(got === exp)
  }

  test("decade events: F replicas, replica 0 byte-equal, id spaces disjoint, s5-twin output is F shifted copies") {
    val d = s"${Tables.scratch}/decade_spec_events_x$factor"
    Tables.rmrf(d)
    CorpusDecade.replicateEvents(spark, sf0001, factor)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val ids = Tables.events(spark, sf0001)
      .agg(max(col("event_id")), max(col("user_id"))).head()
    val eStride = ids.getLong(0) + 1
    val uStride = ids.getLong(1) + 1
    val src = Tables.events(spark, sf0001)
    val rep = Tables.events(spark, d)
    assert(rep.count() === factor * src.count())
    // replica 0 is the source log verbatim; non-null ids never collide
    assert(rep.filter(col("event_id") < eStride || col("event_id").isNull)
      .exceptAll(src).count() === 0)
    assert(rep.filter(col("event_id").isNotNull)
      .groupBy(col("event_id")).count().filter(col("count") > 1).count() === 0)
    // nulls replicate as nulls (the shift must not resurrect them)
    assert(rep.filter(col("user_id").isNull).count() ===
      factor * src.filter(col("user_id").isNull).count())
    // the s5 batch twin (purchase⋈view interval join) on the replicated
    // log is exactly F shifted copies of the source's — no cross-replica
    // matches, the linearity the streaming ladder measurement rests on
    def twin(dd: String) = Tables.events(spark, dd)
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("event_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    def joined(dd: String) = {
      val p = twin(dd).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      val v = twin(dd).filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("v_id"))
      p.join(v, col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") && col("v_ts") <= col("p_ts"))
        .select(col("p_id"), col("v_id"))
    }
    val srcJ = joined(sf0001)
    val repJ = joined(d)
    val expected = srcJ.crossJoin(spark.range(factor).toDF("r"))
      .select((col("p_id") + col("r") * eStride).as("p_id"),
        (col("v_id") + col("r") * eStride).as("v_id"))
    assert(repJ.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(repJ).count() === 0)
  }

  test("decade events: b26b counters are EXACTLY F× the source's — the density axis is linear in the aggregates") {
    // replicas share the time span (the density axis), so every hour
    // bucket holds exactly F× the signups and purchases; because b26b's
    // decayed sums are integer-linear in the hour-grain counts, the
    // whole output must equal the source's with all three counters
    // scaled by exactly F — the correctness half of the (af) ladder:
    // density growth changes magnitudes, never structure.
    val d = s"${Tables.scratch}/decade_spec_events_x$factor"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/events.parquet"))) {
      Tables.rmrf(d)
      CorpusDecade.replicateEvents(spark, sf0001, factor)
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val src = graft.ops.RangeJoin.b26b_attributionCounters(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val rep = graft.ops.RangeJoin.b26b_attributionCounters(spark, d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rep.keySet === src.keySet, "hour buckets must be identical")
    src.foreach { case (h, (n, wp, wc)) =>
      assert(rep(h) === ((n * factor, wp * factor, wc * factor)),
        s"hour $h counters must scale by exactly F=$factor")
    }
  }

  test("decade embeddings: F replicas, replica 0 byte-equal, probes stay replica-0-only") {
    val rep = CorpusDecade.replicateEmbeddings(spark, sf0001, factor)
    val src = Tables.embeddings(spark, sf0001)
    val stride = src.agg(max(col("vec_id"))).head.getLong(0) + 1
    assert(rep.count() === factor * src.count())
    // replica 0 is the source table verbatim; ids never collide
    assert(rep.filter(col("vec_id") < stride).exceptAll(src).count() === 0)
    assert(rep.groupBy(col("vec_id")).count().filter(col("count") > 1).count() === 0)
    // the probe set (vec_id < 20) is exactly the source's — every
    // ladder step searches the SAME queries against an F× corpus
    assert(rep.filter(col("vec_id") < 20).exceptAll(src.filter(col("vec_id") < 20))
      .count() === 0)
    assert(rep.filter(col("vec_id") < 20).count() === src.filter(col("vec_id") < 20).count())
  }

  test("decade corpus: cluster count scales by exactly F, no cross-replica members") {
    val srcClusters = TextOps.c15_dedupClusters(spark, sf0001)
    val repClusters = TextOps.c15_dedupClusters(spark, dir)
    assert(repClusters.count() === factor * srcClusters.count())
    // every member's replica (id div stride) equals its cluster's —
    // a cross-replica edge would merge labels across the boundary
    assert(repClusters
      .filter(col("doc_id").divide(stride).cast("long") =!=
        col("cluster_id").divide(stride).cast("long"))
      .count() === 0)
  }
}
