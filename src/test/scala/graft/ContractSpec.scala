package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._
import graft.streaming.StreamOps

/** Driver-contract consistency pins. SparkEntry assembles its maps by
  * `++` over eleven per-module maps — which silently OVERWRITES on a
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
    "TextOps" -> TextOps.queries, "VectorOps" -> VectorOps.queries,
    "Simhash" -> Simhash.queries, "TextQuality" -> TextQuality.queries,
    "Multimodal" -> Multimodal.queries, "StreamOps" -> StreamOps.queries)

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

  test("the rows-only set is exactly the nine declared x_* variants") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set("x_approx_distinct", "x_minhash_lsh", "x_ann_lsh",
      "x_ann_ivf", "x_label_centroids", "x_stratified_prefilter",
      "x_corpus_from_clusters", "x_asof_bucketed", "x_pack_twophase"),
      "a query lost its oracle (or a new one shipped without one): " + rowsOnly)
  }

  test("the inventory holds all 80 SURVEY §2 queries") {
    assert(SparkEntry.queries.size === 80)
    assert(SparkEntry.oracleSql.size === 71)
  }
}
