package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade-scale profile of the semantic-dedup pair stages: the exact
  * x_semantic_dedup (c7's blocked all-pairs scan, O(n²) work) against
  * x_semantic_ann (IVF-cell-bucketed candidates, O(n) work by the
  * cell-target sizing). Run over [[CorpusDecade]] outputs so the
  * embeddings table grows by integer factors of sf0.1 while the
  * near-dup structure stays a shifted replica of the source
  * (replicateEmbeddings: values unchanged, ids disjoint).
  *
  * Per dataset it reports, as one readable line each:
  *   - n vectors;
  *   - the ANN candidate census: Σ_cell m_c·(m_c−1)/2 over the probed
  *     cell assignments (m_c = vectors probing cell c) — the pair
  *     count the cell equi-join feeds the verifier, to be read against
  *     c7's n·(n−1)/2;
  *   - wall seconds + output rows for x_semantic_ann;
  *   - wall seconds + output rows for x_semantic_dedup (skippable via
  *     EXACT_MAX_N once the quadratic cost stops being worth the
  *     measurement).
  *
  * Usage: runMain graft.tools.ProfileSemantic <dir> [dir ...]
  * (do not run concurrently with Bench — two local[32] JVMs
  * oversubscribe the box and contaminate both measurements)
  */
object ProfileSemantic {

  private val ExactMaxN = sys.env.getOrElse("EXACT_MAX_N", "25000").toLong

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileSemantic <dir> [dir ...]")
    val spark = ToolSession.session()


    for (d <- args) {
      val emb = graft.ops.Tables.embeddings(spark, d)
      val n = emb.count()
      // the candidate census x_semantic_ann's sizing promises: same k,
      // same trainer, same nprobe as the registered query
      val k = math.max(graft.ops.VectorOps.SemAnnMinCells,
        math.min(graft.ops.VectorOps.SemAnnMaxCells,
          (graft.ops.VectorOps.SemAnnCellsPerSqrtN * math.sqrt(n.toDouble)).toLong)).toInt
      val cents = graft.ops.Extras.ivfCentroidsK(spark, emb, k, seedByLabel = false,
        trainCap = math.max(1024, 16 * k),
        lloydIters = graft.ops.VectorOps.SemAnnLloydIters)
      val cand = emb
        .select(explode(graft.ops.Extras.topCellsCol(cents,
          graft.ops.VectorOps.SemAnnNprobe)).as("cell"))
        .groupBy(col("cell")).agg(count(lit(1)).as("m"))
        .agg(sum(expr("m * (m - 1) / 2")).as("cand"))
        .head().getAs[Any]("cand")
      val exactPairs = n * (n - 1) / 2
      // collect the id column once per operator and derive BOTH the
      // row count and the membership set from it — re-running the
      // queries for the recall (the exact arm is the O(n²) pass
      // ExactMaxN exists to bound) doubled the profiler's most
      // expensive section (round-16 review)
      val (annIds, annSec) = ToolSession.timed(
        graft.ops.VectorOps.x_semanticAnn(spark, d)
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet)
      val annRows = annIds.size
      println(f"[semantic] $d n=$n k=$k candidates=$cand exact_pairs=$exactPairs " +
        f"ann_sec=$annSec%.2f ann_rows=$annRows")
      if (n <= ExactMaxN) {
        val (exactIds, exSec) = ToolSession.timed(
          graft.ops.VectorOps.x_semanticDedup(spark, d)
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet)
        val exRows = exactIds.size
        // membership recall, the TextVectorSpec definition: clustered
        // ids the ANN run keeps ∩ the exact run's — NOT a row-count
        // ratio, which can exceed 1 when component shapes differ
        // (round-15 ADVICE)
        val recall =
          if (exactIds.isEmpty) 1.0
          else annIds.intersect(exactIds).size.toDouble / exactIds.size
        println(f"[semantic] $d exact_sec=$exSec%.2f exact_rows=$exRows " +
          f"rows_ratio=${if (exRows == 0) 1.0 else annRows.toDouble / exRows}%.4f " +
          f"membership_recall=$recall%.4f")
        // the INGEST form (x_semantic_incremental): first invocation
        // pays the standing-state build (codebooks + posting fan-out +
        // the exact backfill over the base half — the batch operator's
        // own cost, paid ONCE); the second invocation is the memo-warm
        // DAILY marginal cost a production cadence actually recurs.
        // Identity vs the exact batch answer asserted here end-to-end.
        val (inc1Ids, inc1Sec) = ToolSession.timed(
          graft.ops.VectorOps.x_semanticIncremental(spark, d)
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet)
        val (inc2Ids, inc2Sec) = ToolSession.timed(
          graft.ops.VectorOps.x_semanticIncremental(spark, d)
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet)
        require(inc1Ids == exactIds && inc2Ids == exactIds,
          s"incremental identity broken vs exact batch at $d")
        println(f"[semantic] $d inc_first_sec=$inc1Sec%.2f " +
          f"inc_day_sec=$inc2Sec%.2f exact_sec=$exSec%.2f " +
          f"day_vs_exact=${inc2Sec / math.max(exSec, 1e-9)}%.3f")
      }
    }
    spark.stop()
  }
}
