package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each operator group registers its own (queries, oracles) pair; this
  * object only concatenates them.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference pipeline (A14): envelope → gated numeric rewrite
    * → required-field validation → fixed-order projection.
    */
  def entry(spark: SparkSession): DataFrame =
    Ingest.a14_pipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Ingest.queries ++ Sources.queries ++ Features.queries ++ Relational.queries ++
      Extras.queries ++ RangeJoin.queries ++ BloomJoin.queries ++
      CorpusOps.queries ++ TextOps.queries ++ BpeTrain.queries ++
      VectorOps.queries ++ Simhash.queries ++ TextQuality.queries ++
      Multimodal.queries ++ RetentionAudit.queries ++
      graft.streaming.StreamOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Ingest.oracles ++ Sources.oracles ++ Features.oracles ++ Relational.oracles ++
      Extras.oracles ++ RangeJoin.oracles ++ BloomJoin.oracles ++
      CorpusOps.oracles ++ TextOps.oracles ++ BpeTrain.oracles ++
      VectorOps.oracles ++ Simhash.oracles ++ TextQuality.oracles ++
      Multimodal.oracles ++ RetentionAudit.oracles ++
      graft.streaming.StreamOps.oracles
}
