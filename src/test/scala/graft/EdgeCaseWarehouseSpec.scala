package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dirty-warehouse sweep — the relational third of the totality matrix
  * (EdgeCaseSpec: corpus; EdgeCaseEventsSpec: event log). Each TPC-H-ish
  * table is rebuilt from a slice of the real fixture plus poisoned
  * rows: every double column takes NaN/±Inf/1e18 in turn, and every
  * column takes NULL in turn (null join keys, null dates, null money).
  * The B-tier relational queries must run to completion — the decimal
  * conversions degrade to NULL (TRY_CAST) and ratio denominators are
  * NULLIF-guarded rather than ANSI-aborting on one bad row.
  */
class EdgeCaseWarehouseSpec extends SparkSpec {

  private val tables = Seq(
    "lineitem", "orders", "customer", "part", "supplier", "nation", "region")

  /** Real slice + one row per (double column × poison value) + one row
    * per column nulled — schemas identical to the fixture's.
    */
  private def poisoned(name: String): DataFrame = {
    val src = spark.read.parquet(s"$sf0001/$name.parquet")
    val one = src.limit(1)
    val doubles = src.schema.fields.filter(_.dataType == DoubleType).map(_.name)
    val poisons = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, 1e18)
    val mutated = doubles.toSeq.flatMap(c => poisons.map(p => one.withColumn(c, lit(p))))
    val nulled = src.schema.fields.toSeq.map(f =>
      one.withColumn(f.name, lit(null).cast(f.dataType)))
    (Seq(src.limit(20)) ++ mutated ++ nulled).reduce(_ unionByName _)
  }

  private lazy val dir: String = {
    val d = s"${graft.ops.Tables.scratch}/edgecase_warehouse"
    graft.ops.Tables.rmrf(d)
    tables.foreach(t =>
      poisoned(t).coalesce(1).write.mode("overwrite").parquet(s"$d/$t.parquet"))
    d
  }

  private val warehouseQueries = Seq(
    "b8_join_suite", "b9_sort_topk", "b10_setops", "b12_tpch_q1like",
    "b13_q5like", "b14_sql_cte", "b18_q3like", "b19_bucketed_join",
    "b20_q14like", "b27_bloom_join", "b31_salted_join", "b33_decorrelate")

  warehouseQueries.foreach { name =>
    test(s"$name survives the poisoned warehouse") {
      val rows = SparkEntry.queries(name)(spark, dir).collect()
      assert(rows != null) // totality is the point; row counts may be 0
    }
  }

  test("b31 equals the plain join on the poisoned warehouse (null o_orderkey keeps its bucket)") {
    // the fixture nulls o_orderkey in one row: pmod(NULL, 16) is NULL,
    // and before the coalesce-to-bucket-0 fix that row silently vanished
    // from the salted join even though its o_custkey matched — this pin
    // is the divergence-vs-plain-join check, not just totality
    val plain = graft.ops.Tables.orders(spark, dir)
      .join(graft.ops.Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        coalesce(sum(graft.ops.Tables.cents(col("o_totalprice"))), lit(0L)).as("rev_cents"))
      .orderBy(col("c_mktsegment"))
      .collect().toSeq
    val salted = graft.ops.Relational.b31_saltedJoin(spark, dir).collect().toSeq
    assert(salted === plain)
  }

  test("b12 aggregates degrade poisoned measures to NULL, keeping clean groups") {
    val out = SparkEntry.queries("b12_tpch_q1like")(spark, dir).collect()
    assert(out.nonEmpty)
    // count_order always materializes even where the sums went NULL
    out.foreach(r => assert(r.getAs[Long]("count_order") >= 1L))
  }
}
