package graft

import org.apache.spark.sql.functions._

/** Dirty-events sweep — the ingest/feature twin of [[EdgeCaseSpec]].
  * The reference consumes arbitrary JSON off Kafka, so its Spark
  * re-expression must be total over exactly the records a real topic
  * carries: all-null envelopes, malformed JSON props, non-numeric and
  * overflowing payload values, NaN/Inf metrics, null timestamps and
  * users, unicode event types, duplicate event ids, pre-epoch clocks.
  * Every events-reading query (A-tier pipeline + sinks, the B-tier
  * feature ops, streaming twins) must run to completion; a handful of
  * cheap invariants pin the intended degradation (nulls, drops) rather
  * than aborts.
  */
class EdgeCaseEventsSpec extends SparkSpec {
  import spark.implicits._

  /** ts is written as int64 nanos, exactly the raw fixture layout
    * (Tables.events converts nanos→µs itself).
    */
  private lazy val dir: String = {
    val d = s"${graft.ops.Tables.scratch}/edgecase_events"
    graft.ops.Tables.rmrf(d)
    val us = 1704067200000000L // 2024-01-01 UTC in µs
    def ns(offSec: Long): java.lang.Long = (us + offSec * 1000000L) * 1000L
    val rows: Seq[(java.lang.Long, java.lang.Long, java.lang.Long, String, java.lang.Double, String)] = Seq(
      (null, null, null, null, null, null), // the all-null record
      (1L: java.lang.Long, ns(10), 1L: java.lang.Long, "purchase", 12.5: java.lang.Double, """{"k": 42}"""),
      (2L: java.lang.Long, ns(20), 1L: java.lang.Long, "view", -3.75: java.lang.Double, """{"k": "notanum"}"""),
      (3L: java.lang.Long, ns(30), 2L: java.lang.Long, "view", Double.NaN: java.lang.Double, "{not json"),
      (4L: java.lang.Long, ns(40), 2L: java.lang.Long, "weird🙂", Double.PositiveInfinity: java.lang.Double, """{"j": 1}"""),
      (5L: java.lang.Long, null, 3L: java.lang.Long, "purchase", 0.0: java.lang.Double, "null"),
      (6L: java.lang.Long, ns(60), null, "click", 1e18: java.lang.Double,
        """{"k": 123456789012345678901234567890}"""), // overflows BIGINT
      (7L: java.lang.Long, ns(60), 3L: java.lang.Long, "view", 2.0: java.lang.Double, """{"k": -1}"""),
      (8L: java.lang.Long, ns(70), 3L: java.lang.Long, "view", 3.0: java.lang.Double, """{"k": 7}"""),
      (8L: java.lang.Long, ns(80), 3L: java.lang.Long, "view", 4.0: java.lang.Double, """{"k": 8}"""), // dup id
      (9L: java.lang.Long, ns(-3600L * 24 * 365 * 60), 4L: java.lang.Long, "purchase",
        1.25: java.lang.Double, """{"k": 0}""")) // pre-epoch ts (1964)
    // stage events.parquet as a single FILE like the raw fixtures — the
    // layout the driver gate runs (the stream source handles directory
    // tables too, via the in-place branch; this spec exercises the
    // staged-link path the fixtures use)
    val tmp = s"$d/_tmp_events"
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$d/events.parquet"))
    graft.ops.Tables.rmrf(tmp)
    // s4 enriches against the static customer dim
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/customer.parquet"),
      java.nio.file.Paths.get(s"$d/customer.parquet"))
    d
  }

  /** Every query that reads only the events table. */
  private val eventQueries = Seq(
    "a1_scan_events", "a3_parse_json", "a5_filter_isin", "a6_regexp_extract",
    "a7_validate_notnull", "a8_project", "a9_partition_by_type",
    "a18_quarantine",
    "a12_sink_dwd", "a13_sink_jdbc", "a14_pipeline_e2e",
    "a15_json_roundtrip", "a16_csv_roundtrip", "a17_orc_roundtrip",
    "b1_agg_user_features", "b2_agg_distinct", "b3_groupsets_rollup",
    "b3b_cube", "b4_window_rank", "b5_window_frame", "b6_sessionize",
    "b7_asof_join", "x_asof_bucketed", "b11_scalar_suite", "b15_salted_agg",
    "b16_percentiles",
    "b21_decayed_features", "b22_feature_drift", "b23_funnel", "b24_retention",
    "b25_ltv_curve", "b26_range_join", "b26b_attribution_counters",
    "b28_unpivot", "b29_anomaly_zscore",
    "b30_scd2_history", "b32_snapshot_merge",
    "x_approx_percentiles", "x_hll_rollup",
    "b17_latest_features", "x_approx_distinct",
    "s1_stream_pipeline", "s2_stream_window", "s3_stream_sessionize",
    "s4_stream_join", "s5_stream_stream_join", "s6_stream_dedup",
    "s7_stream_quarantine", "s8_stream_hll_rollup")

  eventQueries.foreach { name =>
    test(s"$name survives the dirty event log") {
      val rows = SparkEntry.queries(name)(spark, dir).collect()
      assert(rows != null) // totality is the point; row counts may be 0
    }
  }

  /** Zero-event log with the real schema: quiet topic / first run. */
  private lazy val emptyDir: String = {
    val d = s"${graft.ops.Tables.scratch}/edgecase_empty_events"
    graft.ops.Tables.rmrf(d)
    val tmp = s"$d/_tmp_events"
    spark.read.parquet(s"$dir/events.parquet").limit(0)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$d/events.parquet"))
    graft.ops.Tables.rmrf(tmp)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/customer.parquet"),
      java.nio.file.Paths.get(s"$d/customer.parquet"))
    d
  }

  eventQueries.foreach { name =>
    test(s"$name returns empty from an empty event log") {
      assert(SparkEntry.queries(name)(spark, emptyDir).collect().isEmpty)
    }
  }

  test("a3 nulls unparseable k in BOTH forms instead of aborting the ingest") {
    val out = SparkEntry.queries("a3_parse_json")(spark, dir).collect()
      .filter(r => !r.isNullAt(r.fieldIndex("event_id")))
      .map(r => r.getAs[Long]("event_id") ->
        (r.isNullAt(r.fieldIndex("k")), r.isNullAt(r.fieldIndex("k_path")))).toMap
    assert(out(1L) === ((false, false)), "valid k parses in both forms")
    assert(out(2L) === ((true, true)), "non-numeric string k -> null, both forms")
    assert(out(3L) === ((true, true)), "malformed JSON -> null, both forms")
    assert(out(4L) === ((true, true)), "absent k -> null, both forms")
    assert(out(6L) === ((true, true)), "BIGINT overflow -> null, both forms")
  }

  test("a7 drops exactly the rows missing a required envelope field") {
    val out = SparkEntry.queries("a7_validate_notnull")(spark, dir).collect()
    val ids = out.map(_.getAs[String]("EventID").toLong).toSet
    // dropped: the all-null record; id 5 (null ts -> null EventTimestamp);
    // id 6 (null user -> null PlayerID). Location nulls (id % 97 == 0)
    // only hit the synthetic id 0 here, which is already the null record.
    assert(ids === Set(1L, 2L, 3L, 4L, 7L, 8L, 9L), s"unexpected survivors: $ids")
  }

  test("a6 extracts no numeric from a NaN-valued gated row, without aborting") {
    val out = SparkEntry.queries("a6_regexp_extract")(spark, dir).collect()
    val byId = out.filter(r => !r.isNullAt(r.fieldIndex("EventID")))
      .map(r => r.getAs[String]("EventID").toLong -> r).toMap
    // id 3 is a gated "view" whose details are "amount NaN usd" — the
    // numeric regex finds nothing and the extraction is null
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("extracted")))
    // id 1's "amount 12.50 usd" extracts 12.5
    assert(byId(1L).getAs[Float]("extracted") === 12.5f)
  }
}
