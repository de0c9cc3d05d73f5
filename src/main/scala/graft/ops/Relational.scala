package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Part-B relational core (SURVEY.md §2B): join suite, top-k, set ops,
  * scalar-function suite, and the TPC-H-Q1-shaped bench workhorse.
  *
  * Determinism rules shared with every oracle in this repo:
  *  - money/measure aggregates go through DECIMAL(18,2) so Spark and
  *    DuckDB both sum exactly and cast to the identical double;
  *  - derived integers are cast to BIGINT on both sides;
  *  - every output carries a total-order ORDER BY.
  *
  * Scale notes (100 TB): b12 is a single hash-aggregate with map-side
  * partials over a pruned parquet scan (only 7 of 11 lineitem columns
  * read, shipdate filter pushed down). b8's dimension joins broadcast
  * the small side; the theta join is a broadcast nested-loop of two
  * dimension tables (never fact×fact). b9 is TakeOrderedAndProject —
  * per-partition top-k then a k-row merge on the driver, no global sort.
  */
object Relational {

  /** b12: TPC-H Q1-shaped aggregation over lineitem. */
  def b12_tpchQ1(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        expr("CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"),
        expr("CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)").as("sum_base_price"),
        expr("""CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(3,2)) - TRY_CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)""")
          .as("sum_disc_price"),
        expr("""CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(3,2)) - TRY_CAST(l_discount AS DECIMAL(4,2))) *
                (CAST(1 AS DECIMAL(3,2)) + TRY_CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)""")
          .as("sum_charge"),
        expr("CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)").as("avg_qty"),
        expr("CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)").as("avg_price"),
        expr("CAST(SUM(TRY_CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*)").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** b8: join suite — each join flavor contributes one tagged count row.
    * Small dimensions are broadcast explicitly; the non-equi (theta)
    * join stays dimension×dimension so the nested loop is bounded.
    */
  def b8_joinSuite(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val s = Tables.supplier(spark, d)
    val n = Tables.nation(spark, d)
    val r = Tables.region(spark, d)
    val on = o("o_custkey") === c("c_custkey")
    def tag(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("cnt")).select(lit(name).as("join_kind"), col("cnt"))
    tag("01_inner", o.join(broadcast(c), on))
      .unionAll(tag("02_left_unmatched", c.join(o, on, "left").filter(o("o_orderkey").isNull)))
      .unionAll(tag("03_full", c.join(o, on, "full")))
      .unionAll(tag("04_semi", c.join(o, on, "left_semi")))
      .unionAll(tag("05_anti", c.join(o, on, "left_anti")))
      .unionAll(tag("06_cross", n.crossJoin(r)))
      .unionAll(tag("07_theta", s.join(broadcast(c), s("s_acctbal") < c("c_acctbal"))))
      .unionAll(tag("08_star4", o.join(broadcast(c), on)
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))))
      .orderBy(col("join_kind"))
  }

  /** b9: global top-k — planner picks TakeOrderedAndProject (no full sort). */
  def b9_sortTopk(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(25)

  /** b10: set operations over keyed projections, tagged per op. */
  def b10_setops(spark: SparkSession, d: String): DataFrame = {
    val buyers = Tables.orders(spark, d).select(col("o_custkey").as("k"))
    val rich = Tables.customer(spark, d)
      .filter(col("c_acctbal") > 5000).select(col("c_custkey").as("k"))
    def tag(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("op"), col("k"))
    tag("union", buyers.union(rich).distinct())
      .unionAll(tag("union_all", buyers.unionAll(rich)))
      .unionAll(tag("intersect", buyers.intersect(rich)))
      .unionAll(tag("except", rich.except(buyers)))
      .orderBy(col("op"), col("k"))
  }

  /** b11: scalar-function suite — string/date/math/array/map/json in one
    * wide, fully codegen'd projection over events.
    *
    * Dirty-data posture (EdgeCaseEventsSpec): double→long conversions
    * are try_cast ≡ oracle TRY_CAST (a NaN/Inf metric degrades to NULL,
    * never an ANSI abort), and the single-entry map is built only under
    * a non-null key (ANSI refuses null map keys).
    */
  def b11_scalarSuite(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d).select(
      col("event_id"),
      upper(col("event_type")).as("up"),
      concat(col("event_type"), lit("-"), col("user_id").cast("string")).as("tag"),
      substring(col("event_type"), 1, 3).as("sub3"),
      col("event_type").like("%ck%").as("is_ck"),
      to_date(col("ts")).as("day"),
      to_date(date_trunc("month", col("ts"))).as("mon"),
      year(col("ts")).cast("long").as("yr"),
      hour(col("ts")).cast("long").as("hr"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).cast("long").as("days_since"),
      round(col("value")).try_cast("long").as("v_round"),
      abs(col("value") - 100.0).as("v_absdev"),
      sqrt(col("value")).as("v_sqrt"),
      floor(col("value")).try_cast("long").as("v_floor"),
      ceil(col("value")).try_cast("long").as("v_ceil"),
      size(split(concat(col("event_type"), lit("-"), col("user_id").cast("string")), "-"))
        .cast("long").as("arr_n"),
      element_at(split(concat(col("event_type"), lit("-"), col("user_id").cast("string")), "-"), 1)
        .as("arr_first"),
      when(col("event_type").isNotNull,
        element_at(map(col("event_type"), col("value")), "click")).as("map_click"),
      get_json_object(col("props"), "$.k").try_cast("long").as("json_k"))
      .orderBy(col("event_id"))

  /** b13: TPC-H Q5-shaped star join — revenue per nation through
    * lineitem⋈orders⋈customer⋈nation⋈region with broadcast dimensions
    * (one fact-table scan, all dims broadcast; single final shuffle on
    * the 25-key group).
    */
  def b13_q5like(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        expr("""CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(3,2)) - TRY_CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)""")
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))

  /** b14: the SQL surface — CTE + window + join, executed via spark.sql
    * over registered views (top order per customer segment).
    */
  def b14_sqlCte(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("orders_v")
    Tables.customer(spark, d).createOrReplaceTempView("customer_v")
    spark.sql(
      """WITH ranked AS (
        |  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY c.c_mktsegment
        |                       ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
        |  FROM orders_v o JOIN customer_v c ON o.o_custkey = c.c_custkey)
        |SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 5
        |ORDER BY c_mktsegment, rn""".stripMargin)
  }

  /** b33: correlated-scalar-subquery DECORRELATION exemplar — the one
    * optimizer behavior in SURVEY §4's checklist without a dedicated
    * query until now: "orders above their own customer's average order
    * value", written in the natural correlated form
    * (`WHERE cents > (SELECT AVG(...) WHERE same customer)`). Executed
    * naively that is one aggregate re-run PER ROW; Catalyst's
    * RewriteCorrelatedScalarSubquery decorrelates it into ONE
    * per-customer aggregate joined back on the correlation key — the
    * plan a human would hand-write — and PlanSpec pins exactly that
    * (an Aggregate + equi-join on o_custkey, no nested loop, no
    * per-row re-scan). The oracle runs the IDENTICAL correlated SQL in
    * DuckDB, which decorrelates the same way.
    *
    * Determinism: cents are exact BIGINT (the b21 idiom on
    * o_totalprice); AVG over them is sum/count where every partial sum
    * stays below 2^53, so the double average is the same single IEEE
    * division on both engines, and the strict `>` excludes the
    * boundary identically. NULL custkey/totalprice degrade the same
    * way on both sides (empty correlated group → NULL avg → filtered).
    *
    * Scale (100 TB): after decorrelation this is one map-side-
    * combinable groupBy(custkey) over the slim (custkey, cents)
    * projection plus one equi-join of the fact against that
    * customer-sized aggregate — the same bill as a hand-written
    * avg-join. The correlated FORM costs nothing; that is the point.
    */
  def b33_decorrelate(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("orders_v")
    spark.sql(
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    TRY_CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders_v)
        |SELECT o_orderkey, o_custkey, cents
        |FROM o
        |WHERE cents > (SELECT CAST(AVG(o2.cents) AS DOUBLE)
        |               FROM o o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Salt fan-out for b31 — 16 shards per hot key. */
  val SaltBuckets = 16

  /** b31: two-phase SALTED equi-join — the manual skew-mitigation shape
    * for a fact⋈dim join where the dim is too big to broadcast and the
    * fact is hot-keyed (b15 is the same recipe for aggregation). The
    * fact side gets a deterministic salt from its own unique key; the
    * dim side is exploded ×[[SaltBuckets]], one replica per salt; the
    * equi-join runs on (key, salt), spreading each hot key over 16
    * reducers. Result ≡ the plain join — which is exactly what the
    * oracle runs. The join is HINTED sort-merge: at fixture scale AQE
    * would broadcast the small dim and the salt would demonstrate
    * nothing; the operator's contract is the both-sides-shuffle plan
    * (PlanSpec pins SMJ-on-(key,salt), no broadcast of the dim).
    *
    * Scale (100 TB): dim shuffle volume grows ×16 (the price of the
    * spread) but per-reducer fact volume for the hottest key drops
    * ×16; AQE's skew splitter solves the same problem adaptively when
    * its thresholds fire — this is the deterministic form for when
    * they don't (e.g. a single pathological key inside one partition).
    */
  def b31_saltedJoin(spark: SparkSession, d: String): DataFrame = {
    val fact = Tables.orders(spark, d)
      // coalesce: pmod(NULL, 16) is NULL, which matches NO dim salt —
      // a null-keyed fact row would silently vanish from the join even
      // though the join key is o_custkey, diverging from the plain-join
      // contract below. Null salts land in bucket 0 instead (the salt
      // only spreads load; ANY bucket is correct).
      .select(col("o_custkey"),
        coalesce(pmod(col("o_orderkey"), lit(SaltBuckets)), lit(0)).cast("int").as("salt"),
        Tables.cents(col("o_totalprice")).as("cents"))
    val dim = Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("d_salt", explode(expr(s"CAST(sequence(0, ${SaltBuckets - 1}) AS ARRAY<INT>)")))
    fact.join(dim.hint("merge"),
        col("o_custkey") === col("c_custkey") && col("salt") === col("d_salt"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        coalesce(sum(col("cents")), lit(0L)).as("rev_cents"))
      .orderBy(col("c_mktsegment"))
  }

  val oracles: Map[String, String] = Map(
    // the IDENTICAL correlated SQL (only the view name differs): both
    // engines must decorrelate it to the same aggregate+join result
    "b33_decorrelate" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    TRY_CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, cents
        |FROM o
        |WHERE cents > (SELECT CAST(AVG(o2.cents) AS DOUBLE)
        |               FROM o o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "b31_salted_join" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
         |  CAST(coalesce(SUM(${Tables.centsSqlOf("o_totalprice")}), 0) AS BIGINT) AS rev_cents
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "b13_q5like" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - TRY_CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "b14_sql_cte" ->
      """WITH ranked AS (
        |  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY c.c_mktsegment
        |                       ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
        |SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 5
        |ORDER BY c_mktsegment, rn""".stripMargin,
    "b12_tpch_q1like" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - TRY_CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - TRY_CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + TRY_CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(TRY_CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "b8_join_suite" ->
      """SELECT '01_inner' AS join_kind, COUNT(*) AS cnt FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |UNION ALL SELECT '02_left_unmatched', COUNT(*) FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL SELECT '03_full', COUNT(*) FROM customer c FULL JOIN orders o ON o.o_custkey = c.c_custkey
        |UNION ALL SELECT '04_semi', COUNT(*) FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL SELECT '05_anti', COUNT(*) FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL SELECT '06_cross', COUNT(*) FROM nation, region
        |UNION ALL SELECT '07_theta', COUNT(*) FROM supplier s JOIN customer c ON s.s_acctbal < c.c_acctbal
        |UNION ALL SELECT '08_star4', COUNT(*) FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey JOIN nation n ON c.c_nationkey = n.n_nationkey JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY join_kind""".stripMargin,
    "b9_sort_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "b10_setops" ->
      """WITH buyers AS (SELECT o_custkey AS k FROM orders),
        |rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        |SELECT 'union' AS op, k FROM (SELECT k FROM buyers UNION SELECT k FROM rich)
        |UNION ALL SELECT 'union_all', k FROM (SELECT k FROM buyers UNION ALL SELECT k FROM rich)
        |UNION ALL SELECT 'intersect', k FROM (SELECT k FROM buyers INTERSECT SELECT k FROM rich)
        |UNION ALL SELECT 'except', k FROM (SELECT k FROM rich EXCEPT SELECT k FROM buyers)
        |ORDER BY op, k""".stripMargin,
    "b11_scalar_suite" ->
      """SELECT event_id,
        |  upper(event_type) AS up,
        |  event_type || '-' || CAST(user_id AS VARCHAR) AS tag,
        |  substr(event_type, 1, 3) AS sub3,
        |  event_type LIKE '%ck%' AS is_ck,
        |  CAST(ts AS DATE) AS day,
        |  CAST(date_trunc('month', ts) AS DATE) AS mon,
        |  CAST(EXTRACT(year FROM ts) AS BIGINT) AS yr,
        |  CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
        |  CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS days_since,
        |  TRY_CAST(ROUND(value) AS BIGINT) AS v_round,
        |  ABS(value - 100.0) AS v_absdev,
        |  SQRT(value) AS v_sqrt,
        |  TRY_CAST(FLOOR(value) AS BIGINT) AS v_floor,
        |  TRY_CAST(CEIL(value) AS BIGINT) AS v_ceil,
        |  CAST(len(str_split(event_type || '-' || CAST(user_id AS VARCHAR), '-')) AS BIGINT) AS arr_n,
        |  str_split(event_type || '-' || CAST(user_id AS VARCHAR), '-')[1] AS arr_first,
        |  CASE WHEN event_type = 'click' THEN value END AS map_click,
        |  CASE WHEN json_valid(props) THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END AS json_k
        |FROM events ORDER BY event_id""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b8_join_suite"    -> b8_joinSuite _,
    "b9_sort_topk"     -> b9_sortTopk _,
    "b10_setops"       -> b10_setops _,
    "b11_scalar_suite" -> b11_scalarSuite _,
    "b12_tpch_q1like"  -> b12_tpchQ1 _,
    "b13_q5like"       -> b13_q5like _,
    "b14_sql_cte"      -> b14_sqlCte _,
    "b31_salted_join"  -> b31_saltedJoin _,
    "b33_decorrelate"  -> b33_decorrelate _,
  )
}
