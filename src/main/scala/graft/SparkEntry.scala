package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions._

import graft.ops.{MapReduce, Relational, TextOps}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named entry in [[queries]];
  * each SQL-expressible one has matching DuckDB oracle SQL in [[oracleSql]] with
  * identical output column names (the driver sorts columns by name and hashes
  * values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's one real analytics workload: word count (SURVEY §7.1). */
  def entry(spark: SparkSession): DataFrame =
    TextOps.wordCount(Tables.documents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wordcount" -> ((s, d) => TextOps.wordCount(Tables.documents(s, d))),
    "tokens_per_doc" -> ((s, d) => TextOps.tokensPerDoc(Tables.documents(s, d))),
    "q1_pricing_summary" -> Relational.q1PricingSummary,
    // typed map/reduce surface (reference M1/R1/R2) — same oracle as wordcount
    "mapreduce_wordcount" -> ((s, d) => {
      import s.implicits._
      MapReduce.wordCountJob(Tables.documents(s, d).select("text").as[String])
        .toDF("word", "cnt").orderBy("word")
    }),
    // M3+M4: predicate filter + projection, pushed into the parquet scan
    "filter_project" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("lang") === "en" && col("n_chars") > lit(200))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")),
    // P1: hash-partition demo with a portable bucketing function
    "partition_hist" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(pmod(col("doc_id"), lit(8)).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")),
    // R3 + top-k: global sort with deterministic tiebreak, then limit
    "sort_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")),
    // distinct (absent in reference; trivial map/reduce job there)
    "distinct_flags" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")),
    // joins — all absent in the reference (single-input dataflow)
    "join_broadcast_segment" -> Relational.revenueBySegment,
    "join_multi_region" -> Relational.acctbalByRegion,
    "join_semi_customers" -> Relational.customersWithOrders,
    "join_anti_customers" -> Relational.customersWithoutOrders,
    "join_asof_last_order" -> Relational.lastOrderAsOfEvent,
    "join_range_event_pairs" -> Relational.eventPairsWithinHour,
    // window functions
    "window_top3_orders" -> Relational.top3OrdersPerCustomer,
    "window_running_qty" -> Relational.runningQtyPerSupplier,
    "window_moving_avg" -> Relational.movingAvgEventValue,
    // multi-dimensional aggregation
    "rollup_flag_status" -> Relational.rollupFlagStatus,
    "cube_status_priority" -> Relational.cubeStatusPriority,
    "grouping_sets_docs" -> Relational.groupingSetsDocs,
    // set operations
    "setops_custkeys" -> Relational.setOpsCustkeys,
    // scalar / temporal / JSON function surface
    "scalar_sampler" -> Relational.scalarSampler,
    "json_extract_events" -> Relational.jsonExtractEvents,
    "orders_per_month" -> Relational.ordersPerMonth,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "wordcount" ->
      """SELECT w AS word, count(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS w FROM documents)
        |WHERE regexp_matches(w, '^[A-Za-z0-9]+$')
        |GROUP BY w ORDER BY w""".stripMargin,
    "tokens_per_doc" ->
      """SELECT doc_id, count(*) AS n_tokens
        |FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS w FROM documents)
        |WHERE regexp_matches(w, '^[A-Za-z0-9]+$')
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  sum(l_quantity) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "mapreduce_wordcount" ->
      """SELECT w AS word, count(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS w FROM documents)
        |WHERE regexp_matches(w, '^[A-Za-z0-9]+$')
        |GROUP BY w ORDER BY w""".stripMargin,
    "filter_project" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE lang = 'en' AND n_chars > 200 ORDER BY doc_id""".stripMargin,
    "partition_hist" ->
      "SELECT doc_id % 8 AS bucket, count(*) AS cnt FROM documents GROUP BY 1 ORDER BY 1",
    "sort_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "distinct_flags" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "join_broadcast_segment" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_multi_region" ->
      """SELECT r_name,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
        |  count(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "join_semi_customers" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti_customers" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_asof_last_order" ->
      """SELECT event_id, max(o.o_orderdate) AS last_order_date
        |FROM events e JOIN orders o
        |  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |GROUP BY event_id ORDER BY event_id""".stripMargin,
    "join_range_event_pairs" ->
      """SELECT e1.user_id, count(*) AS n_pairs
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id AND e1.event_id < e2.event_id
        |  AND abs(date_diff('second', e1.ts, e2.ts)) <= 3600
        |GROUP BY e1.user_id ORDER BY e1.user_id""".stripMargin,
    "window_top3_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "window_running_qty" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "window_moving_avg" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / count(*) OVER w AS mavg_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "rollup_flag_status" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "cube_status_priority" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "grouping_sets_docs" ->
      """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
        |  count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY GROUPING SETS ((lang), (source))
        |ORDER BY lang, source""".stripMargin,
    "setops_custkeys" ->
      """SELECT k FROM (
        |  SELECT k FROM (
        |    SELECT k FROM (
        |      SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
        |      UNION
        |      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
        |    EXCEPT
        |    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY')
        |  INTERSECT
        |  SELECT o_custkey AS k FROM orders)
        |ORDER BY k""".stripMargin,
    "scalar_sampler" ->
      """SELECT o_orderkey,
        |  upper(o_orderpriority) AS prio_upper,
        |  substring(o_orderpriority, 1, 1) AS prio_code,
        |  CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(month(o_orderdate) AS BIGINT) AS o_month,
        |  CAST(day(o_orderdate) AS BIGINT) AS o_day,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k,
        |  sqrt(o_totalprice) AS price_sqrt,
        |  abs(o_totalprice * -1) AS price_abs
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "json_extract_events" ->
      """SELECT event_type,
        |  CAST(CAST(json_extract_string(props, '$.k') AS INT) % 10 AS BIGINT) AS k_mod,
        |  count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "orders_per_month" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
