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
  )
}
