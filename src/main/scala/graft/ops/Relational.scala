package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Relational completion operators (SURVEY.md §2b 🔶/❌ rows, §7.2 step 3).
  *
  * The reference is a single-input MapReduce dataflow — joins, windows, set ops,
  * grouping sets and scalar functions all had to be hand-rolled by users inside
  * Python map/reduce scripts. Here each is a first-class declarative operator so
  * Catalyst can push filters to the parquet scan, prune columns, broadcast small
  * dimension tables, and keep the whole pipeline in whole-stage codegen.
  *
  * Oracle-parity note: sums over continuous DOUBLE columns are order-dependent
  * in IEEE arithmetic, so any money arithmetic is done in exact DECIMAL and only
  * cast to DOUBLE at the end — bit-identical to DuckDB regardless of partition
  * count or AQE decisions (the same plan property that makes results stable on a
  * 1000-executor cluster makes them match the oracle locally).
  */
object Relational {

  private val money = DecimalType(18, 2)
  private val rate  = DecimalType(4, 2)

  /** TPC-H Q1-style pricing summary: partial+final hash aggregation over the
    * fact table with exact decimal money math (SURVEY R1/R2 generalized). */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val price = col("l_extendedprice").cast(money)
    val disc  = col("l_discount").cast(rate)
    val tax   = col("l_tax").cast(rate)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
        sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (sum(price).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
}
