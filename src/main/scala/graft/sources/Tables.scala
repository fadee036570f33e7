package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet table loaders for the graft test corpus (TESTDATA.md / FIXTURES.md §B).
  *
  * The reference engine's only "source" is whole/ranged text-blob reads
  * (srics96/SDC_Mapreduce `src/util/blob.cpp:49-70`); Spark's file sources subsume
  * both (input splits = ranged reads, `spark.sql.files.maxPartitionBytes` = the
  * reference's shard planner `src/master/sharding.h:27-83`). We standardize on
  * parquet for the analytic tables and expose text in/out via [[graft.ops.Engine]].
  *
  * At 100 TB these same calls work unchanged against `s3a://`/`abfss://` paths:
  * the loaders are path-agnostic and columnar scans prune columns + push filters.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts normalization. The generator has shipped this column as
    * parquet TIMESTAMP(NANOS) (which Spark reads as long under
    * `spark.sql.legacy.parquet.nanosAsLong`) and as TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (which Spark reads as TIMESTAMP_NTZ). Both are
    * folded to plain TIMESTAMP here so every downstream `unix_micros`/
    * window/watermark call sees one type. All graft sessions pin
    * `spark.sql.session.timeZone=UTC`, so the NTZ→TZ cast is value-exact
    * and matches DuckDB's naive-timestamp reading of the same file. The
    * integer `div` on the nanos path matters: a double division would lose
    * precision above 2^53 ns (~mid-1970s). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Every table of the corpus, by name. */
  val All: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register the whole corpus as temp views so `spark.sql` works over it
    * directly — the engine's SQL text surface is then complete (any query a
    * DataFrame caller can run is also runnable as SQL against these names,
    * including the corrected `events.ts` timestamps). */
  def registerAll(s: SparkSession, d: String): Unit =
    All.foreach(n => (if (n == "events") events(s, d) else table(s, d, n))
      .createOrReplaceTempView(n))
}
