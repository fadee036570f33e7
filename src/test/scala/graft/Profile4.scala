package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.CrossHash
import graft.ops.TextAnalysis
import graft.sources.Tables

/** Dev utility: stage-level timings for the hashEmbed featurizer.
  * Usage: runMain graft.Profile4 [sfDir] */
object Profile4 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup

    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)
    val alnum = expr("filter(split(lower(text), '\\\\s+'), t -> t rlike '^[a-z0-9]+$')")

    for (r <- 1 to 2) {
      t(s"token explode only r$r")(
        docs.select(col("doc_id"), explode_outer(alnum).as("tok"))
          .queryExecution.toRdd.count())
      t(s"explode + 1 md5 r$r")(
        docs.select(col("doc_id"), explode_outer(alnum).as("tok"))
          .select(col("doc_id"),
            pmod(CrossHash.h60(concat(lit("he:"), col("tok"))), lit(64L)).as("idx"))
          .queryExecution.toRdd.count())
      t(s"explode + 2 md5 r$r")(
        docs.select(col("doc_id"), explode_outer(alnum).as("tok"))
          .select(col("doc_id"),
            pmod(CrossHash.h60(concat(lit("he:"), col("tok"))), lit(64L)).as("idx"),
            pmod(CrossHash.h60(concat(lit("hs:"), col("tok"))), lit(2L)).as("sgn"))
          .queryExecution.toRdd.count())
      t(s"voted agg r$r")(
        docs.select(col("doc_id"), explode_outer(alnum).as("tok"))
          .groupBy(col("doc_id"),
            pmod(CrossHash.h60(concat(lit("he:"), col("tok"))), lit(64L)).as("idx"))
          .agg(sum(when(
            pmod(CrossHash.h60(concat(lit("hs:"), col("tok"))), lit(2L)) === 0, 1L)
            .otherwise(-1L)).as("v"))
          .queryExecution.toRdd.count())
      t(s"full hashEmbed r$r")(
        TextAnalysis.hashEmbed(docs).queryExecution.toRdd.count())
      t(s"gate long form r$r")(
        SparkEntry.queries("ta_hash_embed")(spark, sfDir)
          .queryExecution.toRdd.count())
      t(s"sort-then-explode r$r")(
        TextAnalysis.hashEmbed(docs)
          .orderBy("doc_id")
          .select(col("doc_id"), posexplode(col("embedding")).as(Seq("dim_idx", "weight")))
          .select(col("doc_id"), col("dim_idx").cast("long").as("dim_idx"), col("weight"))
          .queryExecution.toRdd.count())
      t(s"explode-no-sort r$r")(
        TextAnalysis.hashEmbed(docs)
          .select(col("doc_id"), posexplode(col("embedding")).as(Seq("dim_idx", "weight")))
          .select(col("doc_id"), col("dim_idx").cast("long").as("dim_idx"), col("weight"))
          .queryExecution.toRdd.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
