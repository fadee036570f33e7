package graft

import org.apache.spark.sql.SparkSession

import graft.ops.Dedup
import graft.sources.Tables

/** Dev utility: stage-level timings for the heavy dedup operators.
  * Usage: runMain graft.Profile [sfDir] */
object Profile {
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
    t("shingles")(Dedup.shingles(docs).count())
    t("minHashSignatures")(Dedup.minHashSignatures(docs).count())
    t("minHashPairs")(Dedup.minHashPairs(docs).count())
    t("ngramJaccardPairs")(Dedup.ngramJaccardPairs(docs).count())
    t("simHash")(Dedup.simHash(docs).count())
    t("simHashPairs")(Dedup.simHashPairs(docs).count())
    spark.stop()
  }
}
