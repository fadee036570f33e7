package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted physical plans for plan-quality review
  * (pushdown, broadcast, codegen spans). Usage: runMain graft.PlanCheck [sfDir] [query...] */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "filter_project", "join_broadcast_segment", "q1_pricing_summary",
      "sim_neardup_embedding", "dedup_minhash_pairs", "mm_metadata")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
