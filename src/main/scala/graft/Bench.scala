package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/parquet-footer paths once so the first timed
    // query doesn't absorb session start-up cost (measured ~6 s of one-time
    // Jackson/from_json + legacy-nanos-read initialization otherwise).
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
      // .collect(), not .count() — count() would let Catalyst prune the
      // from_json away and skip the Jackson init this exists to absorb
      graft.sources.Tables.events(spark, sfDir)
        .limit(16).selectExpr("from_json(props, 'k INT') AS j").collect()
    } catch { case _: Throwable => () }
    // stable alphabetical order so per-query timings compare across rounds
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // failed queries are reported as -1 (a failure's elapsed time is not a
    // timing — recording it would masquerade as a speedup) and listed in
    // "errors" so regressions are loud in round-over-round comparison
    val qs = results.map { case (k, v, ok) => s"\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
