package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt, "graft-bench")
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
    // stable alphabetical order so per-query timings compare across rounds;
    // each query runs SPARK_GRAFT_BENCH_RUNS times (default 2) and reports
    // the min — steady-state throughput, not one-time Janino/classload cost.
    // First-run (cold) timings are preserved under "cold".
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        // toRdd.count() executes the FULL physical plan (final projections,
        // sorts, formatting included); a DataFrame count() would let
        // Catalyst prune output-side work and under-measure the query
        val ok = try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val ok = times.forall(_._2)
      // drop this query's persisted intermediates before the next query:
      // without this, ~30 queries of cached dedup/similarity tables pile up
      // and later queries' timings become order- and memory-pressure-
      // sensitive (run N's steady time still reuses run N-1's caches, same
      // as before — the clear happens only between queries)
      spark.catalog.clearCache()
      (name, times.map(_._1).min, times.head._1, ok)
    }
    // failed queries are reported as -1 (a failure's elapsed time is not a
    // timing — recording it would masquerade as a speedup) and listed in
    // "errors" so regressions are loud in round-over-round comparison
    def jmap(f: ((String, Double, Double, Boolean)) => Double): String =
      results.map { case r @ (k, _, _, ok) => s"\"" + k + "\":" + (if (ok) f(r) else -1.0) }
        .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, _, true) => v }.sum
    // "value" is the steady-state total (min of N runs per query); the
    // explicit "total_cold" keeps the first-run map from being misread as
    // the steady number (r2 artifact confusion)
    val totalCold = results.collect { case (_, _, c, true) => c }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","total_cold":$totalCold,"queries":${jmap(_._2)},"cold":${jmap(_._3)},"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
