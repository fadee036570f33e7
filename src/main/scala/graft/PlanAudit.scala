package graft


/** Dev utility: sweep every gate query's physical plan for scale red
  * flags (cartesian products, unexpected nested-loop joins), print a
  * one-line verdict per query. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(8, "graft-planaudit")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // materialize THIS df's plan so AQE finalizes it
        val plan = df.queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
          "SortMergeJoin" -> plan.contains("SortMergeJoin"),
          "noCodegen" -> !(plan.contains("WholeStageCodegen") || plan.contains("*("))
        ).collect { case (f, true) => f }
        println(s"[audit] $name: ${if (flags.isEmpty) "clean" else flags.mkString(",")}")
      } catch { case e: Throwable => println(s"[audit] $name: ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
