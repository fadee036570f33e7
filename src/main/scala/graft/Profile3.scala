package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev utility: stage-level timings inside repetitionStats.
  * Usage: runMain graft.Profile3 [sfDir] */
object Profile3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-profile3")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[p3] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)
    val a = docs.select(col("doc_id"), split(lower(col("text")), "\\s+").as("a"))
    t("tokenize only")(a.select(explode(col("a"))).count())
    val g2 = a.select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(a) - 2), i -> concat_ws(' ', slice(a, i + 1, 2)))")).as("g"))
    t("2gram explode")(g2.count())
    t("2gram counts")(g2.groupBy("doc_id", "g").count().count())
    val g2b = a.select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(a) - 2), i -> concat_ws(' ', a[i], a[i + 1]))")).as("g"))
    t("2gram explode noslice")(g2b.count())
    t("2gram counts noslice")(g2b.groupBy("doc_id", "g").count().count())
    val tagged = a.select(col("doc_id"), explode(concat(
      expr("transform(sequence(0, size(a) - 2), i -> struct(2 AS n, concat_ws(' ', slice(a, i + 1, 2)) AS g))"),
      expr("transform(sequence(0, size(a) - 3), i -> struct(3 AS n, concat_ws(' ', slice(a, i + 1, 3)) AS g))"))).as("c"))
    t("tagged explode")(tagged.count())
    t("tagged counts")(tagged.groupBy(col("doc_id"), col("c.n"), col("c.g")).count().count())
    val tagged2 = a.select(col("doc_id"), explode(concat(
      expr("CASE WHEN size(a) >= 2 THEN transform(sequence(0, size(a) - 2), i -> struct(2 AS n, concat_ws(' ', slice(a, i + 1, 2)) AS g)) ELSE CAST(array() AS array<struct<n: int, g: string>>) END"),
      expr("CASE WHEN size(a) >= 3 THEN transform(sequence(0, size(a) - 3), i -> struct(3 AS n, concat_ws(' ', slice(a, i + 1, 3)) AS g)) ELSE CAST(array() AS array<struct<n: int, g: string>>) END"))).as("c"))
    t("guarded tagged explode")(tagged2.count())
    t("guarded tagged toRdd")(tagged2.queryExecution.toRdd.count())
    val counts1 = tagged2.groupBy(col("doc_id"), col("c.n").as("n"), col("c.g").as("g"))
      .agg(count(lit(1)).as("c"))
    t("guarded counts toRdd")(counts1.queryExecution.toRdd.count())
    val counts2 = counts1.groupBy("doc_id").agg(
      sum(when(col("n") === 2, col("c"))).as("t2"),
      count(when(col("n") === 2, lit(1))).as("d2"),
      max(when(col("n") === 2, col("c"))).as("m2"),
      sum(when(col("n") === 3, col("c"))).as("t3"),
      count(when(col("n") === 3, lit(1))).as("d3"))
    t("second agg toRdd")(counts2.queryExecution.toRdd.count())
    t("full op")(graft.ops.TextAnalysis.repetitionStats(docs).queryExecution.toRdd.count())
    t("full op again")(graft.ops.TextAnalysis.repetitionStats(docs).queryExecution.toRdd.count())
    spark.stop()
  }
}
