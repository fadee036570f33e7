package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Map-typed column surface (SURVEY §2b scalar-functions row): built from
  * corpus data, exercised at unit level — map cells round-trip through
  * parquet but compare unreliably through the pandas oracle path, so this
  * stays out of the driver gate by design. */
class MapFunctionsSpec extends SparkTestBase {

  test("map build / lookup / keys / explode round-trip") {
    val m = Tables.documents(spark, sfDir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"))
      .agg(map_from_arrays(collect_list(col("lang")), collect_list(col("n"))).as("by_lang"))
      .cache()
    val row = m.select(
      map_keys(col("by_lang")).as("ks"),
      element_at(col("by_lang"), "en").as("n_en"),
      size(col("by_lang")).as("n_entries")).collect()(0)
    val enCount = Tables.documents(spark, sfDir).filter(col("lang") === "en").count()
    assert(row.getAs[Long]("n_en") === enCount)
    assert(row.getAs[Seq[String]]("ks").toSet ===
      Tables.documents(spark, sfDir).select("lang").distinct()
        .collect().map(_.getString(0)).toSet)
    // explode back to rows: total count is preserved
    val total = m.select(explode(col("by_lang")).as(Seq("k", "v")))
      .agg(sum("v")).collect()(0).getLong(0)
    assert(total === Tables.documents(spark, sfDir).count())
  }

  test("map_filter / transform_values lambdas") {
    import spark.implicits._
    val df = Seq((1, Map("a" -> 1L, "b" -> 10L, "c" -> 100L))).toDF("id", "m")
    val out = df.select(
      expr("map_filter(m, (k, v) -> v >= 10)").as("big"),
      expr("transform_values(m, (k, v) -> v * 2)").as("doubled"))
      .collect()(0)
    assert(out.getAs[Map[String, Long]]("big") === Map("b" -> 10L, "c" -> 100L))
    assert(out.getAs[Map[String, Long]]("doubled") === Map("a" -> 2L, "b" -> 20L, "c" -> 200L))
  }
}
