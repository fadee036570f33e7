package graft

import java.sql.Timestamp
import graft.ops.Relational

/** Expectation report: each check must COUNT its violations exactly (not
  * just flag), and a clean table passes everything — the crafted table
  * violates every check a known number of times. */
class ExpectationsSpec extends SparkTestBase {

  test("expectationReport counts each violation class exactly") {
    import spark.implicits._
    val ordTs = Timestamp.valueOf("1995-01-01 00:00:00")
    val orders = Seq(
      (1L, Option(10L), "O", 100.0),
      (1L, Option(10L), "F", 50.0),        // duplicate key
      (2L, None: Option[Long], "P", 10.0), // null custkey
      (3L, Option(99L), "X", -5.0),        // orphan + bad status + bad price
      (4L, Option(11L), "O", 0.0)          // price <= 0
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .withColumn("o_orderdate", org.apache.spark.sql.functions.lit(ordTs))
    val customer = Seq((10L, "a"), (11L, "b")).toDF("c_custkey", "c_name")
    val got = Relational.expectationReportOf(orders, customer)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getInt(3))).toMap
    assert(got === Map(
      "not_null_o_custkey" -> ((1L, 0)),
      "range_o_totalprice_positive" -> ((2L, 0)), // -5.0 and 0.0
      "accepted_values_o_orderstatus" -> ((1L, 0)),
      "unique_o_orderkey" -> ((1L, 0)),
      // the NULL-custkey row is also an orphan under anti-join (null
      // never equi-matches) — 2 orphans: doc'd 3VL behavior of the check
      "fk_orders_customer" -> ((2L, 0))))
    assert(got.values.forall(_._2 == 0))
  }

  test("expectationReport: the real corpus passes every contract") {
    val got = Relational.expectationReport(spark, sfDir).collect()
    assert(got.length == 5 && got.forall(_.getInt(3) == 1),
      s"contract violations on clean data: ${got.mkString(";")}")
  }
}
