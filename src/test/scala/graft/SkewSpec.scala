package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.sources.Tables

class SkewSpec extends SparkTestBase {

  test("saltedJoin returns exactly the plain join's result multiset") {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
    val plain = o.join(c, col("o_custkey") === col("c_custkey"))
      .orderBy("o_orderkey").collect()
    val salted = Skew.saltedJoin(o, c, "o_custkey", "c_custkey", salt = 8)
      .select(o.columns.map(col) ++ c.columns.map(col): _*)
      .orderBy("o_orderkey").collect()
    assert(salted.toSeq === plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("saltedJoin spreads a hot key across salt buckets") {
    import spark.implicits._
    // pathological input: one key carries 10k rows
    val big = (1 to 10000).map(i => (42L, i)).toDF("k", "payload")
    val small = Seq((42L, "hot")).toDF("k2", "tag")
    val out = Skew.saltedJoin(big, small, "k", "k2", salt = 8)
    assert(out.count() === 10000)
    // the salt really fans identical hot-key rows out before the join
    // (a content hash would put all 10k identical rows in ONE bucket):
    val saltCards = big.withColumn("_s",
      pmod(monotonically_increasing_id(), lit(8L)))
      .groupBy("_s").count().collect()
    assert(saltCards.length === 8, "hot key rows spread over all 8 salt buckets")
  }
}
