package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational
import graft.sources.Tables

/** Fuzzy string self-join: prefix-filtered candidate generation must be
  * COMPLETE against brute force (the gate's oracle is the quadratic scan,
  * so completeness is the whole claim), and the crafted cases pin the
  * boundary: distance exactly maxDist kept, maxDist+1 dropped, dist 0
  * (exact duplicates) kept. */
class FuzzyJoinSpec extends SparkTestBase {

  test("fuzzyJoinPairs: crafted substitution pairs at the distance boundary") {
    import spark.implicits._
    // equal-length strings (the completeness contract's domain):
    // a-b dist 1, a-c dist 2 (excluded at maxDist=1), d-e dist 0 (dups),
    // f unrelated
    val df = Seq(
      (1L, "ACCT-00417-X"), (2L, "ACCT-00418-X"), (3L, "ACCT-00428-X"),
      (4L, "ACCT-99999-Z"), (5L, "ACCT-99999-Z"), (6L, "XXXX-55555-Q")
    ).toDF("id", "s")
    val got = Relational.fuzzyJoinPairs(df, "id", "s", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 1L), (2L, 3L, 1L), (4L, 5L, 0L)),
      s"boundary pairs wrong: $got")
  }

  test("fuzzyJoinPairs: complete vs brute force on the sf0.001 customer names") {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val brute = cust.as("a")
      .join(broadcast(cust.as("b")), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.s"), col("b.s")).cast("long").as("dist"))
      .filter(col("dist") <= 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Relational.fuzzyJoinPairs(Tables.customer(spark, sfDir),
        "c_custkey", "c_name", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "degenerate corpus: brute force found no pairs")
    assert(got === brute,
      s"prefix filter incomplete: missing ${(brute -- got).take(5)}, " +
        s"extra ${(got -- brute).take(5)}")
  }

  test("fuzzyJoinPairs maxDist=2: the prefix-filter path matches brute force") {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val brute = cust.as("a")
      .join(broadcast(cust.as("b")), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.s"), col("b.s")).cast("long").as("dist"))
      .filter(col("dist") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Relational.fuzzyJoinPairs(Tables.customer(spark, sfDir),
        "c_custkey", "c_name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.exists(_._3 == 2L), "no dist-2 pair in the corpus")
    assert(got === brute, s"prefix filter (maxDist=2) diverged: " +
      s"missing ${(brute -- got).take(5)}, extra ${(got -- brute).take(5)}")
  }

  test("fuzzyJoinIndexed: masked-key probe complete; append == one-shot") {
    import spark.implicits._
    val master = Seq((1L, "ACCT-00417-X"), (2L, "ACCT-99999-Z"))
      .toDF("id", "s")
    val late = Seq((3L, "QRST-12345-M")).toDF("id", "s")
    // probe 10 substitutes an UNSEEN char: its rarest grams include
    // df=0 grams — completeness must survive (at most maxDist*n unseen
    // grams exist, the prefix keeps maxDist*n+1)
    val probe = Seq((10L, "ACCT-Z0417-X"), (11L, "BCCT-99999-Z"),
      (12L, "QRST-12345-W"), (13L, "XXXX-XXXXX-X")).toDF("id", "s")
    Relational.buildFuzzyIndex(master, "id", "s", "graft_fuzzy_test")
    Relational.appendToFuzzyIndex(late, "id", "s", "graft_fuzzy_test")
    val got = Relational.fuzzyJoinIndexed(spark, probe, "id", "s", "graft_fuzzy_test")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((10L, 1L, 1L), (11L, 2L, 1L), (12L, 3L, 1L)),
      s"indexed probe wrong: $got")
    // one-shot rebuild over the union finds the same verified pairs
    Relational.buildFuzzyIndex(master.union(late), "id", "s", "graft_fuzzy_test2")
    val oneShot = Relational.fuzzyJoinIndexed(spark, probe, "id", "s", "graft_fuzzy_test2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(oneShot === got, "append diverged from one-shot")
  }
}
