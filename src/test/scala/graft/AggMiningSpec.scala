package graft

import graft.ops.Relational

/** Co-purchase mining semantics: a part repeated within one order counts
  * that order ONCE, pairs are unordered (emitted once, low key first),
  * and the support threshold is per-ORDER count. */
class AggMiningSpec extends SparkTestBase {

  test("coPurchasePairsOf: per-order dedup, unordered pairs, support cut") {
    import spark.implicits._
    val li = Seq(
      // order 1: parts 10, 20, 20 (the repeat must not double-count)
      (1L, 10L), (1L, 20L), (1L, 20L),
      // order 2: parts 10, 20, 30
      (2L, 10L), (2L, 20L), (2L, 30L),
      // order 3: parts 20, 30
      (3L, 20L), (3L, 30L)
    ).toDF("l_orderkey", "l_partkey")
    val got = Relational.coPurchasePairsOf(li, minOrders = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // (10,20) in orders 1+2 = 2; (20,30) in orders 2+3 = 2; (10,30) only
    // order 2 = 1, cut by the threshold
    assert(got === Map((10L, 20L) -> 2L, (20L, 30L) -> 2L), s"got $got")
  }

  test("winsorizedStatsOf: the clamp makes the mean outlier-immune") {
    import spark.implicits._
    // 10 values 1..9 plus an outlier: [P10, P90] = [1, 9] (k10=1, k90=9
    // of n=10), so the outlier clamps to 9 — and blowing it up 100×
    // must not move ANY output column
    def px(outlier: Long) =
      ((1L to 9L) :+ outlier).map(("A", _)).toDF("flag", "cents")
    val a = Relational.winsorizedStatsOf(px(1000L)).collect().head
    val b = Relational.winsorizedStatsOf(px(100000L)).collect().head
    assert(a.toString === b.toString, s"outlier moved the winsorized stats")
    assert((a.getLong(2), a.getLong(3)) === ((1L, 9L)), s"bounds wrong: $a")
    // winsorized sum = 1..9 clamped + outlier→9 = 45 + 9 = 54
    assert(a.getLong(4) === 54L && a.getDouble(5) === 5.4)
  }

  test("paretoOf: the 80% boundary is inclusive and integer-exact") {
    import spark.implicits._
    // revenues 80/10/5/5: the head part's cumulative share is EXACTLY
    // 80% (5·80 == 4·100) and must still flag; the next must not
    val rev = Seq((1L, 80L), (2L, 10L), (3L, 5L), (4L, 5L))
      .toDF("partkey", "rev_cents")
    val got = Relational.paretoOf(rev, topN = 4)
      .collect().map(r => r.getLong(1) -> (r.getLong(0), r.getLong(3), r.getInt(4)))
      .toMap
    assert(got(1L) === ((1L, 80L, 1)), s"exact-80% head must flag: $got")
    assert(got(2L) === ((2L, 90L, 0)) && got(3L)._3 === 0 && got(4L)._3 === 0)
  }

  test("triangleCountsOf: K4 counts 3 per node, stars and paths count none") {
    import spark.implicits._
    // K4 on {1,2,3,4}: 4 triangles, every node in exactly 3; star at 9
    // (a hub — the case degree orientation exists for) and path 5-6-7
    // contribute nothing
    val k4 = for (u <- 1L to 4L; v <- (u + 1) to 4L) yield (u, v)
    val star = Seq((9L, 10L), (9L, 11L), (9L, 12L), (9L, 13L))
    val path = Seq((5L, 6L), (6L, 7L))
    val edges = (k4 ++ star ++ path).toDF("u", "v")
    val got = graft.ops.Relational.triangleCountsOf(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
  }
}
