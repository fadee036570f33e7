package graft

import java.sql.Timestamp
import graft.ops.Relational

/** Funnel + retention semantics on crafted users — the ORDER contract is
  * the whole operator: a purchase before the first view must not count,
  * and a click before the first view must not count even when a later
  * view exists. */
class EventAnalyticsSpec extends SparkTestBase {

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("eventFunnel: steps only count strictly AFTER the previous step") {
    import spark.implicits._
    val ev = Seq(
      // user 1: clean view->click->purchase = 3 steps
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2: purchase FIRST (doesn't count), then view->click = 2 steps
      (2L, "purchase", ts(1)), (2L, "view", ts(2)), (2L, "click", ts(3)),
      // user 3: click BEFORE the first view and never after = 1 step
      (3L, "click", ts(1)), (3L, "view", ts(2)),
      // user 4: never viewed — not in the funnel at all
      (4L, "click", ts(1)), (4L, "purchase", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val got = Relational.eventFunnelOf(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === ((Some(ts(1)), Some(ts(2)), Some(ts(3)), 3L)))
    assert(got(2L) === ((Some(ts(2)), Some(ts(3)), None, 2L)))
    assert(got(3L) === ((Some(ts(2)), None, None, 1L)))
  }

  test("eventAnomalyDays: a genuine spike flags, uniform days do not") {
    import spark.implicits._
    // type 'a': TEN days of 10 events + ONE day of 100. A single outlier
    // among n-1 uniform days has z = √(n−1) exactly (it owns all the
    // variance), so 10 days sits exactly AT 3σ and must NOT flag under
    // the strict inequality — 11 days gives z = √10 > 3 and must flag.
    // Type 'b': perfectly uniform, nothing may flag (the real corpus is
    // uniform too — this is the positive branch the gate never exercises)
    val rows =
      (for (d <- 1 to 10; i <- 1 to 10)
        yield ("a", Timestamp.valueOf(f"2024-01-$d%02d 00:00:${i % 60}%02d"))) ++
      (for (i <- 0 until 100)
        yield ("a", Timestamp.valueOf(f"2024-01-11 00:${i / 60}%02d:${i % 60}%02d"))) ++
      (for (d <- 1 to 10; i <- 1 to 5)
        yield ("b", Timestamp.valueOf(f"2024-01-$d%02d 00:00:${i % 60}%02d"))) ++
      // type 'c': the boundary case — 9 uniform days + 1 outlier is
      // EXACTLY 3σ, strict inequality must not flag
      (for (d <- 1 to 9; i <- 1 to 10)
        yield ("c", Timestamp.valueOf(f"2024-01-$d%02d 00:00:${i % 60}%02d"))) ++
      (for (i <- 0 until 100)
        yield ("c", Timestamp.valueOf(f"2024-01-10 00:${i / 60}%02d:${i % 60}%02d")))
    val ev = rows.toDF("event_type", "ts").withColumn("user_id", org.apache.spark.sql.functions.lit(1L))
    val got = Relational.eventAnomalyDaysOf(ev)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getInt(3))).toMap
    assert(got(("a", "2024-01-11")) === ((100L, 1)), "spike not flagged")
    assert(got.count { case ((t, _), (_, f)) => t == "a" && f == 1 } == 1,
      "only the spike day may flag for type a")
    assert(got.forall { case ((t, _), (_, f)) => t != "b" || f == 0 },
      "uniform type b must not flag")
    assert(got.forall { case ((t, _), (_, f)) => t != "c" || f == 0 },
      "exactly-3-sigma outlier must not flag under the strict inequality")
  }

  test("rollingActiveUsers: trailing-7 coverage, clamped range, true gaps absent") {
    import spark.implicits._
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, Timestamp.valueOf("2024-01-10 10:00:00"))
    ).toDF("user_id", "ts")
    val got = Relational.rollingActiveUsersOf(ev)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // Jan 1 activity covers report days 1..7; Jan 10 covers only day 10
    // (clamped at the observed max); days 8-9 have NO activity in their
    // trailing window and must be ABSENT, not zero
    val expect = ((1 to 7).map(d => f"2024-01-$d%02d" -> 1L) :+
      ("2024-01-10" -> 1L)).toMap
    assert(got === expect, s"got $got")
  }

  test("abTestReport: significance boundary on crafted conversion splits") {
    import spark.implicits._
    // 100 users per arm (ids 0..199): control (even) converts at
    // `c0`/100, treatment (odd) at 10/100 — c0=40 gives z≈5 (flag),
    // c0=15 gives z≈1.06 (no flag); each user emits a view + maybe a
    // purchase, and duplicate purchases must not double-count
    def ev(c0: Int) = {
      val rows =
        (0L until 200L).map(u => (u, "view")) ++
        (0L until 200L by 2).take(c0).flatMap(u => Seq((u, "purchase"), (u, "purchase"))) ++
        (1L until 200L by 2).take(10).map(u => (u, "purchase"))
      rows.toDF("user_id", "event_type")
        .withColumn("ts", org.apache.spark.sql.functions.lit(ts(1)))
    }
    val strong = Relational.abTestReportOf(ev(40)).collect().head
    assert((strong.getLong(0), strong.getLong(1), strong.getLong(2), strong.getLong(3))
      === ((100L, 40L, 100L, 10L)))
    assert(strong.getInt(4) === 1 && strong.getInt(5) === 1, s"strong split: $strong")
    val weak = Relational.abTestReportOf(ev(15)).collect().head
    assert(weak.getInt(4) === 0, s"weak split must not flag: $weak")
  }

  test("retentionCohorts: offsets are 7-day buckets from each user's own start") {
    import spark.implicits._
    val ev = Seq(
      // user 1 first seen Jan 1: active day 0, day 6 (offset 0), day 7 (offset 1)
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, Timestamp.valueOf("2024-01-07 10:00:00")),
      (1L, Timestamp.valueOf("2024-01-08 10:00:00")),
      // user 2 first seen Jan 3: active day 0 and day 14 (offset 2)
      (2L, Timestamp.valueOf("2024-01-03 10:00:00")),
      (2L, Timestamp.valueOf("2024-01-17 10:00:00"))
    ).toDF("user_id", "ts")
    val got = Relational.retentionCohortsOf(ev)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("2024-01-01", 0L) -> 1L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-03", 0L) -> 1L, ("2024-01-03", 2L) -> 1L))
  }
}
