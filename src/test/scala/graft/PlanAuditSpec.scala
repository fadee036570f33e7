package graft

/** Whole-surface physical-plan audit, run over every driver gate at the
  * smallest scale factor:
  *
  *  - every gate must PLAN — a wiring typo (bad column, missing table,
  *    unresolvable expression) surfaces here in seconds instead of at
  *    Verify time;
  *  - no gate may plan a `CartesianProduct` — the one join shape that
  *    cannot survive a 100 TB input. The engine's intentional one-row
  *    scalar joins (`crossJoin(broadcast(stats))`) plan as
  *    BroadcastNestedLoopJoin with a single-row build side, which is the
  *    correct scalable form and passes this audit.
  *
  * Gates with eager side effects (index builds, format sink→scan round
  * trips, BPE/k-means/TextRank training) run those effects here at
  * sf0.001, so the audit stays cheap while still exercising the real
  * code path of all queries. */
class PlanAuditSpec extends SparkTestBase {

  test("every gate plans, and no gate plans a CartesianProduct") {
    val d = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, d).queryExecution.executedPlan.toString
        catch { case e: Throwable =>
          fail(s"gate $name failed to plan: ${e.getMessage}")
        }
      assert(!plan.contains("CartesianProduct"),
        s"gate $name plans a CartesianProduct:\n$plan")
    }
  }
}
