package graft.relational

import graft.SparkSpec

/** Regression net over the whole registry's PHYSICAL plans: correctness
  * tests can't catch a plan that silently degrades to a cartesian product
  * (it still computes the right answer — until it meets real data).
  * Small-side broadcasts legitimately plan as BroadcastNestedLoopJoin
  * (1-row bounds frames, query vectors), so only the truly pathological
  * shape is banned.
  */
class PlanAuditSpec extends SparkSpec {

  // stream_* run a real streaming query inside the builder (AvailableNow +
  // awaitTermination) — they are executed, not planned, so auditing them
  // here would re-run the streaming machinery for no plan information.
  // (A few other builders run small setup jobs at construction — the wrm
  // ingest, bucket-size counts, IVF training — that's accepted cost; this
  // spec's assertion is still about the RETURNED plan.)
  private val skip = Set(
    "stream_hourly_window", "stream_latest_per_user",
    "stream_purchase_view_join")

  test("no registry query plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    graft.SparkEntry.registry.filterNot(q => skip(q.name)).foreach { q =>
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a cartesian product:\n$plan")
    }
  }
}
