package graft

/** Automated version of the per-round manual plan audit (docs/PLANS.md
  * "full-surface plan audit"): build EVERY SparkEntry query's physical
  * plan and assert the one invariant that must never regress at scale —
  * no CartesianProduct anywhere. An unhinted cross product is the one
  * plan shape that cannot survive a 100 TB corpus regardless of
  * constants; every intentional small-side nested loop in this library
  * rides an explicit broadcast (1-row scalar aggregates, bounded query
  * sets, k-row centroid/codebook tables), which plans as
  * BroadcastNestedLoopJoin, not CartesianProduct.
  *
  * Plans are BUILT, not executed (queryExecution.executedPlan on the
  * sf0.001 corpus), so the sweep stays cheap; entries whose query
  * function eagerly stages a fixture (partition-pruned layout, served
  * ANN indexes, JDBC round-trip) pay that once into temp dirs.
  */
class PlanAuditSpec extends SparkSpec {

  test("no SparkEntry query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString()
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning a cartesian product: ${offenders.mkString(", ")}")
  }
}
