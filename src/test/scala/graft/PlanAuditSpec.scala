package graft

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, JoinHint}

/** Automated version of the per-round manual plan audit (docs/PLANS.md
  * "full-surface plan audit"): build EVERY SparkEntry query's physical
  * plan and assert the invariants that must never regress at scale.
  *
  *  1. No CartesianProduct anywhere. An unhinted cross product is the
  *     one plan shape that cannot survive a 100 TB corpus regardless
  *     of constants.
  *  2. Every condition-free cross join is a BROADCAST of a bounded
  *     frame: either side carries an explicit broadcast() hint, or the
  *     optimizer can prove a side tiny (maxRows — global aggregates,
  *     limits, literal tables). This pins the library convention —
  *     every intentional crossJoin is a 1-row scalar aggregate, a
  *     bounded query set, or a k-row centroid/codebook/mask table —
  *     as a checked property instead of review prose: a corpus-scaled
  *     frame drifting into a crossJoin would plan as a
  *     BroadcastNestedLoopJoin that broadcasts the corpus, invisible
  *     to the CartesianProduct check and fatal at scale.
  *
  * Plans are BUILT, not executed (queryExecution on the sf0.001
  * corpus), so the sweep stays cheap; entries whose query function
  * eagerly stages a fixture (partition-pruned layout, served ANN
  * indexes, JDBC round-trip) pay that once into temp dirs. Both
  * invariants read the same QueryExecution, so the surface is swept
  * once.
  */
class PlanAuditSpec extends SparkSpec {

  test("no SparkEntry query plans a CartesianProduct, and every " +
      "condition-free cross join broadcasts a bounded frame") {
    val cartesian = Seq.newBuilder[String]
    val unbounded = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val qe = fn(spark, sf).queryExecution
      if (qe.executedPlan.toString().contains("CartesianProduct"))
        cartesian += name
      qe.optimizedPlan.foreach {
        case j: Join if j.condition.isEmpty =>
          val hinted = (j.hint: JoinHint) match {
            case JoinHint(l, r) =>
              l.exists(_.strategy.contains(BROADCAST)) ||
                r.exists(_.strategy.contains(BROADCAST))
          }
          val bounded = j.left.maxRows.exists(_ <= 4096) ||
            j.right.maxRows.exists(_ <= 4096)
          if (!hinted && !bounded) unbounded += s"$name ($j)"
        case _ =>
      }
    }
    val cart = cartesian.result()
    assert(cart.isEmpty,
      s"queries planning a cartesian product: ${cart.mkString(", ")}")
    val unb = unbounded.result()
    assert(unb.isEmpty,
      "queries cross-joining a frame that is neither broadcast-hinted " +
        s"nor provably bounded: ${unb.mkString("; ")}")
  }
}
