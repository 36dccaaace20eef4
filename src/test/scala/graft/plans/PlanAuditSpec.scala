package graft.plans

import graft.{SparkEntry, SparkSuite}

/** Whole-surface plan audit: every one of SparkEntry's queries must
  * plan without a CartesianProduct. The targeted PlanQualitySpec pins
  * ~30 plans in detail (broadcasts, pushdown, partial aggs); this
  * sweep is the blanket guarantee that NO query — present or future —
  * ships an unbroadcast cross join. (Deliberate tiny-frame cross
  * joins, e.g. against k-row centroid tables, plan as
  * BroadcastNestedLoopJoin, which is allowed; CartesianProduct means
  * both sides were big enough that Spark refused to broadcast —
  * exactly the 100 TB killer this guards against.) */
class PlanAuditSpec extends SparkSuite {

  test("no CartesianProduct in any query plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sf).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct")) Some(name -> "CartesianProduct")
          else None
        } catch {
          case e: Throwable =>
            Some(name -> s"failed to plan: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
        }
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, w) => s"$n: $w" }.mkString("\n"))
  }
}
