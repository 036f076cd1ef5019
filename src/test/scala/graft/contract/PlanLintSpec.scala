package graft.contract

import graft.{SparkEntry, SparkTestBase}

/** Whole-contract plan lint: no query may plan a CartesianProductExec.
  *
  * Every intentional cross join in the engine pairs a large relation with
  * a broadcastable few-row relation (lib sizes, sample ids, 1-row corpus
  * totals), which Spark plans as BroadcastNestedLoopJoin — bounded work.
  * A CartesianProduct between two data-proportional relations is the
  * classic accidental O(n²) scale-killer; this spec makes introducing one
  * a test failure rather than a 100 TB incident.
  *
  * Note: queries with eager side effects (stream replay, table writes)
  * execute here; the rest only plan.
  */
class PlanLintSpec extends SparkTestBase {
  test("no contract query plans a cartesian product") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val planStr = fn(spark, dir).queryExecution.executedPlan.toString
        if (planStr.contains("CartesianProduct")) Some(name) else None
      } catch {
        case e: Throwable => Some(s"$name [failed to plan: ${e.getClass.getSimpleName}]")
      }
    }
    assert(offenders.isEmpty, s"cartesian products (or planning failures) in: $offenders")
  }
}
