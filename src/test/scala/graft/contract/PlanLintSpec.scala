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

  /** No contract query may plan a GLOBAL window (empty partitionSpec)
    * whose input is an UNBOUNDED scan-backed relation: a global window
    * funnels its whole input through ONE task — the per-query
    * `Norm.ordered` convention exists precisely to avoid this. (The 378
    * `WARN WindowExec: No Partition Defined` lines a full test run
    * emits come from FIXTURES and oracle-shaped check queries inside
    * specs, which deliberately mirror the DuckDB oracle's global
    * `row_number() OVER (ORDER BY …)` on tiny inputs — this lint proves
    * the contract surface itself is clean.)
    *
    * Two bounded shapes are accepted:
    *
    *  1. STRUCTURALLY bounded: a TakeOrderedAndProject / Limit /
    *     WindowGroupLimit sits between the window and every scan below
    *     it — Spark's own rewrite of the `row_number() <= k` top-k
    *     pattern (text_collocations, text_keyphrases, text_bpe_pairs,
    *     graph_jaccard): each partition is pruned to k rows BEFORE the
    *     single-partition exchange, so the global window sees O(k).
    *  2. ALLOWLISTED by name with a documented domain bound: global
    *     windows whose input was aggregated onto a corpus-size-FREE
    *     domain — the hourly time spine (rows = hours in the data's
    *     time range, identical at 100 TB: evt_acf/pacf/ar_forecast/
    *     cross_corr/granger/motif/survival/transfer_entropy), Benford's
    *     nine leading digits (evt_benford), or the doc-length histogram
    *     (corpus_report's exact median — one row per DISTINCT length,
    *     bounded by the max doc length, not the corpus). An aggregate
    *     alone is NOT accepted structurally, because group cardinality
    *     can be corpus-proportional (doc_id, bigram vocab) — each
    *     allowlist entry names its bound instead.
    */
  test("no contract query plans a global window over an unbounded scan-backed relation") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val boundedDomain: Map[String, String] = Map(
      "evt_acf" -> "hour spine (time-range rows)",
      "evt_pacf" -> "hour spine",
      "evt_ar_forecast" -> "hour spine",
      "evt_cross_corr" -> "hour spine",
      "evt_granger" -> "hour spine",
      "evt_motif" -> "hour spine",
      "evt_survival" -> "hour spine",
      "evt_transfer_entropy" -> "hour spine",
      "evt_benford" -> "9 leading digits",
      "corpus_report" -> "doc-length histogram (distinct lengths)"
    )
    val dir = "/root/testdata/sf0.001"
    def expand(p: SparkPlan): Seq[SparkPlan] =
      p.children ++ (p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case _                        => Nil
      }) ++ p.subqueries
    def nodes(p: SparkPlan): Seq[SparkPlan] = Seq(p) ++ expand(p).flatMap(nodes)
    def bounds(n: SparkPlan): Boolean = {
      val s = n.nodeName
      s.contains("TakeOrderedAndProject") || s.contains("Limit") || s.contains("WindowGroupLimit")
    }
    // true iff some scan below p is reachable WITHOUT passing a bounding node
    def unboundedScan(p: SparkPlan): Boolean =
      if (bounds(p)) false
      else if (p.nodeName.contains("Scan")) true
      else expand(p).exists(unboundedScan)
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan
        val global = nodes(plan).collect {
          case w: WindowExec if w.partitionSpec.isEmpty && unboundedScan(w.child)           => w.nodeName
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty && unboundedScan(w.child) => w.nodeName
        }
        if (global.nonEmpty && !boundedDomain.contains(name))
          Some(s"$name -> ${global.distinct.mkString(",")}")
        else None
      } catch {
        case e: Throwable => Some(s"$name [failed to plan: ${e.getClass.getSimpleName}]")
      }
    }
    assert(offenders.isEmpty, s"global windows over unbounded scan-backed inputs in: $offenders")
  }
}
