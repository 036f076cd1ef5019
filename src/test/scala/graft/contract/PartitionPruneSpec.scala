package graft.contract

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The point of the partitioned sink: a dim-filtered join against a table
  * partitioned on the join key must plan a DYNAMIC partition-pruning
  * filter on the fact scan, and the executed scan must read only the
  * partitions whose types survive the dim filter.
  */
class PartitionPruneSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def withPartitionedTable(run: String)(body: (String, String) => Unit): Unit = {
    val (tbl, dimTbl, tmp) = SinkQueries.writePartitioned(spark, dir, run)
    try body(tbl, dimTbl)
    finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS $dimTbl")
      graft.GateResult.deleteRecursively(java.nio.file.Paths.get(tmp))
    }
  }

  test("dim-filtered join plans dynamic partition pruning on the fact scan") {
    withPartitionedTable("dppspec") { (tbl, dimTbl) =>
      val df = SinkQueries.prunedJoinPlanUnderTest(spark, tbl, dimTbl)
      df.collect() // execute so AQE finalizes the plan and DPP resolves
      val plan = df.queryExecution.executedPlan
      val finalPlan = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(
        finalPlan.toString.contains("dynamicpruningexpression"),
        s"expected a dynamic partition-pruning filter on the fact scan:\n$finalPlan"
      )
      // the executed scan must have read ONLY the 3 surviving partitions
      // (weight >= 1.0 keeps click/purchase/signup out of 5 types).
      // plain collect() stops at AQE query-stage boundaries (stages are
      // leaf nodes whose materialized plan is not a child) — descend
      // through them explicitly
      def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
        val here = p match { case s: FileSourceScanExec => Seq(s); case _ => Nil }
        val kids = p.children ++ (p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
          case _ => Nil
        })
        here ++ kids.flatMap(allScans)
      }
      val scans = allScans(finalPlan)
      val factScan = scans.find(_.relation.partitionSchema.fieldNames.contains("event_type"))
      assert(factScan.isDefined, s"no partitioned fact scan found:\n$finalPlan")
      val partsRead = factScan.get.metrics.get("numPartitions").map(_.value)
      assert(
        partsRead.contains(3L),
        s"expected the scan to read exactly 3 of 5 partitions, metrics said $partsRead"
      )
    }
  }

  test("partitioned round-trip is value-identical to the direct computation") {
    withPartitionedTable("dppval") { (tbl, dimTbl) =>
      val via = SinkQueries
        .prunedJoinPlanUnderTest(spark, tbl, dimTbl)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val direct = Tables
        .events(spark, dir)
        .join(SinkQueries.typeDim(spark).filter(col("weight") >= 1.0), col("event_type") === col("d_type"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          Norm.rnd(sum(round(col("value") * col("weight") * 100.0).cast("long")) / 100.0, 2)
            .as("weighted_sum")
        )
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(via == direct)
    }
  }
}
