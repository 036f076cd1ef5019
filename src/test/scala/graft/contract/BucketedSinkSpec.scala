package graft.contract

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The point of the bucketed sink: a join between two tables bucketed on
  * the join key with equal bucket counts must plan WITHOUT a shuffle on
  * either side.
  */
class BucketedSinkSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def withBucketedTables(run: String)(body: (String, String) => Unit): Unit = {
    val (lt, ot, tmp) = SinkQueries.writeBucketed(spark, dir, run)
    try body(lt, ot)
    finally {
      spark.sql(s"DROP TABLE IF EXISTS $lt")
      spark.sql(s"DROP TABLE IF EXISTS $ot")
      graft.GateResult.deleteRecursively(java.nio.file.Paths.get(tmp))
    }
  }

  test("bucketed-table join plans with zero shuffle exchanges") {
    withBucketedTables("planspec") { (lt, ot) =>
      // disable broadcast: a broadcast join would be shuffle-free trivially;
      // the claim under test is that the SORT-MERGE path needs no exchange
      // because both sides are bucketed on the join key
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = SinkQueries.joinPlanUnderTest(spark, lt, ot)
        joined.collect() // execute so AQE finalizes the plan
        val plan = joined.queryExecution.executedPlan
        val finalPlan = plan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        val planStr = finalPlan.toString
        assert(planStr.contains("SortMergeJoin"), s"expected sort-merge join:\n$planStr")
        val shuffles = finalPlan.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.isEmpty, s"expected exchange-free bucket join, found:\n$finalPlan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("bucketed round-trip is value-identical to the direct join") {
    withBucketedTables("valspec") { (lt, ot) =>
      val viaBuckets = spark
        .table(lt)
        .join(spark.table(ot), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .count()
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      val direct = Tables
        .lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .count()
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      assert(viaBuckets == direct)
    }
  }
}
