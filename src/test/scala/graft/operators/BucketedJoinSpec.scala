package graft.operators

import graft.SparkTestBase

/** Proof of the SCALE.md co-located-join claim: two tables bucketed on the
  * join key by the same bucket count sort-merge-join WITHOUT any exchange —
  * the physical plan the 100 TB fact-to-fact joins (lineitem⋈orders, edge⋈
  * labels, signature⋈signature) would use on a cluster, where localCheckpoint
  * stands in for bucketed persistence in the local contract queries.
  */
class BucketedJoinSpec extends SparkTestBase {

  test("same-bucketed tables sort-merge-join with zero shuffle exchanges") {
    val spark2 = spark
    import spark2.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the sort-merge path: a broadcast join would trivially avoid a
      // shuffle without proving anything about bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val n = 1000
      (0 until n)
        .map(i => (i.toLong, i * 2.0))
        .toDF("k", "va")
        .write
        .bucketBy(8, "k")
        .sortBy("k")
        .mode("overwrite")
        .saveAsTable("graft_buck_a")
      (0 until n)
        .map(i => (i.toLong, s"v$i"))
        .toDF("k", "vb")
        .write
        .bucketBy(8, "k")
        .sortBy("k")
        .mode("overwrite")
        .saveAsTable("graft_buck_b")
      val j = spark.table("graft_buck_a").join(spark.table("graft_buck_b"), "k")
      assert(j.count() == n)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin in:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS graft_buck_a")
      spark.sql("DROP TABLE IF EXISTS graft_buck_b")
    }
  }
}
