package graft.contract

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Runtime bloom-filter join pruning (Spark's `InjectRuntimeFilter`):
  * when a selective dim-side filter feeds a SHUFFLE join (broadcast
  * joins get dynamic pruning instead), Spark can build a bloom filter
  * from the dim side's join keys at runtime and push
  * `bloom_filter_might_contain` into the fact scan — at 100 TB this is
  * what spares the fact shuffle from carrying rows that cannot match.
  * Default thresholds target real cluster sizes (10 GB application-side
  * scans), so the spec lowers them to fire on test data; what it pins is
  * that OUR join shape qualifies — equi-join key, selective creation
  * side, no broadcast — so the optimization stays reachable when the
  * same plan runs at the sizes the defaults expect.
  */
class RuntimeFilterSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> util.Try(spark.conf.get(k)).toOption }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally {
      old.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("dim-filtered shuffle join qualifies for a runtime bloom filter") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    ) {
      val li = Tables.t(spark, dir, "lineitem").select("l_partkey", "l_quantity")
      val p = Tables.t(spark, dir, "part").filter(col("p_size") <= 5).select("p_partkey")
      val joined = li.join(p, col("l_partkey") === col("p_partkey")).agg(count(lit(1)))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(
        optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the fact scan; optimized plan:\n$optimized"
      )
    }
  }

  test("without the selective dim filter no runtime filter is injected") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    ) {
      val li = Tables.t(spark, dir, "lineitem").select("l_partkey", "l_quantity")
      val p = Tables.t(spark, dir, "part").select("p_partkey")
      val joined = li.join(p, col("l_partkey") === col("p_partkey")).agg(count(lit(1)))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(
        !optimized.contains("might_contain"),
        "an unfiltered creation side should not inject a bloom filter"
      )
    }
  }
}
