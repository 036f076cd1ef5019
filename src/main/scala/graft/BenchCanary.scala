package graft

import org.apache.spark.sql.SparkSession

/** The two fixed host-noise canary workloads, shared by [[Bench]] and the
  * fresh-JVM sf1 seeding tool ([[graft.tools.Sf1Seed]]) so seeds and gate
  * verdicts are certified against the SAME reference workloads (VERDICT
  * r16 item 3). Semantics and calibration history live in Bench's
  * scaladoc; these are pure constant-cost workloads with no data files.
  */
object BenchCanary {

  /** Constant-cost scan + small shuffle — the primary host-noise probe. */
  def scanShuffleOnce(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 8000000L, 1L, 16)
      .selectExpr("id % 64 AS k", "id % 9973 AS v")
      .groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
      .queryExecution.toRdd.count()
    (System.nanoTime() - t0) / 1e9
  }

  /** Keyed self-join fanning ~30x into a partial+final aggregate — the
    * pair-join-shaped probe for the host dimension that inflates the CCM
    * family (round 13).
    */
  def pairJoinOnce(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    val r = spark.range(0L, 60000L, 1L, 16).selectExpr("id % 2000 AS k", "id AS v")
    r.as("a").join(r.as("b"), org.apache.spark.sql.functions.expr("a.k = b.k"))
      .selectExpr("a.k AS k", "abs(a.v - b.v) AS d")
      .groupBy("k").agg(org.apache.spark.sql.functions.min("d"))
      .queryExecution.toRdd.count()
    (System.nanoTime() - t0) / 1e9
  }
}
