package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ccm.{Ccm, CcmPipeline, CcmSpec, FftSurrogate}
import graft.contract.Tables

/** Explain (and optionally time) the PRE-checkpoint ranked-stage plan of
  * representative CCM queries — the subtree Bench executes inside the
  * eager localCheckpoint, which PlanDump cannot see (it captures only the
  * post-checkpoint tail). Evidence for OPTIMIZATION_r17.
  */
object CcmStagePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ccm_curve's input (CcmQueries.curveInput replicated: the per-user
    // lag series over events)
    val w = Window.partitionBy("user_id").orderBy("ts")
    val cin = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value").as("x"),
        lag(col("value"), 1).over(w).as("y"))
      .filter(col("y").isNotNull)
      .select(col("user_id").cast("long").as("skey"), col("x"), col("y"), col("ts"))

    def rankedOf(base: org.apache.spark.sql.DataFrame, e: Int, tau: Int, samples: Int): org.apache.spark.sql.DataFrame = {
      def oneDir(src: org.apache.spark.sql.Column, tgt: org.apache.spark.sql.Column, dir: String) =
        CcmPipeline.embedded(base, Seq("skey"), Seq(col("ts")), src, tgt, e, tau)
          .withColumn("direction", lit(dir))
      val emb = oneDir($"y", $"x", Ccm.DirXCausesY).unionByName(oneDir($"x", $"y", Ccm.DirYCausesX))
      CcmPipeline.ranked(emb, Seq("skey", "direction"), samples, 42L, col("skey"))
    }

    val rkCurve = rankedOf(cin, 2, 1, 2)
    println("==== ccm_curve ranked-stage plan (pre-checkpoint) ====")
    println(rkCurve.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))

    // time it: noop-style action
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      rkCurve.queryExecution.toRdd.count()
      println(f"ranked-stage run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // the fft surrogate bundle ranked stage (is the DFT subtree shared?)
    val boot = Tables.events(spark, sfDir)
      .filter(col("user_id") % 7 === 0)
      .select(col("user_id"), col("ts"), col("value"))
    val wb = Window.partitionBy("user_id").orderBy("ts")
    val capped = boot
      .withColumn("rn", row_number().over(wb)).filter(col("rn") <= 128)
      .select(col("user_id"), col("ts"), col("value").as("x"),
        lag(col("value"), 1).over(wb).as("y"))
      .filter(col("y").isNotNull)
    val surr = FftSurrogate.bundle(capped, col("user_id"), Seq("ts"), col("x"), col("y"),
      numK = 7, stride = 100L, seed = 1187L)
      .select(col("skey2").as("skey"), col("ts"), col("x"), col("y"))
    val rkSurr = rankedOf(surr, 2, 1, 4)
    println("==== fft-surrogate-shaped ranked-stage plan (pre-checkpoint) ====")
    val pl = rkSurr.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    println(pl)
    println("Exchange count: " + "(?m)^.*\\([0-9]+\\) Exchange".r.findAllIn(pl).size)
    println("ReusedExchange count: " + "ReusedExchange".r.findAllIn(pl).size)
    println("HashAggregate count: " + "HashAggregate".r.findAllIn(pl).size)
    spark.stop()
  }
}
