package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ccm.{Ccm, CcmSpec}

/** Scratch A/B probe for CcmSpec.reuseDistances at a configurable sample
  * count — NOT part of the driver contract; run manually:
  *   sbt "Test/runMain graft.tools.BootProbe /root/testdata/sf0.1 8 5"
  * args: sfDir numSamples userMod
  */
object BootProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val samples = args.lift(1).map(_.toInt).getOrElse(8)
    val userMod = args.lift(2).map(_.toInt).getOrElse(5)
    val libs = args.lift(3).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(16, 32, 48))
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("boot-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }

    val w = Window.partitionBy("user_id").orderBy("ts")
    val capped = graft.contract.Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .filter(col("user_id") % userMod === 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 66)
      .drop("rn")
    val in = capped
      .select(col("user_id"), col("ts"), col("value").as("x"),
        lag(col("value"), 1).over(w).as("y"))
      .filter(col("y").isNotNull)
      .localCheckpoint()

    def run(reuse: Boolean): Long =
      Ccm
        .bidirectional(
          in,
          skey = col("user_id"),
          order = Seq("ts"),
          x = col("x"),
          y = col("y"),
          spec = CcmSpec(numSamples = samples, seed = 42L, reuseDistances = reuse),
          libSizes = libs
        )
        .queryExecution
        .toRdd
        .count()

    // warm codegen/caches, then honest repeats
    run(reuse = false)
    for (_ <- 1 to 2) {
      timed("exact")(run(reuse = false))
      timed("reuse")(run(reuse = true))
    }
    spark.stop()
  }
}
