package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ccm.{FftLadder, FftSurrogate}

/** Measures the VERDICT r9 item-3 composition directly: the O(n²) direct
  * DFT surrogate bundle vs the O(n log n) butterfly ladder, both on the
  * ccm_wide folded-series regime (every 16th folded series, the
  * ccm_surrogate_fft_wide gate's input) at SPARK_GRAFT_SF_DIR. Times the
  * BUNDLE construction alone (count of the surrogate relation), isolating
  * the DFT cost from the shared CCM tail.
  */
object FftWideProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(2)

    def wideInput(dir: String) = {
      val skey = col("user_id") % 80
      val w = org.apache.spark.sql.expressions.Window.partitionBy(skey).orderBy(col("ts"), col("user_id"))
      spark.read
        .parquet(s"$dir/events.parquet")
        .filter(col("user_id") % 2 === 0)
        .select(skey.as("skey"), col("ts"), col("user_id"), col("value").as("x"),
          lag(col("value"), 1).over(w).as("y"))
        .filter(col("y").isNotNull)
        .filter(col("skey") % 16 === 0)
    }

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (dt, n)
      }
      println(f"TIME $name min=${times.map(_._1).min}%.2f rows=${times.head._2} all=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    }

    time("fft_direct_wide") {
      FftSurrogate.bundle(wideInput(sf), col("skey"), Seq("ts", "user_id"),
        col("x"), col("y"), numK = 7, stride = 100L, seed = 1187L)
    }
    time("fft_ladder_wide") {
      FftLadder.bundle(wideInput(sf), col("skey"), Seq("ts", "user_id"),
        col("x"), col("y"), numK = 7, stride = 100L, seed = 1187L)
    }
    spark.stop()
  }
}
