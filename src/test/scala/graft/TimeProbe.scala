package graft
import org.apache.spark.sql.SparkSession

/** Controlled timing: run named queries N times each in one JVM at sf0.1. */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_RUNS=1 for the 100x spot measurements (min-of-1 is the
    // accepted methodology at that size; a second run would double an
    // already ~10-minute query for a ratio read with ±30% noise anyway)
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(3)
    args.foreach { name =>
      // warmup at sf0.001
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
      catch { case _: Throwable => () }
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sf).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $name min=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
