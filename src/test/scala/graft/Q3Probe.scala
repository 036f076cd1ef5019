package graft
import org.apache.spark.sql.SparkSession

/** Throwaway probe: run one contract query by name with full stack trace. */
object Q3Probe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q3_shipping"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    df.show(5, false)
    spark.stop()
  }
}
