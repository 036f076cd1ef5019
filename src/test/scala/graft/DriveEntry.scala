package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ccm._

/** Manual end-to-end driver for the SparkEntry contract surface
  * (`sbt "Test/runMain graft.DriveEntry"`) — used for verification, not CI.
  */
object DriveEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = SparkEntry.entry(spark)
    df.orderBy("skey", "direction", "lib_size").show(40, truncate = false)
    println("ENTRY_ROWS=" + df.count())

    // probe: lib sizes at/beyond the series length -> guard path, rho 0.0
    val tiny = spark
      .range(0, 30)
      .select(lit(7L).as("skey"), col("id").as("t"), rand(1).as("x"), rand(2).as("y"))
    val g = Ccm.bidirectional(tiny, col("skey"), Seq("t"), col("x"), col("y"),
      CcmSpec(numSamples = 2), libSizes = Seq(10, 28, 50))
    g.orderBy("direction", "lib_size").show(false)

    // probe: E larger than the series -> empty embedding, empty result
    val e = Ccm.bidirectional(tiny, col("skey"), Seq("t"), col("x"), col("y"),
      CcmSpec(embeddingDim = 40, numSamples = 2), libSizes = Seq(5))
    println("EMPTY_EMBED_ROWS=" + e.count())
    println("PROBE_DONE")
    spark.stop()
  }
}
