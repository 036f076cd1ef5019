package graft

import org.apache.spark.sql.SparkSession

/** Manual driver: graft_dot via the spark.sql.extensions deployment path +
  * cosine-query timing at sf0.1.
  */
object DriveDot {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // extensions path: function available WITHOUT programmatic registration
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").collect()(0).getDouble(0)
    println(s"EXTENSIONS_DOT=$r")
    val dir = "/root/testdata/sf0.1"
    for (name <- Seq("dedup_embed_cos", "ann_topk", "ann_lsh_topk")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      println(f"$name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
