package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TruthProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]").appName("truth-probe")
      .config("spark.sql.shuffle.partitions", 32).config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val res = graft.SparkEntry.queries("dedup_substring")(spark, dir).localCheckpoint()
    val n = res.count()
    val docs = res.select(col("doc_a").as("d")).union(res.select(col("doc_b").as("d"))).distinct().count()
    println(s"TRUTH pairs=$n docs=$docs")
    spark.stop()
  }
}
