package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the graft_bloom_agg / graft_might_contain wrappers:
  * conf caps, null-skipping, literal-bloom probing, and the substring
  * family's dup-hash statistics at a given SF (sizing evidence for the
  * §3.2 pre-filters).
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]").appName("bloom-probe")
      .config("spark.sql.shuffle.partitions", 32).config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    // 1. caps: items above the 4M runtime-filter default cap?
    try {
      val bf = spark.range(0, 100).agg(expr("graft_bloom_agg(id, 8000000L, 67108864L)")).first().getAs[Array[Byte]](0)
      println(s"CAP items=8M ok, bytes=${bf.length}")
    } catch { case e: Throwable => println(s"CAP items=8M FAILED: ${e.getMessage.take(200)}") }
    try {
      val bf = spark.range(0, 100).agg(expr("graft_bloom_agg(id, 1000000L, 268435456L)")).first().getAs[Array[Byte]](0)
      println(s"CAP bits=256M ok, bytes=${bf.length}")
    } catch { case e: Throwable => println(s"CAP bits=256M FAILED: ${e.getMessage.take(200)}") }

    // 2. null-skip + probe round trip
    val bf = spark.range(0, 1000).select(when(col("id") % 2 === 0, col("id")).as("v"))
      .agg(expr("graft_bloom_agg(v, 1000L, 8192L)")).first().getAs[Array[Byte]](0)
    val probed = spark.range(0, 1000)
      .select(col("id"), call_function("graft_might_contain", lit(bf), col("id")).as("m"))
      .agg(sum(when(col("m"), 1).otherwise(0))).first().getLong(0)
    println(s"NULLSKIP inserted=500 probed_positive=$probed (expect ~500 + few fp)")

    // 3. dup-hash stats for the substring family at this SF
    val sh = graft.contract.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .select(col("doc_id"), posexplode(expr("graft_winhashes(text, 24, 1)")).as(Seq("pos", "h")))
      .localCheckpoint()
    val n = sh.count()
    val freq = sh.groupBy("h").agg(count(lit(1)).as("c")).localCheckpoint()
    val nDistinct = freq.count()
    val nDup = freq.filter(col("c") >= 2).count()
    val dupRows = freq.filter(col("c") >= 2).agg(sum(col("c"))).first().getLong(0)
    val seedDistinct = sh.filter(col("pos") % 13 === 0).select("h").distinct().count()
    println(f"STATS windows=$n distinct=$nDistinct dupHashes=$nDup dupRows=$dupRows (${100.0 * dupRows / n}%.1f%% of windows) seedDistinct=$seedDistinct")
    spark.stop()
  }
}
