package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for dedup_substring_banded's phase volumes: how many
  * minimizer rows, candidate pairs, candidate docs, and candidate-doc
  * stride-1 rows the two phases see at a given SF dir. Round-13 tool;
  * keep for future re-probes.
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "Test/runMain graft.tools.SubstrProbe"
  */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("substr-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val d = graft.contract.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val docsN = d.count()
    val sh1 = d.select(col("doc_id"), posexplode(expr("graft_winhashes(text, 24, 1)")).as(Seq("pos", "h")))
    val sh1N = sh1.count()
    val mins = d.select(col("doc_id"), explode(expr("graft_minimizers(text, 24, 13)")).as("m"))
      .select(col("doc_id"), col("m.pos").as("pos"), col("m.h").as("h")).localCheckpoint()
    val minsN = mins.count()
    val okM = mins.groupBy("h").agg(count(lit(1)).as("c")).filter(col("c") <= 64).select("h")
    val mf = mins.join(okM, "h")
    val cand = mf.as("a").join(mf.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (col("a.pos") - col("b.pos")).as("mdiag"))
      .agg(count(lit(1)).as("nm")).filter(col("nm") >= 2)
      .select("doc_a", "doc_b").distinct().localCheckpoint()
    val candN = cand.count()
    val docsIn = cand.select(col("doc_a").as("doc_id")).union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val docsInN = docsIn.count()
    val shcN = d.join(docsIn, "doc_id")
      .select(posexplode(expr("graft_winhashes(text, 24, 1)")).as(Seq("pos", "h"))).count()
    println(s"PROBE docs=$docsN stride1=$sh1N minimizers=$minsN (${minsN * 100.0 / math.max(1, sh1N)}%%) " +
      s"candPairs=$candN candDocs=$docsInN (${docsInN * 100.0 / math.max(1, docsN)}%%) candStride1=$shcN")
    spark.stop()
  }
}
