package graft.contract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** VERDICT r12 item 7: quantify ann_ivf_persist's delta-maintenance
  * QUALITY under distribution drift — the 100x cost row (SCALE.md) shows
  * the maintenance is cheap; this measures what frozen centroids COST in
  * recall as drifting batches accumulate, versus a fresh rebuild.
  *
  * Drift source: the ScaleGen replica's per-copy orthogonal transforms
  * (dimension permutation + sign flips) are genuinely out-of-
  * distribution for copy-0 centroids — each arriving copy is a new
  * "domain". Protocol: centroids frozen from copy 0 at the
  * ann_ivf_topk stride; copies 1..k arrive as delta batches (assignment
  * only, the ann_ivf_persist maintenance path); recall@5 vs exact
  * cosine truth over the grown corpus, against a FRESH index whose
  * centroids are re-strided over the same grown corpus.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "Test/runMain graft.contract.IvfDriftProbe"
  */
object IvfDriftProbe {
  private val CentroidStride = 31
  private val NProbe = 2
  private val TopK = 5
  private val QueryStride = 50
  private val CopyBase = 1000000L

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("ivf-drift-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val e = VecOps.vecs(spark, dir).localCheckpoint()
    val dot = VecOps.dotSpark

    def centsOf(rel: DataFrame, stride: Long = CentroidStride): DataFrame =
      rel.filter(col("vec_id") % stride === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))

    def top5(rel: DataFrame, joinable: DataFrame): DataFrame = {
      val q = rel.filter(col("vec_id") % QueryStride === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
      val dotQN = expr(dot.format("qv", "v"))
      val w = Window.partitionBy("qid").orderBy((dotQN / (col("qnrm") * col("nrm"))).desc, col("vec_id").asc)
      q.join(joinable, col("qid") =!= col("vec_id"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("vec_id").as("nid"))
    }

    def ivfTop5(rel: DataFrame, cents: DataFrame): DataFrame = {
      val dotVC = expr(dot.format("v", "cv"))
      val wA = Window.partitionBy("vec_id").orderBy((dotVC / (col("nrm") * col("cnrm"))).desc, col("cid").asc)
      val assigned = rel.crossJoin(broadcast(cents))
        .withColumn("crank", row_number().over(wA))
      val lists = assigned.filter(col("crank") === 1).select(col("vec_id"), col("v"), col("nrm"), col("cid"))
      val probes = assigned
        .filter(col("vec_id") % QueryStride === 0 && col("crank") <= NProbe)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"), col("cid").as("pcid"))
      val dotQN = expr(dot.format("qv", "nv"))
      val w = Window.partitionBy("qid").orderBy((dotQN / (col("qnrm") * col("nnrm"))).desc, col("nid").asc)
      probes
        .join(
          lists.select(col("vec_id").as("nid"), col("v").as("nv"), col("nrm").as("nnrm"), col("cid").as("pcid")),
          Seq("pcid")
        )
        .filter(col("qid") =!= col("nid"))
        .select("qid", "nid", "qv", "qnrm", "nv", "nnrm")
        .distinct()
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select("qid", "nid")
    }

    def recall(approx: DataFrame, truth: DataFrame): Double = {
      val hit = approx.join(truth, Seq("qid", "nid")).count().toDouble
      val tot = truth.count().toDouble
      if (tot == 0) 0.0 else hit / tot
    }

    val frozenCents = centsOf(e.filter(col("vec_id") < CopyBase)).localCheckpoint()
    println("IVFDRIFT copies_merged frozen_recall@5 fresh_grown_k fresh_matched_k")
    Seq(0, 1, 2, 4, 9).foreach { k =>
      val corpus = e.filter(col("vec_id") < (k + 1) * CopyBase).localCheckpoint()
      val truth = top5(corpus, corpus.select("vec_id", "v", "nrm")).localCheckpoint()
      val frozen = recall(ivfTop5(corpus, frozenCents), truth)
      val fresh = recall(ivfTop5(corpus, centsOf(corpus)), truth)
      // budget-matched fresh: same ~64-centroid budget as the frozen
      // index, re-strided over the grown corpus — isolates drift
      // ADAPTATION from the centroid-count / probe-fraction effect
      val fresh64 = recall(ivfTop5(corpus, centsOf(corpus, CentroidStride * (k + 1).toLong)), truth)
      println(f"IVFDRIFT $k%d $frozen%.4f $fresh%.4f $fresh64%.4f")
    }
    spark.stop()
  }
}
