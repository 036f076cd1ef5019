package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ccm.{Ccm, CcmPipeline, CcmSpec}

/** Scratch decomposition of ccm_wide's cost at a given SF — NOT part of the
  * driver contract; run manually:
  *   sbt "Test/runMain graft.tools.WideProbe /root/testdata/sf0.1"
  */
object WideProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("wide-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val WideMod = 80
    val WideLibs = Seq(60, 120)
    val w = Window.partitionBy(col("user_id") % WideMod).orderBy(col("ts"), col("user_id"))
    val in = graft.contract.Tables
      .events(spark, dir)
      .filter(col("user_id") % 2 === 0)
      .select(
        (col("user_id") % WideMod).as("skey"),
        col("ts"),
        col("user_id"),
        col("value").as("x"),
        lag(col("value"), 1).over(w).as("y")
      )
      .filter(col("y").isNotNull)

    val spec = CcmSpec(numSamples = 1, seed = 2024L, knnBuckets = 0, knnAutoFactor = 0)
    val base = in.select(
      col("skey").cast("long").as("skey"), col("x"), col("y"), col("ts"), col("user_id"))
    def oneDir(src: org.apache.spark.sql.Column, tgt: org.apache.spark.sql.Column, d: String) =
      CcmPipeline
        .embedded(base, Seq("skey"), Seq(col("ts"), col("user_id")), src, tgt,
          spec.embeddingDim, spec.tau)
        .withColumn("direction", lit(d))
    val emb = oneDir($"y", $"x", "x_causes_y").unionByName(oneDir($"x", $"y", "y_causes_x"))
    val keys = Seq("skey", "direction")

    // one full pass to warm codegen/parquet caches, then honest repeats.
    // NOTE: use toRdd.count() everywhere — .count() lets Catalyst eliminate
    // the left-joined kNN subtree entirely (join elimination on the unique
    // aggregate key), which is how the first probe mis-measured skill at
    // 0.3 s.
    def run(df: DataFrame): Long = df.queryExecution.toRdd.count()
    timed("warmup full")(run(Ccm.bidirectional(
      in, col("skey"), Seq("ts", "user_id"), col("x"), col("y"), spec, WideLibs)))

    for (i <- 1 to 2) {
      val rk = timed(s"ranked+ckpt #$i")(
        CcmPipeline.ranked(emb, keys, spec.numSamples, spec.seed, col("skey")).localCheckpoint())

      // stage decomposition: raw pair join output (pre-fanout), fanned+filtered,
      // topk survivors, full preds
      val q = rk.as("q").filter($"q.rank" > lit(WideLibs.min.toLong))
      val joinCond = $"q.skey" === $"l.skey" && $"q.direction" === $"l.direction" &&
        $"q.sample_id" === $"l.sample_id" &&
        $"l.rank" < $"q.rank" && $"l.rank" <= lit(WideLibs.max.toLong)
      val pairsOnce = q.join(rk.as("l"), joinCond).select(
        $"q.skey".as("skey"), $"q.direction".as("direction"), $"q.sample_id".as("sample_id"),
        $"q.rank".as("q_rank"), $"l.rank".as("l_rank"),
        $"q.idx".as("pred_idx"), $"q.tgt".as("actual"),
        $"l.idx".as("lib_idx"), $"l.tgt".as("lib_tgt"),
        sqrt((0 until 3)
          .map(j => (col(s"q.e$j") - col(s"l.e$j")) * (col(s"q.e$j") - col(s"l.e$j")))
          .reduce(_ + _)).as("dist")
      )
      timed(s"pairsOnce count #$i")(println(s"[probe] pairs rows = ${run(pairsOnce)}"))

      // fanout + filter
      val libsDf = broadcast(WideLibs.toDF("lib_size"))
      val pairs = pairsOnce.crossJoin(libsDf)
        .filter($"l_rank" <= $"lib_size" && $"q_rank" > $"lib_size")
        .drop("q_rank", "l_rank")
      timed(s"fanout count #$i")(println(s"[probe] fanned rows = ${run(pairs)}"))

      // + topk window
      val cellPred = Seq(col("skey"), col("direction"), col("sample_id"), col("lib_size"), col("pred_idx"))
      val wNN = Window.partitionBy(cellPred: _*).orderBy($"dist".asc, $"lib_idx".asc)
      val nn = pairs.withColumn("nn_rank", row_number().over(wNN)).filter($"nn_rank" <= lit(4))
      timed(s"nn topk count #$i")(println(s"[probe] nn rows = ${run(nn)}"))

      val pr = CcmPipeline.predictions(rk, keys, WideLibs, spec.embeddingDim, 0, 0)
      timed(s"preds from rk #$i")(println(s"[probe] preds rows = ${run(pr)}"))

      val rk32 = rk.repartition(32, col("skey"), col("direction"), col("sample_id"))
      val pr32 = CcmPipeline.predictions(rk32, keys, WideLibs, spec.embeddingDim, 0, 0)
      timed(s"preds repart32 #$i")(println(s"[probe] preds32 rows = ${run(pr32)}"))
      timed(s"full e2e #$i") {
        run(Ccm.bidirectional(
          in, col("skey"), Seq("ts", "user_id"), col("x"), col("y"), spec, WideLibs))
      }
    }

    spark.stop()
  }
}
