package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition for graph_betweenness tuning: times the edge
  * build, forward sweep, predecessor DAG, and backward sweep separately.
  */
object BcProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]").appName("bc-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    import graft.operators.Checkpoints.tracked
    val li = spark.read.parquet(s"$dir/lineitem.parquet").select(col("l_suppkey"), col("l_orderkey"))
    val or = spark.read.parquet(s"$dir/orders.parquet").select(col("o_orderkey"), col("o_custkey"))
    val directed = t("directed")(
      li.join(or, col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("src"), (col("o_custkey") * 2 + 1).as("dst")).distinct()
        .localCheckpoint()
    )
    val sym = directed.union(directed.select(col("dst").as("src"), col("src").as("dst")))
    val (e, _) = t("edges")(tracked(sym.toDF("src", "dst")))
    val seeds = t("seeds")(
      e.select(col("src").as("vertex")).distinct()
        .filter(col("vertex") % 50 === 0).orderBy(col("vertex")).limit(4).localCheckpoint()
    )
    val maxDepth = 4
    var frontier = seeds.select(col("vertex").as("seed"), col("vertex").as("v"), lit(0).as("dep"), lit(1L).as("sigma")).localCheckpoint()
    var vis = frontier
    for (d <- 1 to maxDepth) {
      val (cand, _) = t(s"fwd$d")(tracked(
        frontier.join(e, frontier("v") === e("src"))
          .select(col("seed"), e("dst").as("v"), col("sigma"))
          .groupBy("seed", "v").agg(sum(col("sigma")).as("sigma"))
          .join(vis.select("seed", "v"), Seq("seed", "v"), "left_anti")
          .select(col("seed"), col("v"), lit(d).as("dep"), col("sigma"))
      ))
      frontier = cand; vis = vis.union(cand)
    }
    val preds = t("preds")(
      vis.filter(col("dep") < maxDepth).as("u")
        .join(e, col("u.v") === e("src"))
        .join(vis.as("w"), e("dst") === col("w.v") && col("u.seed") === col("w.seed") && col("w.dep") === col("u.dep") + 1)
        .select(col("u.seed").as("seed"), col("u.v").as("uv"), col("u.sigma").as("su"),
          col("w.v").as("wv"), col("w.dep").as("wdep"), col("w.sigma").as("sw"))
        .localCheckpoint()
    )
    println("preds rows " + preds.count())
    var delta = vis.filter(col("dep") === maxDepth).select(col("seed"), col("v"), lit(0L).as("dm"))
    for (d <- (maxDepth - 1) to 1 by -1) {
      delta = t(s"bwd$d")(
        preds.filter(col("wdep") === d + 1)
          .join(delta.select(col("seed"), col("v").as("wv"), col("dm").as("wdm0")), Seq("seed", "wv"), "left")
          .withColumn("wdm", coalesce(col("wdm0"), lit(0L)))
          .withColumn("term", expr(graft.operators.Betweenness.termSql("su", "sw", "wdm")))
          .groupBy(col("seed"), col("uv").as("v")).agg(sum(col("term")).as("dm"))
          .localCheckpoint()
      )
    }
    spark.stop()
  }
}
