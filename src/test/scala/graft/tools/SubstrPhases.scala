package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timings/volumes for the exact-substring family (round 13). */
object SubstrPhases {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]").appName("substr-phases")
      .config("spark.sql.shuffle.partitions", 32).config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f; println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = graft.contract.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val sh = t("sh checkpoint")(
      d.select(col("doc_id"), posexplode(expr("graft_winhashes(text, 24, 1)")).as(Seq("pos", "h")))
        .localCheckpoint())
    val bad = t("bad agg")(
      sh.groupBy("h").agg(count(lit(1)).as("c")).filter(col("c") > 64).select("h").localCheckpoint())
    println(s"VOL bad=${bad.count()}")
    val shf = sh.join(broadcast(bad), Seq("h"), "left_anti")
    val seeds = shf.filter(col("pos") % 13 === 0)
    val survivors = t("seed join + agg")(
      seeds.as("a").hint("SHUFFLE_HASH")
        .join(shf.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          (col("a.pos") - col("b.pos")).as("diag"))
        .agg(count(lit(1)).as("nseed")).filter(col("nseed") >= 2)
        .select("doc_a", "doc_b", "diag").localCheckpoint())
    println(s"VOL survivors=${survivors.count()}")
    val sdocs = survivors.select(col("doc_a").as("doc_id"))
      .union(survivors.select(col("doc_b").as("doc_id"))).distinct()
    println(s"VOL sdocs=${sdocs.count()}")
    val shfS = shf.join(broadcast(sdocs), "doc_id")
    val prS = shfS.as("a").join(shfS.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
      .withColumn("diag", col("pa") - col("pb"))
      .join(broadcast(survivors), Seq("doc_a", "doc_b", "diag"))
    t("island pass")(println(s"VOL prS=${prS.count()}"))
    // locality-tightened survivors: the two seeds of a true run are <= 26
    // apart; two 52-wide block families (offsets 0 and 26) catch that
    val seedRows = seeds.as("a").hint("SHUFFLE_HASH")
      .join(shf.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (col("a.pos") - col("b.pos")).as("diag"), col("a.pos").as("pa"))
    def fam(off: Int) = seedRows
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), ((col("pa") + off) / 52).cast("long").as("blk"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select("doc_a", "doc_b", "diag")
    val survivors2 = t("local seed agg")(fam(0).union(fam(26)).distinct().localCheckpoint())
    println(s"VOL survivors2=${survivors2.count()}")
    val sdocs2 = survivors2.select(col("doc_a").as("doc_id"))
      .union(survivors2.select(col("doc_b").as("doc_id"))).distinct()
    println(s"VOL sdocs2=${sdocs2.count()}")
    // final truth scale: run the tail over the tightened survivors
    val shfS2 = shf.join(broadcast(sdocs2), "doc_id")
    val prS2 = shfS2.as("a").join(shfS2.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
      .withColumn("diag", col("pa") - col("pb"))
      .join(broadcast(survivors2), Seq("doc_a", "doc_b", "diag"))
    import org.apache.spark.sql.expressions.Window
    val wr = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag")).orderBy("pa")
    val runs = prS2.withColumn("grp", col("pa") - row_number().over(wr))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg((count(lit(1)) + 23).as("run_len"))
    val res = runs.filter(col("run_len") >= 50).groupBy("doc_a", "doc_b")
      .agg(max("run_len").as("max_run"), count(lit(1)).as("n_runs"))
    t("tail over survivors2")(println(s"VOL result_pairs=${res.count()}"))
    spark.stop()
  }
}
