package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Third-decade probe for dedup_substring_banded's SEED JOIN + AGGREGATE
  * phase (VERDICT r13 item 2): the twin's one data-squared term.
  *
  * A full 1000x text replica is infeasible to GENERATE here (ScaleGen's
  * per-copy cipher is a union of k map-literal branches — 1000 branches
  * explode planning), but the seed phase never sees text: it consumes the
  * RETAINED shingle relation (doc_id, pos, h). Under the suite's
  * vocab-disjoint replica convention, copies share no shingles, so the
  * F x-equivalent retained relation is EXACTLY the base relation
  * replicated with per-copy disjoint doc ids and per-copy rehashed h
  * (xxhash64(h, k): a w.h.p.-injective map per copy — the within-copy
  * frequency histogram survives, cross-copy buckets are disjoint; rare
  * collisions only ADD bucket interaction, making the probe
  * conservative). The frequency guard (df <= 64) commutes with
  * replication for the same reason — per-copy df IS global df — so it is
  * applied once to the base, exactly what the real query's anti-join
  * leaves behind.
  *
  * Run: SPARK_DRIVER_MEM=96g sbt "Test/runMain graft.tools.SubstrThirdDecade 100 1000"
  * Each factor prints the seed-phase wall seconds and output volumes.
  */
object SubstrThirdDecade {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(100, 1000)
    val spark = SparkSession.builder().master("local[32]").appName("substr-3rd-decade")
      .config("spark.sql.shuffle.partitions", 256) // seed agg at 1.4B rows wants finer spill granularity
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // base = the RETAINED shingle relation at sf0.1 (guard applied once —
    // it commutes with disjoint replication)
    val d = graft.contract.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val sh = d.select(col("doc_id"), posexplode(expr("graft_winhashes(text, 24, 1)")).as(Seq("pos", "h")))
    val bad = sh.groupBy("h").agg(count(lit(1)).as("c")).filter(col("c") > 64).select("h")
    val base = sh.join(broadcast(bad), Seq("h"), "left_anti").localCheckpoint()
    val nBase = base.count()
    println(s"VOL base_windows=$nBase")

    for (f <- factors) {
      // 64-way copy axis STREAMED against the broadcast base: the cross
      // join's parallelism is the streamed side's partition count, so a
      // 1-partition range would funnel the whole f x expansion through
      // one task (measured: single-core, 70 GB heap, no progress)
      val copies = spark.range(0, f.toLong, 1, 64).toDF("k")
      val shf = copies.crossJoin(broadcast(base))
        .select(
          (col("doc_id") + col("k") * 10000000L).as("doc_id"),
          col("pos"),
          expr("xxhash64(h, k)").as("h")
        )
      val seeds = shf.filter(col("pos") % 13 === 0)
      val survivors = t(s"seed join + agg @${f}x")(
        seeds.as("a").hint("SHUFFLE_HASH")
          .join(shf.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            (col("a.pos") - col("b.pos")).as("diag"))
          .agg(count(lit(1)).as("nseed")).filter(col("nseed") >= 2)
          .count()
      )
      println(s"VOL survivors@${f}x=$survivors windows=${nBase * f}")
    }
    spark.stop()
  }
}
