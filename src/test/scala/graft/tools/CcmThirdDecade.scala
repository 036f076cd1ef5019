package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third-decade probe for the CCM family's pair-join phase (VERDICT r15
  * item 5): `ccm_wide` measured 48x at 100x data (SCALE.md round 9), one
  * decade short of the evidence standard the substring family meets. This
  * probe turns "pairs ∝ n·maxLib is linear in series length" into a
  * measured per-decade number.
  *
  * Replication axis — SERIES LENGTH, the axis the sf replicas actually
  * grow (ScaleGen offsets user ids, `user_id % 80` folds them back onto
  * the same 40 series keys, so 10x data = 10x LONGER series). The
  * length-extension commutes exactly for this phase:
  *   - extension rows carry rank' = rank + k·10^7 (k >= 1), so only the
  *     base copy's rank <= maxLib rows are library-eligible — EXACTLY a
  *     longer series under a fixed lib ladder, where the ladder keeps the
  *     library at maxLib rows per (series, sample) while every full
  *     embedding row joins as a query point (rank > minLib);
  *   - pair volume is therefore f × base pairs BY CONSTRUCTION (q side
  *     grows f-fold, l side capped at maxLib), which is the claim under
  *     test: the measured wall either tracks that linear volume or
  *     exposes a superlinear join/sort/window term;
  *   - which 120 rows form the library differs from a true f-times-longer
  *     series (there the hash rank picks them from all f·n rows), but the
  *     COUNT and the join/topk/weight shapes are identical, and cost
  *     depends on shape, not on which rows win.
  *
  * The probe runs the SHIPPED phase code (CcmPipeline.embedded / ranked /
  * predictions — the exact path ccm_wide takes, knnBuckets = 0) on a
  * 4-series panel of the wide workload (skey % 20 == 0), so the top
  * factor's pair relation lands near the substring probe's third-decade
  * volume (~1.2B rows) without an infeasible generate step. The fixed
  * 4-group join layout is deliberate: the third decade of ONE series'
  * length is precisely the skew regime a 100 TB deployment worries about
  * (a shuffle group cannot split below one (series, sample) cell).
  *
  * Run: SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.tools.CcmThirdDecade 10 100 1000"
  * Prints per-factor PHASE wall seconds and VOL pair counts.
  */
object CcmThirdDecade {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 100, 1000)
    val spark = SparkSession.builder().master("local[32]").appName("ccm-3rd-decade")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // the ccm_wide input shape (CcmQueries.wideInput), cut to a 4-series
    // panel: skey = user_id % 80 over even user ids, x = value, y = lag
    val wOrd = Window.partitionBy(col("skey")).orderBy(col("ts"), col("user_id"))
    val in = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("user_id") % 2 === 0 && (col("user_id") % 80) % 20 === 0)
      .select((col("user_id") % 80).as("skey"), col("ts"), col("user_id"), col("value").as("x"))
      .select(col("skey"), col("ts"), col("user_id"), col("x"), lag(col("x"), 1).over(wOrd).as("y"))
      .filter(col("y").isNotNull)
    val emb = graft.ccm.CcmPipeline.embedded(
      in, Seq("skey"), Seq(col("ts"), col("user_id")), col("x"), col("y"), e = 3, tau = 1)
    val base = graft.ccm.CcmPipeline
      .ranked(emb, Seq("skey"), numSamples = 1, seed = 42L, seriesKey = col("skey"))
      .localCheckpoint()
    val nBase = base.count()
    println(s"VOL base_ranked_rows=$nBase")

    val libs = Seq(60, 120)
    for (f <- factors) {
      // streamed copy axis against the broadcast base (the SubstrThirdDecade
      // lesson: a 1-partition range funnels the expansion through one task)
      val copies = spark.range(0, f.toLong, 1, 64).toDF("k")
      val ext = copies.crossJoin(broadcast(base))
        .select(
          col("skey"),
          col("sample_id"),
          (col("idx") + col("k") * 10000000L).as("idx"),
          col("e0"), col("e1"), col("e2"), col("tgt"),
          (col("rank") + col("k") * 10000000L).as("rank")
        )
      val preds = t(s"pair join + topk + weighted fold @${f}x")(
        graft.ccm.CcmPipeline
          .predictions(ext, Seq("skey"), libs, e = 3, knnBuckets = 0, knnAutoFactor = 0)
          .queryExecution.toRdd.count()
      )
      println(s"VOL predictions@${f}x=$preds ranked_rows=${nBase * f}")
    }
    spark.stop()
  }
}
