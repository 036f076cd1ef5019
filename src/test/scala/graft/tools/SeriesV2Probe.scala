package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the [[graft.sources.SeriesV2]] connector contracts:
  * at N series x P points, measure (a) the per-file partial aggregate
  * fold vs the same aggregate over the plain CSV reader — the "ship
  * O(series), not O(lines)" claim — and (b) join-driven runtime
  * filtering vs the same join with dynamic pruning disabled. Round-13
  * tool; keep for future re-probes.
  *   SERIES=4000 POINTS=1000 sbt "Test/runMain graft.tools.SeriesV2Probe"
  */
object SeriesV2Probe {
  def main(args: Array[String]): Unit = {
    val nSeries = sys.env.getOrElse("SERIES", "4000").toLong
    val nPoints = sys.env.getOrElse("POINTS", "1000").toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("seriesv2-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = Files.createTempDirectory("sv2probe").toString
    // key-partitioned layout: each of the 32 files holds a skey range,
    // the shape a real series store would have
    spark.range(0L, nSeries * nPoints, 1L, 64)
      .select(
        (col("id") / nPoints).cast("long").as("skey"),
        (col("id") % nPoints).as("ord"),
        (col("id") % 9973).cast("double").as("x"),
        ((col("id") + 7) % 9973).cast("double").as("y")
      )
      .repartition(32, col("skey"))
      .write.option("header", "true").csv(s"$tmp/d")

    def timed(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $label%-28s $s%8.2f s  (rows=$n)")
      s
    }

    val v2 = spark.read.format("graft.sources.SeriesV2").load(s"$tmp/d")
    val plain = spark.read.option("header", "true")
      .schema("skey LONG, ord LONG, x DOUBLE, y DOUBLE").csv(s"$tmp/d")

    def aggOf(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy("skey")
        .agg(count(lit(1)).as("n"), min("ord").as("omin"), max("x").as("xmax"))
        .count()

    // warm codegen/JIT once each, then measure
    aggOf(v2); aggOf(plain)
    val tPush = timed("agg: V2 per-file fold")(aggOf(v2))
    val tPlain = timed("agg: plain CSV reader")(aggOf(plain))

    // dim must be a SCAN with a surviving selective Filter: a Seq-backed
    // LocalRelation gets its Filter folded away by ConvertToLocalRelation
    // and then carries no selective predicate for the pruning rule —
    // measured here, the range+le shape delivers, local+filter does not.
    // Real dimension sides are table scans, so this is the honest shape.
    val dimKeys = (0L until nSeries by math.max(1L, nSeries / 40L)).toSeq
    import spark.implicits._
    def joinCount(dpp: Boolean): Long = {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", dpp)
      val dim = spark.range(0, nSeries).toDF("skey")
        .filter(col("skey") % (nSeries / 40L) === 0L)
      // carry the payload columns: a join that only counts would prune
      // the fact scan to skey and measure nothing but the gate itself
      val n = v2.join(dim, "skey").agg(sum(col("x")), sum(col("y")), count(lit(1))).count()
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", true)
      n
    }
    joinCount(dpp = true) // warm
    val tDpp = timed("join: runtime filter ON")(joinCount(dpp = true))
    val tNo = timed("join: runtime filter OFF")(joinCount(dpp = false))

    // the same reject gate under a STATIC pushed predicate (no subquery):
    // isolates the per-line save from DPP's dim-first serialization
    def statAgg(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("skey") < nSeries / 100L).agg(sum("x"), sum("y"), count(lit(1))).count()
    statAgg(v2); statAgg(plain)
    val tSv2 = timed("static 1% filter: V2 gate")(statAgg(v2))
    val tSpl = timed("static 1% filter: plain CSV")(statAgg(plain))
    // was the runtime filter actually delivered?
    def delivery(tag: String)(dim: org.apache.spark.sql.DataFrame): Unit = {
      val j = v2.join(dim, "skey").select(count(lit(1)))
      j.collect()
      val plan = j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        Seq(p) ++ (p.children ++ (p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case _ => Nil
        })).flatMap(all)
      val delivered = all(plan).collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          (b.runtimeFilters.size, b.runtimeFilters.map(_.getClass.getSimpleName))
      }
      println(s"PROBE delivery[$tag]: $delivered")
    }
    delivery("local+ge")(dimKeys.toDF("skey").filter(col("skey") >= 0L))
    delivery("range+le")(spark.range(0, nSeries).toDF("skey").filter(col("skey") <= nSeries / 100))
    delivery("range+mod")(spark.range(0, nSeries).toDF("skey").filter(col("skey") % (nSeries / 40L) === 0L))

    // TOP-N pushdown (round 14): ORDER BY x DESC LIMIT 10 — the V2 reader
    // keeps a size-10 heap per file (≤ 10 rows shipped per file), the
    // plain CSV plan feeds every line into TakeOrderedAndProject
    def topOf(df: org.apache.spark.sql.DataFrame): Long =
      df.orderBy(col("x").desc, col("skey"), col("ord")).limit(10).count()
    topOf(v2); topOf(plain)
    val tTv2 = timed("topn: V2 per-file heap")(topOf(v2))
    val tTpl = timed("topn: plain CSV")(topOf(plain))

    // FILE ELIMINATION (round 14): the key-ranged layout + sidecar vs the
    // same selective probe on the unranged layout (per-line gate only).
    // This is the contract's real 100-TB story — open only the files
    // whose range can hold the key.
    val rangedDir = s"$tmp/ranged"
    graft.sources.SeriesSource.writeKeyRanged(plain, rangedDir, 32)
    val v2r = spark.read.format("graft.sources.SeriesV2").load(rangedDir)
    def probeOne(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("skey") === nSeries / 2L).agg(sum("x"), count(lit(1))).count()
    probeOne(v2r); probeOne(v2)
    val tRanged = timed("1-key probe: ranged+sidecar")(probeOne(v2r))
    val tFlat = timed("1-key probe: unranged gate")(probeOne(v2))

    // KEY-GROUPED layout contracts (round 15): same total lines reshaped
    // to 128 long series so the one-file-per-key layout stays bounded.
    //  - COMPLETE keyed fold (no merge agg, no exchange) vs the ranged
    //    layout's PARTIAL fold + exchange + merge;
    //  - storage-partitioned JOIN (both sides keyed, broadcast off, zero
    //    exchange) vs the ranged pair's shuffle join.
    val nK = 128L
    val wide = spark.range(0L, nSeries * nPoints, 1L, 64)
      .select(
        (col("id") % nK).as("skey"),
        (col("id") / nK).as("ord"),
        (col("id") % 9973).cast("double").as("x"),
        ((col("id") + 7) % 9973).cast("double").as("y")
      )
    val kgDir = s"$tmp/kg"
    val krDir = s"$tmp/kr"
    graft.sources.SeriesSource.writeKeyGrouped(wide, kgDir, 32)
    graft.sources.SeriesSource.writeKeyRanged(wide, krDir, nK.toInt)
    val digest = wide
      .groupBy("skey")
      .agg(min(col("x")).as("x"))
      .select(col("skey"), lit(0L).as("ord"), col("x"), lit(0.0).as("y"))
    graft.sources.SeriesSource.writeKeyGrouped(digest, s"$tmp/kgd", 8)
    graft.sources.SeriesSource.writeKeyRanged(digest, s"$tmp/krd", 8)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val vkg = spark.read.format("graft.sources.SeriesV2").load(kgDir)
    val vkr = spark.read.format("graft.sources.SeriesV2").load(krDir)
    aggOf(vkg); aggOf(vkr)
    val tKg = timed("agg: keyed COMPLETE fold")(aggOf(vkg))
    val tKr = timed("agg: ranged PARTIAL fold")(aggOf(vkr))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def joinOf(fact: org.apache.spark.sql.DataFrame, dim: org.apache.spark.sql.DataFrame): Long =
      fact
        .join(dim.select(col("skey"), col("x").as("minx")), "skey")
        .groupBy("skey")
        .agg(sum(col("x") - col("minx")).as("s"), count(lit(1)).as("n"))
        .count()
    val dkg = spark.read.format("graft.sources.SeriesV2").load(s"$tmp/kgd")
    val dkr = spark.read.format("graft.sources.SeriesV2").load(s"$tmp/krd")
    joinOf(vkg, dkg); joinOf(vkr, dkr)
    val tSpj = timed("join: SPJ (both keyed)")(joinOf(vkg, dkg))
    val tShj = timed("join: shuffle (ranged)")(joinOf(vkr, dkr))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")

    println(f"PROBE summary series=$nSeries points=$nPoints " +
      f"agg_speedup=${tPlain / tPush}%.2fx dpp_speedup=${tNo / tDpp}%.2fx static_speedup=${tSpl / tSv2}%.2fx " +
      f"topn_speedup=${tTpl / tTv2}%.2fx fileprune_speedup=${tFlat / tRanged}%.2fx " +
      f"keyed_complete_speedup=${tKr / tKg}%.2fx spj_speedup=${tShj / tSpj}%.2fx")
    graft.GateResult.deleteRecursively(java.nio.file.Paths.get(tmp))
    spark.stop()
  }
}
