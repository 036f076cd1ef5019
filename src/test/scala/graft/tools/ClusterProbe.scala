package graft.tools

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Multi-executor probe (VERDICT r15 item 2): every prior measurement ran
  * single-JVM `local[32]`, so the contracts the 100-TB story rests on had
  * never planned across two executor PROCESSES. This main runs them on
  * `local-cluster[2,16,8192]` (default; SPARK_GRAFT_MASTER overrides):
  *
  *  1. `SeriesSource.writeKeyRanged` — the accumulator-built one-pass
  *     sidecar: entries must arrive from BOTH executors and the merged
  *     ranges must equal a read-back ground truth.
  *  2. The same accumulator+write-stage mechanism under a FORCED TASK
  *     RETRY (one write-stage task throws on attempt 0): the per-pid
  *     min/max merge must still equal ground truth — the idempotence
  *     claim in writeKeyRanged's scaladoc, measured.
  *  3. `SeriesSource.writeKeyGrouped` + the SPJ read: two key-grouped
  *     stores joined on skey + grouped aggregate under
  *     `spark.sql.sources.v2.bucketing.enabled` must plan with ZERO
  *     ShuffleExchangeExec across executors, and the values must match
  *     the same aggregate computed directly from the input.
  *  4. `SupportsReportStatistics` — a small series directory joined to a
  *     large fact must auto-broadcast (stats-driven, no hint).
  *
  * Environment (release-layout Spark needs the scala suffix spelled out
  * for the in-JVM executor launcher):
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   SPARK_GRAFT_SPARK_CONF='spark.executor.extraClassPath=<repo>/target/scala-2.13/classes;spark.executor.extraClassPath2=...' \
  *   sbt "Test/runMain graft.tools.ClusterProbe"
  * (test classes must also be on the executor classpath for probe 2's
  * injected-failure lambda: .../target/scala-2.13/test-classes)
  *
  * Prints PROBE lines; exits nonzero on any contract violation.
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,16,8192]")
    val spark = graft.ExtraConf
      .applyTo(
        SparkSession.builder()
          .master(master)
          .appName("graft-cluster-probe")
          .config("spark.sql.shuffle.partitions", 32)
          .config("spark.ui.enabled", "false")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failures = List.empty[String]
    def check(name: String)(ok: Boolean, detail: => String): Unit = {
      println(s"PROBE $name ${if (ok) "OK" else "VIOLATION"} $detail")
      if (!ok) failures ::= name
    }

    val tmp = Files.createTempDirectory("graft-cluster-probe").toString
    val nSeries = 97L
    val nRows = 2000000L
    val in = spark.range(0L, nRows, 1L, 64).select(
      (col("id") % nSeries).as("skey"),
      (col("id") divide nSeries).cast("long").as("ord"),
      (col("id") % 9973).cast("double").as("x"),
      ((col("id") + 7) % 9973).cast("double").as("y")
    )
    in.queryExecution.toRdd.count() // force executor registration before counting them
    // executors actually distinct processes? (paranoia: local[*] would
    // trivially pass everything below)
    val execs = spark.sparkContext.getExecutorMemoryStatus.keys.toSeq.sorted
    println(s"PROBE executors n=${execs.size} (driver included): ${execs.mkString(" ")}")

    // ---- 1. key-ranged write: accumulator sidecar from two executors
    graft.sources.SeriesSource.writeKeyRanged(in, s"$tmp/ranged", nFiles = 32)
    val sidecar = Files.readAllLines(java.nio.file.Paths.get(s"$tmp/ranged/_ranges.csv"))
      .asScala.drop(1)
      .map(_.split(",", -1))
      .collect { case Array(f, lo, hi) => f -> (lo.trim.toLong, hi.trim.toLong) }
      .toMap
    val truth = spark.read.option("header", "true")
      .schema("skey LONG, ord LONG, x DOUBLE, y DOUBLE")
      .csv(s"$tmp/ranged")
      .select(col("skey"), input_file_name().as("f"))
      .groupBy("f").agg(min("skey").as("lo"), max("skey").as("hi"))
      .collect()
      .map(r => (r.getString(0).split("/").last, (r.getLong(1), r.getLong(2))))
      .toMap
    val sidecarMatches = truth.forall { case (f, range) => sidecar.get(f).contains(range) }
    check("sidecar_two_executors")(
      sidecar.size == truth.size && sidecarMatches,
      s"sidecar=${sidecar.size} files, truth=${truth.size}, ranges_match=$sidecarMatches"
    )

    // ---- 2. the accumulator mechanism under a forced write-stage retry
    // (writeKeyRanged's exact shape: shuffle -> pass-through fold ->
    // file write, with one task failing AFTER folding rows on attempt 0)
    val acc = spark.sparkContext.collectionAccumulator[(Int, Long, Long)]("probe_ranges")
    import org.apache.spark.sql.{Encoders, Row}
    val schema = org.apache.spark.sql.types.StructType.fromDDL("skey LONG, ord LONG, x DOUBLE, y DOUBLE")
    val tracked = in
      .repartitionByRange(16, col("skey"), col("ord"))
      .sortWithinPartitions("skey", "ord")
      .mapPartitions { it =>
        val tc = TaskContext.get()
        new scala.collection.AbstractIterator[Row] {
          private var lo = Long.MaxValue
          private var hi = Long.MinValue
          private var n = 0L
          private var any = false
          private var reported = false
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h && any && !reported) {
              acc.add((tc.partitionId(), lo, hi))
              reported = true
              // fail AFTER reporting, first attempt of one task: a
              // retried task re-reports, and accumulator updates from
              // the failed attempt must not corrupt the merge
              if (tc.partitionId() == 3 && tc.attemptNumber() == 0)
                throw new RuntimeException("graft-cluster-probe injected failure")
            }
            h
          }
          override def next(): Row = {
            val r = it.next()
            val k = r.getLong(0)
            if (k < lo) lo = k
            if (k > hi) hi = k
            n += 1
            any = true
            r
          }
        }
      }(Encoders.row(schema))
    tracked.write.option("header", "true").mode("overwrite").csv(s"$tmp/retry")
    val byPid = acc.value.asScala.groupBy(_._1)
      .map { case (pid, es) => pid -> (es.map(_._2).min, es.map(_._3).max) }
    val retryTruth = spark.read.option("header", "true").schema(schema).csv(s"$tmp/retry")
      .agg(min("skey"), max("skey"), count(lit(1))).collect()(0)
    val mergedLo = byPid.values.map(_._1).min
    val mergedHi = byPid.values.map(_._2).max
    check("sidecar_mechanism_under_retry")(
      byPid.size == 16 && mergedLo == retryTruth.getLong(0) && mergedHi == retryTruth.getLong(1),
      s"pids=${byPid.size}/16 lo=$mergedLo/${retryTruth.getLong(0)} hi=$mergedHi/${retryTruth.getLong(1)} rows=${retryTruth.getLong(2)}"
    )

    // ---- 3. SPJ across executors: zero shuffles, values exact
    graft.sources.SeriesSource.writeKeyGrouped(in, s"$tmp/kg_a", nTasks = 16)
    val digest = in.groupBy("skey").agg(min(col("x")).as("x"))
      .select(col("skey"), lit(0L).as("ord"), col("x"), lit(0.0).as("y"))
    graft.sources.SeriesSource.writeKeyGrouped(digest, s"$tmp/kg_b", nTasks = 16)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val a = spark.read.format("graft.sources.SeriesV2").load(s"$tmp/kg_a").select(col("skey"), col("x"))
    val b = spark.read.format("graft.sources.SeriesV2").load(s"$tmp/kg_b").select(col("skey"), col("x").as("minx"))
    val spj = a.join(b, "skey").groupBy("skey")
      .agg(count(lit(1)).as("n"), sum(round((col("x") - col("minx")) * 100.0).cast("long")).as("spread_cents"))
    val spjRows = spj.collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    def exchanges(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val norm = p match { case a: AdaptiveSparkPlanExec => a.executedPlan; case o => o }
      norm.collect { case _: ShuffleExchangeExec => 1 }.sum +
        norm.collect { case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => s }.size
    }
    val nEx = exchanges(spj.queryExecution.executedPlan)
    val expected = in.groupBy("skey").agg(min(col("x")).as("minx"), collect_list(col("x")).as("xs"))
      .select(col("skey"), explode(col("xs")).as("x"), col("minx"))
      .groupBy("skey")
      .agg(count(lit(1)).as("n"), sum(round((col("x") - col("minx")) * 100.0).cast("long")).as("spread_cents"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    check("spj_zero_exchanges")(nEx == 0, s"shuffle_exchanges=$nEx")
    check("spj_values")(spjRows == expected, s"groups=${spjRows.size}/${expected.size}")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    // ---- 4. stats-driven auto-broadcast of a small series directory
    val small = in.filter(col("skey") < 5)
    graft.sources.SeriesSource.writeKeyRanged(small, s"$tmp/small", nFiles = 4)
    val dim = spark.read.format("graft.sources.SeriesV2").load(s"$tmp/small")
      .groupBy("skey").agg(count(lit(1)).as("dn"))
    val fact = spark.range(0L, 1000000L, 1L, 32).select((col("id") % nSeries).as("skey"), col("id").as("v"))
    val j = fact.join(dim, "skey").agg(sum("v"), sum("dn"))
    j.collect()
    val planStr = j.queryExecution.executedPlan.toString
    check("v2_stats_auto_broadcast")(
      planStr.contains("BroadcastHashJoin"),
      s"plan_has_bhj=${planStr.contains("BroadcastHashJoin")}"
    )

    graft.GateResult.deleteRecursively(java.nio.file.Paths.get(tmp))
    println(s"PROBE_DONE failures=${failures.sorted.mkString(",")}")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
