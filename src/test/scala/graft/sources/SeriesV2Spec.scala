package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkTestBase

/** Pins for the [[SeriesV2]] DataSource V2 contracts: result equality with
  * the plain CSV reader, the pruned read schema, pushed-filter evaluation
  * (and its absence from the post-scan plan), and the malformed-line skip.
  */
class SeriesV2Spec extends SparkTestBase {

  private def writeSample(): String = {
    val tmp = Files.createTempDirectory("sv2spec").toString
    val rows = (0L until 6L).flatMap(k => (0L until 4L).map(o => (k, o, k + o * 0.25, k - o * 0.5)))
    import spark.implicits._
    rows.toDF("skey", "ord", "x", "y").coalesce(1).write.option("header", "true").csv(s"$tmp/d")
    s"$tmp/d"
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): SeriesV2.SeriesScan = {
    // agg/shuffle plans come back AQE-wrapped; materialize and unwrap
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        df.collect(); a.executedPlan
      case p => p
    }
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      Seq(p) ++ (p.children ++ (p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => Nil
      })).flatMap(allNodes)
    allNodes(plan)
      .collectFirst { case b: BatchScanExec => b.scan.asInstanceOf[SeriesV2.SeriesScan] }
      .getOrElse(fail("no BatchScanExec in the plan"))
  }

  test("reads exactly what the built-in CSV reader reads") {
    val dir = writeSample()
    val v2 = spark.read.format("graft.sources.SeriesV2").load(dir).collect().toSet
    val csv = SeriesSource.wideCsv(spark, dir).collect().toSet
    assert(v2 == csv)
    assert(v2.size == 24)
  }

  test("column pruning reaches the scan: a two-column projection parses a two-column schema") {
    val dir = writeSample()
    val df = spark.read.format("graft.sources.SeriesV2").load(dir).select("skey", "x")
    val scan = scanOf(df)
    assert(scan.readSchema() == StructType(SeriesV2.Schema.filter(f => Set("skey", "x")(f.name))))
    assert(df.collect().map(_.getDouble(1)).sum > 0.0)
  }

  test("skey predicates push into the reader, are fully evaluated there, and leave the post-scan plan") {
    val dir = writeSample()
    val df = spark.read
      .format("graft.sources.SeriesV2")
      .load(dir)
      .filter(col("skey") > 1L && col("skey") <= 3L)
    val scan = scanOf(df)
    assert(scan.description().contains("GreaterThan(skey,1)"), scan.description())
    assert(scan.description().contains("LessThanOrEqual(skey,3)"), scan.description())
    // pushed = handled: no FilterExec re-checks skey above the scan
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.contains("Filter "), s"pushed predicate re-filtered above the scan:\n$planStr")
    val keys = df.collect().map(_.getLong(0)).toSet
    assert(keys == Set(2L, 3L))
  }

  test("a non-skey predicate stays with Spark and still evaluates correctly") {
    val dir = writeSample()
    val df = spark.read.format("graft.sources.SeriesV2").load(dir).filter(col("x") > 4.0)
    val scan = scanOf(df)
    assert(scan.description().contains("PushedSkeyFilters=[]"), scan.description())
    assert(df.count() == SeriesSource.wideCsv(spark, dir).filter(col("x") > 4.0).count())
  }

  test("LIMIT pushes into the scan as a per-partition early stop; global semantics unchanged") {
    val dir = writeSample()
    val df = spark.read.format("graft.sources.SeriesV2").load(dir).limit(7)
    val scan = scanOf(df)
    assert(scan.description().contains("PushedLimit=7"), scan.description())
    assert(df.count() == 7) // Spark's global Limit stays above (isPartiallyPushed)
    // limit composes with a pushed filter: reader stops after 2 matching rows
    val df2 = spark.read.format("graft.sources.SeriesV2").load(dir).filter(col("skey") === 2L).limit(2)
    assert(scanOf(df2).description().contains("PushedLimit=2"), scanOf(df2).description())
    assert(df2.collect().map(_.getLong(0)).toSeq == Seq(2L, 2L))
    // no-limit scans are unaffected
    val df3 = spark.read.format("graft.sources.SeriesV2").load(dir)
    assert(scanOf(df3).description().contains("PushedLimit=none"), scanOf(df3).description())
    assert(df3.count() == 24)
  }

  test("grouped aggregates push into the scan as a per-file fold; values match the unpushed plan") {
    val dir = writeSample()
    def agged(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("skey") > 1L)
        .groupBy("skey")
        .agg(
          count(lit(1)).as("n"),
          min(col("ord")).as("ord_min"),
          max(col("x")).as("x_max"),
          sum(col("ord")).as("ord_sum")
        )
    val pushed = agged(spark.read.format("graft.sources.SeriesV2").load(dir))
    val scan = scanOf(pushed)
    assert(
      scan.description().contains("PushedAggregation=[GROUP BY skey, COUNT(*), MIN(ord), MAX(x), SUM(ord)]"),
      scan.description()
    )
    // the scan's output IS the partial-agg schema — one row per (file, skey), not per line
    assert(scan.readSchema().fieldNames.toSeq == Seq("skey", "agg_0", "agg_1", "agg_2", "agg_3"))
    val exp = agged(SeriesSource.wideCsv(spark, dir)).collect().map(_.toSeq).toSet
    assert(pushed.collect().map(_.toSeq).toSet == exp)
  }

  test("single-file layout upgrades the pushed aggregate to COMPLETE: no merge Aggregate survives") {
    val dir = writeSample() // coalesce(1): one data file
    val df = spark.read.format("graft.sources.SeriesV2").load(dir)
      .groupBy("skey").agg(count(lit(1)).as("n"), max(col("x")).as("x_max"))
    val rows = df.collect()
    assert(rows.length == 6)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), s"merge Aggregate survived a complete pushdown:\n$plan")
    // multi-file: same query downgrades to PARTIAL (groups span files)
    val dir2 = {
      val tmp = Files.createTempDirectory("sv2multi").toString
      val rows2 = (0L until 6L).flatMap(k => (0L until 4L).map(o => (k, o, k + o * 0.25, k - o * 0.5)))
      import spark.implicits._
      rows2.toDF("skey", "ord", "x", "y").repartition(4).write.option("header", "true").csv(s"$tmp/d")
      s"$tmp/d"
    }
    val df2 = spark.read.format("graft.sources.SeriesV2").load(dir2)
      .groupBy("skey").agg(count(lit(1)).as("n"), max(col("x")).as("x_max"))
    assert(df2.collect().map(_.toSeq).toSet == rows.map(_.toSeq).toSet)
    val plan2 = df2.queryExecution.executedPlan.toString
    assert(plan2.contains("HashAggregate"), s"partial pushdown lost its merge Aggregate:\n$plan2")
  }

  test("a global aggregate over zero matching rows still counts 0 (empty-partition partial row)") {
    val dir = writeSample()
    val df = spark.read
      .format("graft.sources.SeriesV2")
      .load(dir)
      .filter(col("skey") > 1000L)
      .agg(count(lit(1)).as("n"), min(col("x")).as("x_min"))
    assert(scanOf(df).description().contains("PushedAggregation=[COUNT(*), MIN(x)]"), scanOf(df).description())
    val row = df.collect().head
    assert(row.getLong(0) == 0L, "count over nothing must be 0, not a missing row")
    assert(row.isNullAt(1), "min over nothing is NULL")
  }

  test("SUM over a double column is refused: the scan stays in row mode") {
    val dir = writeSample()
    val df = spark.read.format("graft.sources.SeriesV2").load(dir).groupBy("skey").agg(sum(col("x")).as("sx"))
    val scan = scanOf(df)
    assert(scan.description().contains("PushedAggregation=[]"), scan.description())
    val exp = SeriesSource.wideCsv(spark, dir).groupBy("skey").agg(sum(col("x")).as("sx")).collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == exp)
  }

  test("a selective broadcast join delivers a runtime skey filter that the reader applies") {
    val dir = writeSample()
    val fact = spark.read.format("graft.sources.SeriesV2").load(dir)
    val dim = spark.range(0, 6).toDF("skey").filter(col("skey") <= 2L)
    val joined = fact.join(dim, "skey")
    val rows = joined.collect()
    assert(rows.length == 12, "skeys 0,1,2 x 4 points each")
    val scan = scanOf(joined)
    assert(
      scan.runtimeSpecs.nonEmpty,
      s"runtime filter never reached the scan: ${joined.queryExecution.executedPlan}"
    )
    // the delivered set is exactly the dim side's keys
    val in = scan.runtimeSpecs.find(_.op == 5)
    in.foreach(fs => assert(fs.set.toSeq == Seq(0L, 1L, 2L), fs.set.toSeq.toString))
    assert(Seq(0L, 1L, 2L).forall(k => scan.runtimeSpecs.forall(_.accepts(k))))
    assert(!scan.runtimeSpecs.forall(_.accepts(5L)), "non-member keys must be rejected in the reader")
  }

  test("reported size statistics make a small series directory auto-broadcastable") {
    val dir = writeSample()
    val df = spark.read.format("graft.sources.SeriesV2").load(dir)
    // the logical stats are the file bytes scaled by column fraction —
    // not the "unknown = infinite" default that forbids broadcasting
    val stats = df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats > 0 && stats < (1L << 20), s"expected file-listing-sized stats, got $stats")
    val big = spark.range(0, 100000).withColumn("skey", col("id") % 6)
    val joined = big.join(df, "skey")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"small V2 side was not broadcast:\n$plan")
  }

  test("filterAttributes follows the scan output: a skey-pruned projection joins without crashing") {
    val dir = writeSample()
    val v2 = spark.read.format("graft.sources.SeriesV2").load(dir)
    // regression: advertising skey unconditionally made Spark resolve it
    // against the pruned output [ord, x] and fail planning with
    // 'Unable to resolve skey given [ord]' on this valid query
    val dim = spark.range(0, 2).toDF("o")
    val joined = v2.select("ord", "x").join(dim, col("ord") === col("o"))
    assert(joined.count() == 12, "skey-free join must plan and run")
    assert(scanOf(joined).filterAttributes().isEmpty, "pruned skey must not be advertised")
    // a pushed GLOBAL aggregate rewrites the output to agg columns — also no skey
    val g = v2.agg(count(lit(1)).as("n"))
    assert(scanOf(g).filterAttributes().isEmpty, "global-agg output has no skey to filter")
    // but a groupBy(skey) keeps it, and so does a plain skey-bearing read
    val gk = v2.groupBy("skey").agg(count(lit(1)).as("n"))
    assert(scanOf(gk).filterAttributes().map(_.describe()).toSeq == Seq("skey"))
    assert(scanOf(v2.select("skey", "x")).filterAttributes().map(_.describe()).toSeq == Seq("skey"))
  }

  test("pushed double MIN/MAX use Spark's total order: NaN is the max, not a comparison sink") {
    val tmp = Files.createTempDirectory("sv2nan").toString
    Files.writeString(
      java.nio.file.Paths.get(s"$tmp/f.csv"),
      "skey,ord,x,y\n1,0,NaN,2.0\n1,1,5.0,NaN\n1,2,3.0,1.0\n"
    )
    def agged(df: org.apache.spark.sql.DataFrame) =
      df.agg(min(col("x")).as("xmin"), max(col("x")).as("xmax"), min(col("y")).as("ymin"), max(col("y")).as("ymax"))
    val v2 = spark.read.format("graft.sources.SeriesV2").load(s"$tmp/f.csv")
    val pushed = agged(v2)
    assert(scanOf(pushed).description().contains("MIN(x)"), scanOf(pushed).description())
    val got = pushed.collect().head
    // the UNPUSHED plan of the same source (a non-pushable ord filter
    // stays above the scan, which vetoes aggregate pushdown): the pushed
    // fold must agree with Spark's own min/max total order on NaN
    val unpushed = agged(v2.filter(col("ord") >= 0L))
    assert(scanOf(unpushed).description().contains("PushedAggregation=[]"), scanOf(unpushed).description())
    val exp = unpushed.collect().head
    assert(got.getDouble(0) == exp.getDouble(0) && got.getDouble(0) == 3.0, "min(x) skips NaN")
    assert(got.getDouble(1).isNaN && exp.getDouble(1).isNaN, "max(x) is NaN (NaN > everything)")
    assert(got.getDouble(2) == exp.getDouble(2) && got.getDouble(2) == 1.0)
    assert(got.getDouble(3).isNaN && exp.getDouble(3).isNaN)
  }

  test("COMPLETE pushdown executes against the judged file listing, not a re-list (TOCTOU)") {
    val dir = writeSample() // one data file → COMPLETE claimable
    val df = spark.read.format("graft.sources.SeriesV2").load(dir)
      .groupBy("skey").agg(count(lit(1)).as("n"))
    df.queryExecution.optimizedPlan // forces pushdown: COMPLETE judged NOW, listing snapshotted
    // a file landing between planning and execution must NOT become an
    // unmerged per-file partial under the already-dropped merge Aggregate
    val extra = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv")).head
    Files.copy(extra.toPath, java.nio.file.Paths.get(s"$dir/late-arrival.csv"))
    val rows = df.collect()
    assert(rows.length == 6, s"snapshot violated: ${rows.length} rows (duplicate per-file partials?)")
    assert(rows.map(_.getLong(1)).forall(_ == 4L), "counts must come from the judged single file")
  }

  test("sizeInBytes floors the column fraction: an all-pruned scan never reports ~1 byte") {
    val dir = writeSample()
    val b = new SeriesV2.SeriesScanBuilder(dir)
    b.pruneColumns(StructType(Nil))
    val scan = b.build().asInstanceOf[SeriesV2.SeriesScan]
    val raw = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv")).map(_.length()).sum
    val reported = scan.estimateStatistics().sizeInBytes()
    assert(reported.isPresent && reported.getAsLong >= raw / 4,
      s"reported ${reported} vs raw $raw — an under-report auto-broadcasts arbitrarily large dirs")
  }

  test("ORDER BY + LIMIT pushes as per-partition top-N; global order and values unchanged") {
    val dir = writeSample()
    def topq(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("skey") > 0L).orderBy(col("x").desc, col("ord")).limit(5)
    val pushed = topq(spark.read.format("graft.sources.SeriesV2").load(dir))
    val scan = scanOf(pushed)
    assert(scan.description().contains("PushedTopN=[x DESC, ord ASC, limit 5]"), scan.description())
    val exp = topq(SeriesSource.wideCsv(spark, dir)).collect().map(_.toSeq).toSeq
    assert(pushed.collect().map(_.toSeq).toSeq == exp, "Sort above must see enough survivors")
    // multi-file: ≤ n per file reaches the global sort, values still exact
    val dir2 = {
      val tmp = Files.createTempDirectory("sv2topn").toString
      val rows2 = (0L until 6L).flatMap(k => (0L until 4L).map(o => (k, o, k + o * 0.25, k - o * 0.5)))
      import spark.implicits._
      rows2.toDF("skey", "ord", "x", "y").repartition(4).write.option("header", "true").csv(s"$tmp/d")
      s"$tmp/d"
    }
    val pushed2 = topq(spark.read.format("graft.sources.SeriesV2").load(dir2))
    assert(scanOf(pushed2).description().contains("PushedTopN=[x DESC, ord ASC, limit 5]"))
    assert(pushed2.collect().map(_.toSeq).toSeq == exp)
  }

  test("OFFSET pushes only on the single-file layout, where it is globally exact") {
    val dir = writeSample() // single file
    val df = spark.read.format("graft.sources.SeriesV2").load(dir).offset(20)
    val scan = scanOf(df)
    assert(scan.description().contains("PushedOffset=20"), scan.description())
    assert(df.count() == 4, "24 rows - 20 offset")
    assert(df.collect().map(_.getLong(0)).toSet == Set(5L), "the tail rows are series 5's")
    // multi-file: refused — per-partition skipping would drop the wrong rows
    val dir2 = {
      val tmp = Files.createTempDirectory("sv2off").toString
      val rows2 = (0L until 6L).flatMap(k => (0L until 4L).map(o => (k, o, k + o * 0.25, k - o * 0.5)))
      import spark.implicits._
      rows2.toDF("skey", "ord", "x", "y").repartition(4).write.option("header", "true").csv(s"$tmp/d")
      s"$tmp/d"
    }
    val df2 = spark.read.format("graft.sources.SeriesV2").load(dir2).offset(20)
    assert(scanOf(df2).description().contains("PushedOffset=none"), scanOf(df2).description())
    assert(df2.count() == 4, "Spark's own Offset still applies above the scan")
  }

  test("key-ranged layout: the sidecar eliminates whole files for selective static predicates") {
    val tmp = Files.createTempDirectory("sv2ranged").toString
    val rows = (0L until 64L).flatMap(k => (0L until 8L).map(o => (k, o, k + o * 0.25, k - o * 0.5)))
    import spark.implicits._
    SeriesSource.writeKeyRanged(rows.toDF("skey", "ord", "x", "y"), s"$tmp/d", nFiles = 8)
    assert(Files.exists(java.nio.file.Paths.get(s"$tmp/d/_ranges.csv")), "sidecar written")
    val all = spark.read.format("graft.sources.SeriesV2").load(s"$tmp/d")
    assert(scanOf(all).planInputPartitions().length == 8, "no predicate: all files planned")
    // a selective probe plans only the file(s) whose range can hold the key
    val probe = all.filter(col("skey") === 3L)
    val scan = scanOf(probe)
    val planned = scan.planInputPartitions().length
    assert(planned < 8 && planned >= 1, s"expected pruned plan, got $planned of 8 files")
    assert(probe.collect().map(_.getLong(0)).toSet == Set(3L), "values unchanged by pruning")
    // range predicates prune too, and keep every overlapping file
    val range = all.filter(col("skey") >= 40L && col("skey") < 56L)
    assert(scanOf(range).planInputPartitions().length < 8)
    assert(range.count() == 16 * 8)
    // pruned statistics: the selective probe reports a fraction of the bytes
    val statAll = all.queryExecution.optimizedPlan.stats.sizeInBytes
    val statProbe = probe.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(statProbe < statAll, s"pruned stats $statProbe !< $statAll")
  }

  test("key-ranged layout: a join-delivered runtime filter eliminates files at execution") {
    val tmp = Files.createTempDirectory("sv2rangedrt").toString
    val rows = (0L until 64L).flatMap(k => (0L until 8L).map(o => (k, o, k + o * 0.25, k - o * 0.5)))
    import spark.implicits._
    SeriesSource.writeKeyRanged(rows.toDF("skey", "ord", "x", "y"), s"$tmp/d", nFiles = 8)
    val fact = spark.read.format("graft.sources.SeriesV2").load(s"$tmp/d")
    val dim = spark.range(0, 64).toDF("skey").filter(col("skey") < 8L)
    val joined = fact.join(dim, "skey")
    assert(joined.count() == 8 * 8)
    val scan = scanOf(joined)
    assert(scan.runtimeSpecs.nonEmpty, "runtime filter must be delivered")
    // the scan's execution-time plan (post-delivery) opens only matching files
    val planned = scan.planInputPartitions().length
    assert(planned < 8 && planned >= 1, s"runtime pruning planned $planned of 8 files")
  }

  test("file pruning never breaks the global-aggregate empty-input contract") {
    val tmp = Files.createTempDirectory("sv2rangedagg").toString
    val rows = (0L until 16L).flatMap(o => Seq((1L, o, o * 1.0, o * 2.0)))
    import spark.implicits._
    SeriesSource.writeKeyRanged(rows.toDF("skey", "ord", "x", "y"), s"$tmp/d", nFiles = 2)
    val df = spark.read
      .format("graft.sources.SeriesV2")
      .load(s"$tmp/d")
      .filter(col("skey") > 1000L) // no file can match
      .agg(count(lit(1)).as("n"), min(col("x")).as("x_min"))
    val row = df.collect().head
    assert(row.getLong(0) == 0L, "count over nothing must still be 0 — pruning must not drop the partial row")
    assert(row.isNullAt(1))
  }

  test("mayMatchRange covers every predicate shape") {
    import SeriesV2.FilterSpec
    assert(FilterSpec(0, 5).mayMatchRange(1, 9) && !FilterSpec(0, 10).mayMatchRange(1, 9))
    assert(FilterSpec(1, 8).mayMatchRange(1, 9) && !FilterSpec(1, 9).mayMatchRange(1, 9))
    assert(FilterSpec(2, 9).mayMatchRange(1, 9) && !FilterSpec(2, 10).mayMatchRange(1, 9))
    assert(FilterSpec(3, 2).mayMatchRange(1, 9) && !FilterSpec(3, 1).mayMatchRange(1, 9))
    assert(FilterSpec(4, 1).mayMatchRange(1, 9) && !FilterSpec(4, 0).mayMatchRange(1, 9))
    val in = FilterSpec(5, 0L, Array(3L, 12L))
    assert(in.mayMatchRange(1, 9) && in.mayMatchRange(10, 20) && !in.mayMatchRange(4, 9) && !in.mayMatchRange(13, 99))
  }

  private def finalPlanStr(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }

  test("key-grouped layout: groupBy(skey) aggregate pushes COMPLETE — no merge agg, no exchange") {
    val tmp = Files.createTempDirectory("sv2keygroup").toString
    val rows = (0L until 6L).flatMap(k => (0L until 4L).map(o => (k, o, k + o * 0.25, k - o * 0.5)))
    import spark.implicits._
    SeriesSource.writeKeyGrouped(rows.toDF("skey", "ord", "x", "y"), s"$tmp/d", nTasks = 4)
    assert(Files.exists(java.nio.file.Paths.get(s"$tmp/d/_ranges.csv")), "sidecar written")
    def agged(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("skey").agg(count(lit(1)).as("n"), max(col("x")).as("x_max"), sum(col("ord")).as("ord_sum"))
    val df = agged(spark.read.format("graft.sources.SeriesV2").load(s"$tmp/d"))
    val got = df.collect().map(_.toSeq).toSet
    assert(got.map(_.head).toSet == (0L until 6L).map(x => x: Any).toSet)
    // every group lives wholly in one file -> the per-file fold IS the
    // global answer: COMPLETE pushdown, zero HashAggregate, zero Exchange
    val planStr = finalPlanStr(df)
    assert(!planStr.contains("HashAggregate"), s"merge agg survived a keyed COMPLETE pushdown:\n$planStr")
    assert(!planStr.contains("Exchange"), s"keyed COMPLETE pushdown still shuffled:\n$planStr")
    // value check against the flat ranged-layout twin of the same rows
    val tmp2 = Files.createTempDirectory("sv2keygroupref").toString
    SeriesSource.writeKeyRanged(rows.toDF("skey", "ord", "x", "y"), s"$tmp2/d", nFiles = 4)
    val ref = agged(spark.read.format("graft.sources.SeriesV2").load(s"$tmp2/d")).collect().map(_.toSeq).toSet
    assert(got == ref, "keyed plan values must match the ranged-layout plan")
  }

  test("key-grouped layout: row-mode groupBy(skey) plans with NO shuffle (storage-partitioned read)") {
    val tmp = Files.createTempDirectory("sv2keygrouprow").toString
    val rows = (0L until 6L).flatMap(k => (0L until 4L).map(o => (k, o, k + o * 0.25, k - o * 0.5)))
    import spark.implicits._
    SeriesSource.writeKeyGrouped(rows.toDF("skey", "ord", "x", "y"), s"$tmp/d", nTasks = 4)
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      // SUM over a double is refused by the fold, so the scan stays in row
      // mode — this is exactly the shape the KeyGroupedPartitioning report
      // exists for: partial+final aggregate co-located per key, no exchange
      def agged(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("skey").agg(sum(col("x")).as("sx"))
      val df = agged(spark.read.format("graft.sources.SeriesV2").load(s"$tmp/d"))
      val scan = scanOf(df)
      assert(scan.description().contains("KeyGroupedBySkey=true"), scan.description())
      assert(
        scan.outputPartitioning().isInstanceOf[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]
      )
      assert(scan.planInputPartitions().forall(_.isInstanceOf[SeriesV2.KeyedSeriesInputPartition]))
      val got = df.collect().map(_.toSeq).toSet
      val planStr = finalPlanStr(df)
      assert(planStr.contains("HashAggregate"), s"row-mode scan must aggregate above:\n$planStr")
      assert(!planStr.contains("Exchange"), s"storage-partitioned groupBy still shuffled:\n$planStr")
      val tmp2 = Files.createTempDirectory("sv2keygrouprowref").toString
      SeriesSource.writeKeyRanged(rows.toDF("skey", "ord", "x", "y"), s"$tmp2/d", nFiles = 4)
      val ref = agged(spark.read.format("graft.sources.SeriesV2").load(s"$tmp2/d")).collect().map(_.toSeq).toSet
      assert(got == ref, "keyed plan values must match the ranged-layout plan")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None    => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("key-grouped layout: static skey predicates still eliminate files under the keyed claim") {
    val tmp = Files.createTempDirectory("sv2keygroupprune").toString
    val rows = (0L until 8L).flatMap(k => (0L until 3L).map(o => (k, o, k * 1.0 + o, k - o * 2.0)))
    import spark.implicits._
    SeriesSource.writeKeyGrouped(rows.toDF("skey", "ord", "x", "y"), s"$tmp/d", nTasks = 4)
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val df = spark.read
        .format("graft.sources.SeriesV2")
        .load(s"$tmp/d")
        .filter(col("skey") >= 2L && col("skey") < 5L)
        .groupBy("skey")
        .agg(count(lit(1)).as("n"))
      val scan = scanOf(df)
      assert(scan.planInputPartitions().length == 3, "static prune keeps exactly skeys 2,3,4")
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((2L, 3L), (3L, 3L), (4L, 3L)))
      // a join-delivered runtime filter must not shrink the PARTITION set
      // (BatchScanExec rejects a changed key set under the keyed claim);
      // rows are still dropped in the readers and re-checked by the join
      val dim = spark.range(0, 8).toDF("skey").filter(col("skey") === 3L)
      val joined = spark.read.format("graft.sources.SeriesV2").load(s"$tmp/d").join(dim, "skey")
      assert(joined.count() == 3, "skey 3 has 3 points")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None    => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("storage-partitioned JOIN: two key-grouped layouts join on skey with no shuffle") {
    val tmp = Files.createTempDirectory("sv2spj").toString
    import spark.implicits._
    val rowsA = (0L until 6L).flatMap(k => (0L until 4L).map(o => (k, o, k + o * 0.25, 0.0)))
    val rowsB = (0L until 6L).flatMap(k => (0L until 3L).map(o => (k, o, k * 2.0 + o, 0.0)))
    SeriesSource.writeKeyGrouped(rowsA.toDF("skey", "ord", "x", "y"), s"$tmp/a", nTasks = 4)
    SeriesSource.writeKeyGrouped(rowsB.toDF("skey", "ord", "x", "y"), s"$tmp/b", nTasks = 4)
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevBc = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // the reported size stats make these tiny sides broadcastable, which
    // would bypass the partitioned-join path (and BroadcastExchange would
    // trip the no-Exchange pin) — force the shuffle-join planner branch,
    // which SPJ then makes exchange-free
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.read.format("graft.sources.SeriesV2").load(s"$tmp/a").select(col("skey"), col("x"))
      val b = spark.read.format("graft.sources.SeriesV2").load(s"$tmp/b").select(col("skey"), col("x").as("bx"))
      val j = a.join(b, "skey").groupBy("skey").agg(count(lit(1)).as("n"), sum(expr("CAST(x * bx * 4 AS BIGINT)")).as("dot4"))
      val got = j.collect().map(_.toSeq).toSet
      // 4 x-rows x 3 bx-rows per key
      assert(got.map(r => (r.head, r(1))).toSet == (0L until 6L).map(k => (k: Any, 12L: Any)).toSet)
      val planStr = finalPlanStr(j)
      assert(
        !planStr.contains("Exchange"),
        s"storage-partitioned join still shuffled:\n$planStr"
      )
      // value check against the flat layouts of the same rows
      val tmp2 = Files.createTempDirectory("sv2spjref").toString
      SeriesSource.writeKeyRanged(rowsA.toDF("skey", "ord", "x", "y"), s"$tmp2/a", nFiles = 4)
      SeriesSource.writeKeyRanged(rowsB.toDF("skey", "ord", "x", "y"), s"$tmp2/b", nFiles = 4)
      val ar = spark.read.format("graft.sources.SeriesV2").load(s"$tmp2/a").select(col("skey"), col("x"))
      val br = spark.read.format("graft.sources.SeriesV2").load(s"$tmp2/b").select(col("skey"), col("x").as("bx"))
      val ref = ar.join(br, "skey").groupBy("skey").agg(count(lit(1)).as("n"), sum(expr("CAST(x * bx * 4 AS BIGINT)")).as("dot4"))
        .collect().map(_.toSeq).toSet
      assert(got == ref, "SPJ values must match the ranged-layout join")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None    => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      prevBc match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  test("non-keyed layouts never claim partitioning; multi-key ranged files stay unkeyed") {
    val tmp = Files.createTempDirectory("sv2notkeyed").toString
    val rows = (0L until 16L).flatMap(k => (0L until 2L).map(o => (k, o, k * 1.0, o * 1.0)))
    import spark.implicits._
    SeriesSource.writeKeyRanged(rows.toDF("skey", "ord", "x", "y"), s"$tmp/d", nFiles = 4)
    val df = spark.read.format("graft.sources.SeriesV2").load(s"$tmp/d").groupBy("skey").agg(count(lit(1)).as("n"))
    val scan = scanOf(df)
    assert(scan.description().contains("KeyGroupedBySkey=false"), scan.description())
    assert(
      scan.outputPartitioning().isInstanceOf[org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning]
    )
    assert(df.count() == 16)
  }

  test("one-pass writeKeyRanged sidecar equals the read-back-computed ranges") {
    val tmp = Files.createTempDirectory("sv2sidecar").toString
    val rows = (0L until 64L).flatMap(k => (0L until 8L).map(o => (k, o, k + o * 0.25, k - o * 0.5)))
    import spark.implicits._
    SeriesSource.writeKeyRanged(rows.toDF("skey", "ord", "x", "y"), s"$tmp/d", nFiles = 8)
    // reference: the old two-pass form — re-read every file, group by name
    val ref = spark.read
      .option("header", "true")
      .schema(SeriesV2.Schema)
      .csv(s"$tmp/d")
      .select(input_file_name().as("f"), col("skey"))
      .groupBy("f")
      .agg(min("skey").as("lo"), max("skey").as("hi"))
      .collect()
      .map(r => (new org.apache.hadoop.fs.Path(r.getString(0)).getName, r.getLong(1), r.getLong(2)))
      .toSet
    val sidecar = Files
      .readAllLines(java.nio.file.Paths.get(s"$tmp/d/_ranges.csv"))
      .toArray
      .drop(1)
      .map { l => val Array(f, lo, hi) = l.toString.split(","); (f, lo.toLong, hi.toLong) }
      .toSet
    assert(sidecar == ref, s"one-pass sidecar diverged:\n$sidecar\nvs read-back\n$ref")
    assert(sidecar.nonEmpty)
  }

  test("malformed lines are skipped, matching the wideCsv + na.drop contract") {
    val tmp = Files.createTempDirectory("sv2spec_bad").toString
    Files.writeString(
      java.nio.file.Paths.get(s"$tmp/f.csv"),
      "skey,ord,x,y\n1,0,1.5,2.5\nnot,a,valid,row\n2,zero,3.5,4.5\n3,1,4.5\n4,1,5.5,6.5\n"
    )
    val v2 = spark.read.format("graft.sources.SeriesV2").load(s"$tmp/f.csv").collect()
    assert(v2.map(_.getLong(0)).toSet == Set(1L, 4L), "only the two well-formed rows survive")
  }
}
