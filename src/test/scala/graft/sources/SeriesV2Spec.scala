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

  private def scanOf(df: org.apache.spark.sql.DataFrame): SeriesV2.SeriesScan =
    df.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b.scan.asInstanceOf[SeriesV2.SeriesScan] }
      .getOrElse(fail("no BatchScanExec in the plan"))

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
