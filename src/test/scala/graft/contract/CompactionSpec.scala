package graft.contract

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The point of compaction: fewer files, identical data. */
class CompactionSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def parquetFiles(p: String): Seq[Path] =
    Files
      .list(Paths.get(p))
      .iterator()
      .asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .toSeq

  test("compaction reduces file count without changing a row") {
    val (landing, compacted, tmp) =
      SinkQueries.writeLandingAndCompact(spark, dir, "compspec")
    try {
      val nLanding = parquetFiles(landing).size
      val nCompacted = parquetFiles(compacted).size
      assert(nLanding == 32, s"landing zone should carry full task parallelism, got $nLanding")
      assert(
        nCompacted < nLanding,
        s"compaction produced $nCompacted files from $nLanding — no consolidation"
      )
      val key = (p: String) =>
        spark.read
          .parquet(p)
          .agg(
            count(lit(1)),
            sum(col("event_id")),
            sum(round(col("value") * 100.0).cast("long"))
          )
          .head()
          .toSeq
      assert(key(landing) == key(compacted), "compaction changed the data")
    } finally graft.GateResult.deleteRecursively(Paths.get(tmp))
  }
}
