package graft.contract

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The point of z-ordering: a 2-D box predicate needs only the few files
  * whose per-file (min,max) stats intersect the box in BOTH dimensions —
  * exactly the footer-stat skipping a lakehouse engine performs. The
  * contrast layout (arrival order = event_id) leaves almost every file
  * spanning the full (ux, tx) space, so nothing can be skipped.
  */
class ZorderSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def parquetFiles(p: String): Seq[Path] =
    Files
      .list(Paths.get(p))
      .iterator()
      .asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .toSeq

  /** Fraction of files whose (ux, tx) min/max envelope intersects the box
    * — what a stats-based file skipper would have to read.
    */
  private def intersectingFraction(path: String): Double = {
    val files = parquetFiles(path)
    val ((uLo, uHi), (tLo, tHi)) = SinkQueries.zBox
    val hit = files.count { f =>
      val r = spark.read
        .parquet(f.toString)
        .agg(min(col("ux")), max(col("ux")), min(col("tx")), max(col("tx")))
        .head()
      val (uMin, uMax, tMin, tMax) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      uMax >= uLo && uMin <= uHi && tMax >= tLo && tMin <= tHi
    }
    hit.toDouble / files.size
  }

  test("z-order layout lets a 2-D box skip most files and beats single-dim sorts") {
    val (zpath, tmp) = SinkQueries.writeZordered(spark, dir, "zspec")
    try {
      // contrasts: the same rows clustered on ONE dimension each.
      // (arrival order ~ time order here — event ids correlate with ts —
      // so a ux-sorted layout is the other single-dim extreme)
      val base = SinkQueries
        .zDims(Tables.events(spark, dir).select("event_id", "user_id", "ts", "value", "event_type"))
      base.repartitionByRange(16, col("tx"), col("event_id")).write.parquet(s"$tmp/bytime")
      base.repartitionByRange(16, col("ux"), col("event_id")).write.parquet(s"$tmp/byuser")

      val zFrac = intersectingFraction(zpath)
      val tFrac = intersectingFraction(s"$tmp/bytime")
      val uFrac = intersectingFraction(s"$tmp/byuser")
      assert(
        zFrac <= 0.5,
        f"z-order: box intersects $zFrac%.2f of files — expected most files skippable"
      )
      // a single-dim sort prunes its own dimension to ~box-width but reads
      // EVERY file of the other dimension's matching stripe; z-order must
      // not read more files than either single-dim layout for the 2-D box
      assert(
        zFrac <= tFrac && zFrac <= uFrac,
        f"z-order ($zFrac%.2f) should need no more files than time-sorted " +
          f"($tFrac%.2f) or user-sorted ($uFrac%.2f) for a 2-D box"
      )
    } finally {
      graft.GateResult.deleteRecursively(Paths.get(tmp))
    }
  }

  test("z-ordered round-trip loses no rows") {
    val (zpath, tmp) = SinkQueries.writeZordered(spark, dir, "zspec2")
    try {
      val a = spark.read.parquet(zpath).agg(count(lit(1)), sum(col("event_id"))).head()
      val b = Tables.events(spark, dir).agg(count(lit(1)), sum(col("event_id"))).head()
      assert(a == b, s"round-trip mismatch: wrote $a, source $b")
    } finally {
      graft.GateResult.deleteRecursively(Paths.get(tmp))
    }
  }
}
