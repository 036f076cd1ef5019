package graft.contract

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkTestBase

/** Replay idempotence of the streaming upsert (`stream_upsert`): after
  * the micro-batch stream drains, replaying the ENTIRE stream from a
  * fresh checkpoint (the lost-checkpoint / full-redelivery failure mode)
  * must be a no-op — same rows, unique keys, and the partitions the
  * replay does not touch stay byte-identical on disk.
  */
class StreamUpsertSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def partFiles(root: Path): Map[String, Seq[(String, Long)]] =
    Files
      .walk(root)
      .iterator()
      .asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .toSeq
      .groupBy(_.getParent.getFileName.toString)
      .map { case (k, ps) =>
        k -> ps.map(p => (p.getFileName.toString, Files.size(p))).sortBy(_._1)
      }

  test("full stream replay from a fresh checkpoint is a no-op") {
    val (tbl, tmp) = SinkQueries.writeYearPartitioned(spark, dir, "suspec")
    val root = Files.createTempDirectory("graft-stream-upsert-spec")
    try {
      val in = StreamQueries.stageUpdateBatches(spark, dir, root)
      val schema = SinkQueries.updatesBatch(spark, dir).schema
      StreamQueries.runUpsertStream(spark, tbl, in, Files.createDirectory(root.resolve("c1")), schema)
      val tableRoot = Paths.get(tmp, "o")
      val filesAfterFirst = partFiles(tableRoot)
      val rowsAfterFirst = spark
        .table(tbl)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getInt(3)))
        .toSet

      // the failure mode: checkpoint lost, every batch redelivered
      StreamQueries.runUpsertStream(spark, tbl, in, Files.createDirectory(root.resolve("c2")), schema)

      val rowsAfterReplay = spark
        .table(tbl)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getInt(3)))
        .toSet
      assert(rowsAfterReplay == rowsAfterFirst, "replay changed table contents")

      val filesAfterReplay = partFiles(tableRoot)
      assert(filesAfterFirst.keySet == filesAfterReplay.keySet, "partition set changed")
      val untouched = filesAfterFirst.keySet.filter(_.stripPrefix("o_year=").toInt < 1999)
      assert(untouched.nonEmpty, "need untouched partitions for the byte-stability claim")
      untouched.foreach { k =>
        assert(filesAfterReplay(k) == filesAfterFirst(k), s"untouched partition $k was rewritten")
      }

      val total = spark.table(tbl).count()
      val keys = spark.table(tbl).select("o_orderkey").distinct().count()
      assert(total == keys, s"replay duplicated keys: $total rows, $keys keys")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      graft.GateResult.deleteRecursively(Paths.get(tmp))
      graft.GateResult.deleteRecursively(root)
    }
  }
}
