package graft.contract

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The point of dynamic partition overwrite: the upsert must rewrite the
  * restated years' directories and leave every other year's FILES
  * byte-identical — work scales with the touched partitions, not the
  * table.
  */
class UpsertSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def partFiles(root: Path): Map[String, Seq[(String, Long, Long)]] =
    Files
      .walk(root)
      .iterator()
      .asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .toSeq
      .groupBy(_.getParent.getFileName.toString) // e.g. "o_year=1995"
      .map { case (k, ps) =>
        k -> ps
          .map(p => (p.getFileName.toString, Files.size(p), Files.getLastModifiedTime(p).toMillis))
          .sortBy(_._1)
      }

  test("dynamic overwrite rewrites only the touched year partitions") {
    val (tbl, tmp) = SinkQueries.writeYearPartitioned(spark, dir, "upspec")
    try {
      val root = Paths.get(tmp, "o")
      val before = partFiles(root)
      SinkQueries.applyUpsert(spark, dir, tbl)
      val after = partFiles(root)
      assert(before.keySet == after.keySet, "partition set must not change")
      val (touched, untouched) = before.keySet.partition { k =>
        k.stripPrefix("o_year=").toInt >= 1999
      }
      assert(touched.nonEmpty && untouched.nonEmpty, s"need both kinds, got $before")
      untouched.foreach { k =>
        assert(after(k) == before(k), s"untouched partition $k was rewritten")
      }
      touched.foreach { k =>
        assert(after(k) != before(k), s"touched partition $k was NOT rewritten")
      }
      // and the merged state is exactly base-minus-keys plus the updates
      val restated = spark
        .table(tbl)
        .filter(col("o_orderpriority") === "9-RESTATED")
        .select("o_orderkey")
        .collect()
        .map(_.getLong(0))
        .toSet
      val expected = Tables
        .orders(spark, dir)
        .filter(year(col("o_orderdate")) >= 1999 && col("o_orderkey") % 7 === 0)
        .select("o_orderkey")
        .collect()
        .map(_.getLong(0))
        .toSet
      assert(restated == expected)
      // no duplicate keys after the merge
      val total = spark.table(tbl).count()
      val distinctKeys = spark.table(tbl).select("o_orderkey").distinct().count()
      assert(total == distinctKeys, s"upsert duplicated keys: $total rows, $distinctKeys keys")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      graft.GateResult.deleteRecursively(Paths.get(tmp))
    }
  }
}
