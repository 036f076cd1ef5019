package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkTestBase {

  test("two-phase running sum equals the sequential prefix sum") {
    val spark2 = spark
    import spark2.implicits._
    val rng = new scala.util.Random(11)
    val rows = (0 until 5000).map(i => (i.toLong, rng.nextInt(100).toLong))
    // shuffled input: the operator must impose the doc-id order itself
    val df = rng.shuffle(rows).toDF("id", "v").repartition(7)
    val (res, pinned) = PrefixSum
      .runningSumTracked(df, Seq(col("id")), col("v"), "cum", numPartitions = 5)
    val got = res
      .select("id", "cum")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    Checkpoints.free(pinned)
    var acc = 0L
    rows.foreach { case (id, v) =>
      acc += v
      assert(got(id) == acc, s"id=$id")
    }
  }

  test("single-partition degenerate case") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
    val (res, pinned) = PrefixSum
      .runningSumTracked(df, Seq(col("id")), col("v"), "cum", numPartitions = 1)
    val got = res
      .orderBy("id")
      .select("cum")
      .as[Long]
      .collect()
      .toSeq
    Checkpoints.free(pinned)
    assert(got == Seq(10L, 30L, 60L))
  }
}
