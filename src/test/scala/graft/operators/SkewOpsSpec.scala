package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedStats equals a direct groupBy on a skewed key distribution") {
    // one pathologically hot key (90% of rows) + a tail
    val rng = new scala.util.Random(11)
    val rows = (0 until 20000).map { i =>
      val k = if (i % 10 != 0) 1L else (i % 97).toLong
      (k, rng.nextDouble() * 100 - 50)
    }
    val df = rows.toDF("key", "value")
    val direct = df.groupBy(col("key").as("k"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_v"), min("value").as("min_v"), max("value").as("max_v"))
      .withColumn("avg_v", col("sum_v") / col("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    val salted = SkewOps.saltedStats(df, col("key"), col("value"), saltBuckets = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted.keySet == direct.keySet)
    for ((k, (n, mn, mx)) <- direct) {
      val (sn, smn, smx) = salted(k)
      assert(sn == n && smn == mn && smx == mx, s"key $k")
    }
    // sums/avgs agree to fp tolerance (summation order differs by design)
    val sumsD = df.groupBy("key").agg(sum("value")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sumsS = SkewOps.saltedStats(df, col("key"), col("value"), 16)
      .select("k", "sum_v").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((k, v) <- sumsD) assert(math.abs(sumsS(k) - v) < 1e-8, s"key $k")
  }
}
