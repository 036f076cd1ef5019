package graft.ccm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MiTauSpec extends SparkTestBase {
  import spark.implicits._

  test("MI of an alternating period-2 series matches the exact histogram MI") {
    // x = 1,2,1,2,... -> two occupied cells per tau; compute the exact
    // plug-in MI from the pair counts and compare.
    val n = 40
    val series = (0 until n).map(i => if (i % 2 == 0) 1.0 else 2.0)
    val xs = series.zipWithIndex.map { case (v, i) => (7L, i.toLong, v) }
    val df = xs.toDF("skey", "t", "value")
    def exactMi(tau: Int): Double = {
      val pairs = (0 until n - tau).map(i => (series(i), series(i + tau)))
      val joint = pairs.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val total = pairs.size.toDouble
      val px = pairs.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
      val py = pairs.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
      joint.map { case ((a, b), c) =>
        (c / total) * math.log((c * total) / (px(a) * py(b)))
      }.sum
    }
    val mi = MiTau.miCurve(df, Seq("skey"), Seq(col("t")), col("value"), 3, 8)
      .orderBy("tau").collect()
    assert(mi.length == 3)
    for (r <- mi) {
      val tau = r.getInt(1)
      assert(math.abs(r.getDouble(2) - exactMi(tau)) < 1e-9, s"tau=$tau")
      // deterministic dependence: MI must be close to ln 2
      assert(r.getDouble(2) > 0.6, s"tau=$tau")
    }
  }

  test("bestTau picks the first interior local minimum, fallback 1") {
    val curve = Seq(
      (1L, 1, 1.00), (1L, 2, 0.40), (1L, 3, 0.70), (1L, 4, 0.20), (1L, 5, 0.90), // min at 2 (first)
      (2L, 1, 0.50), (2L, 2, 0.40), (2L, 3, 0.30), (2L, 4, 0.20), (2L, 5, 0.10)  // monotone -> fallback 1
    ).toDF("skey", "tau", "mi")
    val best = MiTau.bestTau(curve, Seq("skey")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(best(1L) == 2)
    assert(best(2L) == 1)
  }

  test("constant series degenerates to zero MI (single bin)") {
    val df = (0 until 30).map(i => (1L, i.toLong, 5.0)).toDF("skey", "t", "value")
    val mi = MiTau.miCurve(df, Seq("skey"), Seq(col("t")), col("value"), 2, 8).collect()
    for (r <- mi) assert(math.abs(r.getDouble(2)) < 1e-12)
  }
}
