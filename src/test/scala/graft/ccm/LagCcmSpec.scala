package graft.ccm

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Time-delayed CCM (graft.ccm.LagCcm): the DuckDB gate (ccm_lag_sweep)
  * pins the arithmetic; these pin the DIAGNOSTIC — on a system where X
  * drives Y with a known delay, the cross-map of X from Y's manifold must
  * peak at a negative lag (the cause precedes its effect in Y's record),
  * and the lag axis must actually discriminate (a flat curve would make
  * best_lag meaningless).
  */
class LagCcmSpec extends SparkTestBase {

  // X -> Y with a 2-step delay: x is a logistic map, y relaxes toward the
  // DELAYED x. Deterministic, no RNG.
  private def delayedRows(d: Int): Seq[(Long, Long, Double, Double)] = {
    val n = 150
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    var x = 0.4; var yv = 0.3
    def clamp(v: Double) = math.max(0.001, math.min(0.999, v))
    for (i <- 0 until n) {
      xs(i) = x; ys(i) = yv
      val xd = xs(math.max(0, i - d))
      x = clamp(3.8 * x * (1 - x))
      yv = clamp(0.6 * yv + 0.35 * xd)
    }
    (0 until n).map(i => (1L, i.toLong, xs(i), ys(i)))
  }

  private def sweep(rows: Seq[(Long, Long, Double, Double)]) = {
    import spark.implicits._
    LagCcm
      .bidirectional(
        rows.toDF("skey", "ord", "x", "y"),
        skey = col("skey"),
        order = Seq("ord"),
        x = col("x"),
        y = col("y")
      )
      .collect()
      .map(r => (r.getString(1), r.getLong(2)) -> (r.getDouble(3), r.getLong(4)))
      .toMap
  }

  test("X->Y with delay: cross-map of X from Y peaks at a negative lag") {
    val res = sweep(delayedRows(2))
    val curve = LagCcm.DefaultLags.map(l => l -> res(("x_causes_y", l.toLong))._1)
    info(s"x_causes_y rho by lag: ${curve.map { case (l, r) => f"$l:$r%.3f" }.mkString(" ")}")
    val bestLag = res(("x_causes_y", 0L))._2
    assert(bestLag < 0, s"best_lag $bestLag not negative — cause must precede effect")
    // the lag axis must discriminate: peak clearly above the worst lag
    val rhos = curve.map(_._2)
    assert(rhos.max - rhos.min > 0.05, s"flat lag curve: $curve")
  }

  test("best_lag is constant per (series, direction) and drawn from the ladder") {
    val res = sweep(delayedRows(2))
    Seq("x_causes_y", "y_causes_x").foreach { d =>
      val bests = LagCcm.DefaultLags.map(l => res((d, l.toLong))._2).distinct
      assert(bests.size == 1, s"$d: best_lag varies across rows: $bests")
      assert(LagCcm.DefaultLags.map(_.toLong).contains(bests.head))
    }
  }
}
