package graft.ccm

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Multiview cross-mapping (graft.ccm.Multiview): the DuckDB gate
  * (ccm_multiview) pins the arithmetic; these pin the behavior the
  * operator exists for — on a genuinely coupled system the skill-ranked
  * view ensemble recovers the coupling, and view ranking/averaging is
  * deterministic.
  */
class MultiviewSpec extends SparkTestBase {

  private def run(x: Array[Double], y: Array[Double]) = {
    import spark.implicits._
    val rows = x.indices.map(i => (1L, i.toLong, x(i), y(i)))
    Multiview
      .crossMap(
        rows.toDF("skey", "ord", "x", "y"),
        skey = col("skey"),
        order = Seq("ord"),
        x = col("x"),
        y = col("y")
      )
      .collect()
      .map(r =>
        (r.getLong(0), (r.getLong(1), r.getInt(2), r.getDouble(3), r.getString(4), r.getDouble(5)))
      )
      .toMap
  }

  test("coupled logistic maps: multiview cross-map recovers the coupling with high skill") {
    // Y drives X in the reference generator: cross-mapping X from
    // embeddings of Y's DRIVEN partner tests the information flow.
    // Use the driven series as y (embedded) and the driver as x (target):
    // M_y encodes x, so skill should be high.
    val (xs, ys) = Generators.coupledLogisticMaps(220, coupling = 0.4)
    val got = run(ys, xs) // embed the driver-bearing series, map the other
    val (nPts, _, bestRho, topViews, mvRho) = got(1L)
    assert(nPts > 180, s"expected most points valid, got $nPts")
    assert(mvRho > 0.8, s"multiview rho on coupled logistic maps should be high, got $mvRho")
    assert(bestRho > 0.8, s"best single view should also be skilled, got $bestRho")
    assert(topViews.split(",").length == 3, s"three ranked views expected, got '$topViews'")
  }

  test("independent noise series yield near-zero multiview skill") {
    val rng = new scala.util.Random(7)
    val a = Array.fill(200)(rng.nextDouble())
    val b = Array.fill(200)(rng.nextDouble())
    val (_, _, _, _, mvRho) = run(a, b)(1L)
    assert(math.abs(mvRho) < 0.35, s"independent series should have low skill, got $mvRho")
  }

  test("view ranking is deterministic across repeated runs") {
    val (xs, ys) = Generators.coupledLogisticMaps(120, coupling = 0.3)
    val r1 = run(ys, xs)(1L)
    val r2 = run(ys, xs)(1L)
    assert(r1 == r2, s"repeated runs disagree: $r1 vs $r2")
  }
}
