package graft.ccm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FnnDimSpec extends SparkTestBase {
  import spark.implicits._

  test("a sine series unfolds at E=2: high FNN at E=1, ~zero at E=2") {
    // Incommensurate period (25.3 samples) so no two samples repeat
    // exactly. A clean sinusoid lives on a 1-D manifold (circle) in 2-D delay space:
    // at E=1 distant phases collide (many false neighbors); at E=2 the
    // circle is unfolded and the extra coordinate no longer jumps.
    val n = 200
    val xs = (0 until n).map(i => (1L, i.toLong, math.sin(2 * math.Pi * i / 25.3)))
    val df = xs.toDF("skey", "t", "value")
    val curve = FnnDim
      .fnnCurve(df, Seq("skey"), Seq(col("t")), col("value"), maxE = 3, tau = 3)
      .orderBy("e")
      .collect()
      .map(r => r.getInt(1) -> r.getDouble(4))
      .toMap
    assert(curve(1) > 0.2, s"E=1 frac ${curve(1)} should be high")
    assert(curve(2) < 0.02, s"E=2 frac ${curve(2)} should be ~0")
    val best = FnnDim
      .bestE(
        FnnDim.fnnCurve(df, Seq("skey"), Seq(col("t")), col("value"), 3, 3),
        Seq("skey")
      )
      .collect()(0)
      .getInt(1)
    assert(best == 2, s"best_e=$best")
  }

  test("zero-distance twins are never false neighbors") {
    // constant series: every pair is at distance 0 -> guard path, no falses
    val df = (0 until 50).map(i => (1L, i.toLong, 1.0)).toDF("skey", "t", "value")
    val curve = FnnDim.fnnCurve(df, Seq("skey"), Seq(col("t")), col("value"), 2, 1).collect()
    for (r <- curve) assert(r.getLong(3) == 0L, s"E=${r.getInt(1)} has falses")
  }
}
