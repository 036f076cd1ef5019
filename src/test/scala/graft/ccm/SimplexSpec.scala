package graft.ccm

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Simplex-projection semantics (graft.ccm.Simplex): the DuckDB gates
  * (ccm_simplex / ccm_simplex_tp) pin the arithmetic; these pin the
  * DIAGNOSTICS the operator exists for — Sugihara & May 1990's two claims:
  * deterministic chaos is highly predictable one step ahead, and its skill
  * DECAYS with the forecast horizon, while uncorrelated noise is simply
  * unpredictable at every horizon.
  */
class SimplexSpec extends SparkTestBase {

  private def mkDf(rows: Seq[(Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("skey", "ord", "v")
  }

  // chaotic control: the reference's logistic map at r = 3.99 (fully
  // chaotic band), the exact series family the generators produce
  private def chaotic(n: Int): Seq[(Long, Long, Double)] = {
    var x = 0.4
    (0 until n).map { i =>
      val row = (1L, i.toLong, x)
      x = math.max(0.001, math.min(0.999, 3.99 * x * (1.0 - x)))
      row
    }
  }

  // noise control: DOUBLE-hashed DetHash uniforms. A single rankHash at a
  // fixed stream is a squared linear ramp in idx — locally smooth, hence
  // (correctly!) simplex-predictable; feeding the first hash into a second
  // gives avalanche and serial independence.
  private def noise(n: Int): Seq[(Long, Long, Double)] =
    (0 until n).map { i =>
      val h = DetHash.rankHash(DetHash.rankHash(i.toLong, 7L, 0L, 11L), 3L, 1L, 13L)
      (2L, i.toLong, h.toDouble / DetHash.P)
    }

  test("chaos is one-step predictable and horizon-decaying; noise is neither") {
    val df = mkDf(chaotic(200) ++ noise(200))
    val sweep = Simplex
      .tpSweep(df, Seq("skey"), Seq(col("ord")), col("v"), e = 2, maxTp = 6)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3))
      .toMap
    val chaosRho = (1 to 6).map(tp => sweep((1L, tp)))
    val noiseRho = (1 to 6).map(tp => sweep((2L, tp)))
    info(f"chaos  rho(tp=1..6): ${chaosRho.map(r => f"$r%.3f").mkString(", ")}")
    info(f"noise  rho(tp=1..6): ${noiseRho.map(r => f"$r%.3f").mkString(", ")}")
    // Sugihara-May pin 1: chaos is near-perfectly predictable one step out
    assert(chaosRho.head > 0.9, s"logistic map should be predictable at tp=1: ${chaosRho.head}")
    // pin 2: skill decays with horizon (Lyapunov divergence) — by tp=6 the
    // logistic map at r=3.99 has lost most of its short-term predictability
    assert(
      chaosRho.head - chaosRho.last > 0.3,
      s"chaos skill should decay with horizon: ${chaosRho.head} -> ${chaosRho.last}"
    )
    // pin 3: uncorrelated noise is unpredictable at EVERY horizon
    assert(
      noiseRho.forall(math.abs(_) < 0.35),
      s"noise should be unpredictable at all horizons: $noiseRho"
    )
  }

  test("E-sweep tracks the attractor dimension and n_pred bookkeeping") {
    val df = mkDf(chaotic(200))
    val curve = Simplex
      .curve(df, Seq("skey"), Seq(col("ord")), col("v"), maxE = 4)
      .collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    info(
      f"chaos rho(E=1..4): ${(1 to 4).map(e => f"${curve(e)._2}%.3f").mkString(", ")}"
    )
    // the logistic map is a 1-D map: low E already captures it
    assert((1 to 4).map(e => curve(e)._2).max > 0.9, s"no E reaches high skill: $curve")
    // leave-one-out bookkeeping: at E the embedding loses E-1 lead rows and
    // the target loses tp more — n_pred = n - (E-1) - 1
    (1 to 4).foreach { e =>
      assert(curve(e)._1 == 200 - (e - 1) - 1, s"n_pred wrong at E=$e: ${curve(e)._1}")
    }
  }
}
