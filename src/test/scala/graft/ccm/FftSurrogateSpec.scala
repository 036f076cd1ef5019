package graft.ccm

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** FFT (Ebisuzaki) surrogate semantics: the whole point of the
  * phase-randomized null is that every surrogate keeps x's power spectrum
  * — equivalently (Wiener–Khinchin) its CIRCULAR autocorrelation at every
  * lag — while scrambling phase alignment. These pin exactly that, plus
  * the k=0-is-the-original contract the p-value tail relies on.
  */
class FftSurrogateSpec extends SparkTestBase {

  private val N = 64
  private val K = 4

  private def series(i: Int): Double = {
    // AR(1)-ish with deterministic innovations: strongly autocorrelated,
    // the regime phase randomization exists for
    def u(j: Int): Double = DetHash.rankHash(j.toLong, 3L, 11L, 5L).toDouble / DetHash.P
    var v = 0.2
    for (j <- 0 to i) v = 0.85 * v + 0.2 * (u(j) - 0.5)
    v
  }

  private lazy val bundles: Map[Long, Seq[Double]] = {
    import spark.implicits._
    val rows = (0 until N).map(i => (9L, i.toLong, series(i), i.toDouble))
    FftSurrogate
      .bundle(
        rows.toDF("skey", "ord", "x", "y"),
        skey = col("skey"),
        order = Seq("ord"),
        x = col("x"),
        y = col("y"),
        numK = K,
        stride = 100L,
        seed = 977L
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq)
      .toMap
  }

  private def circAcf(xs: Seq[Double], lag: Int): Double = {
    val n = xs.size
    val mu = xs.sum / n
    (0 until n).map(t => (xs(t) - mu) * (xs((t + lag) % n) - mu)).sum / n
  }

  test("k=0 is the bit-exact original series") {
    val original = (0 until N).map(series)
    assert(bundles(900L) == original, "k=0 must bypass reconstruction entirely")
  }

  test("every surrogate preserves the circular autocorrelation at every lag") {
    val truth = bundles(900L)
    for (k <- 1 to K; lag <- 0 until N) {
      val s = bundles(900L + k)
      val (a, b) = (circAcf(truth, lag), circAcf(s, lag))
      assert(
        math.abs(a - b) < 1e-9,
        f"k=$k lag=$lag: circular ACF $b%.12f != original $a%.12f — spectrum not preserved"
      )
    }
  }

  test("surrogates differ from the original and from each other") {
    val truth = bundles(900L)
    val maxAbs = truth.map(math.abs).max
    for (k <- 1 to K) {
      val s = bundles(900L + k)
      val dist = truth.zip(s).map { case (a, b) => math.abs(a - b) }.max
      assert(dist > 0.01 * maxAbs, s"k=$k: surrogate is (nearly) the original — phases not randomized")
    }
    val d12 = bundles(901L).zip(bundles(902L)).map { case (a, b) => math.abs(a - b) }.max
    assert(d12 > 0.01 * maxAbs, "k=1 and k=2 surrogates coincide — per-k phases not independent")
  }

  test("mean is preserved (DC bin fixed)") {
    val truth = bundles(900L)
    for (k <- 1 to K) {
      val s = bundles(900L + k)
      assert(math.abs(truth.sum / N - s.sum / N) < 1e-9, s"k=$k: mean drifted")
    }
  }
}
