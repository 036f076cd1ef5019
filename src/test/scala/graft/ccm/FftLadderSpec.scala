package graft.ccm

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The O(n log n) butterfly ladder must be a drop-in for the direct
  * O(n²) construction wherever both apply: on a power-of-two series with
  * the same seed the two engines draw the SAME per-(f,k) phases, so the
  * ladder's surrogates must equal [[FftSurrogate]]'s numerically (same
  * math, different summation order — float tolerance, not hash). Plus
  * the ladder-specific contracts: power-of-two truncation, k=0 identity,
  * spectrum preservation on the truncated window.
  */
class FftLadderSpec extends SparkTestBase {

  private val K = 3

  private def series(i: Int): Double = {
    def u(j: Int): Double = DetHash.rankHash(j.toLong, 3L, 11L, 5L).toDouble / DetHash.P
    var v = 0.2
    for (j <- 0 to i) v = 0.85 * v + 0.2 * (u(j) - 0.5)
    v
  }

  private def runBundle(n: Int, viaLadder: Boolean): Map[Long, Seq[Double]] = {
    import spark.implicits._
    val rows = (0 until n).map(i => (9L, i.toLong, series(i), i.toDouble))
    val df = rows.toDF("skey", "ord", "x", "y")
    val out =
      if (viaLadder)
        FftLadder.bundle(df, col("skey"), Seq("ord"), col("x"), col("y"), K, 100L, 977L)
      else
        FftSurrogate.bundle(df, col("skey"), Seq("ord"), col("x"), col("y"), K, 100L, 977L)
    out
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

  test("on a power-of-two series the ladder reproduces the direct O(n²) surrogates") {
    val ladder = runBundle(64, viaLadder = true)
    val direct = runBundle(64, viaLadder = false)
    for (k <- 0 to K) {
      val (l, d) = (ladder(900L + k), direct(900L + k))
      assert(l.size == 64 && d.size == 64)
      val maxDiff = l.zip(d).map { case (a, b) => math.abs(a - b) }.max
      assert(maxDiff < 1e-9, f"k=$k: ladder deviates from direct by $maxDiff%.2e")
    }
  }

  test("non-power-of-two series are truncated to the largest power-of-two prefix") {
    val ladder = runBundle(100, viaLadder = true)
    for (k <- 0 to K) assert(ladder(900L + k).size == 64, s"k=$k: expected 64-point window")
    // the k=0 window is the bit-exact original prefix
    assert(ladder(900L) == (0 until 64).map(series))
  }

  test("spectrum (circular ACF at every lag) preserved on the truncated window") {
    val ladder = runBundle(100, viaLadder = true)
    val truth = ladder(900L)
    for (k <- 1 to K; lag <- 0 until 64) {
      val (a, b) = (circAcf(truth, lag), circAcf(ladder(900L + k), lag))
      assert(math.abs(a - b) < 1e-9, f"k=$k lag=$lag: ACF $b%.12f != $a%.12f")
    }
  }

  test("surrogates differ from the original and from each other") {
    val ladder = runBundle(64, viaLadder = true)
    val truth = ladder(900L)
    val maxAbs = truth.map(math.abs).max
    for (k <- 1 to K) {
      val dist = truth.zip(ladder(900L + k)).map { case (a, b) => math.abs(a - b) }.max
      assert(dist > 0.01 * maxAbs, s"k=$k: phases not randomized")
    }
  }

  test("series shorter than 2 points pass through untouched (all rounds no-op)") {
    import spark.implicits._
    val df = Seq((5L, 0L, 1.25, 0.0)).toDF("skey", "ord", "x", "y")
    val out = FftLadder
      .bundle(df, col("skey"), Seq("ord"), col("x"), col("y"), 2, 100L, 977L)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
      .toMap
    // n_pow = 1: the single bin is DC, every k reproduces the constant
    assert(out.size == 3)
    out.values.foreach(v => assert(math.abs(v - 1.25) < 1e-12))
  }
}
