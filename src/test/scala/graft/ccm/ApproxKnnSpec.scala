package graft.ccm

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Approximate-kNN flag (CcmSpec.knnBuckets, SURVEY §4.3): the grid-
  * bucketed candidate join must (a) reproduce the exact skill curve
  * within tolerance on coupled-dynamics data, (b) be exactly the brute
  * path when disabled, and (c) genuinely prune the candidate pair set.
  */
class ApproxKnnSpec extends SparkTestBase {

  private val Libs = Seq(20, 40, 60)
  private val Samples = 2

  private def inputDf = {
    import spark.implicits._
    // three coupled series with different dynamics, 150 points each
    val rows = for {
      (sid, c) <- Seq((1L, 0.10), (2L, 0.15), (3L, 0.25))
      (xs, ys) = Generators.coupledLogisticMaps(150, c)
      i <- xs.indices
    } yield (sid, i.toLong, xs(i), ys(i))
    rows.toDF("skey", "ord", "x", "y")
  }

  private def run(knnBuckets: Int) =
    Ccm
      .bidirectional(
        inputDf,
        skey = col("skey"),
        order = Seq("ord"),
        x = col("x"),
        y = col("y"),
        spec = CcmSpec(numSamples = Samples, knnBuckets = knnBuckets),
        libSizes = Libs
      )
      .select("skey", "direction", "lib_size", "rho", "convergent")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)) -> (r.getDouble(3), r.getBoolean(4)))
      .toMap

  test("knnBuckets=0 is the exact path; buckets approximate it within tolerance") {
    val exact = run(0)
    val approx = run(8)
    assert(exact.keySet == approx.keySet, "skill grid must be identical")
    val diffs = exact.map { case (k, (rho, _)) => math.abs(rho - approx(k)._1) }
    val mean = diffs.sum / diffs.size
    val worst = diffs.max
    assert(mean <= 0.05, s"mean |Δrho| $mean > 0.05")
    assert(worst <= 0.20, s"max |Δrho| $worst > 0.20")
  }

  test("kernel approx path equals declarative approx path (to corr-impl ulps)") {
    import spark.implicits._
    val declarative = run(8)
    val viaKernel = Ccm
      .perSeries(
        inputDf.select(col("skey"), col("ord"), col("x"), col("y")),
        CcmSpec(numSamples = Samples, knnBuckets = 8),
        Some(Libs)
      )
      .toDF()
      .select("skey", "direction", "lib_size", "rho", "convergent")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)) -> (r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(declarative.keySet == viaKernel.keySet)
    // Spark's corr (streaming co-moments) and CcmLocal.correlation
    // (two-pass) agree only to last ulps — same as the exact-path pair,
    // which is why the shared oracle rounds to 6 decimals. 1e-9 is far
    // below any semantic difference and far above ulp noise.
    declarative.foreach { case (k, (rho, conv)) =>
      assert(
        math.abs(viaKernel(k)._1 - rho) <= 1e-9,
        s"$k: kernel rho ${viaKernel(k)._1} != declarative $rho"
      )
      assert(viaKernel(k)._2 == conv, s"$k: convergent flag differs")
    }
  }

  test("bucketed join prunes the candidate pair set") {
    import spark.implicits._
    val base = inputDf
    // candidate relation: exact = every (l.rank < q.rank <= ...) pair in
    // the cell; approx adds the bucket constraint. Count both directly.
    val emb = CcmPipeline
      .embedded(base, Seq("skey"), Seq(col("ord")), $"y", $"x", 3, 1)
      .withColumn("direction", lit("x_causes_y"))
    val rk = CcmPipeline
      .ranked(emb, Seq("skey", "direction"), Samples, 42L, col("skey"))
      .localCheckpoint()
    val exactPairs = rk
      .as("q")
      .filter($"q.rank" > Libs.min)
      .join(
        rk.as("l"),
        $"q.skey" === $"l.skey" && $"q.direction" === $"l.direction" &&
          $"q.sample_id" === $"l.sample_id" && $"l.rank" < $"q.rank" && $"l.rank" <= Libs.max
      )
      .count()
    val stats = rk
      .filter($"sample_id" === 1)
      .groupBy("skey", "direction")
      .agg(min($"e0").as("mn"), max($"e0").as("mx"))
    val b = 8
    val bucketed = rk
      .join(stats, Seq("skey", "direction"))
      .withColumn(
        "bucket",
        when(($"mx" - $"mn") / lit(b.toDouble) > 0.0,
          floor(($"e0" - $"mn") / (($"mx" - $"mn") / lit(b.toDouble)))
        ).otherwise(0.0).cast("long")
      )
    val approxPairs = bucketed
      .as("q")
      .filter($"q.rank" > Libs.min)
      .join(
        bucketed.as("l"),
        $"q.skey" === $"l.skey" && $"q.direction" === $"l.direction" &&
          $"q.sample_id" === $"l.sample_id" && $"l.rank" < $"q.rank" && $"l.rank" <= Libs.max &&
          abs($"q.bucket" - $"l.bucket") <= 1
      )
      .count()
    assert(approxPairs < exactPairs,
      s"bucketing must prune candidates (exact=$exactPairs approx=$approxPairs)")
    assert(approxPairs.toDouble / exactPairs <= 0.8,
      s"expected >=20% candidate reduction, got $approxPairs/$exactPairs")
  }
}
