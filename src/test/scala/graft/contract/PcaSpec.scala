package graft.contract

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** vec_pca_power's hash gate pins exact values; this pins the property
  * that makes them meaningful: after 8 power iterations the projection
  * direction must capture at least as much variance as ANY single
  * coordinate axis (true of the exact top eigenvector; a non-converged
  * or wrongly-normalized vector fails it).
  */
class PcaSpec extends SparkTestBase {
  private val SfDir = "/root/testdata/sf0.001"

  test("top-PC projection variance dominates every coordinate axis variance") {
    val proj = SparkEntry
      .queries("vec_pca_power")(spark, SfDir)
      .agg(var_samp(col("proj")))
      .head()
      .getDouble(0)
    val maxAxisVar = Tables
      .embeddings(spark, SfDir)
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("k", "x")))
      .groupBy("k")
      .agg(var_samp(col("x")).as("v"))
      .agg(max(col("v")))
      .head()
      .getDouble(0)
    info(f"proj variance $proj%.4f vs max axis variance $maxAxisVar%.4f")
    assert(
      proj >= maxAxisVar * 0.999, // tiny slack for the 6-dp iteration rounding
      s"projection variance $proj below best single axis $maxAxisVar — power iteration did not converge"
    )
  }

  test("vec_pca_topk: variances strictly descending, components near-orthonormal") {
    val rows = SparkEntry
      .queries("vec_pca_topk")(spark, SfDir)
      .select("component", "variance")
      .distinct()
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3), s"expected components 1..3, got ${rows.toSeq}")
    val lams = rows.map(_._2)
    assert(
      lams.zip(lams.tail).forall { case (a, b) => a > b },
      s"variances must be strictly descending: ${lams.toSeq}"
    )
    // each component must be a genuine variance direction: its projection
    // variance near the reported Rayleigh variance. NOT exact by design —
    // later components report λ on the DEFLATED matrix while the
    // projection variance is on the raw data; they differ by
    // Σ λ_prev·(v·v_prev)², bounded by λ1·maxdot² ≈ 1e-3 at the 0.2
    // orthogonality bar below. 5% relative catches real defects (wrong
    // normalization/matrix/sign are order-of-magnitude effects).
    val projVar = SparkEntry
      .queries("vec_pca_topk")(spark, SfDir)
      .groupBy("component")
      .agg(var_samp(col("proj")).as("pv"), first(col("variance")).as("lam"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    projVar.foreach { case (c, pv, lam) =>
      assert(
        math.abs(pv - lam) <= 0.05 * math.max(pv, lam),
        s"component $c: projection variance $pv far from reported $lam"
      )
    }
    // whitened coordinates must have ~unit variance per component (the
    // point of whitening; same deflation-vs-raw-data slack as above)
    val wvar = SparkEntry
      .queries("vec_whiten")(spark, SfDir)
      .groupBy("component")
      .agg(var_samp(col("wproj")).as("wv"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    wvar.foreach { case (c, wv) =>
      assert(math.abs(wv - 1.0) <= 0.05, s"component $c: whitened variance $wv not ~1")
    }
    // near-orthogonality of the deflated directions: recompute the ranked
    // components driver-side from the same covariance arithmetic the
    // query used (measured max |dot| across SFs is ~0.10 at 8 iterations
    // on this near-flat spectrum; 0.2 is the regression bar)
    val d = 64
    val cov = Tables
      .embeddings(spark, SfDir)
      .select(col("embedding").cast("array<double>").as("v"))
      .select(col("v"), posexplode(col("v")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("v")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("sx"), sum(col("xj")).as("sy"), sum(col("xi") * col("xj")).as("sxy"))
      .select(
        col("i"),
        col("j"),
        Norm.rnd((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1), 6).as("cov")
      )
      .collect()
    val m = Array.ofDim[Double](d, d)
    cov.foreach { r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2); m(r.getInt(1))(r.getInt(0)) = r.getDouble(2) }
    val comps = SimQueries.pcaRanked(m).map(_._1._1)
    for (a <- comps.indices; b <- comps.indices if b > a) {
      val dot = math.abs(comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum)
      assert(dot <= 0.2, s"components ${a + 1} and ${b + 1} not near-orthogonal: |dot| = $dot")
    }
  }
}
