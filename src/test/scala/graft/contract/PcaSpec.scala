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
}
