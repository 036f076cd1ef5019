package graft.ccm

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** README-parity library mode pins ([[CcmSpec.consecutive]],
  * `/root/reference/README.md:89,103`): consecutive growing slices from
  * the series start, prediction set = the unshuffled series end.
  */
class ConsecutiveModeSpec extends SparkTestBase {

  test("consecutive ranked: rank is the time index + 1, so library L = first L points") {
    import spark.implicits._
    val df = (0L until 20L).map(i => (1L, i, i * 0.1, i * 0.2)).toDF("skey", "ord", "x", "y")
    val emb = CcmPipeline.embedded(df, Seq("skey"), Seq(col("ord")), $"x", $"y", e = 2, tau = 1)
    val rk = CcmPipeline.ranked(emb, Seq("skey"), numSamples = 1, seed = 42L, $"skey", consecutive = true)
    val rows = rk.select("idx", "rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.forall { case (idx, rank) => rank == idx + 1 })
    // hash mode really is different (the modes must not silently alias)
    val rkH = CcmPipeline.ranked(emb, Seq("skey"), numSamples = 1, seed = 42L, $"skey")
    val hashRows = rkH.select("idx", "rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hashRows.exists { case (idx, rank) => rank != idx + 1 })
  }

  test("local kernel consecutive mode matches the declarative split semantics") {
    // library = first L rows, prediction = tail; a perfectly linear map
    // predicts its tail well, so rho should be high and identical across
    // repeated calls (sample-independent)
    val n = 40
    val src = Array.tabulate(n)(i => math.sin(i * 0.3))
    val tgt = Array.tabulate(n)(i => math.sin(i * 0.3 + 0.1))
    val spec = CcmSpec(embeddingDim = 2, numSamples = 1, consecutive = true, libSizes = Some(Seq(12, 20)))
    val r1 = CcmLocal.crossMap(src, tgt, spec, seriesKey = 7L)
    val r2 = CcmLocal.crossMap(src, tgt, spec, seriesKey = 99L) // seriesKey must not matter
    assert(r1.results == r2.results, "consecutive mode must be independent of seriesKey/hash")
    // and differs from the random-subset mode on the same input
    val rh = CcmLocal.crossMap(src, tgt, spec.copy(consecutive = false), seriesKey = 7L)
    assert(r1.results != rh.results)
  }
}
