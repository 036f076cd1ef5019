package graft.ccm

import org.scalatest.funsuite.AnyFunSuite

/** Micro-fixture tests pinning the reference's exact semantics
  * (FIXTURES.md §A3, SURVEY.md §2d).
  */
class CcmLocalSpec extends AnyFunSuite {

  test("embedding of [1..6] with E=2, tau=2 (ccm.ex:99-107)") {
    val emb = CcmLocal.embed(Array(1, 2, 3, 4, 5, 6).map(_.toDouble), 2, 2)
    assert(emb.map(_.toSeq).toSeq == Seq(Seq(1.0, 3.0), Seq(2.0, 4.0), Seq(3.0, 5.0), Seq(4.0, 6.0)))
  }

  test("embedding row count is n-(E-1)*tau") {
    assert(CcmLocal.embed(Array.fill(10)(0.5), 3, 2).length == 6)
  }

  test("euclidean distance (ccm.ex:179-185)") {
    assert(CcmLocal.euclidean(Array(0.0, 3.0), Array(4.0, 0.0)) == 5.0)
  }

  test("pearson: <2 pairs -> 0.0 (ccm.ex:187)") {
    assert(CcmLocal.correlation(Seq((1.0, 2.0))) == 0.0)
    assert(CcmLocal.correlation(Seq.empty) == 0.0)
  }

  test("pearson: zero variance -> 0.0 (ccm.ex:212)") {
    assert(CcmLocal.correlation(Seq((1.0, 2.0), (1.0, 3.0), (1.0, 4.0))) == 0.0)
  }

  test("pearson: perfect positive / negative") {
    assert(math.abs(CcmLocal.correlation(Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0))) - 1.0) < 1e-12)
    assert(math.abs(CcmLocal.correlation(Seq((1.0, 6.0), (2.0, 4.0), (3.0, 2.0))) + 1.0) < 1e-12)
  }

  test("weights: exact hit d<1e-12 -> 1.0; scaled exp otherwise (ccm.ex:246-262)") {
    val w = CcmLocal.weights(Array(0.0, 1.0, 2.0))
    assert(w(0) == 1.0)
    // min_dist = 0.0 -> exp(-d/1e-8) underflows to 0.0 for d=1,2
    assert(w(1) == 0.0 && w(2) == 0.0)
    val w2 = CcmLocal.weights(Array(1.0, 2.0))
    assert(math.abs(w2(0) - math.exp(-1.0 / (1.0 + 1e-8))) < 1e-15)
    assert(math.abs(w2(1) - math.exp(-2.0 / (1.0 + 1e-8))) < 1e-15)
  }

  test("convergent: <3 points -> false (ccm.ex:215)") {
    assert(!CcmLocal.convergent(Seq((10, 0.1), (20, 0.9))))
  }

  test("convergent: strict slope > 0.001 (ccm.ex:240)") {
    // slope exactly 0.001 -> NOT convergent
    val flat = Seq((10, 0.01), (20, 0.02), (30, 0.03)) // slope 0.001
    assert(!CcmLocal.convergent(flat))
    val rising = Seq((10, 0.1), (20, 0.2), (30, 0.3)) // slope 0.01
    assert(CcmLocal.convergent(rising))
    val constant = Seq((10, 0.5), (10, 0.5), (10, 0.5)) // zero denominator
    assert(!CcmLocal.convergent(constant))
  }

  test("cross_map_sample guard: lib_size >= n_points -> 0.0 (ccm.ex:109-110)") {
    val emb = CcmLocal.embed(Array.tabulate(10)(_.toDouble), 2, 1)
    val tgt = Array.tabulate(10)(i => i * 2.0).drop(1)
    assert(CcmLocal.crossMapSample(emb, tgt, emb.length, 1L, 0L, 42L) == 0.0)
    assert(CcmLocal.crossMapSample(emb, tgt, emb.length + 5, 1L, 0L, 42L) == 0.0)
  }

  test("cross_map_sample: <2 prediction points -> 0.0 (ccm.ex:123-124)") {
    val emb = CcmLocal.embed(Array.tabulate(10)(_.toDouble), 2, 1)
    val tgt = Array.tabulate(10)(i => i * 2.0).drop(1)
    assert(CcmLocal.crossMapSample(emb, tgt, emb.length - 1, 1L, 0L, 42L) == 0.0)
  }

  test("predictPoint: weighted average of E+1 nearest neighbor targets") {
    // library = embedding rows; query equals row 0 exactly -> d=0 for it
    val emb = Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(10.0, 10.0))
    val tgt = Array(5.0, 7.0, 100.0)
    val pred = CcmLocal.predictPoint(Array(0.0, 0.0), Array(0, 1, 2), emb, tgt)
    // k = min(E+1=3, 3) = 3; d = [0, 1, sqrt(200)]; min_dist=0
    // w0 = 1.0 (exact hit), w1 = exp(-1/1e-8) = 0, w2 = 0 -> pred = 5.0
    assert(pred == 5.0)
  }

  test("deterministic sampling: same seed same result, different seed differs") {
    val (x, y) = Generators.coupledLogisticMaps(120, 0.15)
    val spec = CcmSpec(numSamples = 5, libSizes = Some(Seq(20, 40, 60)))
    val r1 = CcmLocal.bidirectional(x, y, spec)
    val r2 = CcmLocal.bidirectional(x, y, spec)
    assert(r1 == r2)
    val r3 = CcmLocal.bidirectional(x, y, spec.copy(seed = 43))
    assert(r1 != r3)
  }

  test("lib size ladder (ccm.ex:86-97)") {
    assert(CcmSpec.libSizeLadder(9) == Seq(9))
    assert(CcmSpec.libSizeLadder(10) == Seq(5, 7, 9))
    // max=100: start max(10,5)=10, step max(2,5)=5
    assert(CcmSpec.libSizeLadder(100) == (10 to 100 by 5))
    // max=298 (n=300, E=3, tau=1): start 29, step 14
    assert(CcmSpec.libSizeLadder(298) == (29 to 298 by 14))
  }

  test("CcmSpec validation mirrors CCM.new/3 (ccm.ex:20-42)") {
    intercept[IllegalArgumentException](CcmSpec(embeddingDim = 0))
    intercept[IllegalArgumentException](CcmSpec(tau = 0))
    intercept[IllegalArgumentException](
      CcmLocal.bidirectional(Array(1.0, 2.0), Array(1.0), CcmSpec(numSamples = 1))
    )
  }

  test("parse custom series text (examples.livemd:203-218)") {
    val txt = "1,2,3,4,5,6,7,8,9,10\n2,4,6,8,10,12,14,16,18,20"
    val (a, b) = Ccm.parseSeriesText(txt)
    assert(a.length == 10 && b(9) == 20.0)
    intercept[IllegalArgumentException](Ccm.parseSeriesText("1,2,3\n1,2"))
    intercept[IllegalArgumentException](Ccm.parseSeriesText("1,2,3\n4,5,6"))
  }
}
