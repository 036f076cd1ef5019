package graft.ccm

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's single ExUnit test (`test/ccm_test.exs:5-14`) plus
  * the positive/negative-control properties its generators document
  * (`lib/coupled_series_generator.ex:88-102,142`).
  */
class CharacterizationSpec extends AnyFunSuite {

  test("reference characterization: logistic maps n=300 c=0.15 -> both directions non-convergent") {
    val (x, y) = Generators.coupledLogisticMaps(300, 0.15)
    val res = CcmLocal.bidirectional(x, y, CcmSpec(embeddingDim = 3, tau = 1, numSamples = 50))
    assert(!res.xCausesY.convergent, s"x_causes_y should not converge: ${res.xCausesY.results}")
    assert(!res.yCausesX.convergent, s"y_causes_x should not converge: ${res.yCausesX.results}")
  }

  test("positive control: strong coupling X->Y, skill grows with library size") {
    val (x, y) = Generators.coupledSeries(200, Generators.CoupledParams(coupling = 0.4, noiseLevel = 0.02))
    val spec = CcmSpec(numSamples = 30)
    val res = CcmLocal.crossMap(y, x, spec, 0L) // X causes Y: embed Y, map X
    val rhos = res.results
    assert(rhos.last._2 > rhos.head._2, s"skill should increase: $rhos")
    assert(rhos.last._2 > 0.5, s"skill at max lib should be substantial: $rhos")
  }

  test("negative control: zero coupling does not converge") {
    val (x, y) = Generators.coupledSeries(200, Generators.CoupledParams(coupling = 0.0, noiseLevel = 0.05))
    val res = CcmLocal.bidirectional(x, y, CcmSpec(numSamples = 30))
    assert(!res.xCausesY.convergent, s"no-coupling control converged: ${res.xCausesY.results}")
  }

  test("generators are deterministic") {
    assert(Generators.coupledLogisticMaps(50, 0.1)._1.toSeq == Generators.coupledLogisticMaps(50, 0.1)._1.toSeq)
    assert(Generators.coupledSeries(50)._2.toSeq == Generators.coupledSeries(50)._2.toSeq)
    assert(Generators.testCases.map(_._1) == Seq("strong", "medium", "weak", "none"))
  }
}
