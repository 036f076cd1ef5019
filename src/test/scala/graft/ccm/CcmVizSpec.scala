package graft.ccm

import org.scalatest.funsuite.AnyFunSuite

/** V1 renderer pins: the Vega-Lite document carries the livemd's exact
  * mark/encoding contract and the ASCII chart is deterministic and
  * complete.
  */
class CcmVizSpec extends AnyFunSuite {
  private val pts = Seq(
    CcmViz.PlotPoint(20, 0.31, "X → Y"),
    CcmViz.PlotPoint(40, 0.52, "X → Y"),
    CcmViz.PlotPoint(60, 0.64, "X → Y"),
    CcmViz.PlotPoint(20, 0.12, "Y → X"),
    CcmViz.PlotPoint(40, 0.10, "Y → X"),
    CcmViz.PlotPoint(60, 0.11, "Y → X")
  )

  test("Vega-Lite spec mirrors examples.livemd:89-97 (mark, encodings, inline values)") {
    val json = CcmViz.convergenceSpecJson(pts)
    assert(json.contains("\"mark\": {\"type\": \"line\", \"point\": true}"))
    assert(json.contains("\"field\": \"library_size\", \"type\": \"quantitative\", \"title\": \"Library Size\""))
    assert(json.contains("\"field\": \"correlation\", \"type\": \"quantitative\", \"title\": \"Cross-Map Correlation\""))
    assert(json.contains("\"field\": \"direction\", \"type\": \"nominal\", \"title\": \"Causal Direction\""))
    assert(json.contains("\"strokeDash\""))
    assert(json.contains("\"width\": 600, \"height\": 400"))
    // all six records inlined, livemd field names
    assert(pts.forall(p => json.contains(s"""{"library_size":${p.librarySize},"correlation":${p.correlation}""")))
    // parseable enough to count braces (no dangling quotes from escaping)
    assert(json.count(_ == '{') == json.count(_ == '}'))
  }

  test("ascii chart is deterministic, bounded, and draws every direction") {
    val a = CcmViz.asciiChart(pts)
    val b = CcmViz.asciiChart(pts)
    assert(a == b)
    assert(a.contains("x = X → Y") && a.contains("o = Y → X"))
    assert(a.linesIterator.size >= 16)
    assert(a.contains("lib_size 20..60"))
    assert(CcmViz.asciiChart(Nil) == "(no points)")
    // a flat single-direction series must not divide by zero
    val flat = Seq(CcmViz.PlotPoint(10, 0.5, "X → Y"), CcmViz.PlotPoint(20, 0.5, "X → Y"))
    assert(CcmViz.asciiChart(flat).nonEmpty)
  }

  test("non-finite correlations emit JSON null, never NaN/Infinity tokens (ADVICE r12)") {
    val bad = pts :+ CcmViz.PlotPoint(80, Double.NaN, "X → Y") :+
      CcmViz.PlotPoint(90, Double.PositiveInfinity, "Y → X")
    val json = CcmViz.convergenceSpecJson(bad)
    assert(!json.contains("NaN") && !json.contains("Infinity"))
    assert(json.contains("\"correlation\":null"))
  }

  test("a fifth direction cycles the glyph palette instead of throwing (ADVICE r12)") {
    val five = (1 to 5).map(i => CcmViz.PlotPoint(10 * i, 0.1 * i, s"dir$i"))
    val chart = CcmViz.asciiChart(five)
    assert(chart.contains("x = dir1") && chart.contains("x = dir5")) // 5th reuses glyph 1
  }
}
