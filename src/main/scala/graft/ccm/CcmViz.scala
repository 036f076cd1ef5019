package graft.ccm

/** Convergence visualization (reference §2a V1, `examples.livemd:80-99`).
  *
  * The reference's livemd builds plot-ready records
  * `%{library_size, correlation, direction}` and renders a VegaLite line
  * plot (mark :line point: true; x = library_size quantitative,
  * y = correlation quantitative, color + stroke_dash by direction).
  * The engine-side equivalents:
  *
  *   - [[convergenceSpecJson]] — the SAME Vega-Lite v5 document the Vl
  *     builder chain produces, with the data inlined as `values` (what
  *     `Vl.data_from_values` does), renderable by any Vega-Lite host;
  *   - [[asciiChart]] — a terminal fallback for `CcmDemo` (the reference
  *     demo prints per-lib-size correlations; this draws them).
  *
  * The plot DATA itself is a gated contract query
  * (`ccm_convergence_plot` in graft.contract.CcmQueries) so the rows a
  * user feeds either renderer are oracle-verified.
  */
object CcmViz {

  /** One plot record: the livemd's `%{library_size, correlation, direction}`. */
  final case class PlotPoint(librarySize: Int, correlation: Double, direction: String)

  private def esc(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }

  /** Vega-Lite v5 spec mirroring `examples.livemd:89-97`:
    * width/height/title, line mark with points, quantitative x/y with the
    * livemd's axis titles, direction on color AND strokeDash.
    */
  def convergenceSpecJson(
      points: Seq[PlotPoint],
      width: Int = 600,
      height: Int = 400,
      title: String = "CCM Convergence Analysis"
  ): String = {
    // Non-finite rho (degenerate CCM output) would interpolate as the
    // bare tokens NaN/Infinity — invalid JSON that breaks any Vega-Lite
    // host. Emit JSON null instead; Vega-Lite skips null points.
    def corrJson(c: Double): String =
      if (java.lang.Double.isFinite(c)) c.toString else "null"
    val values = points
      .map(p =>
        s"""{"library_size":${p.librarySize},"correlation":${corrJson(p.correlation)},"direction":"${esc(p.direction)}"}"""
      )
      .mkString("[", ",", "]")
    s"""{
       |  "$$schema": "https://vega.github.io/schema/vega-lite/v5.json",
       |  "width": $width, "height": $height, "title": "${esc(title)}",
       |  "data": {"values": $values},
       |  "mark": {"type": "line", "point": true},
       |  "encoding": {
       |    "x": {"field": "library_size", "type": "quantitative", "title": "Library Size"},
       |    "y": {"field": "correlation", "type": "quantitative", "title": "Cross-Map Correlation"},
       |    "color": {"field": "direction", "type": "nominal", "title": "Causal Direction"},
       |    "strokeDash": {"field": "direction", "type": "nominal"}
       |  }
       |}""".stripMargin
  }

  /** Terminal line chart: one glyph per direction ('x' and 'o', '*' where
    * they coincide), lib sizes across, correlation up, with numeric y-axis
    * bounds and an x-axis legend line. Deterministic (no randomness, no
    * locale formatting).
    */
  def asciiChart(points: Seq[PlotPoint], width: Int = 64, height: Int = 16): String = {
    if (points.isEmpty) return "(no points)"
    val dirs = points.map(_.direction).distinct.sorted
    // cycle glyphs by index: a 5th+ direction reuses the palette instead
    // of throwing NoSuchElementException from a 4-entry map
    val glyphs = Seq('x', 'o', '+', '#')
    val glyph = dirs.zipWithIndex.map { case (d, i) => d -> glyphs(i % glyphs.size) }.toMap
    val (loX, hiX) = (points.map(_.librarySize).min, points.map(_.librarySize).max)
    val (loY0, hiY0) = (points.map(_.correlation).min, points.map(_.correlation).max)
    val (loY, hiY) = if (hiY0 - loY0 < 1e-12) (loY0 - 0.5, hiY0 + 0.5) else (loY0, hiY0)
    def colOf(ls: Int): Int =
      if (hiX == loX) 0 else ((ls - loX).toDouble / (hiX - loX) * (width - 1)).round.toInt
    def rowOf(c: Double): Int =
      (height - 1) - ((c - loY) / (hiY - loY) * (height - 1)).round.toInt
    val grid = Array.fill(height, width)(' ')
    points.foreach { p =>
      val (r, cc) = (rowOf(p.correlation), colOf(p.librarySize))
      grid(r)(cc) = if (grid(r)(cc) == ' ') glyph(p.direction) else '*'
    }
    val yHi = f"$hiY%8.4f |"
    val yLo = f"$loY%8.4f |"
    val pad = " " * 9 + "|"
    val body = grid.zipWithIndex
      .map { case (row, i) =>
        val prefix = if (i == 0) yHi else if (i == height - 1) yLo else pad
        prefix + new String(row)
      }
      .mkString("\n")
    val legend = dirs.map(d => s"${glyph(d)} = $d").mkString("   ")
    body + "\n" + " " * 10 + "+" + "-" * width +
      s"\n${" " * 10} lib_size $loX..$hiX   $legend"
  }
}
