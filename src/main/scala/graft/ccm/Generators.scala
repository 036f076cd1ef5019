package graft.ccm

/** Deterministic coupled-series generators, re-implemented from the
  * reference's two generator modules. Recurrences are inherently sequential,
  * so they run driver-side (tiny data) and feed `createDataFrame`.
  */
object Generators {

  /** Coupled logistic maps (`lib/coupled_logistic_maps_generator.ex:6-27`):
    * r1=3.7, r2=3.6, x0=0.1, y0=0.2;
    * x' = clamp01(r1*x*(1-x) + c*(y-x)); y' = clamp01(r2*y*(1-y)).
    * NOTE: **Y drives X** here. Deterministic, no RNG.
    */
  def coupledLogisticMaps(length: Int, coupling: Double = 0.02): (Array[Double], Array[Double]) = {
    val xs = new Array[Double](length)
    val ys = new Array[Double](length)
    var x = 0.1; var y = 0.2
    var i = 0
    while (i < length) {
      xs(i) = x; ys(i) = y
      val nx = 3.7 * x * (1 - x) + coupling * (y - x)
      val ny = 3.6 * y * (1 - y)
      x = math.max(0.0, math.min(1.0, nx))
      y = math.max(0.0, math.min(1.0, ny))
      i += 1
    }
    (xs, ys)
  }

  /** Parameters of [[coupledSeries]], defaults matching the reference
    * (`lib/coupled_series_generator.ex:10-27`).
    */
  final case class CoupledParams(
      rX: Double = 3.8,
      rY: Double = 3.6,
      coupling: Double = 0.3,
      noiseLevel: Double = 0.05,
      x0: Double = 0.3,
      y0: Double = 0.4,
      seed: Long = 123L
  )

  /** Coupled series with observation noise
    * (`lib/coupled_series_generator.ex:10-83`): **X drives Y**:
    * y' = clamp(rY*y*(1-y) + c*(x-y), 0.001, 0.999); x' = clamp(rX*x*(1-x));
    * then additive uniform noise value + noise*(U(0,1)-0.5)*2. The
    * reference seeds the BEAM RNG in its demo (`:117`) — determinism is the
    * intended property, not a specific RNG. The uniform source here is the
    * [[DetHash]] permutation (stream 1 for x, stream 2 for y, scaled to
    * [0,1)): seeded, engine-portable integer arithmetic, so the ENTIRE
    * generator — recurrence AND noise — is reproducible as DuckDB SQL and
    * the generated series can pass the exact-hash oracle gate (a
    * java.util.Random stream cannot: its 48-bit LCG products overflow
    * BIGINT in SQL).
    */
  def coupledSeries(length: Int = 50, p: CoupledParams = CoupledParams()): (Array[Double], Array[Double]) = {
    val xs = new Array[Double](length)
    val ys = new Array[Double](length)
    var x = p.x0; var y = p.y0
    var i = 0
    def clamp(v: Double) = math.max(0.001, math.min(0.999, v))
    def u(stream: Long): Double = DetHash.rankHash(i.toLong, stream, 0L, p.seed).toDouble / DetHash.P
    while (i < length) {
      xs(i) = x + p.noiseLevel * (u(1) - 0.5) * 2
      ys(i) = y + p.noiseLevel * (u(2) - 0.5) * 2
      val nx = clamp(p.rX * x * (1 - x))
      val ny = clamp(p.rY * y * (1 - y) + p.coupling * (x - y))
      x = nx; y = ny
      i += 1
    }
    (xs, ys)
  }

  /** The reference's four canned cases
    * (`lib/coupled_series_generator.ex:88-102`), each length 50.
    */
  def testCases: Seq[(String, CoupledParams)] = Seq(
    "strong" -> CoupledParams(coupling = 0.4, noiseLevel = 0.02),
    "medium" -> CoupledParams(coupling = 0.2, noiseLevel = 0.05),
    "weak" -> CoupledParams(coupling = 0.1, noiseLevel = 0.03),
    "none" -> CoupledParams(coupling = 0.0, noiseLevel = 0.05)
  )
}
