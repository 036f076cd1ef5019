package graft.contract

/** The repo's literal grid-round forms — ONE definition of the SQL text
  * both engines parse, so a Spark expression and its DuckDB oracle can
  * never drift apart (the ExactLn/ExactExp discipline applied to
  * rounding). `round()` is deliberately absent here: its exact-half
  * semantics differ by engine class (Spark's decimal HALF_UP vs DuckDB's
  * binary half-away), while `floor`/`ceil` of a bit-identical double are
  * bit-identical everywhere.
  *
  * The Scala-code twin in [[graft.multimodal.Multimodal.decodeStub]]
  * (math.floor/math.ceil over the same ops) cannot share this string —
  * cross-language lockstep there is by documented construction, pinned by
  * the mm_features hash gate.
  */
object GridRound {

  /** Half-away-from-zero round of `expr` onto the 1/`scale` grid,
    * emitted as exact integer GRID UNITS (a BIGINT safe to sum in any
    * aggregation order). `expr` must be a double-typed SQL expression
    * valid in both engines; `scale` a literal like "1e9". The splice
    * parenthesizes `expr` (ADVICE r15): an additive argument like
    * "a - b" must bind as a unit, not as `a - (b * scale)`.
    */
  def halfAwayUnits(expr: String, scale: String): String =
    s"CAST(CASE WHEN ($expr) >= 0 THEN floor(($expr) * $scale + 0.5) " +
      s"ELSE ceil(($expr) * $scale - 0.5) END AS BIGINT)"

  /** The nonnegative fast path: plain floor(x·scale + 0.5) units. Only
    * for operands provably >= 0 (weights, counts, magnitudes).
    */
  def floorUnits(expr: String, scale: String): String =
    s"CAST(floor(($expr) * $scale + 0.5) AS BIGINT)"

  /** Publication form for hashed DOUBLE columns on the 1e-6 grid: the
    * half-away units divided back to a double (`/ 1e6` of an integer is
    * correctly rounded, hence bit-identical cross-engine) with the
    * `+ 0.0` −0.0-normalization convention. Replaces `round(x, 6)` at
    * shared-string sites: decimal ties are not binary-representable, so
    * Spark's decimal HALF_UP and DuckDB's binary half-away measurably
    * split on them (the evt_mad_outliers flip) — this form has no
    * engine-class rounding surface at all.
    */
  def grid6(expr: String): String =
    s"(CAST(${halfAwayUnits(expr, "1e6")} AS DOUBLE) / 1e6 + 0.0)"
}
