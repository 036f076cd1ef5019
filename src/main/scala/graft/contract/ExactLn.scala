package graft.contract

/** Engine-shared natural logarithm built from IEEE-only arithmetic.
  *
  * WHY THIS EXISTS: the driver's correctness gate byte-hashes result
  * values, so a hashed double that passed through libm (`ln`, `exp`,
  * `pow`) is a cross-engine liability — JVM `Math.log` and DuckDB's
  * libm are allowed to differ by 1 ulp, and the round-11 driver run
  * measured exactly that (evt_hurst: local MATCH, driver hash-red).
  * IEEE 754 `+ - * /` and `sqrt`, by contrast, are CORRECTLY ROUNDED
  * on every conforming engine: the same operation tree over the same
  * inputs yields bit-identical doubles everywhere. So we compute ln
  * ourselves from those five ops only (the FftSurrogate cos/sin
  * precedent), emit the SAME operation tree as a Spark SQL expression
  * and as a DuckDB SQL expression, and the two engines agree by
  * construction instead of by libm luck.
  *
  * ALGORITHM (identical op order in both dialects):
  *   1. Range-reduce y = 2^e * f with f in [1, 2) by a bounded fold of
  *      exact halvings/doublings (multiply by 0.5 / 2.0 is exact; 40
  *      steps covers y in (2^-40, 2^40), far beyond any caller's range).
  *   2. z = (f-1)/(f+1), z in [0, 1/3]; ln(f) = 2*atanh(z)
  *      = 2 * sum_{k=0..13} z^(2k+1)·c_k with c_k the spliced
  *      shortest-decimal literal of 1/(2k+1) — a multiplication, not
  *      a division (the [[ExactExp]] reciprocal-coefficient rationale:
  *      both engines parse c_k to the same double, so parity is by
  *      construction and the per-term cost drops from an FP divide to
  *      a multiply). Truncation error < 2e-14 at z = 1/3, and the ≤1
  *      ulp per-term rounding shift vs the divide form is irrelevant
  *      for parity (both engines run the same multiply) and far below
  *      any published precision.
  *   3. ln(y) = e * LN2 + 2*s with LN2 spliced as the round-trip
  *      shortest-decimal literal of Math.log(2) (strtod is correctly
  *      rounded in both engines, so the literal parses to the same bits).
  *
  * Literal suffixes matter: bare decimal literals parse as DECIMAL in
  * BOTH Spark and DuckDB, which would poison the arithmetic with
  * decimal ops — Spark text uses the `D` suffix, DuckDB text uses
  * `e0` exponent form, both forcing DOUBLE.
  *
  * Callers must pass a PLAIN COLUMN REFERENCE holding a strictly
  * positive double (the expression repeats the reference).
  */
object ExactLn {

  /** Shortest-decimal round-trip literal of Math.log(2). */
  val Ln2 = "0.6931471805599453"

  /** Shortest-decimal round-trip literals of 1/(2k+1), k = 0..13 — the
    * atanh coefficients shared by both SQL texts (and mirrored by
    * [[graft.functions.ExactMath.LnInvOdd]]).
    */
  val InvOdd: Seq[String] = Seq(
    "1.0", "0.3333333333333333", "0.2", "0.14285714285714285",
    "0.1111111111111111", "0.09090909090909091", "0.07692307692307693",
    "0.06666666666666667", "0.058823529411764705", "0.05263157894736842",
    "0.047619047619047616", "0.043478260869565216", "0.04",
    "0.037037037037037035"
  )

  /** Spark SQL expression text for ln(`y`); `y` a positive double column. */
  def spark(y: String): String =
    s"""element_at(transform(array(
       |  aggregate(sequence(1, 40),
       |    aggregate(sequence(1, 40),
       |      named_struct('f', CAST($y AS DOUBLE), 'e', 0.0D),
       |      (acc, i) -> IF(acc.f >= 2.0D, named_struct('f', acc.f * 0.5D, 'e', acc.e + 1.0D), acc)),
       |    (acc, i) -> IF(acc.f < 1.0D, named_struct('f', acc.f * 2.0D, 'e', acc.e - 1.0D), acc))),
       |  fe -> element_at(transform(array((fe.f - 1.0D) / (fe.f + 1.0D)),
       |    z -> aggregate(array(${InvOdd.map(_ + "D").mkString(", ")}),
       |      named_struct('p', z, 's', 0.0D),
       |      (acc, ck) -> named_struct(
       |        'p', acc.p * (z * z),
       |        's', acc.s + (acc.p * ck)),
       |      acc -> (fe.e * ${Ln2}D) + (2.0D * acc.s))), 1)), 1)""".stripMargin

  /** DuckDB SQL expression text for ln(`y`) — the SAME operation tree.
    *
    * The range-reduction CASEs are ELEMENT-WISE (each list slot gets its
    * own scalar CASE) rather than list-valued (`CASE ... THEN [..] ELSE
    * acc END`): DuckDB 1.0.0 segfaults — measured, nondeterministically
    * by vector boundary — when a list_reduce lambda returns the
    * accumulator list itself from a CASE branch. Values are identical
    * (same arithmetic per slot), so this is purely a crash fix; the
    * Spark text keeps the struct-valued IF (no such bug there).
    */
  def duck(y: String): String =
    s"""list_transform([
       |  list_reduce(
       |    list_prepend(
       |      list_reduce(
       |        list_prepend([CAST($y AS DOUBLE), 0.0e0],
       |                     list_transform(generate_series(1, 40), i -> [0.0e0, 0.0e0])),
       |        (acc, e) -> [CASE WHEN acc[1] >= 2.0e0 THEN acc[1] * 0.5e0 ELSE acc[1] END,
       |                     CASE WHEN acc[1] >= 2.0e0 THEN acc[2] + 1.0e0 ELSE acc[2] END]),
       |      list_transform(generate_series(1, 40), i -> [0.0e0, 0.0e0])),
       |    (acc, e) -> [CASE WHEN acc[1] < 1.0e0 THEN acc[1] * 2.0e0 ELSE acc[1] END,
       |                 CASE WHEN acc[1] < 1.0e0 THEN acc[2] - 1.0e0 ELSE acc[2] END])],
       |  fe -> list_transform([(fe[1] - 1.0e0) / (fe[1] + 1.0e0)],
       |    z -> (fe[2] * ${Ln2}e0) + (2.0e0 * list_reduce(
       |      list_prepend([z, 0.0e0],
       |                   [${InvOdd.map(c => s"[${c}e0, 0.0e0]").mkString(", ")}]),
       |      (acc, e) -> [acc[1] * (z * z),
       |                   acc[2] + (acc[1] * e[1])])[2]))[1])[1]""".stripMargin
}
