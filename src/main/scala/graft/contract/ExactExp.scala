package graft.contract

/** Engine-shared exponential built from IEEE-only arithmetic — the
  * sibling of [[ExactLn]] that retires the "CCM exp kernel" class
  * waiver (BASELINE.md float-parity ledger): the weights
  * `exp(-d/dmin)` / `exp(-θ·d/d̄)` previously relied on JVM `Math.exp`
  * and DuckDB's libm agreeing, which is exactly the 1-ulp class that
  * produced round-11's evt_hurst driver hash-red on a different libm
  * build. This emits the SAME operation tree as Spark SQL text and
  * DuckDB SQL text using only `+ - * /`, `floor`, and comparisons —
  * all exactly defined on every IEEE 754 engine — so the two engines
  * agree bit-for-bit by construction.
  *
  * ALGORITHM (identical op order in both dialects and in
  * [[graft.functions.ExactMath.exp]], the codegen'd JVM emission):
  *   1. Clamp: x < -745 → 0.0 (true exp is below the 2^-1074 subnormal
  *      floor at -745.13; the clamp bounds |k| ≤ 1075 < 2^11 for step 3
  *      and can only differ from libm exp in the last two denormal ulps
  *      — and identically so on both engines).
  *   2. Range-reduce: k = floor(x/ln2 + 0.5) (floor over a double is a
  *      rounding op, exactly defined, NOT libm); r = x - k·ln2 with ln2
  *      spliced as the round-trip shortest-decimal literal (strtod is
  *      correctly rounded in both engines). |r| ≤ ln2/2 + eps.
  *      exp(r) by 13-term Taylor fold p_j = (p_{j-1}·r)·c_j, s += p_j,
  *      where c_j is the spliced shortest-decimal literal of 1/j —
  *      a MULTIPLICATION, not a division by j: the fold's serial
  *      dependency chain is p_j → p_{j+1}, and an FP divide costs
  *      3-5x an FP multiply in that chain on every current CPU (the
  *      codegen'd kernel runs per neighbor pair in 25 CCM queries —
  *      measured ~6% of the family's wall-clock as a division chain).
  *      c_j parses to the nearest double of 1/j in both engines
  *      (strtod is correctly rounded), so each term differs from the
  *      divide form by ≤1 ulp — truncation + rounding stays ~1e-16
  *      relative (the spec pins 5e-13 vs libm), and parity is by
  *      construction because BOTH engines run the same multiply.
  *   3. Scale by 2^k via square-and-multiply over k's 11 bits
  *      (bit = m - 2·floor(m/2)). Powers of two are exact down to the
  *      subnormal floor; underflow rounds deterministically under IEEE
  *      rules — the same bits on every conforming engine.
  *
  * Domain: total. x < -745 → 0.0; x > 709 → +Infinity (true exp
  * overflows there; the clamp keeps |k| inside the 11-bit ladder, and
  * consumers like the logistic sigmoid 1/(1+exp(-η)) get the same 0/1
  * limits libm produces). CCM kernels pass x ≤ 0 only.
  *
  * Literal suffixes matter (the ExactLn lesson): bare decimal literals
  * parse as DECIMAL in both Spark and DuckDB — Spark text uses the `D`
  * suffix, DuckDB text uses `e0` exponent form, both forcing DOUBLE.
  *
  * The `x` argument expression is spliced exactly ONCE in each dialect
  * (bound via single-element transform), so callers may pass any
  * double-typed sub-expression, e.g. `-dist / (min_dist + 1e-8)`.
  */
object ExactExp {

  /** Shortest-decimal round-trip literal of Math.log(2). */
  val Ln2 = ExactLn.Ln2

  /** Shortest-decimal round-trip literals of 1/j, j = 1..13 — the
    * Taylor coefficients as ONE list shared by the Spark and DuckDB
    * texts (and mirrored by [[graft.functions.ExactMath.ExpInvJ]]):
    * the three emissions multiply by the same parsed double.
    */
  val InvJ: Seq[String] = Seq(
    "1.0", "0.5", "0.3333333333333333", "0.25", "0.2",
    "0.16666666666666666", "0.14285714285714285", "0.125",
    "0.1111111111111111", "0.1", "0.09090909090909091",
    "0.08333333333333333", "0.07692307692307693"
  )

  /** Spark SQL expression text for exp(`x`). */
  def spark(x: String): String =
    s"""element_at(transform(array(CAST($x AS DOUBLE)), xx ->
       |  CASE WHEN xx < -745.0D THEN 0.0D
       |       WHEN xx > 709.0D THEN CAST('Infinity' AS DOUBLE) ELSE
       |  element_at(transform(array(CAST(FLOOR(xx / ${Ln2}D + 0.5D) AS DOUBLE)), kk ->
       |    element_at(transform(array(xx - kk * ${Ln2}D), r ->
       |      aggregate(array(${InvJ.map(_ + "D").mkString(", ")}),
       |        named_struct('p', 1.0D, 's', 1.0D),
       |        (acc, cj) -> named_struct(
       |          'p', (acc.p * r) * cj,
       |          's', acc.s + ((acc.p * r) * cj)),
       |        acc -> acc.s)
       |      * aggregate(sequence(1, 11),
       |          named_struct('b', IF(kk < 0.0D, 0.5D, 2.0D), 'res', 1.0D, 'm', IF(kk < 0.0D, -kk, kk)),
       |          (acc, i) -> named_struct(
       |            'b', acc.b * acc.b,
       |            'res', IF(acc.m - (2.0D * CAST(FLOOR(acc.m * 0.5D) AS DOUBLE)) >= 1.0D, acc.res * acc.b, acc.res),
       |            'm', CAST(FLOOR(acc.m * 0.5D) AS DOUBLE)),
       |          acc -> acc.res)), 1)), 1)
       |  END), 1)""".stripMargin

  /** DuckDB SQL expression text for exp(`x`) — the SAME operation tree.
    * Accumulators ride as same-type DOUBLE lists (struct_pack inside
    * list_reduce contaminates the accumulator type — the Durbin-Levinson
    * lesson); list_reduce consumes the prepended head as the initial
    * accumulator.
    */
  def duck(x: String): String =
    s"""list_transform([CAST($x AS DOUBLE)], xx ->
       |  CASE WHEN xx < -745.0e0 THEN 0.0e0
       |       WHEN xx > 709.0e0 THEN CAST('Infinity' AS DOUBLE) ELSE
       |  list_transform([CAST(FLOOR(xx / ${Ln2}e0 + 0.5e0) AS DOUBLE)], kk ->
       |    list_transform([xx - kk * ${Ln2}e0], r ->
       |      list_reduce(
       |        list_prepend([1.0e0, 1.0e0],
       |                     [${InvJ.map(c => s"[${c}e0, 0.0e0]").mkString(", ")}]),
       |        (acc, e) -> [(acc[1] * r) * e[1], acc[2] + ((acc[1] * r) * e[1])])[2]
       |      * list_reduce(
       |          list_prepend([CASE WHEN kk < 0.0e0 THEN 0.5e0 ELSE 2.0e0 END, 1.0e0,
       |                        CASE WHEN kk < 0.0e0 THEN -kk ELSE kk END],
       |                       list_transform(generate_series(1, 11), i -> [0.0e0, 0.0e0, 0.0e0])),
       |          (acc, e) -> [acc[1] * acc[1],
       |                       CASE WHEN acc[3] - (2.0e0 * CAST(FLOOR(acc[3] * 0.5e0) AS DOUBLE)) >= 1.0e0
       |                            THEN acc[2] * acc[1] ELSE acc[2] END,
       |                       CAST(FLOOR(acc[3] * 0.5e0) AS DOUBLE)])[2])[1])[1]
       |  END)[1]""".stripMargin
}
