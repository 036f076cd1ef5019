package graft.contract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{lit, round}

/** Cross-engine float-output normalization for the DuckDB-oracle gate.
  *
  * The driver's correctness compare byte-hashes values, so `-0.0` and
  * `+0.0` — equal by every numeric comparison — hash DIFFERENTLY. A
  * rounded aggregate can legitimately land on zero with either sign, and
  * the two engines do not agree on which (observed: DuckDB `round(rho,6)`
  * -> `-0.0` where Spark produced `+0.0` on the same cell).
  *
  * Fix: add `+ 0.0` after every rounded double output on BOTH sides.
  * IEEE 754 guarantees `x + (+0.0) == x` bit-exactly for every finite,
  * infinite and NaN `x` EXCEPT `-0.0`, which becomes `+0.0` — i.e. the
  * addition is a pure sign-of-zero normalizer. Neither engine's optimizer
  * folds `col + 0.0` away (doing so would be unsound for exactly this
  * reason).
  */
object Norm {
  /** `round(c, scale)` with `-0.0` normalized to `+0.0`. */
  def rnd(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)

  /** Deterministic total ordering of a SMALL final result without
    * `orderBy`'s hidden double execution: a global sort plans
    * `Exchange(rangepartitioning)`, whose range-boundary SAMPLING job
    * re-executes the plan's entire unshuffled tail — for queries whose
    * heavy work sits between the last shuffle and the sort (the CCM pair
    * joins, the dedup self-joins) that is the whole expensive subtree run
    * TWICE (measured +55% wall clock on ccm_fnn_dim). `repartition(1)`
    * inserts a plain hash-shuffle boundary instead — the expensive subtree
    * executes once, in parallel — and the rows get their total order from
    * a single-partition sort. Only for small results (every contract
    * output is <= ~40k rows); a large result would want a real
    * range-partitioned sort.
    */
  def ordered(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)
}
