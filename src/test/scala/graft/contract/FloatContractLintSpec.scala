package graft.contract

import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

/** Float-contract lint: no hashed column may depend on libm luck.
  *
  * The driver's correctness gate byte-hashes result values from TWO
  * engines (Spark/JVM and DuckDB). IEEE 754 guarantees bit-equal
  * results across conforming implementations ONLY for `+ - * /` and
  * `sqrt` (correctly rounded); `ln`/`exp`/`pow` may differ by 1 ulp
  * between libm builds. Round 11 measured the failure mode: evt_hurst
  * (libm `ln` in the OLS) matched locally and hash-failed on the
  * driver's different build. The exact recipes that replace libm are
  * ExactLn's IEEE-only series, integer micro-units with
  * (2a+b) div (2b) half-up, floor(x+0.5), and spliced round-trip
  * double literals.
  *
  * This spec scans every ORACLE SQL text (the oracle is the engine-
  * parity contract: transcendental math there is the cross-engine
  * surface) for ln( exp( pow( power( log( log2( log10(. Every hit
  * must be covered by a waiver carrying a written parity argument —
  * new libm enters the hashed surface deliberately or not at all.
  *
  * WHAT IS DELIBERATELY NOT LINTED:
  *   - 1-arg round(x): at scale 0 every tie (half-integer) is exactly
  *     binary-representable, so the shortest-decimal HALF_UP view
  *     (Spark BigDecimal) and the binary half-away view (DuckDB
  *     std::round) see the SAME tie and round it the same way, and
  *     agree trivially off-tie — the documented evt_interpolate /
  *     ccm_boot_ci argument, green on every driver build. (round(x, n)
  *     for n>0 is DIFFERENT: decimal ties are not representable and
  *     the two views measurably split — the evt_mad_outliers flip —
  *     but it is the surface-wide Norm.rnd output convention with 11
  *     rounds of measured parity; BASELINE.md's waiver ledger records
  *     that residual risk.)
  *   - DECIMAL-typed hashed outputs (engine/build-dependent scale
  *     rules): convention is CAST(int AS DOUBLE)/1e6-style publishing;
  *     recorded in the ledger, not textually detectable here.
  */
class FloatContractLintSpec extends AnyFunSuite {

  private val Transcendentals = Seq("ln", "exp", "pow", "power", "log", "log2", "log10")

  private def callSites(sql: String, fn: String): Seq[Int] = {
    val re = s"(?i)(?<![a-z0-9_])${fn}\\s*\\(".r
    re.findAllMatchIn(sql).map(_.start).toList
  }

  private def snippet(sql: String, at: Int): String =
    sql.slice(at, math.min(sql.length, at + 70)).replaceAll("\\s+", " ")

  private def scan(sql: String): Seq[String] =
    Transcendentals.flatMap { fn =>
      callSites(sql, fn).map(at => s"$fn :: ${snippet(sql, at)}")
    }

  /** Class waivers — one parity argument covering every matching site.
    *
    * pow2int: pow(2, k) for integer k — the result is an exact power
    * of two, which every libm (and the JVM) returns exactly; there is
    * no rounding surface. Used by the simhash/LSH bit-packers.
    *
    * (The former ccmExpKernel class waiver — exp(-d/dmin),
    * exp(-theta*d/dbar) on 25 ccm_ and stream_ccm queries — was retired
    * in round 13: the kernel now runs the IEEE-only ExactExp series on
    * both engines (graft_exp codegen on the Spark side, ExactExp.duck
    * on the oracle side, ExactMath.exp in the JVM twins), bit-identical
    * by construction. ExactSeriesSpec pins the three-way equality.)
    */
  private def classWaived(hit: String): Boolean =
    hit.matches("(?i)(pow|power) :: (pow|power)\\(\\s*2\\s*,.*")

  /** Per-query waivers: transcendental name -> written parity argument.
    * Every entry names math whose parity is empirical (measured green on
    * both builds, every driver round since the query landed), not
    * IEEE-guaranteed; each carries the boundary reasoning and the
    * conversion path if a future build flips it. Mirrored in
    * BASELINE.md's waiver ledger.
    */
  private val waivers: Map[String, (Set[String], String)] = Map.empty
  // Round 13 emptied the table: the eleven per-query ln/exp waivers
  // (text_zipf, text_lm_score, text_bigram_lm, text_quality_lr,
  // text_source_divergence, text_tfidf, text_bm25, ccm_mi_tau,
  // ccm_auto_params, evt_transfer_entropy, mm_features) were all
  // converted to the ExactLn/ExactExp IEEE-only series on both engines.
  // New libm in a hashed path must either use the exact recipes or add
  // a written waiver here.

  test("every transcendental in an oracle's hashed path is explicitly waived") {
    val violations = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      val allowed = waivers.get(name).map(_._1).getOrElse(Set.empty[String])
      scan(sql)
        .filterNot(h => allowed.contains(h.takeWhile(_ != ' ')) || classWaived(h))
        .map(b => s"$name: $b")
    }
    assert(
      violations.isEmpty,
      s"\nUnwaived libm in hashed oracle paths (use the exact recipes — ExactLn series, integer " +
        s"(2a+b) div (2b) half-up, floor(x+0.5), spliced literals — or add a written waiver):\n  " +
        violations.mkString("\n  ")
    )
  }

  test("waivers list only queries that still exist and still hit the lint") {
    val stale = waivers.keys.filterNot(SparkEntry.oracleSql.contains)
    assert(stale.isEmpty, s"waivers for deleted queries: ${stale.mkString(", ")}")
    val silent = waivers.collect {
      case (name, (allowed, _))
          if SparkEntry.oracleSql.contains(name) &&
            !scan(SparkEntry.oracleSql(name)).exists(h => allowed.contains(h.takeWhile(_ != ' '))) =>
        name
    }
    assert(silent.isEmpty, s"waivers whose queries no longer hit the lint (delete them): ${silent.mkString(", ")}")
  }
}
