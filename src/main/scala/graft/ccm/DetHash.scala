package graft.ccm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic arithmetic hashes shared by the Scala kernel, the Spark
  * DataFrame pipeline, and the DuckDB oracle SQL.
  *
  * The reference samples library rows with unseeded `Enum.take_random`
  * (`lib/ccm.ex:117`); we replace that with a seeded hash-rank order so the
  * exact same sample is reproducible in plain ANSI SQL on any engine. The
  * hash is pure int64 arithmetic with all intermediate products < 2^63
  * (idx < 2^40, sample < 2^20), so there is no overflow and no dependence on
  * engine-native hash functions (Spark xxhash64 != DuckDB hash).
  */
object DetHash {
  val P: Long = 2147483647L // 2^31 - 1 (Mersenne prime)
  val A_IDX: Long = 2654435761L // Knuth multiplicative constant
  val A_SAMPLE: Long = 40503L
  val A_KEY: Long = 97L
  val A_SEED: Long = 104729L

  /** Rank hash for library sampling: order rows within a (series, sample)
    * cell by (rankHash, idx); the first L rows are the library, the rest the
    * prediction set (complement split, reference `lib/ccm.ex:117,121`).
    *
    * Construction: a per-(sample, series, seed) multiplier `a` in [1, P-1]
    * defines a true permutation of Z_P (P prime) via (idx+1)*a mod P; a
    * squaring step then breaks the linear lattice structure so successive
    * samples/seeds yield genuinely different library sets (an additive-only
    * hash would make them mere cyclic rotations of one another).
    *
    * Domain: requires 0 <= idx < 2^31 (a, h0 < 2^31 keep every product
    * below 2^63 — Spark would silently wrap past that while DuckDB raises,
    * so the bound is load-bearing for oracle parity; 2 billion rows per
    * SERIES is far beyond CCM's O(n^2) practicality anyway). The multiplier
    * folds through a double mod so negative sample/series/seed inputs still
    * land in [1, P-1] instead of degenerating the permutation.
    */
  def rankHash(idx: Long, sampleId: Long, seriesKey: Long, seed: Long): Long = {
    val m = (sampleId * A_SAMPLE + seed * A_SEED + seriesKey * A_KEY) % (P - 1)
    val a = (m + (P - 1)) % (P - 1) + 1
    val h0 = ((idx + 1) * a) % P
    (h0 * h0) % P
  }

  /** Column form of [[rankHash]] — identical arithmetic, runs in codegen. */
  def rankHashCol(idx: Column, sampleId: Column, seriesKey: Column, seed: Long): Column = {
    val m = (sampleId.cast("long") * A_SAMPLE + lit(seed) * A_SEED +
      seriesKey.cast("long") * A_KEY) % (P - 1)
    val a = (m + (P - 1)) % (P - 1) + 1
    val h0 = ((idx.cast("long") + 1) * a) % P
    (h0 * h0) % P
  }

  /** SQL text form of [[rankHash]] for the DuckDB oracle. The inner term is
    * CAST to BIGINT explicitly: with all-literal arguments DuckDB types the
    * expression INT32 and `m + (P-1)` overflows (int64 everywhere in Spark).
    */
  def rankHashSql(idx: String, sampleId: String, seriesKey: String, seed: Long): String = {
    val m = s"(CAST((($sampleId) * ${A_SAMPLE} + ${seed} * ${A_SEED} + ($seriesKey) * ${A_KEY}) AS BIGINT) % ${P - 1})"
    val a = s"(($m + ${P - 1}) % ${P - 1} + 1)"
    val h0 = s"(((($idx) + 1) * $a) % ${P})"
    s"(($h0 * $h0) % ${P})"
  }

  /** Polynomial (Horner) string hash over code points, mod P. Engine-portable:
    * Spark `aggregate(split(s,''), ...)` and DuckDB
    * `list_reduce(list_prepend(0, list_transform(string_split(s,''), ...)))`
    * produce identical values (verified for ASCII and BMP code points).
    */
  def polyHash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column form of [[polyHash]]. */
  def polyHashCol(c: Column): Column =
    aggregate(
      split(c, ""),
      lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch).cast("long")) % P
    )

  /** Spark-SQL text form of [[polyHash]] — for use inside higher-order
    * lambdas (where the Column form can't reach the lambda variable).
    */
  def polyHashSparkSql(expr: String): String =
    s"aggregate(split($expr, ''), CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + ascii(c)) % ${P})"

  /** DuckDB SQL form of [[polyHash]]. */
  def polyHashSql(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($expr, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(acc, c) -> (acc * 31 + c) % ${P})"

  /** Affine re-hash used for MinHash permutations: (a_k * h + b_k) % P.
    * Coefficients derived arithmetically from k so both engines can inline
    * them: a_k = 2*k+1 scaled, b_k from the seed hash.
    */
  def minhashPerm(h: Column, k: Int): Column =
    (h * (2L * k + 1L) + (k.toLong * A_SAMPLE + 7L)) % P

  def minhashPermSql(h: String, k: Int): String =
    s"((($h) * ${2L * k + 1L} + ${k.toLong * A_SAMPLE + 7L}) % ${P})"
}
