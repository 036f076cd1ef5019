package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware aggregation helpers.
  *
  * A plain `groupBy(key).agg(...)` sends every row of a hot key to one
  * reducer. For algebraic aggregates the standard fix is two-phase salting:
  * aggregate on (key, salt) first — spreading a hot key over `saltBuckets`
  * reducers — then combine the partials per key. Results are identical for
  * the algebraic aggregates supported here (count / sum / min / max; avg is
  * derived as sum/count at the end).
  *
  * At 100 TB this matters when a blocking key (dedup `source`, an LSH band
  * bucket, a series id) is pathologically hot; AQE's skew-join handling
  * covers joins, but hot-key AGGREGATION still wants salting.
  */
object SkewOps {

  /** Two-phase salted count+sum+min+max+avg of `value` per `key`.
    *
    * Salt derivation: content-only — `hash(key, value[, rowId])` — so the
    * bucket of every row is a pure function of its data, independent of
    * partition layout or row order (a `monotonically_increasing_id`-based
    * salt changes across runs, which also reorders the floating-point
    * combine and can move double sums by an ulp). Caveat: without `rowId`,
    * exact duplicate `(key, value)` rows share one bucket; if a hot key
    * carries a near-constant value, pass a stable per-row id column so the
    * salt still spreads.
    */
  def saltedStats(
      df: DataFrame,
      key: Column,
      value: Column,
      saltBuckets: Int = 32,
      rowId: Option[Column] = None
  ): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val saltInput = Seq(key, value) ++ rowId
    val salted = df.select(
      key.as("k"),
      value.as("v"),
      (abs(hash(saltInput: _*)) % saltBuckets).as("salt")
    )
    val partial = salted
      .groupBy(col("k"), col("salt"))
      .agg(
        count(lit(1)).as("p_cnt"),
        sum(col("v")).as("p_sum"),
        min(col("v")).as("p_min"),
        max(col("v")).as("p_max")
      )
    partial
      .groupBy(col("k"))
      .agg(
        sum(col("p_cnt")).as("n"),
        sum(col("p_sum")).as("sum_v"),
        min(col("p_min")).as("min_v"),
        max(col("p_max")).as("max_v")
      )
      .withColumn("avg_v", col("sum_v") / col("n"))
  }
}
