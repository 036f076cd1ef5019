package graft.ccm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S-map — sequential locally weighted global linear maps (Sugihara 1994,
  * "Nonlinear forecasting for the classification of natural time series").
  * The classic EDM companion to the reference's simplex-projection CCM
  * (`lib/ccm.ex:139-177` is the kNN/simplex half of the same toolkit; the
  * reference stops there): for each target point, fit a linear map over
  * the WHOLE library with distances-to-target exponentially weighted by
  * `w_i = exp(-θ·d_i / d̄)`, and sweep θ. θ=0 is one global linear model;
  * growing skill with θ ("state-dependence") is the standard EDM evidence
  * that the dynamics are nonlinear — the diagnostic that motivates using
  * CCM at all.
  *
  * This implementation is the E=1 closed form: per (target, θ) the
  * weighted least squares over library pairs `(src_i → tgt_i)` reduces to
  * five weighted sums (Sw, Swx, Swy, Swxx, Swxy), so the whole sweep is
  * pair-join → window mean → aggregate — fully declarative, one shuffle
  * per stage, and replayable in ANSI SQL (the ccm_smap oracle). Library
  * membership is leave-one-out (every other point of the same series).
  *
  * Directions follow the CCM convention (`lib/ccm.ex:49-53`): x_causes_y
  * maps FROM Y (src) TO X (tgt).
  *
  * Scale: pairs are generated per series only (equi-join on the series
  * key), so a million independent series parallelize freely; per-series
  * cost is the same O(n²) the simplex pipeline already pays. Degenerate
  * guards: `d̄ = 0` (constant source series) falls back to uniform
  * weights; a singular normal matrix (|den| <= 1e-12) drops the slope and
  * predicts the weighted mean; corr over <2 points or zero variance → 0.0
  * (the C9 convention).
  */
object Smap {
  val DefaultThetas: Seq[Double] = Seq(0.0, 0.5, 1.0, 2.0, 4.0, 8.0)
  val DefaultNonlinearEps: Double = 0.01

  /** Output: (skey, direction, theta, rho, nonlinear) — rho rounded to
    * 6 dp BEFORE the nonlinear flag is derived, so the flag compares
    * engine-identical doubles (cross-engine ulp noise cannot flip it).
    * `nonlinear` = max_θ rho − rho(θ_min) > nonlinearEps, replicated per
    * (skey, direction) like the convergent flag.
    */
  def bidirectional(
      df: DataFrame,
      skey: Column,
      order: Seq[String],
      x: Column,
      y: Column,
      thetas: Seq[Double] = DefaultThetas,
      nonlinearEps: Double = DefaultNonlinearEps
  ): DataFrame = {
    require(thetas.nonEmpty, "thetas must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val base =
      df.select(Seq(skey.cast("long").as("skey"), x.as("x"), y.as("y")) ++ order.map(col): _*)
    val wIdx = Window.partitionBy("skey").orderBy(order.map(col): _*)
    val indexed = base
      .withColumn("idx", row_number().over(wIdx).cast("long"))
      .select("skey", "idx", "x", "y")
    val thetaDf = broadcast(thetas.toDF("theta"))

    def oneDir(srcName: String, tgtName: String, dir: String): DataFrame = {
      val rel = indexed.select(col("skey"), col("idx"), col(srcName).as("s"), col(tgtName).as("g"))
      val pairs = rel
        .as("t")
        .join(rel.as("i"), $"t.skey" === $"i.skey" && $"t.idx" =!= $"i.idx")
        .select(
          $"t.skey".as("skey"),
          $"t.idx".as("t_idx"),
          $"t.s".as("ts_"),
          $"t.g".as("tg"),
          $"i.s".as("is_"),
          $"i.g".as("ig")
        )
        .withColumn("d", abs($"is_" - $"ts_"))
      // mean distance to the target's library: window aggregate on the
      // pair relation (already partitioned by the join) — no extra shuffle
      val wBar = Window.partitionBy("skey", "t_idx")
      val weighted = pairs
        .withColumn("dbar", avg($"d").over(wBar))
        .crossJoin(thetaDf)
        .withColumn("w", when($"dbar" > 0.0, exp(-$"theta" * $"d" / $"dbar")).otherwise(1.0))
      val sums = weighted
        .groupBy($"skey", $"theta", $"t_idx", $"ts_", $"tg")
        .agg(
          sum($"w").as("sw"),
          sum($"w" * $"is_").as("swx"),
          sum($"w" * $"ig").as("swy"),
          sum($"w" * $"is_" * $"is_").as("swxx"),
          sum($"w" * $"is_" * $"ig").as("swxy")
        )
      val den = $"sw" * $"swxx" - $"swx" * $"swx"
      val preds = sums
        .withColumn(
          "bc",
          when(abs(den) > 1e-12, ($"sw" * $"swxy" - $"swx" * $"swy") / den).otherwise(0.0)
        )
        .withColumn("pred", ($"swy" - $"bc" * $"swx") / $"sw" + $"bc" * $"ts_")
      // Pearson from guarded co-moments rather than corr(): under ANSI
      // mode (Spark 4 default) corr THROWS on zero variance instead of
      // returning NaN, so the C9 degenerate→0.0 convention has to be
      // applied BEFORE the division — a `when` guard around cv/(s1·s2)
      // keeps the branch unevaluated on degenerate groups. (Engine-delta
      // vs DuckDB's corr is ulp-level and absorbed by the 6-dp round,
      // like every other aggregation-order delta in this family.)
      preds
        .groupBy($"skey", $"theta")
        .agg(
          covar_samp($"tg", $"pred").as("cv"),
          stddev_samp($"tg").as("s1"),
          stddev_samp($"pred").as("s2")
        )
        .withColumn(
          "rho",
          when(
            $"cv".isNull || $"s1".isNull || $"s2".isNull ||
              isnan($"cv") || isnan($"s1") || isnan($"s2") ||
              $"s1" === 0.0 || $"s2" === 0.0,
            0.0
          ).otherwise($"cv" / ($"s1" * $"s2"))
        )
        .select($"skey", lit(dir).as("direction"), $"theta", (round($"rho", 6) + lit(0.0)).as("rho"))
    }

    val u = oneDir("y", "x", Ccm.DirXCausesY).unionByName(oneDir("x", "y", Ccm.DirYCausesX))
    val minTheta = thetas.min
    val wFlag = Window.partitionBy("skey", "direction")
    u.withColumn("rho0", max(when($"theta" === minTheta, $"rho")).over(wFlag))
      .withColumn("rho_max", max($"rho").over(wFlag))
      .withColumn("nonlinear", $"rho_max" - $"rho0" > nonlinearEps)
      .drop("rho0", "rho_max")
  }
}
