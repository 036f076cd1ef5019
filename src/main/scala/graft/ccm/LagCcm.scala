package graft.ccm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-delayed CCM (Ye, Deyle, Gilarranz & Sugihara 2015,
  * "Distinguishing time-delayed causal interactions using convergent
  * cross mapping"): sweep the cross-map over a LAG ladder — predict the
  * target at `t + ℓ` from the source manifold's neighbors at `t` — and
  * read the causal structure off the skill-vs-lag curve (true causation
  * peaks at a small NEGATIVE lag: the cause precedes its effect; a peak
  * at ℓ ≥ 0 flags synchrony/confounding instead). The diagnostic the
  * plain convergence test (`convergent?/1`, `lib/ccm.ex:215-244`) cannot
  * express.
  *
  * The expensive part — embedding, pair distances, kNN selection,
  * weights — depends ONLY on the source manifold, so it is computed ONCE
  * and every lag reuses it: the lag ladder cross-joins onto the weighted
  * neighbor relation and two equi-joins on `(skey, idx ± ℓ)` fetch the
  * shifted library targets and actuals from the embedded relation itself
  * (embedding row i's `tgt` is the target at manifold time i+(E-1)τ, so
  * row i+ℓ holds the target at time +ℓ). Out-of-range shifts drop via
  * the inner joins: a neighbor whose shifted target does not exist drops
  * from the weighted sum (its weight leaves the denominator too), and a
  * prediction point without a shifted actual contributes no pair — the
  * same boundary contract both engines replay exactly.
  *
  * Library is leave-one-out (every other embedding row of the series);
  * k = E+1 neighbors by (distance, idx); weights are the reference's
  * exact-hit/stabilizer formula (`lib/ccm.ex:246-262`). Directions follow
  * the CCM convention: x_causes_y embeds Y, predicts X.
  *
  * Scale: one pair join per series (the series-id partition axis), lag
  * fan-out multiplies only the k-row neighbor relation, never the pair
  * relation.
  */
object LagCcm {
  val DefaultLags: Seq[Int] = Seq(-3, -2, -1, 0, 1, 2, 3)

  /** Output: (skey, direction, lag, rho, best_lag) — rho 6-dp-rounded
    * BEFORE best_lag is derived (max-rho argmax, ties to the smallest
    * lag), so the argmax compares engine-identical doubles.
    */
  def bidirectional(
      df: DataFrame,
      skey: Column,
      order: Seq[String],
      x: Column,
      y: Column,
      e: Int = 2,
      tau: Int = 1,
      lags: Seq[Int] = DefaultLags
  ): DataFrame = {
    require(lags.nonEmpty, "lags must be non-empty")
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark) // graft_exp weight kernel
    import spark.implicits._
    val base =
      df.select(Seq(skey.cast("long").as("skey"), x.as("x"), y.as("y")) ++ order.map(col): _*)
    val ord = order.map(col)
    val lagDf = broadcast(lags.toDF("lag").select(col("lag").cast("long").as("lag")))

    def oneDir(src: Column, tgt: Column, dir: String): DataFrame = {
      val emb = CcmPipeline.embedded(base, Seq("skey"), ord, src, tgt, e, tau)
      val dims = (0 until e).map(j => s"e$j")
      // localCheckpoint: rel feeds FOUR join sides (pair t/l, shifted
      // library targets, shifted actuals) — without materialization each
      // reference re-runs the capped scan + index/embedding windows
      // (8 scans per query, visible as duplicated WindowGroupLimit
      // subtrees in CcmFanoutPlanSpec's plan); at cluster scale this is
      // the persisted embedding table every EDM stage shares
      val rel = emb
        .select((Seq(col("skey"), col("idx")) ++ dims.map(col) :+ col("tgt")): _*)
        .localCheckpoint()
      val d2 = dims
        .map(dn => (col(s"t.$dn") - col(s"l.$dn")) * (col(s"t.$dn") - col(s"l.$dn")))
        .reduceLeft(_ + _)
      val pairs = rel
        .as("t")
        .join(rel.as("l"), $"t.skey" === $"l.skey" && $"t.idx" =!= $"l.idx")
        .select(
          $"t.skey".as("skey"),
          $"t.idx".as("t_idx"),
          $"l.idx".as("l_idx"),
          sqrt(d2).as("dist")
        )
      val wNN = Window.partitionBy("skey", "t_idx").orderBy($"dist".asc, $"l_idx".asc)
      val wMin = Window.partitionBy("skey", "t_idx")
      val nn = pairs
        .withColumn("rn", row_number().over(wNN))
        .filter($"rn" <= e + 1)
        .withColumn("min_dist", min($"dist").over(wMin))
        .withColumn(
          "w",
          when($"dist" < 1e-12, 1.0).otherwise(expr("graft_exp((- dist) / (min_dist + 1e-8D))"))
        )
        .select($"skey", $"t_idx", $"l_idx", $"w")
      // lag fan-out on the k-row neighbor relation; shifted targets come
      // from the embedded relation itself via (skey, idx + lag)
      val libT = rel.select($"skey".as("lskey"), $"idx".as("li"), $"tgt".as("lt"))
      val actT = rel.select($"skey".as("askey"), $"idx".as("ai"), $"tgt".as("act"))
      val fanned = nn.crossJoin(lagDf)
      val summed = fanned
        .join(libT, fanned("skey") === libT("lskey") && fanned("l_idx") + fanned("lag") === libT("li"))
        .groupBy($"skey", $"lag", $"t_idx")
        .agg(sum($"w").as("sw"), sum($"w" * $"lt").as("swt"))
      val preds = summed
        .join(actT, summed("skey") === actT("askey") && summed("t_idx") + summed("lag") === actT("ai"))
        .withColumn("pred", when($"sw" === 0.0, 0.0).otherwise($"swt" / $"sw"))
      preds
        .groupBy($"skey", $"lag")
        .agg(
          covar_samp($"act", $"pred").as("cv"),
          stddev_samp($"act").as("s1"),
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
        .select($"skey", lit(dir).as("direction"), $"lag", (round($"rho", 6) + lit(0.0)).as("rho"))
    }

    val u = oneDir($"y", $"x", Ccm.DirXCausesY).unionByName(oneDir($"x", $"y", Ccm.DirYCausesX))
    val wD = Window.partitionBy("skey", "direction")
    u.withColumn("rho_max", max($"rho").over(wD))
      .withColumn("best_lag", min(when($"rho" === $"rho_max", $"lag")).over(wD))
      .drop("rho_max")
  }
}
