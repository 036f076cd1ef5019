package graft.ccm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** False-Nearest-Neighbor (FNN) embedding-dimension estimation.
  *
  * The reference MENTIONS this ("E estimation via False Nearest Neighbors",
  * `README.md:77`) but never implements it — E is a plain parameter
  * defaulting to 3 (`lib/ccm.ex:27`). Implemented here as a first-class
  * extension (SURVEY.md §2c.2), Kennel et al. 1992 criterion:
  *
  *  - embed at dimension E and find each point's nearest neighbor in the
  *    E-dimensional manifold (brute-force pair join + top-1 window — the
  *    same kNN machinery as cross-mapping);
  *  - the neighbor is FALSE if the extra coordinate revealed at dimension
  *    E+1 jumps relative to the E-dim distance:
  *    |x_{i+E*tau} − x_{j+E*tau}| / d_E(i,j) > rTol;
  *  - fnn_frac(E) = fraction of false neighbors; the suggested E is the
  *    first E whose fraction drops below `frac` (fallback: argmin).
  *
  * One embedding pass computes E_max+1 lead columns, and ONE pair join
  * serves every candidate E: d²(E) is a prefix sum of per-coordinate
  * squared diffs, so the E dimension is unpivoted (`stack`) from a single
  * joined row instead of re-probing the join maxE times. The nearest
  * neighbor per (series, E, idx) is then a hash-aggregation argmin —
  * `min(struct(dist, nn_idx, …))` — which partial-aggregates map-side:
  * the shuffle carries one candidate row per point, not the O(n²) pair
  * relation a window-sort formulation would move. Keyed on the series id,
  * so it distributes across series.
  */
object FnnDim {

  /** fnn_frac(E) per series for E = 1..maxE.
    * Output: (keys..., e: int, n_neighbors: long, n_false: long,
    * fnn_frac: double).
    */
  def fnnCurve(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[Column],
      value: Column,
      maxE: Int,
      tau: Int = 1,
      rTol: Double = 15.0
  ): DataFrame = {
    val k = keys.map(col)
    val w = Window.partitionBy(k: _*).orderBy(order: _*)
    // dims 0..maxE: embedding coordinates for E=maxE, plus the (E+1)-th
    // coordinate needed by the false-neighbor test of E=maxE
    val leadCols = (0 to maxE).map { j =>
      (if (j == 0) value else lead(value, j * tau).over(w)).as(s"e$j")
    }
    val emb = df
      .select(k ++ Seq((row_number().over(w) - 1).cast("long").as("idx")) ++ leadCols: _*)

    // ONE join at the widest row set (E=1 needs e1 on both sides; lead(j)
    // non-null implies lead(j-1) non-null, so higher-E validity is just
    // "the extra coordinate is non-null on both sides").
    val rows = emb.filter(col("e1").isNotNull)
    val joinCond = keys.map(kn => col(s"a.$kn") === col(s"b.$kn")).reduce(_ && _) &&
      col("a.idx") =!= col("b.idx")
    // d²(E) built as a prefix sum: 0.0 + d0 + d1 + … keeps the exact
    // left-associated IEEE order of the old per-E reduce (0.0 + x == x
    // bit-exactly; the squared diffs are never -0.0), so distances — and
    // the oracle parity — are unchanged.
    val diffs2 = (0 until maxE)
      .map(j => (col(s"a.e$j") - col(s"b.e$j")) * (col(s"a.e$j") - col(s"b.e$j")))
    val d2 = diffs2.scanLeft(lit(0.0): Column)(_ + _).drop(1) // index e-1 -> d²(E=e)
    val pairBase = rows
      .as("a")
      .join(rows.as("b"), joinCond)
      .select(
        (keys.map(kn => col(s"a.$kn").as(kn)) ++ Seq(
          col("a.idx").as("idx"),
          col("b.idx").as("nn_idx")
        ) ++ (1 to maxE).map(e => sqrt(d2(e - 1)).as(s"dist_$e"))
          ++ (1 to maxE).map(e => abs(col(s"a.e$e") - col(s"b.e$e")).as(s"gap_$e"))): _*
      )
    // unpivot the E dimension; a null extra_gap means dimension E+1 does
    // not exist for this pair -> the pair is not in E's candidate set
    val stackExpr =
      s"stack($maxE, ${(1 to maxE).map(e => s"$e, dist_$e, gap_$e").mkString(", ")}) AS (e, dist, extra_gap)"
    val long = pairBase
      .select((k ++ Seq(col("idx"), col("nn_idx"), expr(stackExpr))): _*)
      .filter(col("extra_gap").isNotNull)
    // argmin by (dist, nn_idx) — identical tie semantics to the previous
    // row_number() ORDER BY dist, nn_idx formulation
    val nn = long
      .groupBy((k ++ Seq(col("e"), col("idx"))): _*)
      .agg(min(struct(col("dist"), col("nn_idx"), col("extra_gap"))).as("m"))
      .select(
        (k :+ col("e") :+
          // zero-distance twins are never false; Kennel ratio otherwise
          when(col("m.dist") < 1e-12, lit(false))
            .otherwise(col("m.extra_gap") / col("m.dist") > rTol)
            .as("is_false")): _*
      )
    nn
      .groupBy((k :+ col("e")): _*)
      .agg(
        count(lit(1)).as("n_neighbors"),
        sum(when(col("is_false"), 1L).otherwise(0L)).as("n_false")
      )
      .withColumn("fnn_frac", col("n_false") / col("n_neighbors").cast("double"))
  }

  /** Suggested E per series: first E with fnn_frac < frac, else the argmin
    * (smallest E among ties). Output: (keys..., best_e: int).
    */
  def bestE(fnnDf: DataFrame, keys: Seq[String], frac: Double = 0.01): DataFrame = {
    val k = keys.map(col)
    fnnDf
      .groupBy(k: _*)
      .agg(
        coalesce(
          min(when(col("fnn_frac") < frac, col("e"))),
          min_by(col("e"), struct(col("fnn_frac"), col("e")))
        ).cast("int").as("best_e")
      )
  }
}
