package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list by Pregel-style
  * min-label propagation — the dedup-clustering endgame (duplicate
  * components -> one canonical representative per doc).
  *
  * Each round is one distributed equi-join (labels flow along edges) plus a
  * partial-aggregating `min`; rounds needed = component diameter. Near-dup
  * graphs are shallow (dups of dups), so a handful of rounds suffices; for
  * adversarial diameters the documented refinement is large-star/small-star
  * contraction (Kiveris et al. 2014), which has the same per-round shuffle
  * shape but contracts paths in O(log n) rounds.
  *
  * Scale notes: the driver sees ONE boolean per round (`isEmpty` of changed
  * labels) — no data is collected; `localCheckpoint` per round caps lineage
  * (on a cluster: checkpoint to storage every few rounds). Non-convergence
  * at the round cap FAILS loudly — emitting partially-propagated labels
  * would be silently wrong clusters.
  */
object ConnectedComponents {

  /** Label every vertex of the (src, dst) edge list with the minimum vertex
    * id reachable from it. Vertices are whatever appears in the edge list;
    * isolated vertices (no edges) are the caller's concern.
    *
    * @param edges DataFrame with two LongType columns (src, dst), one row
    *              per undirected edge (either orientation)
    * @param reliableEvery 0 = local checkpoints only (single-JVM / short
    *              jobs); N > 0 = every Nth round checkpoints RELIABLY to
    *              the SparkContext checkpoint dir (Checkpoints.tracked
    *              reliable mode — the cluster setting, where a 25-round
    *              loop must survive executor loss), with lineage-preserving
    *              persists in between (NOT localCheckpoint, whose truncated
    *              lineage would make a lost executor's blocks unrecoverable
    *              — ADVICE r7) so recomputation after a failure is bounded
    *              by N rounds from the last reliable one.
    * @return (vertex: Long, component: Long)
    */
  def minLabelPropagation(
      edges: DataFrame,
      maxIter: Int = 25,
      reliableEvery: Int = 0
  ): DataFrame = {
    // superseded rounds' checkpoint blocks are freed explicitly (ADVICE r3)
    import Checkpoints.{tracked => checkpointTracked}
    // in hybrid mode (reliableEvery > 1), in-between rounds persist with
    // lineage intact so executor loss recomputes from the last reliable
    // checkpoint instead of failing (ADVICE r7)
    def roundPin(df: DataFrame, reliableRound: Boolean): (DataFrame, Checkpoints.Pin) =
      if (reliableEvery > 0) {
        if (reliableRound) checkpointTracked(df, reliable = true)
        else Checkpoints.cached(df)
      } else checkpointTracked(df)
    val e0 = edges.toDF("src", "dst")
    val (sym, symRdds) = roundPin(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))),
      reliableRound = true
    )
    var (labels, labelRdds) = roundPin(
      sym
        .select(col("src").as("vertex"))
        .distinct()
        .select(col("vertex"), col("vertex").as("component")),
      // derives from the reliably-checkpointed `sym`, so a persist suffices
      reliableRound = false
    )
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels, sym("dst") === labels("vertex"))
        .groupBy(sym("src").as("nid"))
        .agg(min(col("component")).as("nbr_min"))
      // the changed flag rides the checkpointed relation, so convergence is
      // a filter over cached blocks — not a second join re-executing labels
      val (nextFlagged, nextRdds) = roundPin(
        labels
          .join(nbrMin, labels("vertex") === nbrMin("nid"), "left")
          .select(
            labels("vertex"),
            least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"),
            (coalesce(col("nbr_min"), col("component")) < col("component")).as("changed")
          ),
        reliableRound = (iter + 1) % reliableEvery.max(1) == 0
      )
      converged = nextFlagged.filter(col("changed")).isEmpty
      Checkpoints.free(labelRdds)
      labels = nextFlagged.select("vertex", "component")
      labelRdds = nextRdds
      iter += 1
    }
    Checkpoints.free(symRdds)
    require(
      converged,
      s"minLabelPropagation did not converge within $maxIter rounds — the graph has a component " +
        "of diameter > maxIter; raise the cap or switch to large-star/small-star contraction"
    )
    labels
  }
}
