package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star / small-star contraction
  * (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond") —
  * the adversarial-diameter alternative to [[ConnectedComponents]]' min-
  * label propagation. Label propagation needs diameter-many rounds (a
  * 10⁶-hop chain of near-duplicates would need 10⁶ shuffles); star
  * contraction halves path lengths every alternation, converging in
  * O(log n) rounds on ANY diameter, with every round the same two
  * hash-shuffles keyed on the vertex id (a groupBy-min and a join — no
  * broadcast, no driver data).
  *
  *  - large-star: per vertex u with neighbors Γ(u), m = min(Γ(u) ∪ u);
  *    every neighbor v > u re-attaches to m. Run over BOTH edge
  *    orientations.
  *  - small-star: on the resulting big→small directed edges, per vertex u
  *    with smaller-neighbors N, m = min(N ∪ u); every v ∈ N \ m and u
  *    itself re-attach to m.
  *
  * The fixpoint is a forest of depth-1 stars: every non-minimum vertex
  * points directly at its component's minimum id — the same labeling
  * [[ConnectedComponents.minLabelPropagation]] produces, so the two
  * operators are interchangeable (and `dedup_cluster_star` shares
  * `dedup_cluster`'s oracle verbatim).
  */
object StarContraction {

  /** (vertex, component-minimum) for every vertex in the edge list.
    *
    * @param edges   (src, dst) undirected edges, either orientation
    * @param maxIter round cap — O(log n) rounds suffice, so hitting a
    *                cap of 25 means ~2²⁵ vertices in one component;
    *                non-convergence FAILS loudly like minLabelPropagation
    * @param reliableEvery as in [[ConnectedComponents.minLabelPropagation]]
    * @param reliableCheckpoints true = EVERY round's checkpoint goes to
    *                the SparkContext checkpoint dir (the full-reliable
    *                mode Betweenness/Bfs/Hits carry, VERDICT r16 item 6 —
    *                `reliableEvery` is the cheaper hybrid that bounds
    *                recomputation instead; this flag wins when both set)
    */
  def connectedComponents(
      edges: DataFrame,
      maxIter: Int = 25,
      reliableEvery: Int = 0,
      reliableCheckpoints: Boolean = false
  ): DataFrame = {
    import Checkpoints.{tracked => checkpointTracked}
    // hybrid in-between rounds persist with lineage intact (ADVICE r7) —
    // same rationale as ConnectedComponents.roundPin
    def roundPin(df: DataFrame, reliableRound: Boolean): (DataFrame, Checkpoints.Pin) =
      if (reliableCheckpoints) checkpointTracked(df, reliable = true)
      else if (reliableEvery > 0) {
        if (reliableRound) checkpointTracked(df, reliable = true)
        else Checkpoints.cached(df)
      } else checkpointTracked(df)
    val eAll = edges.toDF("src", "dst")
    // self-loops carry no connectivity but DO introduce their vertex: keep
    // the vertex set from the unfiltered list so a self-loop-only vertex
    // labels itself, exactly as minLabelPropagation emits (v, v) for it
    // (ADVICE r7) — the interchangeability claim below holds for any input.
    val e0 = eAll.filter(col("src") =!= col("dst"))
    val (sym, symRdds) = roundPin(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
        .toDF("u", "v"),
      reliableRound = true
    )

    // large-star over both orientations: every strictly-larger neighbor of
    // u re-attaches to min(Γ(u) ∪ u). Output is directed big→small
    // (m <= u < v), deduplicated.
    def largeStar(bothOrients: DataFrame): DataFrame = {
      val mn = bothOrients.groupBy("u").agg(min(col("v")).as("mnv"))
      bothOrients
        .join(mn, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), least(col("u"), col("mnv")).as("v"))
        .distinct()
    }

    // small-star over big→small edges: u's smaller neighbors plus u
    // re-attach to their minimum. Stays big→small (mnv = min of N, so
    // every emitted (x, mnv) has x > mnv after the self-loop filter).
    def smallStar(bigToSmall: DataFrame): DataFrame = {
      val mn = bigToSmall.groupBy("u").agg(min(col("v")).as("mnv"))
      val reattached = bigToSmall
        .join(mn, "u")
        .filter(col("v") =!= col("mnv"))
        .select(col("v").as("u"), col("mnv").as("v"))
      reattached.union(mn.select(col("u"), col("mnv").as("v"))).distinct()
    }

    var (cur, curRdds) = roundPin(smallStar(largeStar(sym)), reliableRound = false)
    var converged = false
    var iter = 1 // the priming round above
    while (!converged && iter < maxIter) {
      val bothOrients = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
      val (next, nextRdds) = roundPin(
        smallStar(largeStar(bothOrients)),
        reliableRound = (iter + 1) % reliableEvery.max(1) == 0
      )
      // fixpoint test over the checkpointed relations: two anti-joins on
      // cached blocks, the driver sees only emptiness flags
      converged = next.exceptAll(cur).isEmpty && cur.exceptAll(next).isEmpty
      Checkpoints.free(curRdds)
      cur = next
      curRdds = nextRdds
      iter += 1
    }
    require(
      converged,
      s"star contraction did not converge within $maxIter rounds — at O(log n) rounds this " +
        "implies an absurd component size; investigate the edge relation"
    )
    // non-minimum vertices point at their component min; minima (never a
    // left side at the fixpoint) label themselves. `sym` and the final
    // round's relation feed this LAZY result, so their checkpoint blocks
    // are deliberately NOT freed here (the caller unpersists when done —
    // same contract as minLabelPropagation's returned labels); only
    // superseded rounds were freed in the loop.
    val _ = symRdds
    // vertex set from the UNFILTERED edge list (self-loop-only vertices
    // must appear in the output, labeling themselves)
    val vertices = eAll
      .select(col("src").as("vertex"))
      .union(eAll.select(col("dst").as("vertex")))
      .distinct()
    vertices
      .join(cur.select(col("u").as("vertex"), col("v").as("component")), Seq("vertex"), "left")
      .select(col("vertex"), coalesce(col("component"), col("vertex")).as("component"))
  }
}
