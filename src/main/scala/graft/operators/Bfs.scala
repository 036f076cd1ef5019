package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search over an undirected edge list: the
  * distance (hop count) from every vertex to its nearest seed, up to a
  * depth bound. The graph-exploration primitive next to
  * [[ConnectedComponents]] (membership) and [[PageRank]] (centrality) —
  * e.g. "how far is every document from a trusted/curated seed set" in a
  * quality-propagation pipeline.
  *
  * Frontier-based: each round joins ONLY the newly-reached vertices
  * against the edge list (work per round ∝ frontier × avg degree, not
  * graph size), one equi-join + partial-aggregating `min` per round —
  * the same shuffle shape as min-label propagation. In unweighted BFS a
  * vertex's first-reached depth IS its final distance, so there is no
  * relaxation loop: newly-reached vertices are exactly `candidates MINUS
  * already-reached` (a left-anti join).
  *
  * The driver sees one boolean per round (frontier emptiness); a
  * per-round checkpoint caps lineage — executor-local by default,
  * reliable (checkpoint-dir) under `reliableCheckpoints = true`,
  * exactly as [[ConnectedComponents]].
  */
object Bfs {

  /** @param edges (src, dst) LongType edge list, either orientation
    * @param seeds  single-column vertex ids (dist 0)
    * @param maxDepth stop after this many hops; vertices farther than the
    *                 bound (or unreachable) are absent from the output
    * @param edgesAlreadySymmetric the caller guarantees `edges` already
    *                 contains both orientations of every edge; skip the
    *                 internal reverse-union so frontier joins don't process
    *                 every edge row twice (candidates are distinct'ed, so
    *                 doubling is correct but pure wasted shuffle)
    * @param reliableCheckpoints true = per-round checkpoints go to the
    *                 SparkContext checkpoint directory instead of
    *                 executor-local blocks (the [[PageRank]] /
    *                 [[ConnectedComponents]] cluster mode; requires
    *                 `sparkContext.setCheckpointDir`)
    * @return (vertex: Long, dist: Int) for every vertex within maxDepth
    *         hops of a seed (seeds themselves at dist 0)
    */
  def distances(
      edges: DataFrame,
      seeds: DataFrame,
      maxDepth: Int,
      edgesAlreadySymmetric: Boolean = false,
      reliableCheckpoints: Boolean = false
  ): DataFrame = {
    import Checkpoints.{tracked => checkpointTracked}
    val e0 = edges.toDF("src", "dst")
    val (sym, symPin) = checkpointTracked(
      if (edgesAlreadySymmetric) e0
      else e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))),
      reliableCheckpoints
    )
    var (reached, reachedPin) = checkpointTracked(
      seeds.toDF("vertex").distinct().select(col("vertex"), lit(0).as("dist")),
      reliableCheckpoints
    )
    var frontier = reached
    // the current frontier's blocks must stay pinned until the NEXT round
    // has consumed them; None while the frontier aliases `reached`
    var frontierPin: Option[Checkpoints.Pin] = None
    var depth = 0
    var done = false
    while (!done && depth < maxDepth) {
      val candidates = sym
        .join(frontier, sym("src") === frontier("vertex"))
        .select(sym("dst").as("vertex"))
        .distinct()
      // eager checkpoint: materialized before anything upstream is freed
      val (newlyReached, newPin) = checkpointTracked(
        candidates
          .join(reached, Seq("vertex"), "left_anti")
          .select(col("vertex"), lit(depth + 1).as("dist")),
        reliableCheckpoints
      )
      done = newlyReached.isEmpty
      if (!done) {
        val (merged, mergedPin) = checkpointTracked(reached.union(newlyReached), reliableCheckpoints)
        Checkpoints.free(reachedPin)
        reached = merged
        reachedPin = mergedPin
        frontierPin.foreach(Checkpoints.free)
        frontier = newlyReached
        frontierPin = Some(newPin)
      } else {
        Checkpoints.free(newPin)
      }
      depth += 1
    }
    frontierPin.foreach(Checkpoints.free)
    Checkpoints.free(symPin)
    reached
  }
}
