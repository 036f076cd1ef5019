package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank by power iteration — each round is ONE equi-join (ranks flow
  * along edges) plus a partial-aggregating sum, the same shuffle shape as
  * [[ConnectedComponents]]: shuffles are keyed on vertex ids (never on
  * anything lower-cardinality), the driver never sees data (only the fixed
  * iteration count), and superseded iterations' checkpoint blocks are freed
  * as the loop advances. Skewed hub vertices are exactly the AQE skew-join
  * case; at cluster scale enable AQE skew handling or pre-salt the hub ids.
  */
object PageRank {

  /** Ranks after a fixed number of power iterations.
    *
    * @param edges      directed (src, dst) edge list; callers with an
    *                   undirected graph pass both orientations. The vertex
    *                   set is src ∪ dst: zero-in-degree vertices keep their
    *                   teleport-only rank every round (the full vertex set
    *                   is left-joined back each iteration), and dangling
    *                   vertices (no out-edges) simply contribute nothing —
    *                   dangling-MASS redistribution is deliberately out of
    *                   scope (ranks then sum to < 1).
    * @return (vertex: Long, rank: Double), unnormalized beyond the
    *         teleport term (sums to ~1 over vertices when no vertex
    *         dangles)
    */
  /** Every `checkpointInterval`-th iteration is materialized (eager
    * localCheckpoint) and the previous checkpoint freed; intermediate
    * iterations stay lazy, so a 10-iteration run schedules ~3 jobs instead
    * of 10 — per-iteration job latency, not compute, dominates small
    * graphs, and bounded-depth lineage (a few joins) is cheap to carry.
    */
  private val CheckpointInterval = 3

  /** @param reliableCheckpoints true = the periodic checkpoints go to the
    *        SparkContext checkpoint dir (survive executor loss — the
    *        cluster setting for long iteration counts; requires
    *        `setCheckpointDir`); false = executor-local blocks.
    */
  def run(
      edges: DataFrame,
      iterations: Int = 10,
      damping: Double = 0.85,
      reliableCheckpoints: Boolean = false
  ): DataFrame = {
    val e0 = edges.toDF("src", "dst")
    // (src, dst, deg): out-degrees joined in ONCE, checkpointed — every
    // iteration reuses this relation on both sides of its join
    val deg = e0.groupBy("src").agg(count(lit(1)).as("deg"))
    val (e, eRdds) = Checkpoints.tracked(e0.join(deg, "src"), reliableCheckpoints)
    // the vertex set is src ∪ dst, checkpointed ONCE: every iteration
    // left-joins it back so zero-in-degree vertices (no contrib row from
    // the groupBy(dst)) keep their teleport rank instead of vanishing
    val (vertices, vRdds) = Checkpoints.tracked(
      e.select(col("src").as("vertex")).union(e.select(col("dst").as("vertex"))).distinct()
    )
    val n = vertices.count()
    val nD = n.toDouble
    var (ranks, rankRdds) = Checkpoints.tracked(
      vertices.select(col("vertex"), (lit(1.0) / lit(nD)).as("rank"))
    )
    for (i <- 1 to iterations) {
      val contribs = e
        .join(ranks, e("src") === ranks("vertex"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("contrib"))
      val next = vertices
        .join(contribs, vertices("vertex") === contribs("dst"), "left")
        .select(
          vertices("vertex"),
          (lit(1.0 - damping) / lit(nD) + lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank")
        )
      if (i % CheckpointInterval == 0 || i == iterations) {
        val (cp, cpRdds) = Checkpoints.tracked(next, reliableCheckpoints)
        Checkpoints.free(rankRdds)
        ranks = cp
        rankRdds = cpRdds
      } else ranks = next
    }
    Checkpoints.free(eRdds)
    Checkpoints.free(vRdds)
    ranks
  }

  /** PERSONALIZED PageRank: teleport mass goes to a seed set instead of
    * uniformly to every vertex — r_{t+1}(v) = (1−d)·s(v) + d·Σ contribs,
    * s(v) = 1/|seeds| on seeds, 0 elsewhere; r_0 = s. Same shuffle shape
    * as [[run]] (one equi-join + partial-agg sum per round, vertex-keyed
    * throughout); the seed indicator is joined in ONCE and carried on the
    * checkpointed vertex relation, so the per-iteration plan is identical
    * to the global variant's. Ranks concentrate around the seeds — the
    * "similar documents by graph proximity" primitive (seed-biased trust /
    * relevance propagation).
    *
    * @param seeds one column of vertex ids; must be a subset of the
    *              graph's vertices for the mass interpretation to hold
    */
  def runPersonalized(
      edges: DataFrame,
      seeds: DataFrame,
      iterations: Int = 10,
      damping: Double = 0.85,
      reliableCheckpoints: Boolean = false
  ): DataFrame = {
    val e0 = edges.toDF("src", "dst")
    val deg = e0.groupBy("src").agg(count(lit(1)).as("deg"))
    val (e, eRdds) = Checkpoints.tracked(e0.join(deg, "src"), reliableCheckpoints)
    val sd = seeds.toDF("vertex").distinct()
    val (vertices, vRdds) = Checkpoints.tracked(
      e.select(col("src").as("vertex"))
        .union(e.select(col("dst").as("vertex")))
        .distinct()
        .join(sd.select(col("vertex"), lit(1L).as("is_seed")), Seq("vertex"), "left")
        .select(col("vertex"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
    )
    val nSeeds = vertices.filter(col("is_seed") === 1L).count()
    val sD = nSeeds.toDouble
    val teleport = when(col("is_seed") === 1L, lit(1.0) / lit(sD)).otherwise(lit(0.0))
    var (ranks, rankRdds) = Checkpoints.tracked(
      vertices.select(col("vertex"), teleport.as("rank"))
    )
    for (i <- 1 to iterations) {
      val contribs = e
        .join(ranks, e("src") === ranks("vertex"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("contrib"))
      val next = vertices
        .join(contribs, vertices("vertex") === contribs("dst"), "left")
        .select(
          vertices("vertex"),
          (lit(1.0 - damping) * teleport + lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank")
        )
      if (i % CheckpointInterval == 0 || i == iterations) {
        val (cp, cpRdds) = Checkpoints.tracked(next, reliableCheckpoints)
        Checkpoints.free(rankRdds)
        ranks = cp
        rankRdds = cpRdds
      } else ranks = next
    }
    Checkpoints.free(eRdds)
    Checkpoints.free(vRdds)
    ranks
  }
}
