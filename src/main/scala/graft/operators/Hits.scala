package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (Kleinberg hubs-and-authorities) by power iteration on a DIRECTED
  * edge list — the directed complement of [[PageRank]]: authority(v) sums
  * the hub scores of v's in-neighbors, hub(u) sums the authority scores of
  * u's out-neighbors, so the two sides rank different things (on a
  * supplier→customer graph: hub suppliers with broad reach vs authority
  * customers everyone serves). Each half-round is ONE vertex-keyed
  * equi-join plus a partial-aggregating sum — the same shuffle shape as
  * PageRank, no driver-side data beyond the per-round normalizer.
  *
  * Normalization is by the round MAX, not the L2/L1 norm: `max` is
  * summation-order independent (a double sum over millions of edges is
  * not), which keeps the scores reproducible across partitionings to
  * within per-vertex ulp noise — the property the 6-dp oracle rounding
  * relies on. Scores land in (0, 1] with the top vertex pinned at 1.0.
  */
object Hits {

  private val CheckpointInterval = 2

  /** Hub and authority scores after a fixed number of rounds.
    *
    * @param edges directed (src, dst) edge list, deduplicated by caller
    * @return (role: String "hub"|"authority", vertex: Long, score: Double)
    */
  def run(edges: DataFrame, iterations: Int = 6, reliableCheckpoints: Boolean = false): DataFrame = {
    val (e, eRdds) = Checkpoints.tracked(edges.toDF("src", "dst"), reliableCheckpoints)
    // the initial hubs relation forwards the flag too (ADVICE r16: it
    // rode a localCheckpoint even in reliable mode, so an executor loss
    // before the first interval checkpoint was unrecoverable)
    var (hubs, hubRdds) = Checkpoints.tracked(
      e.select(col("src").as("vertex")).distinct().withColumn("h", lit(1.0)),
      reliableCheckpoints
    )
    var auths: DataFrame = null
    var authRdds: Checkpoints.Pin = null
    for (i <- 1 to iterations) {
      val aRaw = e
        .join(hubs, e("src") === hubs("vertex"))
        .groupBy(e("dst").as("vertex"))
        .agg(sum(col("h")).as("a_raw"))
      val aNext = aRaw
        .crossJoin(broadcast(aRaw.agg(max(col("a_raw")).as("a_max"))))
        .select(col("vertex"), (col("a_raw") / col("a_max")).as("a"))
      // every round's auth relation feeds TWO consumers (its max and the
      // hub join) — materialize so the lineage doesn't fork exponentially.
      // Measured negative (round 9): swapping this eager localCheckpoint
      // for a lazy persist (Checkpoints.cached, pins freed at hub
      // checkpoints) went 3.95 → 5.5 s at sf0.1 — each round's broadcast
      // max-subquery races the cache population and recomputes the
      // aggregate subtree before it is cached; the eager form stays.
      val (aCp, aCpRdds) = Checkpoints.tracked(aNext, reliableCheckpoints)
      if (authRdds != null) Checkpoints.free(authRdds)
      auths = aCp
      authRdds = aCpRdds
      val hRaw = e
        .join(auths, e("dst") === auths("vertex"))
        .groupBy(e("src").as("vertex"))
        .agg(sum(col("a")).as("h_raw"))
      val hNext = hRaw
        .crossJoin(broadcast(hRaw.agg(max(col("h_raw")).as("h_max"))))
        .select(col("vertex"), (col("h_raw") / col("h_max")).as("h"))
      if (i % CheckpointInterval == 0 || i == iterations) {
        val (hCp, hCpRdds) = Checkpoints.tracked(hNext, reliableCheckpoints)
        Checkpoints.free(hubRdds)
        hubs = hCp
        hubRdds = hCpRdds
      } else hubs = hNext
    }
    val out = hubs
      .select(lit("hub").as("role"), col("vertex"), col("h").as("score"))
      .union(auths.select(lit("authority").as("role"), col("vertex"), col("a").as("score")))
    Checkpoints.free(eRdds)
    out
  }
}
