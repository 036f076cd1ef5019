package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Tracked checkpointing for iterative operators (connected components,
  * PageRank): Dataset.localCheckpoint has no public "unpersist", so we
  * recover the pinned RDD from the checkpointed Dataset itself and let the
  * caller free a superseded iteration's blocks explicitly — otherwise
  * checkpoint storage grows linearly with rounds.
  *
  * Two modes (VERDICT r6 item 6):
  *  - `reliable = false`: `localCheckpoint` — executor-local blocks. Fast,
  *    but the blocks (and, because lineage is TRUNCATED, the ability to
  *    recompute them) die with an executor; acceptable for short jobs and
  *    for local[n].
  *  - `reliable = true`: `Dataset.checkpoint` to the SparkContext
  *    checkpoint directory (HDFS/object store on a cluster) — survives
  *    executor loss, which a 50-round CC/PageRank on 1000 executors MUST
  *    assume will happen. Requires `sparkContext.setCheckpointDir` (fails
  *    fast otherwise). Checkpoint FILES outlive the RDD — they live until
  *    the checkpoint dir is removed, or are GC'd by the ContextCleaner
  *    when `spark.cleaner.referenceTracking.cleanCheckpoints=true`.
  */
object Checkpoints {
  /** Checkpoint `df` and return it with the exact RDD the checkpoint pinned.
    * An (eager) checkpoint materializes the plan into an internal-row
    * RDD and wraps it in a `LogicalRDD` leaf — that leaf's RDD is precisely
    * the persisted one, so we read it off the returned plan instead of
    * diffing `sc.getPersistentRDDs` (which would race with concurrent
    * caller-side persists and need a lock).
    */
  def tracked(df: DataFrame, reliable: Boolean = false): (DataFrame, Seq[RDD[_]]) = {
    val out =
      if (reliable) {
        require(
          df.sparkSession.sparkContext.getCheckpointDir.isDefined,
          "Checkpoints.tracked(reliable = true) requires " +
            "sparkContext.setCheckpointDir(<fault-tolerant storage path>)"
        )
        df.checkpoint()
      } else df.localCheckpoint()
    val pinned = out.queryExecution.logical.collect { case lr: LogicalRDD => lr.rdd }
    require(
      pinned.nonEmpty,
      "Checkpoints.tracked: checkpointed plan has no LogicalRDD leaf — " +
        "Spark changed checkpoint's plan shape; update the extractor"
    )
    (out, pinned)
  }

  /** Unpersist superseded iterations' blocks (no-op for the file-backed
    * part of reliable checkpoints — see the class doc for file lifetime).
    */
  def free(rdds: Seq[RDD[_]]): Unit = rdds.foreach(_.unpersist(blocking = false))
}
