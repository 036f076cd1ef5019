package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Tracked `localCheckpoint` for iterative operators (connected components,
  * PageRank): Dataset.localCheckpoint has no public "unpersist", so we
  * recover the pinned RDD from the checkpointed Dataset itself and let the
  * caller free a superseded iteration's blocks explicitly — otherwise
  * checkpoint storage grows linearly with rounds. On a cluster the same
  * pattern applies with reliable checkpoints to storage every few rounds.
  */
object Checkpoints {
  /** Checkpoint `df` and return it with the exact RDD the checkpoint pinned.
    * An (eager) localCheckpoint materializes the plan into an internal-row
    * RDD and wraps it in a `LogicalRDD` leaf — that leaf's RDD is precisely
    * the persisted one, so we read it off the returned plan instead of
    * diffing `sc.getPersistentRDDs` (which would race with concurrent
    * caller-side persists and need a lock).
    */
  def tracked(df: DataFrame): (DataFrame, Seq[RDD[_]]) = {
    val out = df.localCheckpoint()
    val pinned = out.queryExecution.logical.collect { case lr: LogicalRDD => lr.rdd }
    require(
      pinned.nonEmpty,
      "Checkpoints.tracked: checkpointed plan has no LogicalRDD leaf — " +
        "Spark changed localCheckpoint's plan shape; update the extractor"
    )
    (out, pinned)
  }

  def free(rdds: Seq[RDD[_]]): Unit = rdds.foreach(_.unpersist(blocking = false))
}
