package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Tracked `localCheckpoint` for iterative operators (connected components,
  * PageRank): Dataset.localCheckpoint has no public "unpersist", so we
  * capture the RDD ids each checkpoint pins (queries run sequentially, so
  * the id delta is ours) and let the caller free a superseded iteration's
  * blocks explicitly — otherwise checkpoint storage grows linearly with
  * rounds. On a cluster the same pattern applies with reliable checkpoints
  * to storage every few rounds.
  */
object Checkpoints {
  def tracked(df: DataFrame): (DataFrame, Seq[RDD[_]]) = synchronized {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint()
    val delta = (sc.getPersistentRDDs -- before).values.toSeq
    // one localCheckpoint pins exactly one RDD; a bigger delta means some
    // OTHER thread persisted concurrently and free() would unpersist its
    // blocks — fail loudly instead of silently corrupting foreign state
    // (the synchronized above serializes tracked() against itself, but not
    // against arbitrary caller-side persists)
    require(
      delta.size == 1,
      s"Checkpoints.tracked expected exactly 1 newly-pinned RDD, saw ${delta.size} " +
        s"(ids ${delta.map(_.id).sorted.mkString(",")}) — concurrent persist detected"
    )
    (out, delta)
  }

  def free(rdds: Seq[RDD[_]]): Unit = rdds.foreach(_.unpersist(blocking = false))
}
