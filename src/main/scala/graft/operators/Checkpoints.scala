package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Tracked checkpointing for iterative operators (connected components,
  * PageRank): Dataset.localCheckpoint has no public "unpersist", so we
  * recover the pinned RDD from the checkpointed Dataset itself and let the
  * caller free a superseded iteration's blocks explicitly — otherwise
  * checkpoint storage grows linearly with rounds.
  *
  * Three modes (VERDICT r6 item 6, ADVICE r7 item 1):
  *  - `tracked(df)` — `localCheckpoint`: executor-local blocks. Fast, but
  *    the blocks (and, because lineage is TRUNCATED, the ability to
  *    recompute them) die with an executor; acceptable for short jobs and
  *    for local[n].
  *  - `tracked(df, reliable = true)` — `Dataset.checkpoint` to the
  *    SparkContext checkpoint directory (HDFS/object store on a cluster) —
  *    survives executor loss, which a 50-round CC/PageRank on 1000
  *    executors MUST assume will happen. Requires
  *    `sparkContext.setCheckpointDir` (fails fast otherwise). Checkpoint
  *    FILES outlive the RDD — they live until the checkpoint dir is
  *    removed, or are GC'd by the ContextCleaner when
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true`.
  *  - `cached(df)` — `persist(MEMORY_AND_DISK)`: materialized blocks with
  *    lineage PRESERVED. This is the correct in-between mode for hybrid
  *    `reliableEvery = N > 1` loops: a `localCheckpoint` between reliable
  *    rounds truncates lineage to executor-local blocks, so losing an
  *    executor makes those rounds unrecoverable (no path back to the
  *    reliable checkpoint — the job FAILS, it does not recompute). A
  *    persisted round keeps its plan rooted at the last reliable
  *    checkpoint, so a lost block is recomputed from there — at most N
  *    rounds of recomputation, which is the guarantee hybrid mode
  *    advertises. The plan (and per-round Catalyst analysis cost) grows
  *    only until the next reliable round truncates it, so keep N small
  *    (3–5).
  */
object Checkpoints {

  /** Handle to the storage pinned for one iteration; `free()` releases the
    * superseded round's blocks (non-blocking).
    */
  sealed trait Pin { def free(): Unit }

  private final class RddPin(rdds: Seq[RDD[_]]) extends Pin {
    def free(): Unit = rdds.foreach(_.unpersist(blocking = false))
  }

  private final class CachePin(df: DataFrame) extends Pin {
    def free(): Unit = { df.unpersist(blocking = false); () }
  }

  /** Checkpoint `df` and return it with a pin on the exact RDD the
    * checkpoint persisted. An (eager) checkpoint materializes the plan into
    * an internal-row RDD and wraps it in a `LogicalRDD` leaf — that leaf's
    * RDD is precisely the persisted one, so we read it off the returned
    * plan instead of diffing `sc.getPersistentRDDs` (which would race with
    * concurrent caller-side persists and need a lock).
    */
  def tracked(df: DataFrame, reliable: Boolean = false): (DataFrame, Pin) = {
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
    (out, new RddPin(pinned))
  }

  /** Persist `df` (lineage preserved) — the fault-tolerant in-between step
    * for hybrid reliable loops; see the class doc. Lazy: the caller's next
    * action (convergence check) materializes it.
    */
  def cached(df: DataFrame): (DataFrame, Pin) = {
    val out = df.persist(StorageLevel.MEMORY_AND_DISK)
    (out, new CachePin(out))
  }

  /** Release a superseded iteration's blocks (no-op for the file-backed
    * part of reliable checkpoints — see the class doc for file lifetime).
    */
  def free(pin: Pin): Unit = pin.free()
}
