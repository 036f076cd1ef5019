package graft.streaming

import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Batch-equivalence harness for the streaming layer (VERDICT r5 item 4).
  *
  * Runs a streaming DataFrame to completion with `Trigger.AvailableNow()`
  * into a sink and returns the results as a batch DataFrame. This drives
  * the REAL micro-batch engine — state store, watermark tracking,
  * `flatMapGroupsWithState` timeouts — over the driver's parquet tables,
  * so the streaming operators get the same DuckDB-oracle hash gate as
  * every batch operator.
  *
  * Two sinks:
  *  - [[runAvailableNow]]: named memory sink. The collect-to-driver is
  *    correct ONLY for a correctness gate over small outputs (hundreds of
  *    rows here).
  *  - [[runAvailableNowToParquet]]: a REAL `FileStreamSink` (VERDICT r6
  *    item 3) — the production path for 100 TB streams. The directory is
  *    read back through the sink's `_spark_metadata` commit log, so the
  *    gate also covers the sink commit protocol and its exactly-once
  *    file listing (files written but not committed are invisible to the
  *    read-back, exactly as for a downstream consumer).
  */
object StreamHarness {
  private val ctr = new AtomicInteger(0)

  /** State partitions for the gate streams, sized to STATE VOLUME — the
    * repo's shuffle-sizing doctrine applied to streaming state. A
    * stateful operator opens (and commits) one state store per shuffle
    * partition per store-kind per micro-batch; a symmetric stream-stream
    * join keeps FOUR stores per partition, so at the session's 32 batch
    * partitions every micro-batch pays 128 store open/commit cycles for
    * gate state of only ~40k rows (~1.2k rows per partition). Measured
    * with graft.tools.StreamJoinProbe: the watermark-eviction batch of
    * stream_stream_join carried 12 state rows yet summed 75 s of
    * cumulative stateCommitMs across instances — pure per-store fixed
    * cost. At 8 partitions (~5k state rows each) the same query runs
    * 2.4x faster wall-clock. At 100 TB this knob goes UP with state
    * volume (it is per-query via SPARK_GRAFT_STREAM_PARTS), but the
    * principle is the same: partitions follow state size, never a
    * batch-compute default.
    */
  private val StreamStateParts: String =
    sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8")

  /** Run `body` with shuffle partitions sized for streaming state,
    * restoring the session's batch setting after (the streamAsOfJoin
    * provider-swap pattern). The partition count is captured by the
    * query PLAN at start(), so the override need only span the run.
    */
  private def withStreamParts[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, StreamStateParts)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Run `sdf` to exhaustion (AvailableNow) and return the sink's rows
    * MATERIALIZED (the temp view is dropped before returning — the bench
    * re-runs each query several times per invocation and the views would
    * otherwise accumulate in the catalog, ADVICE r6). `outputMode` must
    * match the stream's semantics: "complete" for aggregations,
    * "append"/"update" as declared by the stateful operator.
    */
  def runAvailableNow(sdf: DataFrame, outputMode: String): DataFrame = {
    val spark = sdf.sparkSession
    val name = s"graft_stream_gate_${ctr.incrementAndGet()}"
    val ckpt = Files.createTempDirectory("graft-stream-ckpt")
    withStreamParts(spark) {
      val q = sdf.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    deleteRecursively(ckpt)
    graft.GateResult.materialize(spark.table(name)) {
      spark.catalog.dropTempView(name)
    }
  }

  /** Run `sdf` to exhaustion (AvailableNow) into a parquet FileStreamSink
    * in a temp directory, read the directory back through the sink's
    * `_spark_metadata` log, and return the MATERIALIZED result (the temp
    * dirs are deleted before returning, so the result must not stay
    * lazy). FileStreamSink only supports append mode — aggregations must
    * carry a watermark and only watermark-finalized groups reach the
    * files, which the oracle must encode.
    */
  def runAvailableNowToParquet(sdf: DataFrame): DataFrame = {
    val spark = sdf.sparkSession
    val ckpt = Files.createTempDirectory("graft-stream-ckpt")
    val outDir = Files.createTempDirectory("graft-stream-sink")
    withStreamParts(spark) {
      val q = sdf.writeStream
        .format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch read THROUGH the commit log: FileStreamSink directories are
    // listed via _spark_metadata, not via the filesystem, so uncommitted
    // files can never leak into the result
    val committed = spark.read.schema(sdf.schema).parquet(outDir.toString).collect()
    deleteRecursively(ckpt)
    deleteRecursively(outDir)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(committed.toSeq.asJava, sdf.schema)
  }

  /** Best-effort temp-dir cleanup: the state is single-use by design. */
  private def deleteRecursively(dir: Path): Unit = graft.GateResult.deleteRecursively(dir)
}
