package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Batch-equivalence harness for the streaming layer (VERDICT r5 item 4).
  *
  * Runs a streaming DataFrame to completion with `Trigger.AvailableNow()`
  * into a named memory sink and returns the sink's contents as a batch
  * DataFrame. This drives the REAL micro-batch engine — state store,
  * watermark tracking, `flatMapGroupsWithState` timeouts — over the
  * driver's parquet tables, so the streaming operators get the same
  * DuckDB-oracle hash gate as every batch operator.
  *
  * Scale note: the memory sink collects results onto the driver, which is
  * correct ONLY for a correctness gate over small outputs (hundreds of
  * rows here). Production streams write to real sinks
  * (`writeStream.format("parquet"/"kafka")`); nothing in the operators
  * under test depends on this harness.
  */
object StreamHarness {
  private val ctr = new AtomicInteger(0)

  /** Run `sdf` to exhaustion (AvailableNow) and return the sink table.
    * `outputMode` must match the stream's semantics: "complete" for
    * aggregations, "append"/"update" as declared by the stateful operator.
    */
  def runAvailableNow(sdf: DataFrame, outputMode: String): DataFrame = {
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
    // best-effort checkpoint cleanup: the state is single-use by design
    try {
      import scala.jdk.CollectionConverters._
      Files.walk(ckpt).iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    sdf.sparkSession.table(name)
  }
}
