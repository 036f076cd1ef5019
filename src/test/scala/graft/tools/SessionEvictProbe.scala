package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Measures the WATERMARK-TIGHTENED STATE EVICTION lever for streaming
  * sessionization (VERDICT r14 item 6) — the one streaming-scale lever
  * SCALE.md named (r13/r14 sessionize adjudications) but never measured.
  *
  * The round gates replay the whole table as ONE data batch (watermark 0,
  * everything buffers) + one watermark-advance batch, so eviction never
  * acts DURING the run. This probe replays the same events as B
  * time-ordered micro-batches through a MemoryStream, so the watermark
  * rises between batches, and compares two configs over the identical
  * batch sequence:
  *
  *  - TIGHT  — the gates' 10 s delay: sessions finalize as soon as the
  *    watermark passes their end + gap, so state holds only sessions
  *    still inside the watermark horizon;
  *  - LOOSE  — a 3650 d delay (watermark pinned below every event):
  *    nothing ever evicts, state accumulates every open session, and the
  *    built-in session_window operator re-reads that whole store every
  *    micro-batch.
  *
  * Both configs process byte-identical input through byte-identical
  * plans; only the eviction horizon differs, so the wall-clock ratio IS
  * the lever. Run on the sf1 replica:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_bench_sf1 sbt "Test/runMain graft.tools.SessionEvictProbe 16"
  */
object SessionEvictProbe {
  final case class Ev(ts: java.sql.Timestamp, userId: Long)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = args.headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("session-evict-probe")
      .config("spark.sql.shuffle.partitions", 8) // state-sized (StreamHarness doctrine)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the gates' event shape, time-ordered and split into nBatches slabs —
    // each addData advances max event time, so the watermark climbs
    val rows = graft.contract.Tables
      .events(spark, dir)
      .select(timestamp_micros(expr("ts div 1000")).as("ts"), col("user_id").as("userId"))
      .as[Ev]
      .collect()
      .sortBy(_.ts.getTime)
    val slab = math.max(1, (rows.length + nBatches - 1) / nBatches)
    val batches = rows.grouped(slab).toSeq
    println(s"VOL events=${rows.length} batches=${batches.size} dir=$dir")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def run(label: String, delay: String, data: Seq[Array[Ev]], timed: Boolean): Unit = {
      val ms = MemoryStream[Ev]
      val sessions = ms
        .toDS()
        .withWatermark("ts", delay)
        .groupBy(col("userId"), session_window(col("ts"), "30 seconds"))
        .agg(count(lit(1)).as("n_events"))
      val q = sessions.writeStream
        .format("noop")
        .outputMode("append")
        .option("checkpointLocation", java.nio.file.Files.createTempDirectory(s"evict-$label").toString)
        .start()
      val t0 = System.nanoTime()
      val perBatch = data.map { b =>
        val tb = System.nanoTime()
        ms.addData(b.toSeq)
        q.processAllAvailable()
        (System.nanoTime() - tb) / 1e9
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val stateRows = Option(q.lastProgress)
        .flatMap(p => p.stateOperators.headOption)
        .map(_.numRowsTotal)
        .getOrElse(-1L)
      q.stop()
      if (timed)
        println(
          f"PHASE builtin/$label delay=$delay total=$sec%.1f s state_rows_final=$stateRows " +
            s"per_batch=[${perBatch.map(t => f"$t%.2f").mkString(",")}]"
        )
    }

    // untimed JIT/codegen warmup on a small prefix, then two measured
    // passes per config in alternating order (the first heavy streaming
    // job otherwise pays ~20 s one-time compilation attributed to
    // whichever config runs first)
    val warm = batches.take(2).map(_.take(2000))
    run("warmup", "10 seconds", warm, timed = false)
    run("warmup", "3650 days", warm, timed = false)
    run("tight", "10 seconds", batches, timed = true)
    run("loose", "3650 days", batches, timed = true)
    run("tight", "10 seconds", batches, timed = true)
    run("loose", "3650 days", batches, timed = true)
    spark.stop()
  }
}
