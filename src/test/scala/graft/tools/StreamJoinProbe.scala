package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Where does stream_stream_join's wall-clock actually go?
  *
  * The round-12 adjudication measured the query at 6.8-8.7 s on a host
  * whose canary sat ~2x its quiet floor, vs the 1.64 s quiet baseline —
  * with an 8-vs-32-thread INVERSION (2.9 s at 8 threads). This probe
  * attaches a StreamingQueryListener and prints each micro-batch's
  * engine-reported durationMs breakdown (triggerExecution, addBatch,
  * getBatch, walCommit, commitOffsets) plus the gap between summed batch
  * time and the end-to-end wall (query startup/teardown + driver-side
  * planning), so "state-store/scheduling overhead, not the data path"
  * is a measured statement instead of an inference.
  *
  * Usage: SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "Test/runMain graft.tools.StreamJoinProbe"
  */
object StreamJoinProbe {
  private def pull(json: String, key: String): String =
    s""""$key"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(json).map(_.group(1)).getOrElse("-")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val query = args.headOption.getOrElse("stream_stream_join")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val progress = collection.mutable.ArrayBuffer.empty[String]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        progress.synchronized { progress += e.progress.json }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    println(s"probe query=$query cpus=$cpus sf=$sfDir")
    for (i <- 1 to runs) {
      progress.synchronized(progress.clear())
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(query)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // listener events are async
      val snap = progress.synchronized(progress.toList)
      var sumTrigger = 0L
      snap.foreach { j =>
        val trig = pull(j, "triggerExecution")
        if (trig != "-") sumTrigger += trig.toLong
        println(
          s"  batch=${pull(j, "batchId")} triggerExecution=${trig}ms addBatch=${pull(j, "addBatch")}ms " +
            s"getBatch=${pull(j, "getBatch")}ms walCommit=${pull(j, "walCommit")}ms " +
            s"commitOffsets=${pull(j, "commitOffsets")}ms stateRows=${pull(j, "numRowsTotal")} " +
            s"stateCommitMs=${pull(j, "commitTimeMs")}"
        )
      }
      println(
        f"RUN $i wall=$wall%.2f s rows=$n batches=${snap.size} " +
          f"sum(triggerExecution)=${sumTrigger / 1000.0}%.2f s startup/teardown=${wall - sumTrigger / 1000.0}%.2f s"
      )
    }
    println("STREAM_JOIN_PROBE_DONE")
    spark.stop()
  }
}
