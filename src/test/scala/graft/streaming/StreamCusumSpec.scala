package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.ccm.DetHash
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Detection semantics of the self-starting streaming CUSUM
  * (Streams.streamingCusum): the DuckDB gate (stream_cusum) pins the
  * arithmetic; these pin the DIAGNOSTIC — a genuine mean shift must raise
  * the alarm, a steady series must not (in-control run length is the whole
  * point of the h=4 design), and scalar state must carry the detector
  * correctly ACROSS micro-batches.
  */
class StreamCusumSpec extends SparkTestBase {
  import Streams._

  // avalanche-hashed uniform noise around `level` (the SimplexSpec
  // double-hash lesson: a single rankHash stream is locally smooth)
  private def noisy(i: Int, level: Double, seed: Long): Double = {
    val h = DetHash.rankHash(DetHash.rankHash(i.toLong, 5L, 0L, seed), 2L, 1L, seed + 7)
    level + (h.toDouble / DetHash.P - 0.5) * 2.0
  }

  private def ev(uid: Long, i: Int, v: Double): Event =
    Event(new Timestamp(1700000000000L + i * 1000L), uid, "view", v)

  test("a mean shift alarms, a steady series does not, across micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = streamingCusum(input.toDS())
      .toDF()
      .writeStream
      .format("memory")
      .queryName("cusum_out")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // batch 1: the in-control stretch for both users
      input.addData((0 until 60).flatMap(i => Seq(ev(1L, i, noisy(i, 10.0, 31L)), ev(2L, i, noisy(i, 10.0, 31L)))))
      q.processAllAvailable()
      // batch 2: user 1 stays level; user 2 jumps ~3.5 sigma (uniform
      // +-1 noise has sd ~0.577) — the shift must be caught by state
      // carried over from batch 1
      input.addData((60 until 120).flatMap(i => Seq(ev(1L, i, noisy(i, 10.0, 31L)), ev(2L, i, noisy(i, 12.0, 31L)))))
      q.processAllAvailable()
      val last = spark
        .table("cusum_out")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
        .groupBy(_._1)
        .map { case (uid, rows) => uid -> rows.maxBy(_._2) } // latest update per user
      val (_, nS, maxPosS, maxNegS, alarmsS) = last(1L)
      val (_, nC, maxPosC, _, alarmsC) = last(2L)
      info(f"steady:  n=$nS max_s_pos=$maxPosS%.2f max_s_neg=$maxNegS%.2f alarms=$alarmsS")
      info(f"shifted: n=$nC max_s_pos=$maxPosC%.2f alarms=$alarmsC")
      assert(nS == 120 && nC == 120, "both series must fold all 120 points through state")
      assert(alarmsS == 0, s"in-control series must not alarm (max S+ $maxPosS, S- $maxNegS)")
      assert(alarmsC > 0, s"a 3.5-sigma mean shift must alarm (max S+ $maxPosC)")
      assert(maxPosC > maxPosS * 3, "the shifted series' positive CUSUM must dominate")
    } finally q.stop()
  }
}
