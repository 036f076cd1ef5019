package graft.contract

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Asserts the streaming gates' oracle cutoffs sit FAR from the engine's
  * exact fire-comparison boundaries at every gate SF (ADVICE r6): the
  * oracles state finalization as arithmetic on max(ts), while the engine
  * compares state timeouts / window ends against the watermark with its
  * own <=/< strictness — a ±1 unit disagreement is invisible while no
  * row sits within a unit of the boundary, and silently flips the gate
  * the day one does. These specs turn that unasserted data property into
  * a failing test, naming the offending SF/user.
  */
class GateBoundarySpec extends SparkTestBase {
  // every SF the driver or local iteration runs the gate at
  private val SfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("sessionize: no user's fire boundary is within 5ms of the watermark") {
    // constants mirror StreamQueries (GapMs / SessionDelayMs are private):
    val GapMs = 30000L
    val SessionDelayMs = 10000L
    val MarginMs = 5L
    for (dir <- SfDirs) {
      val e = Tables.events(spark, dir).select(col("user_id"), (col("ts") / 1000000L).cast("long").as("tms"))
      val maxMs = e.agg(max(col("tms"))).head().getLong(0)
      val watermark = maxMs - SessionDelayMs
      // a user fires iff last_end + GapMs (its timeout) < watermark; the
      // engine's comparison may differ by +1/strictness, so no user may
      // sit within MarginMs of it
      val offenders = e
        .groupBy(col("user_id"))
        .agg(max(col("tms")).as("last_end"))
        .withColumn("boundary_dist", abs(col("last_end") + lit(GapMs) - lit(watermark)))
        .filter(col("boundary_dist") <= MarginMs)
        .collect()
      assert(
        offenders.isEmpty,
        s"$dir: users within ${MarginMs}ms of the sessionize fire boundary: " +
          offenders.map(r => s"user ${r.get(0)} dist ${r.getAs[Long]("boundary_dist")}ms").mkString(", ")
      )
    }
  }

  test("window-stats sink: the watermark cutoff is >1s from any hour boundary") {
    val HourUs = 3600L * 1000 * 1000
    val SinkWatermarkUs = 30L * 1000 * 1000
    val MarginUs = 1000000L
    for (dir <- SfDirs) {
      val maxUs = Tables
        .events(spark, dir)
        .agg(max((col("ts") / 1000L).cast("long")))
        .head()
        .getLong(0)
      val cutoff = maxUs - SinkWatermarkUs
      val distToBoundary = math.min(cutoff % HourUs, HourUs - cutoff % HourUs)
      assert(
        distToBoundary > MarginUs,
        s"$dir: sink watermark cutoff $cutoff is ${distToBoundary}us from an hour " +
          "boundary — the engine's window-finalization strictness could flip a window"
      )
    }
  }
}
