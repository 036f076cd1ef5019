package graft.contract

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** stream_stream_left_join's oracle states the null-row cutoff as
  * `p_ts < min(max_p, max_c) - delay` while the engine evicts left state
  * with its own </<= strictness against the final watermark — the two
  * agree only while no unmatched purchase sits near the cutoff. This
  * spec turns that data property into a failing test per gate SF
  * (the ADVICE r6 sessionize lesson, applied to the join gate).
  */
class StreamJoinBoundarySpec extends SparkTestBase {
  private val SfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
  private val LagUs = 1800L * 1000 * 1000
  private val MarginUs = 5L * 1000 * 1000 // 5 s, dwarfs any ±1 unit strictness

  test("no unmatched purchase sits within 5s of the left-join eviction cutoff") {
    for (dir <- SfDirs) {
      val e = Tables
        .events(spark, dir)
        .select(col("user_id"), expr("ts div 1000").as("t"), col("event_type"))
      val p = e.filter(col("event_type") === "purchase").select(col("user_id"), col("t").as("pt"))
      val c = e.filter(col("event_type") === "click").select(col("user_id").as("cu"), col("t").as("ct"))
      val maxP = p.agg(max("pt")).head().getLong(0)
      val maxC = c.agg(max("ct")).head().getLong(0)
      val cutoff = math.min(maxP, maxC) - StreamQueries.LeftJoinDelaySec * 1000000L
      val nearest = p
        .join(
          c,
          col("user_id") === col("cu") &&
            col("ct") <= col("pt") && col("ct") >= col("pt") - LagUs,
          "left_anti"
        )
        .select(abs(col("pt") - cutoff).as("d"))
        .agg(min("d"))
        .head()
        .getLong(0)
      assert(
        nearest >= MarginUs,
        s"$dir: an unmatched purchase sits ${nearest}us from the eviction cutoff — " +
          "the oracle's cutoff arithmetic and the engine's eviction strictness could disagree"
      )
    }
  }

  test("no purchase sits within 30s of the as-of join's eviction cutoff") {
    // stream_asof_join emits EVERY purchase below the watermark cutoff
    // via a timer, so every purchase (matched or not) must sit clear of
    // the cutoff for the oracle's ms-floor arithmetic and the engine's
    // timer strictness to be unobservable. The cutoff derives from the
    // FILTERED stream's max event time (purchase ∪ click — the watermark
    // node sits above the type filter), and delay 900 was CHOSEN by this
    // margin: 800 sits 3.4 s from a purchase at sf0.01.
    for (dir <- SfDirs) {
      val e = Tables
        .events(spark, dir)
        .filter(col("event_type").isin("purchase", "click"))
        .select(expr("ts div 1000").as("t"), col("event_type"))
      val maxT = e.agg(max("t")).head().getLong(0)
      val cutoff = (maxT / 1000L - StreamQueries.AsOfDelaySec * 1000L) * 1000L
      val nearest = e
        .filter(col("event_type") === "purchase")
        .select(abs(col("t") - cutoff).as("d"))
        .agg(min("d"))
        .head()
        .getLong(0)
      assert(
        nearest >= 30L * 1000 * 1000,
        s"$dir: a purchase sits ${nearest}us from the as-of eviction cutoff"
      )
    }
  }
}
