package graft.contract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ccm.FftSurrogate

/** Event-stream relational operators (SURVEY §2b depth): gap-based
  * sessionization, rollup aggregation, and an as-of join.
  *
  * Time axis: Spark surfaces the parquet NANOS timestamps as BIGINT nanos
  * (see [[Tables]]) while DuckDB's `epoch_*` functions truncate to
  * microseconds — both sides therefore work in microseconds (`ts div 1000`
  * vs `epoch_us(ts)`), meeting at the same integers.
  */
object EventQueries {
  private val SessionGapUs: Long = 86400L * 1000 * 1000 // 1 day (microseconds)

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      // microsecond time axis: Spark surfaces parquet NANOS as BIGINT nanos,
      // DuckDB's epoch_* functions truncate to microseconds -- `div 1000`
      // here and `epoch_us(ts)` in the oracle meet at the same integers.
      .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"), col("event_type"), col("value"))

  // -------------------------------------------------------------------
  // evt_sessionize — gap-based sessionization: a new session starts when
  // the gap to the previous event exceeds the threshold; session id is a
  // running sum of the boundary flags (one window pass per series).
  // -------------------------------------------------------------------
  private def sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus")
    val wRun = Window.partitionBy("user_id").orderBy("tus").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, dir)
      .withColumn(
        "new_session",
        when(col("tus") - lag(col("tus"), 1).over(w) > SessionGapUs || lag(col("tus"), 1).over(w).isNull, 1L)
          .otherwise(0L)
      )
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("tus")).as("start_us"),
        max(col("tus")).as("end_us")
      )
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .transform(Norm.ordered(_, col("user_id"), col("session_id")))
  }

  private val sessionizeSql: String =
    s"""WITH t AS (
       |  SELECT user_id, epoch_us(ts) AS tsn FROM events
       |), flags AS (
       |  SELECT user_id, tsn,
       |         CASE WHEN tsn - lag(tsn, 1) OVER w > $SessionGapUs
       |                OR lag(tsn, 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
       |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY tsn)
       |), sess AS (
       |  SELECT user_id, tsn,
       |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY tsn
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM flags
       |)
       |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
       |       min(tsn) AS start_us, max(tsn) AS end_us,
       |       max(tsn) - min(tsn) AS duration_us
       |FROM sess GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  // -------------------------------------------------------------------
  // evt_rollup — ROLLUP (event_type, user bucket): per-cell counts + sums
  // with grouping flags, the grouping-sets surface of the engine.
  // -------------------------------------------------------------------
  private def rollup(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("user_bucket", (col("user_id") % 10).cast("long"))
      .rollup("event_type", "user_bucket")
      .agg(
        count(lit(1)).as("n_events"),
        Norm.rnd(sum(col("value")), 4).as("sum_value"),
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("user_bucket")).cast("long").as("g_bucket")
      )
      .transform(Norm.ordered(_, col("g_type"), col("g_bucket"), col("event_type"), col("user_bucket")))

  private val rollupSql: String =
    """SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  round(sum(value), 4) + 0.0 AS sum_value,
      |  CAST(GROUPING(event_type) AS BIGINT) AS g_type,
      |  CAST(GROUPING(user_id % 10) AS BIGINT) AS g_bucket
      |FROM events
      |GROUP BY ROLLUP(event_type, user_id % 10)
      |ORDER BY g_type, g_bucket, event_type, user_bucket""".stripMargin

  // -------------------------------------------------------------------
  // evt_cube — CUBE (event_type, value bucket): all four grouping sets in
  // one pass (rollup covers the hierarchical sets; cube adds the
  // bucket-only marginals). Spark expands to a single expand+hash-agg.
  // -------------------------------------------------------------------
  private def cubeAgg(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("val_bucket", floor(col("value")).cast("long"))
      .cube("event_type", "val_bucket")
      // sum, not avg: this data's ~5-decimal values make avg-of-few-rows
      // land exactly on round() boundaries where cross-engine summation
      // order flips the last digit (observed at floor(value)=68: avg
      // .61625); the sums stay off-boundary like evt_rollup's
      .agg(
        count(lit(1)).as("n_events"),
        Norm.rnd(sum(col("value")), 4).as("sum_value"),
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("val_bucket")).cast("long").as("g_bucket")
      )
      .transform(Norm.ordered(_, col("g_type"), col("g_bucket"), col("event_type"), col("val_bucket")))

  private val cubeAggSql: String =
    """SELECT event_type, CAST(floor(value) AS BIGINT) AS val_bucket,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  round(sum(value), 4) + 0.0 AS sum_value,
      |  CAST(GROUPING(event_type) AS BIGINT) AS g_type,
      |  CAST(GROUPING(CAST(floor(value) AS BIGINT)) AS BIGINT) AS g_bucket
      |FROM events
      |GROUP BY CUBE(event_type, CAST(floor(value) AS BIGINT))
      |ORDER BY g_type, g_bucket, event_type, val_bucket""".stripMargin

  // -------------------------------------------------------------------
  // evt_grouping_sets — EXPLICIT grouping sets, the non-hierarchical
  // case neither ROLLUP nor CUBE expresses: (type × weekday), (type),
  // (weekday) — two independent marginals plus the cross, NO grand
  // total. Spark 4's Dataset.groupingSets expands them into one
  // Expand + hash aggregation pass (same single-scan shape as
  // rollup/cube). Weekday is pure integer epoch-day arithmetic — never
  // an engine calendar function (Spark's dayofweek is 1-7 Sunday-first,
  // DuckDB's is 0-6; integer math can't disagree).
  // -------------------------------------------------------------------
  private val GsDayUs = 86400L * 1000 * 1000

  private def groupingSetsAgg(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      // epoch day 0 = Thursday; +4 makes 0 = Sunday, like ISO-ish buckets.
      // integer `div`, not `/`: double division of a ~2^50 micros count
      // rounds at the boundary where floor-by-cast then disagrees with
      // the oracle's exact `//`
      .withColumn("dow", (expr(s"tus div ${GsDayUs}L") + 4) % 7)
      .groupingSets(
        Seq(Seq(col("event_type"), col("dow")), Seq(col("event_type")), Seq(col("dow"))),
        col("event_type"),
        col("dow")
      )
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100.0).cast("long")).as("sum_cents"),
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("dow")).cast("long").as("g_dow")
      )
      .transform(Norm.ordered(_, col("g_type"), col("g_dow"), col("event_type"), col("dow")))

  private val groupingSetsSql: String =
    s"""SELECT event_type,
       |  (epoch_us(ts) // $GsDayUs + 4) % 7 AS dow,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents,
       |  CAST(GROUPING(event_type) AS BIGINT) AS g_type,
       |  CAST(GROUPING((epoch_us(ts) // $GsDayUs + 4) % 7) AS BIGINT) AS g_dow
       |FROM events
       |GROUP BY GROUPING SETS ((event_type, (epoch_us(ts) // $GsDayUs + 4) % 7),
       |                        (event_type),
       |                        ((epoch_us(ts) // $GsDayUs + 4) % 7))
       |ORDER BY g_type, g_dow, event_type, dow""".stripMargin

  // -------------------------------------------------------------------
  // evt_range_frame — a time-RANGE window frame (trailing 1 hour per
  // user), the frame kind ROWS cannot express when event spacing is
  // irregular: the frame holds however many events fall in the hour,
  // peers included. One shuffle on the series key like every other
  // window query; the frame sum is exact integer cents so cross-engine
  // float summation order cannot flip a digit.
  // -------------------------------------------------------------------
  private val RfHourUs = 3600L * 1000 * 1000

  private def rangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy("tus")
      .rangeBetween(-RfHourUs, Window.currentRow)
    ev(s, dir)
      // pre-project cents, then both frame aggregates in ONE select:
      // an interposed projection between chained withColumns would block
      // CollapseWindow and plan two Window passes over the same frame
      // (NewQueryPlanSpec pins the single pass)
      .withColumn("cents", round(col("value") * 100.0).cast("long"))
      .select(
        col("event_id"),
        col("user_id"),
        col("tus"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("cents")).over(w).as("cents_1h")
      )
      .select(
        col("event_id"),
        col("user_id"),
        col("tus"),
        col("n_1h"),
        Norm.rnd(col("cents_1h") / 100.0 / col("n_1h"), 4).as("avg_1h")
      )
      .transform(Norm.ordered(_, col("event_id")))
  }

  private val rangeFrameSql: String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS tus,
       |         CAST(round(value * 100.0) AS BIGINT) AS cents
       |  FROM events
       |)
       |SELECT event_id, user_id, tus,
       |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
       |  round(CAST(sum(cents) OVER w AS BIGINT) / 100.0
       |        / CAST(count(*) OVER w AS BIGINT), 4) + 0.0 AS avg_1h
       |FROM e
       |WINDOW w AS (PARTITION BY user_id ORDER BY tus
       |             RANGE BETWEEN $RfHourUs PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin

  // -------------------------------------------------------------------
  // evt_asof_purchase — as-of join: for every event, the most recent
  // STRICTLY PRIOR 'purchase' event of the same user. Spark side: a single
  // ordered window with `last(..., ignoreNulls)` over an unbounded-to-(-1)
  // frame — the scalable as-of pattern (one shuffle on the series key, no
  // join at all). Oracle: DuckDB's NATIVE `ASOF LEFT JOIN`, so two
  // independent as-of implementations must agree row-for-row.
  // -------------------------------------------------------------------
  private def asofPurchase(s: SparkSession, dir: String): DataFrame = {
    // RANGE (value-based) frame, not ROWS: with a timestamp tie, a ROWS
    // frame could nondeterministically include the same-instant purchase,
    // while DuckDB's ASOF condition (e.tsn > p.tsn) is strictly-prior by
    // value — RANGE ending at -1 matches it exactly.
    val frame = Window
      .partitionBy("user_id")
      .orderBy("tus")
      .rangeBetween(Window.unboundedPreceding, -1)
    // max(struct(tus, event_id)) — not last() — over the frame: when two
    // purchases share one microsecond, last() picks an unspecified peer
    // row, while the struct max is a deterministic argmax (latest tus,
    // then greatest event_id); the oracle dedups to the same argmax.
    ev(s, dir)
      .withColumn(
        "last_purchase",
        max(when(col("event_type") === "purchase", struct(col("tus"), col("event_id")))).over(frame)
      )
      .select(
        col("event_id"),
        col("user_id"),
        col("last_purchase.event_id").as("last_purchase_id"),
        (col("tus") - col("last_purchase.tus")).as("us_since_purchase")
      )
      .transform(Norm.ordered(_, col("event_id")))
  }

  private val asofPurchaseSql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsn FROM events),
      |-- dedup same-instant purchases to max(event_id) BEFORE the ASOF join:
      |-- ASOF's pick among equal-tsn rows is arbitrary; this makes it unique
      |p AS (SELECT user_id, epoch_us(ts) AS tsn, max(event_id) AS event_id
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, p.event_id AS last_purchase_id,
      |       e.tsn - p.tsn AS us_since_purchase
      |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.tsn > p.tsn
      |ORDER BY e.event_id""".stripMargin

  // -------------------------------------------------------------------
  // evt_asof_native — the SAME backward strict as-of as evt_asof_purchase
  // through the engine's CUSTOM CATALYST OPERATOR
  // ([[graft.plans.AsOfJoinPlan]] → AsOfJoinStrategy → AsOfJoinExec): a
  // co-partitioned partition-local merge with O(1) state instead of the
  // window form's union-shuffle running argmax. THREE independent as-of
  // implementations now meet at one oracle hash — the window form, this
  // merge operator, and DuckDB's native ASOF JOIN — which is the
  // strongest correctness statement the gate can make about a custom
  // physical operator. Tie semantics fall out of the merge's required
  // right ordering (time asc, event_id asc + overwrite ≡ the struct
  // argmax); no pre-dedup relation is needed.
  // -------------------------------------------------------------------
  private def asofNative(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("event_id"), col("user_id"), col("tus"))
    val p = ev(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("tus").as("p_tus"), col("event_id").as("p_event_id"))
    graft.plans.AsOf
      .backwardStrict(e, p, "user_id", "tus", "p_user", "p_tus", "p_event_id")
      .select(
        col("event_id"),
        col("user_id"),
        col("p_event_id").as("last_purchase_id"),
        (col("tus") - col("p_tus")).as("us_since_purchase")
      )
      .transform(Norm.ordered(_, col("event_id")))
  }

  // -------------------------------------------------------------------
  // evt_asof_next — the FORWARD as-of join: for every event, the
  // earliest STRICTLY LATER 'purchase' of the same user ("time to next
  // conversion" — the attribution counterpart of evt_asof_purchase's
  // lookback). Same scalable shape: one ordered window per series, no
  // join — min(struct(tus, event_id)) over a RANGE (1, +inf) frame is a
  // deterministic argmin (earliest tus, then smallest event_id) even on
  // same-instant ties. DuckDB's native ASOF is backward-only, so the
  // oracle is an INDEPENDENT join-aggregate formulation (min later
  // purchase time per event, then the purchase at that instant).
  // -------------------------------------------------------------------
  private def asofNext(s: SparkSession, dir: String): DataFrame = {
    val frame = Window
      .partitionBy("user_id")
      .orderBy("tus")
      .rangeBetween(1, Window.unboundedFollowing)
    ev(s, dir)
      .withColumn(
        "next_purchase",
        min(when(col("event_type") === "purchase", struct(col("tus"), col("event_id")))).over(frame)
      )
      .select(
        col("event_id"),
        col("user_id"),
        col("next_purchase.event_id").as("next_purchase_id"),
        (col("next_purchase.tus") - col("tus")).as("us_until_purchase")
      )
      .transform(Norm.ordered(_, col("event_id")))
  }

  private val asofNextSql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsn FROM events),
      |-- dedup same-instant purchases to MIN event_id (the window argmin's
      |-- tie rule) before the aggregate
      |p AS (SELECT user_id, epoch_us(ts) AS tsn, min(event_id) AS event_id
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |nxt AS (
      |  SELECT e.event_id, min(p.tsn) AS ntsn
      |  FROM e JOIN p ON e.user_id = p.user_id AND p.tsn > e.tsn
      |  GROUP BY e.event_id
      |)
      |SELECT e.event_id, e.user_id, p.event_id AS next_purchase_id,
      |       n.ntsn - e.tsn AS us_until_purchase
      |FROM e
      |LEFT JOIN nxt n ON e.event_id = n.event_id
      |LEFT JOIN p ON p.user_id = e.user_id AND p.tsn = n.ntsn
      |ORDER BY e.event_id""".stripMargin

  // -------------------------------------------------------------------
  // evt_percentiles — EXACT interpolated percentiles per event_type
  // (Spark `percentile` == DuckDB `quantile_cont`: both compute
  // lower + frac*(upper-lower) at position p*(n-1) of the sorted values).
  // The approximate path at scale is `percentile_approx` (t-digest, one
  // pass, mergeable) — exact here so the oracle can pin semantics.
  // -------------------------------------------------------------------
  private def percentiles(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        Norm.rnd(expr("percentile(value, 0.5)"), 6).as("p50"),
        Norm.rnd(expr("percentile(value, 0.95)"), 6).as("p95"),
        Norm.rnd(expr("percentile(value, 0.99)"), 6).as("p99")
      )
      .transform(Norm.ordered(_, col("event_type")))

  private val percentilesSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(quantile_cont(value, 0.5), 6) + 0.0 AS p50,
      |  round(quantile_cont(value, 0.95), 6) + 0.0 AS p95,
      |  round(quantile_cont(value, 0.99), 6) + 0.0 AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // evt_window_agg — tumbling 1-day event-time windows via Spark's
  // `window()` (the batch twin of the Structured Streaming windowed agg in
  // graft.streaming.Streams). Spark's window origin is epoch-aligned, so
  // the oracle reproduces the bucketing as integer arithmetic on epoch
  // microseconds — two independent definitions that must agree.
  // -------------------------------------------------------------------
  private val DayUs: Long = 86400L * 1000 * 1000

  private def windowAgg(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("w", window(timestamp_micros(col("tus")), "1 day"))
      .groupBy(col("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Norm.rnd(sum(col("value")), 4).as("sum_value")
      )
      .select(
        unix_micros(col("w.start")).as("day_us"),
        col("event_type"),
        col("n_events"),
        col("sum_value")
      )
      .transform(Norm.ordered(_, col("day_us"), col("event_type")))

  private val windowAggSql: String =
    s"""SELECT epoch_us(ts) - epoch_us(ts) % $DayUs AS day_us, event_type,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  round(sum(value), 4) + 0.0 AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY day_us, event_type""".stripMargin

  // -------------------------------------------------------------------
  // evt_setops — set-operation surface: users with a high-value purchase
  // INTERSECT users with a high-value click, EXCEPT users with a severe
  // error. Spark's intersect/except are set-semantic (dedup built in),
  // same as SQL. (Thresholds make the sets selective: with ~67 events per
  // user every user has every event type, so unthresholded sets would be
  // degenerate — always-empty after EXCEPT.)
  // -------------------------------------------------------------------
  // -------------------------------------------------------------------
  // evt_full_outer — the one join type no other query exercises:
  // reconcile two partial per-user aggregates (high-value purchasers vs
  // severe-error users) with a FULL OUTER join, coalescing both sides.
  // Thresholds keep the sides genuinely partial (35 left / 40 right /
  // 12 both at sf0.01) so left-only, right-only and matched rows all
  // flow. At scale this is a plain shuffle join on the user key — full
  // outer forbids broadcast, which is exactly why it deserves its own
  // plan surface.
  // -------------------------------------------------------------------
  private val FullOuterMin = 195.0

  private def fullOuter(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val p = e
      .filter(col("event_type") === "purchase" && col("value") > FullOuterMin)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_big_purchases"),
        sum(round(col("value") * 100.0).cast("long")).as("pc")
      )
    val x = e
      .filter(col("event_type") === "error" && col("value") > FullOuterMin)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_severe_errors"))
    p.join(x, Seq("user_id"), "full_outer")
      .select(
        col("user_id"),
        coalesce(col("n_big_purchases"), lit(0L)).as("n_big_purchases"),
        Norm.rnd(coalesce(col("pc"), lit(0L)) / 100.0, 2).as("purchase_value"),
        coalesce(col("n_severe_errors"), lit(0L)).as("n_severe_errors")
      )
      .transform(Norm.ordered(_, col("user_id")))
  }

  private val fullOuterSql: String =
    s"""WITH p AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_big_purchases,
       |         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS pc
       |  FROM events WHERE event_type = 'purchase' AND value > $FullOuterMin GROUP BY 1
       |), x AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_severe_errors
       |  FROM events WHERE event_type = 'error' AND value > $FullOuterMin GROUP BY 1
       |)
       |SELECT coalesce(p.user_id, x.user_id) AS user_id,
       |  coalesce(p.n_big_purchases, 0) AS n_big_purchases,
       |  round(coalesce(p.pc, 0) / 100.0, 2) + 0.0 AS purchase_value,
       |  coalesce(x.n_severe_errors, 0) AS n_severe_errors
       |FROM p FULL OUTER JOIN x ON p.user_id = x.user_id
       |ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------------
  // evt_histogram — fixed-width value histogram per event type: the
  // classic distribution profile (bin = floor(value / width), a single
  // IEEE divide + floor on a raw input, bit-identical across engines).
  // Pure two-key hash aggregate: map-side partials, one shuffle of
  // |types|×|bins| rows regardless of input size.
  // -------------------------------------------------------------------
  private val HistWidth = 25.0

  private def histogram(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("bin", floor(col("value") / HistWidth).cast("long"))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", Norm.rnd(col("bin") * HistWidth, 2))
      .select("event_type", "bin", "bin_lo", "n")
      .transform(Norm.ordered(_, col("event_type"), col("bin")))

  private val histogramSql: String =
    s"""SELECT event_type, CAST(floor(value / $HistWidth) AS BIGINT) AS bin,
       |  round(CAST(floor(value / $HistWidth) AS BIGINT) * $HistWidth, 2) + 0.0 AS bin_lo,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM events GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin

  private def setOps(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    def users(t: String, minValue: Double) =
      e.filter(col("event_type") === t && col("value") > minValue).select("user_id")
    users("purchase", 100.0)
      .intersect(users("click", 100.0))
      .except(users("error", 180.0))
      .transform(Norm.ordered(_, col("user_id")))
  }

  private val setOpsSql: String =
    """SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 100.0
      |INTERSECT
      |SELECT user_id FROM events WHERE event_type = 'click' AND value > 100.0
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'error' AND value > 180.0
      |ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------------
  // evt_json_props — semi-structured extraction: the events.props column
  // is a JSON string; pull $.k out (Spark get_json_object ~ DuckDB
  // json_extract_string) and aggregate it per event_type. At scale the
  // same plan applies; for repeated multi-key access you'd from_json to a
  // struct column once instead of re-parsing per key.
  // -------------------------------------------------------------------
  private def jsonProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        count(col("k")).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        countDistinct(col("k")).as("distinct_k")
      )
      .transform(Norm.ordered(_, col("event_type")))

  private val jsonPropsSql: String =
    """WITH x AS (SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |SELECT event_type, CAST(count(k) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
      |       min(k) AS min_k, max(k) AS max_k,
      |       CAST(count(DISTINCT k) AS BIGINT) AS distinct_k
      |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // evt_running_metrics — per-user cumulative sum + 4-event moving average
  // over event time: the sliding-ROWS-frame surface of the engine (the
  // unbounded running frame is covered by sessionize). Tie-safe: the
  // window orders by (tus, event_id), which is unique.
  // -------------------------------------------------------------------
  private def runningMetrics(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mov = ord.rowsBetween(-3, Window.currentRow)
    ev(s, dir)
      .select(
        col("user_id"),
        col("event_id"),
        Norm.rnd(sum(col("value")).over(run), 4).as("cum_value"),
        Norm.rnd(avg(col("value")).over(mov), 6).as("mov_avg4")
      )
      .transform(Norm.ordered(_, col("user_id"), col("event_id")))
  }

  private val runningMetricsSql: String =
    """SELECT user_id, event_id,
      |  round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) + 0.0 AS cum_value,
      |  round(avg(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) + 0.0 AS mov_avg4
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  // -------------------------------------------------------------------
  // evt_keep_first — keep-first canonicalization: the earliest event per
  // (user, event_type) with the dupe count — the event-stream analogue of
  // dedup canonical-doc selection (argmin by (time, id) inside a group).
  // -------------------------------------------------------------------
  private def keepFirst(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy(col("tus"), col("event_id"))
    val wAll = Window.partitionBy("user_id", "event_type")
    ev(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_dupes", count(lit(1)).over(wAll))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"), col("tus").as("first_us"), col("n_dupes"))
      .transform(Norm.ordered(_, col("user_id"), col("event_type")))
  }

  private val keepFirstSql: String =
    """WITH r AS (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS tsn,
      |         row_number() OVER (PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id) AS rn,
      |         CAST(count(*) OVER (PARTITION BY user_id, event_type) AS BIGINT) AS n_dupes
      |  FROM events
      |)
      |SELECT user_id, event_type, event_id AS first_event_id, tsn AS first_us, n_dupes
      |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  // -------------------------------------------------------------------
  // evt_range_join — interval join: clicks within the 7 days BEFORE each
  // purchase of the same user. The naive plan equi-joins on user alone and
  // filters the range AFTER the join — per-user-quadratic. This one is the
  // bucketed range join: bucket width = range width, so a lookback spans
  // at most two buckets; the join is keyed on (user, bucket) and the exact
  // range predicate only ever runs inside a bucket. Bucket count grows
  // with the time span, so the key space scales WITH the data — no skew
  // funnel at 100 TB (plus AQE skew-join for hot users).
  // -------------------------------------------------------------------
  private val RangeUs: Long = 7L * 86400L * 1000 * 1000 // 7-day lookback

  private def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val clicks = e
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("tus").as("c_us"), col("value").as("c_val"))
      .withColumn("bucket", expr(s"c_us div $RangeUs"))
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("tus").as("p_us"))
    val probes = purchases
      .withColumn("bucket", explode(array(expr(s"p_us div $RangeUs - 1"), expr(s"p_us div $RangeUs"))))
    val matched = probes
      .join(clicks, Seq("user_id", "bucket"))
      .filter(col("c_us") >= col("p_us") - RangeUs && col("c_us") < col("p_us"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_hits"), sum(col("c_val")).as("sum_val"))
    purchases
      .join(matched, Seq("event_id"), "left")
      .select(
        col("event_id"),
        col("user_id"),
        col("p_us"),
        coalesce(col("n_hits"), lit(0L)).as("n_clicks"),
        Norm.rnd(coalesce(col("sum_val"), lit(0.0)), 4).as("click_value")
      )
      .transform(Norm.ordered(_, col("event_id")))
  }

  private val rangeJoinSql: String =
    s"""WITH e AS (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tus FROM events),
       |p AS (SELECT user_id, event_id, tus AS p_us FROM e WHERE event_type = 'purchase'),
       |c AS (SELECT user_id, tus AS c_us, value FROM e WHERE event_type = 'click')
       |SELECT p.event_id, p.user_id, p.p_us,
       |  CAST(count(c.c_us) AS BIGINT) AS n_clicks,
       |  round(COALESCE(sum(c.value), 0), 4) + 0.0 AS click_value
       |FROM p LEFT JOIN c ON c.user_id = p.user_id
       |  AND c.c_us >= p.p_us - $RangeUs AND c.c_us < p.p_us
       |GROUP BY 1, 2, 3 ORDER BY p.event_id""".stripMargin

  // -------------------------------------------------------------------
  // evt_pivot — per-user event-type count matrix (the pivot surface).
  // The type list is explicit, so Spark skips the distinct-values
  // discovery pass and the whole pivot is one hash aggregation.
  // -------------------------------------------------------------------
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  private def pivotTypes(s: SparkSession, dir: String): DataFrame = {
    // conditional counts rather than .pivot: same single hash aggregation,
    // but n_events can be a true count(*) in the same pass — so it matches
    // the oracle even if a type OUTSIDE the pivoted list ever appears
    val typeCounts = EventTypes.map(t => count(when(col("event_type") === t, 1)).as(s"n_$t"))
    ev(s, dir)
      .groupBy("user_id")
      .agg(typeCounts.head, typeCounts.tail :+ count(lit(1)).as("n_events"): _*)
      .transform(Norm.ordered(_, col("user_id")))
  }

  private val pivotTypesSql: String = {
    val cols = EventTypes
      .map(t => s"CAST(count(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS n_$t")
      .mkString(",\n  ")
    s"""SELECT user_id,
       |  $cols,
       |  CAST(count(*) AS BIGINT) AS n_events
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // evt_funnel — ordered-sequence funnel signup → click → purchase: per
  // user, the earliest signup, the earliest click strictly after it, the
  // earliest purchase strictly after that; then the per-stage user counts
  // and median stage-to-stage latency. Each stage is one conditional min
  // aggregate over the (already tiny) per-user event set — three hash
  // aggregations, no window, no self-join; user_id keys every shuffle.
  // -------------------------------------------------------------------
  private def funnel(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select("user_id", "event_type", "tus")
    val t1 = e
      .filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min(col("tus")).as("t1"))
    val t2 = e
      .filter(col("event_type") === "click")
      .join(t1, "user_id")
      .filter(col("tus") > col("t1"))
      .groupBy("user_id")
      .agg(first(col("t1")).as("t1"), min(col("tus")).as("t2"))
    val t3 = e
      .filter(col("event_type") === "purchase")
      .join(t2, "user_id")
      .filter(col("tus") > col("t2"))
      .groupBy("user_id")
      .agg(first(col("t1")).as("t1"), first(col("t2")).as("t2"), min(col("tus")).as("t3"))
    // floor before the integer cast: Spark's double->long cast truncates
    // while DuckDB's rounds, and an even-count median is fractional
    val s1 = t1
      .agg(count(lit(1)).as("n_users"))
      .select(lit("1_signup").as("stage"), col("n_users"), lit(null).cast("long").as("median_lat_us"))
    val s2 = t2
      .select((col("t2") - col("t1")).as("lat"))
      .agg(count(lit(1)).as("n_users"), expr("CAST(floor(percentile(lat, 0.5)) AS BIGINT)").as("median_lat_us"))
      .select(lit("2_click").as("stage"), col("n_users"), col("median_lat_us"))
    val s3 = t3
      .select((col("t3") - col("t2")).as("lat"))
      .agg(count(lit(1)).as("n_users"), expr("CAST(floor(percentile(lat, 0.5)) AS BIGINT)").as("median_lat_us"))
      .select(lit("3_purchase").as("stage"), col("n_users"), col("median_lat_us"))
    s1.union(s2).union(s3).transform(Norm.ordered(_, col("stage")))
  }

  private val funnelSql: String =
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
       |t1 AS (SELECT user_id, min(tus) AS t1 FROM e WHERE event_type = 'signup' GROUP BY 1),
       |t2 AS (SELECT e.user_id, any_value(t1.t1) AS t1, min(e.tus) AS t2
       |       FROM e JOIN t1 ON e.user_id = t1.user_id
       |       WHERE e.event_type = 'click' AND e.tus > t1.t1 GROUP BY 1),
       |t3 AS (SELECT e.user_id, any_value(t2.t2) AS t2, min(e.tus) AS t3
       |       FROM e JOIN t2 ON e.user_id = t2.user_id
       |       WHERE e.event_type = 'purchase' AND e.tus > t2.t2 GROUP BY 1)
       |SELECT '1_signup' AS stage, CAST(count(*) AS BIGINT) AS n_users, CAST(NULL AS BIGINT) AS median_lat_us FROM t1
       |UNION ALL
       |SELECT '2_click', CAST(count(*) AS BIGINT), CAST(floor(quantile_cont(t2 - t1, 0.5)) AS BIGINT) FROM t2
       |UNION ALL
       |SELECT '3_purchase', CAST(count(*) AS BIGINT), CAST(floor(quantile_cont(t3 - t2, 0.5)) AS BIGINT) FROM t3
       |ORDER BY stage""".stripMargin

  // -------------------------------------------------------------------
  // evt_retention — cohort retention: cohort = the user's first active
  // day; cell (cohort, offset) = distinct users of that cohort active
  // `offset` days later. Two hash aggregations + one equi-join on
  // user_id; the user-day dedup happens BEFORE the join, so the join and
  // the distinct-count shuffle user-days, not raw events.
  // -------------------------------------------------------------------
  private def retention(s: SparkSession, dir: String): DataFrame = {
    val days = ev(s, dir)
      .select(col("user_id"), (col("tus") - col("tus") % DayUs).as("day_us"))
      .distinct()
    val cohort = days.groupBy("user_id").agg(min(col("day_us")).as("cohort_us"))
    days
      .join(cohort, "user_id")
      .withColumn("day_offset", expr(s"(day_us - cohort_us) div $DayUs"))
      .groupBy("cohort_us", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .transform(Norm.ordered(_, col("cohort_us"), col("day_offset")))
  }

  private val retentionSql: String =
    s"""WITH d AS (SELECT DISTINCT user_id, epoch_us(ts) - epoch_us(ts) % $DayUs AS day_us FROM events),
       |c AS (SELECT user_id, min(day_us) AS cohort_us FROM d GROUP BY 1)
       |SELECT c.cohort_us, (d.day_us - c.cohort_us) // $DayUs AS day_offset,
       |  CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
       |FROM d JOIN c ON d.user_id = c.user_id
       |GROUP BY 1, 2 ORDER BY cohort_us, day_offset""".stripMargin

  // -------------------------------------------------------------------
  // evt_pii_scrub — PII-style redaction over the raw `props` payload:
  // mask every digit run, count redactions, and checksum the masked
  // strings per event type (the checksum proves every masked byte, not
  // just the counts). Pure map-side scan + one map-side-combined agg —
  // the shape of a 100 TB scrubbing pass.
  // -------------------------------------------------------------------
  private def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val P = graft.ccm.DetHash.P
    Tables.events(s, dir)
      .select(
        col("event_type"),
        regexp_count(col("props"), lit("[0-9]+")).cast("long").as("n_masked"),
        regexp_replace(col("props"), "[0-9]+", "#").as("masked")
      )
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("n_masked")).as("n_redactions"),
        sum(graft.ccm.DetHash.polyHashCol(col("masked")) % P).as("mask_hash_sum")
      )
      .transform(Norm.ordered(_, col("event_type")))
  }

  private val piiScrubSql: String = {
    val P = graft.ccm.DetHash.P
    val h = graft.ccm.DetHash.polyHashSql("regexp_replace(props, '[0-9]+', '#', 'g')")
    s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS n_redactions,
       |  CAST(sum($h % $P) AS BIGINT) AS mask_hash_sum
       |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin
  }

  // -------------------------------------------------------------------
  // evt_anomaly — rolling z-score outlier detection: each event is scored
  // against the PRIOR 8 events of its user (full frames only). Variance
  // is built from explicit frame sums (sum, sum of squares) instead of an
  // engine stddev — Spark and DuckDB use different one-pass variance
  // algorithms, but identical sums feed an identical formula here. One
  // window pass per user partition; no self-join. The frame sums are
  // ROUNDED before any threshold compare: engines may combine a window
  // frame in different orders (DuckDB's segment tree vs Spark's running
  // sum), so the raw s1/s2 can differ in the last ulp — rounding both
  // sides to the same grid BEFORE the variance/z filters keeps the
  // emitted row set engine-independent.
  // -------------------------------------------------------------------
  private val ZWin = 8
  private val ZThreshold = 2.5

  private def anomaly(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val prior = ord.rowsBetween(-ZWin, -1)
    ev(s, dir)
      .withColumn("n_prior", count(lit(1)).over(prior))
      .withColumn("s1", Norm.rnd(sum(col("value")).over(prior), 6))
      .withColumn("s2", Norm.rnd(sum(col("value") * col("value")).over(prior), 6))
      .filter(col("n_prior") === ZWin)
      .withColumn("variance", (col("s2") - col("s1") * col("s1") / ZWin) / (ZWin - 1))
      .filter(col("variance") > 1e-9)
      .withColumn("z", (col("value") - col("s1") / ZWin) / sqrt(col("variance")))
      .filter(abs(col("z")) >= ZThreshold)
      .select(col("user_id"), col("event_id"), col("value"), Norm.rnd(col("z"), 6).as("z_score"))
      .transform(Norm.ordered(_, col("user_id"), col("event_id")))
  }

  private val anomalySql: String =
    s"""WITH w AS (
       |  SELECT user_id, event_id, value,
       |         count(*) OVER f AS n_prior,
       |         round(sum(value) OVER f, 6) + 0.0 AS s1,
       |         round(sum(value * value) OVER f, 6) + 0.0 AS s2
       |  FROM events
       |  WINDOW f AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
       |               ROWS BETWEEN $ZWin PRECEDING AND 1 PRECEDING)
       |), v AS (
       |  SELECT user_id, event_id, value,
       |         (s2 - s1 * s1 / $ZWin) / ${ZWin - 1} AS variance, s1
       |  FROM w WHERE n_prior = $ZWin
       |), z AS (
       |  SELECT user_id, event_id, value,
       |         (value - s1 / $ZWin) / sqrt(variance) AS z
       |  FROM v WHERE variance > 1e-9
       |)
       |SELECT user_id, event_id, value, round(z, 6) + 0.0 AS z_score
       |FROM z WHERE abs(z) >= $ZThreshold
       |ORDER BY user_id, event_id""".stripMargin

  // -------------------------------------------------------------------
  // evt_transitions — first-order Markov transition matrix over each
  // user's event-type sequence: one lead() window pass per user
  // partition, then a global (src, dst) count with the row-probability
  // as an exact integer ratio. The sequence-mining primitive behind
  // session modeling / next-event prediction.
  // -------------------------------------------------------------------
  private def transitions(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val wSrc = Window.partitionBy("src_type")
    ev(s, dir)
      .withColumn("dst_type", lead(col("event_type"), 1).over(ord))
      .filter(col("dst_type").isNotNull)
      .groupBy(col("event_type").as("src_type"), col("dst_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn(
        "p",
        Norm.rnd(col("n_transitions").cast("double") / sum(col("n_transitions")).over(wSrc).cast("double"), 6)
      )
      .transform(Norm.ordered(_, col("src_type"), col("dst_type")))
  }

  private val transitionsSql: String =
    """WITH seq AS (
      |  SELECT event_type AS src_type,
      |         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS dst_type
      |  FROM events
      |), c AS (
      |  SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n_transitions
      |  FROM seq WHERE dst_type IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT src_type, dst_type, n_transitions,
      |  round(CAST(n_transitions AS DOUBLE) /
      |        CAST(sum(n_transitions) OVER (PARTITION BY src_type) AS DOUBLE), 6) + 0.0 AS p
      |FROM c ORDER BY src_type, dst_type""".stripMargin

  // -------------------------------------------------------------------
  // evt_gapfill — time-series densification: per user, generate every
  // hour bucket between the user's first and last event (sequence +
  // explode — the distributed gap-fill operator: each user's range
  // expands inside its own task, no driver loop), anti-join the active
  // hours away, and report the gap census incl. the longest outage run
  // (gaps-and-islands via h - row_number). The checksum pins the exact
  // generated row set, not just its size. At 100 TB the explode fans out
  // WITHIN partitions keyed by user — no shuffle grows with the fill
  // factor; only the per-user gap summary (constant per user) shuffles.
  // -------------------------------------------------------------------
  private val HourUs: Long = 3600L * 1000 * 1000

  private def gapfill(s: SparkSession, dir: String): DataFrame = {
    // FLOOR division, NOT `div`: Spark's `div` truncates toward zero while
    // the oracle's `//` floors — they diverge for negative epochs
    // (pre-1970 timestamps). Integer-exact floordiv: adjust the truncated
    // quotient down by one when the remainder is negative.
    val active = ev(s, dir)
      .select(
        col("user_id"),
        (expr(s"tus div $HourUs") - when(expr(s"tus % $HourUs") < 0, 1L).otherwise(0L)).as("h")
      )
      .distinct()
      .localCheckpoint() // feeds span, the anti-join, and nothing twice
    val span = active
      .groupBy("user_id")
      .agg(min(col("h")).as("h_min"), max(col("h")).as("h_max"), count(lit(1)).as("n_active"))
    val gaps = span
      .select(col("user_id"), col("h_min"), explode(sequence(col("h_min"), col("h_max"))).as("h"))
      .join(active, Seq("user_id", "h"), "left_anti")
    val isl = gaps
      .withColumn("g", col("h") - row_number().over(Window.partitionBy("user_id").orderBy("h")))
    val maxRun = isl
      .groupBy("user_id", "g")
      .agg(count(lit(1)).as("run"))
      .groupBy("user_id")
      .agg(max(col("run")).as("max_gap_run"))
    val gapSum = gaps
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"), sum(col("h") - col("h_min")).as("gap_checksum"))
    span
      .join(gapSum, Seq("user_id"), "left")
      .join(maxRun, Seq("user_id"), "left")
      .select(
        col("user_id"),
        (col("h_max") - col("h_min") + 1).as("n_hours"),
        col("n_active"),
        coalesce(col("n_gaps"), lit(0L)).as("n_gaps"),
        coalesce(col("gap_checksum"), lit(0L)).as("gap_checksum"),
        coalesce(col("max_gap_run"), lit(0L)).as("max_gap_run")
      )
      .transform(Norm.ordered(_, col("user_id")))
  }

  private val gapfillSql: String =
    s"""WITH active AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $HourUs AS h FROM events
       |), span AS (
       |  SELECT user_id, min(h) AS h_min, max(h) AS h_max,
       |         CAST(count(*) AS BIGINT) AS n_active
       |  FROM active GROUP BY 1
       |), gaps AS (
       |  SELECT f.user_id, f.h, f.h_min
       |  FROM (SELECT user_id, h_min,
       |               unnest(generate_series(h_min, h_max)) AS h FROM span) f
       |  LEFT JOIN active a ON a.user_id = f.user_id AND a.h = f.h
       |  WHERE a.h IS NULL
       |), isl AS (
       |  SELECT user_id, h, h_min,
       |         h - row_number() OVER (PARTITION BY user_id ORDER BY h) AS g
       |  FROM gaps
       |), runs AS (
       |  SELECT user_id, g, CAST(count(*) AS BIGINT) AS run FROM isl GROUP BY 1, 2
       |), mr AS (
       |  SELECT user_id, max(run) AS max_gap_run FROM runs GROUP BY 1
       |), gs AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
       |         CAST(sum(h - h_min) AS BIGINT) AS gap_checksum
       |  FROM gaps GROUP BY 1
       |)
       |SELECT s.user_id, s.h_max - s.h_min + 1 AS n_hours, s.n_active,
       |       coalesce(gs.n_gaps, 0) AS n_gaps,
       |       coalesce(gs.gap_checksum, 0) AS gap_checksum,
       |       coalesce(mr.max_gap_run, 0) AS max_gap_run
       |FROM span s
       |LEFT JOIN gs ON gs.user_id = s.user_id
       |LEFT JOIN mr ON mr.user_id = s.user_id
       |ORDER BY s.user_id""".stripMargin

  // -------------------------------------------------------------------
  // evt_ntile — decile statistics per event type: ntile(10) over the
  // value order (ties broken by event_id for a total order — ntile is
  // deterministic only under a total order), then one aggregate per
  // (type, decile). Both engines implement SQL-standard ntile (first
  // n mod 10 buckets take the extra row).
  // -------------------------------------------------------------------
  private def ntileStats(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    ev(s, dir)
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("event_type", "decile")
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        Norm.rnd(sum(col("value")), 4).as("sum_value")
      )
      .transform(Norm.ordered(_, col("event_type"), col("decile")))
  }

  private val ntileStatsSql: String =
    """WITH d AS (
      |  SELECT event_type, value,
      |         CAST(ntile(10) OVER (PARTITION BY event_type
      |                              ORDER BY value, event_id) AS BIGINT) AS decile
      |  FROM events
      |)
      |SELECT event_type, decile, CAST(count(*) AS BIGINT) AS n,
      |       min(value) AS min_value, max(value) AS max_value,
      |       round(sum(value), 4) + 0.0 AS sum_value
      |FROM d GROUP BY 1, 2 ORDER BY event_type, decile""".stripMargin

  // -------------------------------------------------------------------
  // evt_rank_stats — the remaining SQL ranking functions (rank,
  // dense_rank, percent_rank, cume_dist) per event type over the VALUE
  // order alone — deliberately NOT a total order: with ties, these four
  // are the functions whose semantics stay deterministic (equal values
  // get equal ranks; row_number would not be well-defined and is
  // excluded). percent_rank = (rank−1)/(n−1) and cume_dist = peers/n are
  // ratios of exact integers, so the doubles agree bit-exactly before
  // the cosmetic rounding. The full-partition window computes every
  // rank; the OUTPUT keeps a fixed id-stride panel so the result stays
  // small while the hash still pins the whole partition's rank layout
  // (any rank shift upstream of a panel row changes its rank).
  // -------------------------------------------------------------------
  private def rankStats(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"))
    ev(s, dir)
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .withColumn("prank", Norm.rnd(percent_rank().over(w), 6))
      .withColumn("cdist", Norm.rnd(cume_dist().over(w), 6))
      .filter(col("event_id") % 97 === 0)
      .select(col("event_type"), col("event_id"), col("rnk"), col("drnk"), col("prank"), col("cdist"))
      .transform(Norm.ordered(_, col("event_type"), col("event_id")))
  }

  private val rankStatsSql: String =
    """WITH r AS (
      |  SELECT event_type, event_id,
      |         CAST(rank() OVER w AS BIGINT) AS rnk,
      |         CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |         round(percent_rank() OVER w, 6) + 0.0 AS prank,
      |         round(cume_dist() OVER w, 6) + 0.0 AS cdist
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type ORDER BY value)
      |)
      |SELECT event_type, event_id, rnk, drnk, prank, cdist
      |FROM r WHERE event_id % 97 = 0 ORDER BY event_type, event_id""".stripMargin

  // -------------------------------------------------------------------
  // evt_interpolate — resampling with LINEAR interpolation: per sampled
  // user, the hourly mean-value series densified to every hour in the
  // user's span (sequence + explode, the gapfill pattern — fan-out stays
  // inside the user's task), with interior gaps filled by linear
  // interpolation between the nearest observed hours on each side. The
  // standard feature-prep resampler (CCM and any window model want an
  // evenly-spaced series). Determinism: hourly means are exact integer
  // cent sums / 100.0 / n (two IEEE divisions), the carried prev/next
  // use last/first IGNORE NULLS over per-user ordered windows, and the
  // interpolation expression is written with the identical operation
  // order in both engines. h_min/h_max are observed by construction, so
  // every gap row has both neighbors.
  // -------------------------------------------------------------------
  private val InterpStride = 20

  private def interpolate(s: SparkSession, dir: String): DataFrame = {
    val obs = ev(s, dir)
      .filter(col("user_id") % InterpStride === 0)
      .select(
        col("user_id"),
        (expr(s"tus div $HourUs") - when(expr(s"tus % $HourUs") < 0, 1L).otherwise(0L)).as("h"),
        round(col("value") * 100.0).cast("long").as("cents")
      )
      .groupBy("user_id", "h")
      .agg((sum(col("cents")) / 100.0 / count(lit(1))).as("v_obs"))
      .localCheckpoint() // feeds span and the grid join
    val span = obs.groupBy("user_id").agg(min("h").as("h_min"), max("h").as("h_max"))
    val grid = span.select(col("user_id"), explode(sequence(col("h_min"), col("h_max"))).as("h"))
    val w = Window.partitionBy("user_id").orderBy("h")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = w.rowsBetween(0, Window.unboundedFollowing)
    grid
      .join(obs, Seq("user_id", "h"), "left")
      .withColumn("prev_h", last(when(col("v_obs").isNotNull, col("h")), ignoreNulls = true).over(wPrev))
      .withColumn("prev_v", last(col("v_obs"), ignoreNulls = true).over(wPrev))
      .withColumn("next_h", first(when(col("v_obs").isNotNull, col("h")), ignoreNulls = true).over(wNext))
      .withColumn("next_v", first(col("v_obs"), ignoreNulls = true).over(wNext))
      .select(
        col("user_id"),
        col("h"),
        when(col("v_obs").isNotNull, 1L).otherwise(0L).as("is_observed"),
        // NOT round(x, 4): power-of-two hour spans make the interpolated
        // double's SHORTEST decimal repr land exactly on a 4-dp half
        // (e.g. "49.50375" for the double whose exact value is
        // 49.5037499...), and Spark's scaled round goes through
        // BigDecimal.valueOf (shortest repr -> HALF_UP -> .5038) while
        // DuckDB rounds the exact binary value (-> .5037) — 12 flipped
        // rows at sf0.01. Scale-0 rounding cannot disagree (an exact
        // half is binary-representable, so both engines see it), so
        // round(x*1e4) -> long -> /1e4 is the cross-engine-stable form.
        (round(
          when(col("v_obs").isNotNull, col("v_obs")).otherwise(
            col("prev_v") + (col("next_v") - col("prev_v")) *
              ((col("h") - col("prev_h")).cast("double") /
                (col("next_h") - col("prev_h")).cast("double"))
          ) * 10000.0
        ).cast("long") / 10000.0 + lit(0.0)).as("v_fill")
      )
      .transform(Norm.ordered(_, col("user_id"), col("h")))
  }

  private val interpolateSql: String =
    s"""WITH obs AS (
       |  SELECT user_id, epoch_us(ts) // $HourUs AS h,
       |         sum(CAST(round(value * 100.0) AS BIGINT)) / 100.0 / count(*) AS v_obs
       |  FROM events WHERE user_id % $InterpStride = 0 GROUP BY 1, 2
       |), span AS (
       |  SELECT user_id, min(h) AS h_min, max(h) AS h_max FROM obs GROUP BY 1
       |), grid AS (
       |  SELECT user_id, unnest(generate_series(h_min, h_max)) AS h FROM span
       |), j AS (
       |  SELECT g.user_id, g.h, o.v_obs FROM grid g
       |  LEFT JOIN obs o ON o.user_id = g.user_id AND o.h = g.h
       |), pn AS (
       |  SELECT user_id, h, v_obs,
       |    last_value(CASE WHEN v_obs IS NOT NULL THEN h END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY h
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
       |    last_value(v_obs IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY h
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
       |    first_value(CASE WHEN v_obs IS NOT NULL THEN h END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY h
       |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h,
       |    first_value(v_obs IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY h
       |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v
       |  FROM j
       |)
       |SELECT user_id, h,
       |  CAST(CASE WHEN v_obs IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_observed,
       |  CAST(round((CASE WHEN v_obs IS NOT NULL THEN v_obs
       |             ELSE prev_v + (next_v - prev_v) *
       |                  (CAST(h - prev_h AS DOUBLE) / CAST(next_h - prev_h AS DOUBLE))
       |        END) * 10000.0) AS BIGINT) / 10000.0 + 0.0 AS v_fill
       |FROM pn ORDER BY user_id, h""".stripMargin

  // -------------------------------------------------------------------
  // evt_attribution — multi-touch conversion attribution, the three
  // standard models in ONE pass: every 'purchase' is joined to its
  // same-user 'click'/'view' touches inside a 3-day lookback (equi-join
  // on user_id + range predicate — per-user work bounded by the lookback,
  // never a cross join), then one window per conversion derives touch
  // count and ordinal, from which channel credit follows: LINEAR
  // (cents/n per touch — a ratio of exact integers, engine-identical
  // before the final 6-dp round), FIRST-touch and LAST-touch (full
  // credit, exact integer cents). The conversion-granular window
  // partitions by the globally unique purchase event id, so credit
  // normalization distributes freely across a cluster.
  // -------------------------------------------------------------------
  private val AttribLookbackUs: Long = 3L * 86400 * 1000 * 1000 // 3 days
  private val AttribTouches = Seq("click", "view")

  private def attribution(s: SparkSession, dir: String): DataFrame = {
    val base = ev(s, dir).withColumn("cents", round(col("value") * 100.0).cast("long"))
    // one scan serves both join sides (self-join rule)
    val e = base.localCheckpoint()
    val p = e
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id").as("p_event_id"),
        col("tus").as("p_tus"),
        col("cents").as("p_cents")
      )
    val t = e
      .filter(col("event_type").isin(AttribTouches: _*))
      .select(
        col("user_id"),
        col("event_type").as("channel"),
        col("event_id").as("t_event_id"),
        col("tus").as("t_tus")
      )
    val joined = p.join(
      t,
      p("user_id") === t("user_id") &&
        t("t_tus") >= p("p_tus") - AttribLookbackUs && t("t_tus") < p("p_tus")
    )
    val w = Window.partitionBy("p_event_id")
    val wOrd = w.orderBy(col("t_tus").asc, col("t_event_id").asc)
    joined
      .select(col("p_event_id"), col("p_cents"), col("channel"), col("t_tus"), col("t_event_id"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(wOrd))
      .groupBy("channel")
      .agg(
        count(lit(1)).as("n_touches"),
        Norm.rnd(sum(expr("CAST(p_cents AS DOUBLE) / n")) / 100.0, 6).as("linear_value"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("first_cnt"),
        sum(when(col("rn") === 1, col("p_cents")).otherwise(0L)).as("first_cents"),
        sum(when(col("rn") === col("n"), 1L).otherwise(0L)).as("last_cnt"),
        sum(when(col("rn") === col("n"), col("p_cents")).otherwise(0L)).as("last_cents")
      )
      .transform(Norm.ordered(_, col("channel")))
  }

  private val attributionSql: String = {
    val touches = AttribTouches.map(c => s"'$c'").mkString(", ")
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type,
       |         CAST(round(value * 100.0) AS BIGINT) AS cents
       |  FROM events
       |), j AS (
       |  SELECT p.event_id AS p_event_id, p.cents AS p_cents,
       |         t.event_type AS channel, t.tus AS t_tus, t.event_id AS t_event_id
       |  FROM (SELECT * FROM e WHERE event_type = 'purchase') p
       |  JOIN (SELECT * FROM e WHERE event_type IN ($touches)) t
       |    ON p.user_id = t.user_id
       |   AND t.tus >= p.tus - $AttribLookbackUs AND t.tus < p.tus
       |), o AS (
       |  SELECT *,
       |    CAST(count(*) OVER (PARTITION BY p_event_id) AS BIGINT) AS n,
       |    CAST(row_number() OVER (PARTITION BY p_event_id ORDER BY t_tus, t_event_id) AS BIGINT) AS rn
       |  FROM j
       |)
       |SELECT channel,
       |  CAST(count(*) AS BIGINT) AS n_touches,
       |  round(sum(CAST(p_cents AS DOUBLE) / n) / 100.0, 6) + 0.0 AS linear_value,
       |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS first_cnt,
       |  CAST(sum(CASE WHEN rn = 1 THEN p_cents ELSE 0 END) AS BIGINT) AS first_cents,
       |  CAST(sum(CASE WHEN rn = n THEN 1 ELSE 0 END) AS BIGINT) AS last_cnt,
       |  CAST(sum(CASE WHEN rn = n THEN p_cents ELSE 0 END) AS BIGINT) AS last_cents
       |FROM o GROUP BY channel ORDER BY channel""".stripMargin
  }

  // -------------------------------------------------------------------
  // evt_seasonal_decompose — classical additive decomposition of each
  // user's DAILY value series: trend = centered 7-day moving average
  // over a RANGE (value-based) frame keyed on the epoch-day index, so
  // calendar gaps shrink the window instead of silently misaligning it
  // (a ROWS frame would average non-adjacent days); trend is defined
  // only where all 7 calendar days exist. Seasonal = per-(user, weekday)
  // mean of the detrended series, centered by the count-weighted per-user
  // mean (so seasonal sums to zero over OBSERVED days — both engines
  // compute the identical row-replicated average);
  // residual = value − trend − seasonal. The trend numerator stays exact
  // integer cents (window sum), the single division by 7 is
  // engine-identical, and the remaining double aggregates follow the
  // family's 6-dp-round convention. One shuffle (user), then windows and
  // two tiny per-user aggregates — per-user series parallelize freely.
  // -------------------------------------------------------------------
  private val SeasonPeriod = 7

  /** Decompose WITHOUT the final ordering — shared by the contract query
    * and the residual-anomaly layer.
    */
  private def seasonalResid(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .withColumn("cents", round(col("value") * 100.0).cast("long"))
      .groupBy(col("user_id"), expr(s"tus div $DayUs").as("day"))
      .agg(sum(col("cents")).as("cents"))
      .withColumn("dow", expr(s"day % $SeasonPeriod"))
    val half = SeasonPeriod / 2
    val wMA = Window.partitionBy("user_id").orderBy("day").rangeBetween(-half, half)
    val detrended = daily
      .withColumn("w_cnt", count(lit(1)).over(wMA))
      .withColumn("w_sum", sum(col("cents")).over(wMA))
      .withColumn(
        "trend",
        when(col("w_cnt") === SeasonPeriod, expr(s"CAST(w_sum AS DOUBLE) / $SeasonPeriod"))
      )
      .withColumn("detr", col("cents") - col("trend"))
    val wU = Window.partitionBy("user_id")
    val wUD = Window.partitionBy("user_id", "dow")
    detrended
      // avg ignores the edge-null detrended rows on both engines
      .withColumn("s_raw", avg(col("detr")).over(wUD))
      .withColumn("s_mean", avg(col("s_raw")).over(wU))
      .withColumn("seasonal", col("s_raw") - col("s_mean"))
      .select(
        col("user_id"),
        col("day"),
        col("cents"),
        Norm.rnd(col("trend"), 6).as("trend"),
        Norm.rnd(col("seasonal"), 6).as("seasonal"),
        Norm.rnd(col("cents") - col("trend") - col("seasonal"), 6).as("resid")
      )
  }

  private def seasonalDecompose(s: SparkSession, dir: String): DataFrame =
    seasonalResid(s, dir).transform(Norm.ordered(_, col("user_id"), col("day")))

  private val seasonalDecomposeSql: String =
    s"""WITH daily AS (
       |  SELECT user_id, epoch_us(ts) // $DayUs AS day,
       |         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2
       |), ma AS (
       |  SELECT *, day % $SeasonPeriod AS dow,
       |    CAST(count(*) OVER w AS BIGINT) AS w_cnt,
       |    CAST(sum(cents) OVER w AS BIGINT) AS w_sum
       |  FROM daily
       |  WINDOW w AS (PARTITION BY user_id ORDER BY day
       |               RANGE BETWEEN ${SeasonPeriod / 2} PRECEDING AND ${SeasonPeriod / 2} FOLLOWING)
       |), det AS (
       |  SELECT *,
       |    CASE WHEN w_cnt = $SeasonPeriod THEN CAST(w_sum AS DOUBLE) / $SeasonPeriod END AS trend
       |  FROM ma
       |), seas AS (
       |  SELECT *, cents - trend AS detr,
       |    avg(cents - trend) OVER (PARTITION BY user_id, dow) AS s_raw
       |  FROM det
       |), cent AS (
       |  SELECT *, avg(s_raw) OVER (PARTITION BY user_id) AS s_mean FROM seas
       |)
       |SELECT user_id, day, cents,
       |  round(trend, 6) + 0.0 AS trend,
       |  round(s_raw - s_mean, 6) + 0.0 AS seasonal,
       |  round(cents - trend - (s_raw - s_mean), 6) + 0.0 AS resid
       |FROM cent ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // evt_changepoint — two-sided CUSUM changepoint detection (Page 1954)
  // over each user's daily spend. The textbook recurrence
  // S_t = max(0, S_{t-1} + x_t) is not a window aggregate, but it has
  // the exact closed form S_t = R_t − min(0, min_{j<=t} R_j) over the
  // prefix sums R — so the whole detector is two running windows
  // (sum + min) per side, fully declarative and one shuffle on the user
  // key. Standardization guards: mean and stddev are 6-dp-ROUNDED before
  // z is formed (cross-engine aggregation-order ulps live in the
  // UNORDERED aggregates; the running sums accumulate in the window's
  // defined row order, so after the round every downstream double is
  // engine-identical and the boolean flag compares identical values —
  // the `nonlinear`-flag convention); zero variance → z = 0.
  // -------------------------------------------------------------------
  private val CusumSlack = 0.5 // drift allowance k, in z units
  private val CusumThreshold = 4.0 // alarm level h, in z units

  private def changepoint(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .withColumn("cents", round(col("value") * 100.0).cast("long"))
      .groupBy(col("user_id"), expr(s"tus div $DayUs").as("day"))
      .agg(sum(col("cents")).as("cents"))
    val wU = Window.partitionBy("user_id")
    val wRun = Window
      .partitionBy("user_id")
      .orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("m", round(avg(col("cents")).over(wU), 6))
      .withColumn("sd", round(coalesce(stddev_samp(col("cents")).over(wU), lit(0.0)), 6))
      .withColumn("z", when(col("sd") === 0.0, 0.0).otherwise((col("cents") - col("m")) / col("sd")))
      .withColumn("r_pos", sum(col("z") - CusumSlack).over(wRun))
      .withColumn("r_neg", sum(-col("z") - CusumSlack).over(wRun))
      .withColumn("s_pos", col("r_pos") - least(lit(0.0), min(col("r_pos")).over(wRun)))
      .withColumn("s_neg", col("r_neg") - least(lit(0.0), min(col("r_neg")).over(wRun)))
      .select(
        col("user_id"),
        col("day"),
        col("cents"),
        Norm.rnd(col("z"), 6).as("z"),
        Norm.rnd(col("s_pos"), 6).as("s_pos"),
        Norm.rnd(col("s_neg"), 6).as("s_neg"),
        (col("s_pos") > CusumThreshold || col("s_neg") > CusumThreshold).as("alarm")
      )
      .transform(Norm.ordered(_, col("user_id"), col("day")))
  }

  private val changepointSql: String =
    s"""WITH daily AS (
       |  SELECT user_id, epoch_us(ts) // $DayUs AS day,
       |         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2
       |), z AS (
       |  SELECT *, CASE WHEN sd = 0.0 THEN 0.0 ELSE (cents - m) / sd END AS z
       |  FROM (
       |    SELECT *, round(avg(cents) OVER (PARTITION BY user_id), 6) AS m,
       |           round(COALESCE(stddev_samp(cents) OVER (PARTITION BY user_id), 0.0), 6) AS sd
       |    FROM daily
       |  )
       |), pre AS (
       |  SELECT *,
       |    sum(z - $CusumSlack) OVER w AS r_pos,
       |    sum(-z - $CusumSlack) OVER w AS r_neg
       |  FROM z
       |  WINDOW w AS (PARTITION BY user_id ORDER BY day
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |), cusum AS (
       |  SELECT *,
       |    r_pos - least(0.0, min(r_pos) OVER w) AS s_pos,
       |    r_neg - least(0.0, min(r_neg) OVER w) AS s_neg
       |  FROM pre
       |  WINDOW w AS (PARTITION BY user_id ORDER BY day
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |)
       |SELECT user_id, day, cents,
       |  round(z, 6) + 0.0 AS z,
       |  round(s_pos, 6) + 0.0 AS s_pos,
       |  round(s_neg, 6) + 0.0 AS s_neg,
       |  (s_pos > $CusumThreshold OR s_neg > $CusumThreshold) AS alarm
       |FROM cusum ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // evt_theilsen — Theil–Sen robust trend estimation per user: the
  // median of all pairwise daily-spend slopes, beside the OLS slope it
  // robustifies (up to ~29% contamination tolerance vs OLS's zero). The
  // pair join is per-user only (equi-join on the series key — a million
  // users parallelize freely; per-user pairs are the O(n²) the estimator
  // inherently costs, bounded here by the 30-day daily rollup). The
  // median is an exact order statistic: slopes are ratios of exact
  // integers (identical doubles on both engines), ranked by value with
  // the pair's day keys as deterministic tie-breaks, and the middle
  // one/two positions are averaged — no approximate percentile anywhere.
  // -------------------------------------------------------------------
  private def theilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .withColumn("cents", round(col("value") * 100.0).cast("long"))
      .groupBy(col("user_id"), expr(s"tus div $DayUs").as("day"))
      .agg(sum(col("cents")).as("cents"))
      .localCheckpoint() // feeds both pair-join sides + the OLS aggregate
    val pairs = daily
      .as("a")
      .join(daily.as("b"), col("a.user_id") === col("b.user_id") && col("a.day") < col("b.day"))
      .select(
        col("a.user_id").as("user_id"),
        col("a.day").as("d1"),
        col("b.day").as("d2"),
        ((col("b.cents") - col("a.cents")) / (col("b.day") - col("a.day")).cast("double"))
          .as("slope")
      )
    val wRank = Window
      .partitionBy("user_id")
      .orderBy(col("slope").asc, col("d1").asc, col("d2").asc)
    val wU = Window.partitionBy("user_id")
    val sen = pairs
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .withColumn("n", count(lit(1)).over(wU))
      // middle position(s): (n+1) div 2 and (n+2) div 2 — equal when odd
      .filter(col("rn") >= expr("(n + 1) div 2") && col("rn") <= expr("(n + 2) div 2"))
      .groupBy("user_id")
      .agg(avg(col("slope")).as("sen_slope"))
    // OLS slope from EXACT integer co-moments (day and cents are BIGINTs;
    // every sum/product stays far under 2^63) — engine-native regr_slope
    // differs by internal ulps, which a boundary draw turned into a real
    // 6-dp hash flip (user 121 measured 124.101562 vs .101563); the
    // integer-moment form leaves ONE double division, bit-identical
    val ols = daily
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("day")).as("sx"),
        sum(col("cents")).as("sy"),
        sum(col("day") * col("cents")).as("sxy"),
        sum(col("day") * col("day")).as("sxx")
      )
      .withColumn(
        "ols_slope",
        expr("CAST(n_days * sxy - sx * sy AS DOUBLE) / CAST(n_days * sxx - sx * sx AS DOUBLE)")
      )
    ols
      .join(sen, "user_id")
      .select(
        col("user_id"),
        col("n_days"),
        Norm.rnd(col("sen_slope"), 6).as("sen_slope"),
        Norm.rnd(col("ols_slope"), 6).as("ols_slope")
      )
      .transform(Norm.ordered(_, col("user_id")))
  }

  private val theilSenSql: String =
    s"""WITH daily AS (
       |  SELECT user_id, epoch_us(ts) // $DayUs AS day,
       |         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2
       |), pairs AS (
       |  SELECT a.user_id AS user_id, a.day AS d1, b.day AS d2,
       |         (b.cents - a.cents) / CAST(b.day - a.day AS DOUBLE) AS slope
       |  FROM daily a JOIN daily b ON a.user_id = b.user_id AND a.day < b.day
       |), ranked AS (
       |  SELECT *,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY slope, d1, d2) AS BIGINT) AS rn,
       |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
       |  FROM pairs
       |), sen AS (
       |  SELECT user_id, avg(slope) AS sen_slope
       |  FROM ranked
       |  WHERE rn >= (n + 1) // 2 AND rn <= (n + 2) // 2
       |  GROUP BY 1
       |), olsm AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
       |         CAST(sum(day) AS BIGINT) AS sx, CAST(sum(cents) AS BIGINT) AS sy,
       |         CAST(sum(day * cents) AS BIGINT) AS sxy, CAST(sum(day * day) AS BIGINT) AS sxx
       |  FROM daily GROUP BY 1
       |), ols AS (
       |  SELECT user_id, n_days,
       |         CAST(n_days * sxy - sx * sy AS DOUBLE) / CAST(n_days * sxx - sx * sx AS DOUBLE) AS ols_slope
       |  FROM olsm
       |)
       |SELECT o.user_id, o.n_days,
       |  round(s.sen_slope, 6) + 0.0 AS sen_slope,
       |  round(o.ols_slope, 6) + 0.0 AS ols_slope
       |FROM ols o JOIN sen s ON o.user_id = s.user_id
       |ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // evt_ses_forecast — exponentially weighted level + one-step-ahead
  // forecast of each user's daily spend: kernel-normalized EWMA
  // level_t = Σ (1-α)^(day_t − day_j)·c_j / Σ (1-α)^(day_t − day_j) over
  // the last `SesWindow` calendar days (day-distance weights, so data
  // gaps DECAY the influence of old points instead of misaligning a
  // row-based recurrence; normalization makes the truncation exact
  // rather than an approximation). Forecast for a day = the PREVIOUS
  // observed day's level; err = actual − forecast; per-user MAE beside
  // each row. Cross-engine trap avoided: pow() is libm-dependent, so the
  // decay weights are precomputed in Scala by sequential multiplication
  // and spliced as shortest-roundtrip DOUBLE LITERALS into one CASE
  // expression both engines parse — weight parity is by construction.
  // The range self-join is per-user with a bounded day span; the window
  // fan-out is the operator's fixed kernel width, never the series size.
  // -------------------------------------------------------------------
  private val SesWindow = 14
  private val SesDecay = 0.7 // 1 - alpha
  private val sesWeightCase: String = {
    val ws = Iterator.iterate(1.0)(_ * SesDecay).take(SesWindow).toSeq
    val whens = ws.zipWithIndex.map { case (w, k) => s"WHEN $k THEN ${w}e0" }.mkString(" ")
    s"(CASE CAST(dd AS INTEGER) $whens ELSE 0.0 END)"
  }

  private def sesForecast(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .withColumn("cents", round(col("value") * 100.0).cast("long"))
      .groupBy(col("user_id"), expr(s"tus div $DayUs").as("day"))
      .agg(sum(col("cents")).as("cents"))
      .localCheckpoint() // feeds both sides of the kernel join
    val joined = daily
      .as("a")
      .join(
        daily.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.day") > col("a.day") - SesWindow && col("b.day") <= col("a.day")
      )
      .select(
        col("a.user_id").as("user_id"),
        col("a.day").as("day"),
        col("a.cents").as("cents"),
        (col("a.day") - col("b.day")).as("dd"),
        col("b.cents").as("c_j")
      )
      .withColumn("w", expr(sesWeightCase))
    val wSeq = Window.partitionBy("user_id").orderBy("day")
    val wU = Window.partitionBy("user_id")
    joined
      // ORDER-FREE level (round 15, closing the float ledger): the r14
      // form summed w*c_j as a double fold — argued safe by its 2.0e-6
      // boundary clearance, but still an aggregation-order-dependent
      // chain. Each term is now nano-rounded with the stub's literal
      // floor/ceil half-away expression (bit-identical on both engines:
      // literal weight x integer cents is one IEEE multiply), the sums
      // are exact integers in ANY order, and the level is ONE division
      // of those integers — the nano scale cancels.
      .withColumn("twc_nano", expr(GridRound.halfAwayUnits("w * c_j", "1e9")))
      .withColumn("w_nano", expr(GridRound.floorUnits("w", "1e9"))) // weights are >= 0
      .groupBy("user_id", "day", "cents")
      .agg(sum(col("twc_nano")).as("swc_n"), sum(col("w_nano")).as("sw_n"))
      .withColumn("level", col("swc_n").cast("double") / col("sw_n").cast("double"))
      // forecast/err derive from the 6-dp-ROUNDED level: at cents
      // magnitude ~1e4 the unrounded sums' order noise (~1e-7) exceeds
      // the 6-dp rounding granularity, so the MAE is accumulated in
      // EXACT INTEGER micro-units of the rounded err — order-independent
      // by construction (measured: avg(abs(err)) flipped 6760.129050 vs
      // .129051 for one user before this)
      .withColumn("forecast", lag(Norm.rnd(col("level"), 6), 1).over(wSeq))
      .withColumn("err", col("cents") - col("forecast"))
      .withColumn("err_micro", expr("CAST(round(abs(err) * 1000000.0) AS BIGINT)"))
      // mae published straight from the exact integer micro sum with the
      // literal floor(x + 0.5) micro-grid round — NOT round(x, 6), whose
      // decimal-vs-binary tie semantics differ across engines exactly at
      // .5 boundaries (the nano-level conversion above surfaced one:
      // sum/cnt landed on a 6-dp half for one sf0.1 user). floor of a
      // bit-identical ratio is bit-identical everywhere; /1e6 is one
      // more identical IEEE op.
      .withColumn(
        "mae",
        expr(
          "floor(CAST(sum(err_micro) OVER (PARTITION BY user_id) AS DOUBLE) / " +
            "count(err_micro) OVER (PARTITION BY user_id) + 0.5) / 1000000.0"
        )
      )
      .select(
        col("user_id"),
        col("day"),
        col("cents"),
        Norm.rnd(col("level"), 6).as("level"),
        Norm.rnd(col("forecast"), 6).as("forecast"),
        Norm.rnd(col("err"), 6).as("err"),
        (col("mae") + lit(0.0)).as("mae") // zero-sign normalization only
      )
      .transform(Norm.ordered(_, col("user_id"), col("day")))
  }

  private val sesForecastSql: String =
    s"""WITH daily AS (
       |  SELECT user_id, epoch_us(ts) // $DayUs AS day,
       |         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2
       |), kern AS (
       |  SELECT a.user_id AS user_id, a.day AS day, a.cents AS cents,
       |         a.day - b.day AS dd, b.cents AS c_j
       |  FROM daily a JOIN daily b
       |    ON a.user_id = b.user_id
       |   AND b.day > a.day - $SesWindow AND b.day <= a.day
       |), lvl AS (
       |  -- per-term nano-rounded, order-free level (see the Spark twin;
       |  -- grid strings single-sourced via GridRound)
       |  SELECT user_id, day, cents,
       |         CAST(sum(${GridRound.halfAwayUnits(s"$sesWeightCase * c_j", "1e9")}) AS DOUBLE)
       |         / CAST(sum(${GridRound.floorUnits(sesWeightCase, "1e9")}) AS DOUBLE) AS level
       |  FROM kern GROUP BY 1, 2, 3
       |), fc AS (
       |  SELECT *, lag(round(level, 6) + 0.0) OVER (PARTITION BY user_id ORDER BY day) AS forecast
       |  FROM lvl
       |), er AS (
       |  SELECT *, cents - forecast AS err,
       |    CAST(round(abs(cents - forecast) * 1000000.0) AS BIGINT) AS err_micro
       |  FROM fc
       |)
       |SELECT user_id, day, cents,
       |  round(level, 6) + 0.0 AS level,
       |  round(forecast, 6) + 0.0 AS forecast,
       |  round(err, 6) + 0.0 AS err,
       |  floor(CAST(CAST(sum(err_micro) OVER (PARTITION BY user_id) AS BIGINT) AS DOUBLE) /
       |        count(err_micro) OVER (PARTITION BY user_id) + 0.5) / 1000000.0 + 0.0 AS mae
       |FROM er ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // evt_mad_outliers — robust point-outlier detection via the modified
  // z-score (Iglewicz & Hoaglin 1993): 0.6745·(x − median)/MAD with the
  // |z| > 3.5 flag. Complements the family: CUSUM finds level SHIFTS,
  // Theil–Sen robust TRENDS, this flags individual points. Both the
  // median and the MAD are EXACT order statistics (rank windows over
  // integer cents; the middle-two average is exactly representable at
  // .5 granularity, and deviations inherit it), so every comparison —
  // including the boolean flag — is over engine-identical doubles with
  // no rounding convention needed anywhere except the cosmetic output.
  // -------------------------------------------------------------------
  private val MadC = 0.6745
  private val MadCut = 3.5

  private def madOutliers(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .withColumn("cents", round(col("value") * 100.0).cast("long"))
      .groupBy(col("user_id"), expr(s"tus div $DayUs").as("day"))
      .agg(sum(col("cents")).as("cents"))
      .localCheckpoint() // feeds the median rank, the MAD rank, and the output join
    def medianOf(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val wR = Window.partitionBy("user_id").orderBy(col(valueCol).asc, col("day").asc)
      val wU = Window.partitionBy("user_id")
      df.withColumn("rn", row_number().over(wR).cast("long"))
        .withColumn("n", count(lit(1)).over(wU))
        .filter(col("rn") >= expr("(n + 1) div 2") && col("rn") <= expr("(n + 2) div 2"))
        .groupBy("user_id")
        .agg(avg(col(valueCol)).as(out))
    }
    val med = medianOf(daily, "cents", "med")
    val dev = daily
      .join(med, "user_id")
      .withColumn("dev", abs(col("cents") - col("med")))
    val mad = medianOf(dev, "dev", "mad")
    dev
      .join(mad, "user_id")
      .withColumn(
        "z",
        when(col("mad") === 0.0, 0.0)
          .otherwise(lit(MadC) * (col("cents") - col("med")) / col("mad"))
      )
      .select(
        col("user_id"),
        col("day"),
        col("cents"),
        col("med"),
        col("mad"),
        // z is UNROUNDED by design: every operand is exact (integer cents,
        // .5-granular medians) and the op order matches the oracle, so the
        // doubles are bit-identical — while ROUNDING actually diverges
        // here: z values are often terminating decimals (0.6745·int/half)
        // and Spark's round() rounds the shortest DECIMAL repr (HALF_UP on
        // "0.5227375" → .522738) where DuckDB rounds the BINARY value
        // (...749999 → .522737). Measured on user 65 day 19750.
        col("z"),
        (abs(col("z")) > MadCut).as("outlier")
      )
      .transform(Norm.ordered(_, col("user_id"), col("day")))
  }

  private val madOutliersSql: String =
    s"""WITH daily AS (
       |  SELECT user_id, epoch_us(ts) // $DayUs AS day,
       |         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2
       |), medr AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY user_id ORDER BY cents, day) AS BIGINT) AS rn,
       |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
       |  FROM daily
       |), med AS (
       |  SELECT user_id, avg(cents) AS med FROM medr
       |  WHERE rn >= (n + 1) // 2 AND rn <= (n + 2) // 2 GROUP BY 1
       |), dev AS (
       |  SELECT d.user_id, d.day, d.cents, m.med, abs(d.cents - m.med) AS dev
       |  FROM daily d JOIN med m ON d.user_id = m.user_id
       |), madr AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY user_id ORDER BY dev, day) AS BIGINT) AS rn,
       |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
       |  FROM dev
       |), mad AS (
       |  SELECT user_id, avg(dev) AS mad FROM madr
       |  WHERE rn >= (n + 1) // 2 AND rn <= (n + 2) // 2 GROUP BY 1
       |), z AS (
       |  SELECT d.user_id, d.day, d.cents, d.med, m.mad,
       |         CASE WHEN m.mad = 0.0 THEN 0.0
       |              ELSE $MadC * (d.cents - d.med) / m.mad END AS z
       |  FROM dev d JOIN mad m ON d.user_id = m.user_id
       |)
       |SELECT user_id, day, cents, med, mad,
       |  z + 0.0 AS z,
       |  (abs(z) > $MadCut) AS outlier
       |FROM z ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // evt_acf — sample autocorrelation function of the DAILY EVENT-COUNT
  // series at lags 1..AcfMaxLag, over the gap-filled (contiguous,
  // missing days = 0) day spine. The estimator is the standard
  // cross-product form r_k = Σ_{t<=n−k}(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²
  // expanded into INTEGER co-moments (multiply num and den by n²):
  //   r_k = (n²·C_k − n·S·(H_k+T_k) + (n−k)·S²) / (n·(n·Q − S²))
  // with C_k = Σ x_t·x_{t+k}, H_k/T_k the head/tail partial sums,
  // S = Σx, Q = Σx² — all int64 (counts ~1e5/day at 100× bench data
  // keep n²·Q < 1e16), ONE double division at the end (memory trap:
  // engine-native corr/regr aggregates and mean-centered double sums
  // both flip 6-dp boundaries; exact integer co-moments don't). The
  // day spine is aggregated-small by construction (days, not events),
  // so the single-partition window is bounded at any corpus size; the
  // Spark side pairs lags with ONE window pass (AcfMaxLag lead columns
  // + stack), the oracle with a day+k self-join on the same spine.
  // -------------------------------------------------------------------
  private val AcfMaxLag = 10

  /** Gap-filled (contiguous, missing days = 0) daily event-count spine,
    * CHECKPOINTED — the single input relation the ACF/PACF/AR family
    * shares (it feeds base moments, the lead window, and the AR tail).
    */
  private def dailySpine(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .groupBy(expr(s"tus div $DayUs").as("day"))
      .agg(count(lit(1)).as("x"))
    daily
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
      .localCheckpoint()
  }

  /** UNROUNDED sample autocorrelations (lag, n_pairs, r) at lags
    * 1..maxLag over a [[dailySpine]] relation — the ONE definition of
    * the integer-co-moment estimator that evt_acf rounds and
    * evt_pacf / evt_ar_forecast fold over (r is a single double
    * division of exact int64s, bit-identical across engines).
    */
  private def acfRawFrom(full: DataFrame, maxLag: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = full.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("s"),
      sum(col("x") * col("x")).as("q")
    )
    val w = Window.orderBy("day")
    val leads = (1 to maxLag).foldLeft(full) { (df, k) =>
      df.withColumn(s"l$k", lead(col("x"), k).over(w))
    }
    leads
      .select(expr(s"stack($maxLag, ${(1 to maxLag).map(k => s"${k}L, x, l$k").mkString(", ")}) AS (lag, x, xl)"))
      .filter(col("xl").isNotNull)
      .groupBy("lag")
      .agg(
        sum(col("x") * col("xl")).as("c"),
        sum(col("x")).as("h"),
        sum(col("xl")).as("t")
      )
      .crossJoin(broadcast(base))
      .select(
        col("lag"),
        (col("n") - col("lag")).as("n_pairs"),
        ((col("n") * col("n") * col("c") - col("n") * col("s") * (col("h") + col("t")) +
          (col("n") - col("lag")) * col("s") * col("s")).cast("double") /
          (col("n") * (col("n") * col("q") - col("s") * col("s"))).cast("double")).as("r")
      )
  }

  private def acf(s: SparkSession, dir: String): DataFrame =
    acfRawFrom(dailySpine(s, dir), AcfMaxLag)
      .select(col("lag"), col("n_pairs"), (round(col("r"), 6) + 0.0).as("r"))
      .transform(Norm.ordered(_, col("lag")))

  /** SQL twin of [[dailySpine]] + [[acfRawFrom]]: CTE chain ending at
    * `rrel` (lag, n_pairs, r UNROUNDED) and `base` (n, s, q).
    */
  private def acfCtesSql(maxLag: Int): String =
    s"""daily AS (
       |  SELECT epoch_us(ts) // $DayUs AS day, CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1
       |), spine AS (
       |  SELECT unnest(generate_series((SELECT min(day) FROM daily),
       |                                (SELECT max(day) FROM daily))) AS day
       |), f AS (
       |  SELECT s.day, COALESCE(d.x, 0) AS x FROM spine s LEFT JOIN daily d ON s.day = d.day
       |), base AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
       |         CAST(sum(x * x) AS BIGINT) AS q
       |  FROM f
       |), ks AS (SELECT unnest(generate_series(1, $maxLag)) AS lag
       |), pairs_k AS (
       |  SELECT k.lag, a.x AS x, b.x AS xl
       |  FROM f a JOIN ks k ON true JOIN f b ON b.day = a.day + k.lag
       |), agg AS (
       |  SELECT CAST(lag AS BIGINT) AS lag, CAST(sum(x * xl) AS BIGINT) AS c,
       |         CAST(sum(x) AS BIGINT) AS h, CAST(sum(xl) AS BIGINT) AS t
       |  FROM pairs_k GROUP BY 1
       |), rrel AS (
       |  SELECT a.lag, b.n - a.lag AS n_pairs,
       |         CAST(b.n * b.n * a.c - b.n * b.s * (a.h + a.t) + (b.n - a.lag) * b.s * b.s AS DOUBLE)
       |           / CAST(b.n * (b.n * b.q - b.s * b.s) AS DOUBLE) AS r
       |  FROM agg a CROSS JOIN base b
       |)""".stripMargin

  private val acfSql: String =
    s"""WITH ${acfCtesSql(AcfMaxLag)}
       |SELECT lag, n_pairs, round(r, 6) + 0.0 AS r FROM rrel ORDER BY lag""".stripMargin

  /** Durbin–Levinson fold over an `rs` array column at lags 1..maxLag
    * (Spark SQL text): accumulator = [φ-row | pacf-prefix] halves; the
    * ONE definition evt_pacf and evt_ar_forecast share.
    */
  private def dlFoldSpark(maxLag: Int): String = {
    val m = "(size(acc) div 2)"
    val num =
      s"(element_at(rs, CAST(k AS INT)) - aggregate(sequence(1, $m), CAST(0.0 AS DOUBLE), (s2, i) -> s2 + element_at(acc, CAST(i AS INT)) * element_at(rs, CAST(k - i AS INT))))"
    val den =
      s"(CAST(1.0 AS DOUBLE) - aggregate(sequence(1, $m), CAST(0.0 AS DOUBLE), (s2, i) -> s2 + element_at(acc, CAST(i AS INT)) * element_at(rs, CAST(i AS INT))))"
    val a = s"($num / $den)"
    val newPhis =
      s"concat(transform(sequence(1, $m), j -> element_at(acc, CAST(j AS INT)) - $a * element_at(acc, CAST(k - j AS INT))), array($a))"
    val newPacfs = s"concat(slice(acc, $m + 1, $m), array($a))"
    s"aggregate(sequence(2, $maxLag), array(element_at(rs, 1), element_at(rs, 1)), (acc, k) -> concat($newPhis, $newPacfs))"
  }

  /** DuckDB twin of [[dlFoldSpark]] — list state (struct state measurably
    * type-contaminates inside list_reduce), e0 double literals.
    */
  private def dlFoldDuck(maxLag: Int): String = {
    val kI = "CAST(e[1] AS BIGINT)"
    val m = "(len(acc) // 2)"
    val num =
      s"(rs[$kI] - list_reduce(list_prepend(0.0e0, list_transform(generate_series(1, $m), i -> acc[i] * rs[$kI - i])), (s2, v) -> s2 + v))"
    val den =
      s"(1.0e0 - list_reduce(list_prepend(0.0e0, list_transform(generate_series(1, $m), i -> acc[i] * rs[i])), (s2, v) -> s2 + v))"
    val a = s"($num / $den)"
    val newPhis =
      s"list_concat(list_transform(generate_series(1, $m), j -> acc[j] - $a * acc[$kI - j]), [$a])"
    val newPacfs = s"list_concat(acc[$m + 1 : 2 * $m], [$a])"
    s"""list_reduce(
       |      list_prepend([rs[1], rs[1]],
       |                   list_transform(generate_series(2, $maxLag), kk -> [CAST(kk AS DOUBLE)])),
       |      (acc, e) -> list_concat($newPhis, $newPacfs))""".stripMargin
  }

  // -------------------------------------------------------------------
  // evt_survival — Kaplan–Meier risk table over USER LIFETIMES (hours
  // from first to last observed event; hour granularity gives the
  // corpus a proper lifetime distribution where days collapse to 3
  // buckets). A user whose last event falls within SurvCensorHours of
  // the corpus max hour is right-CENSORED (they may still be active);
  // otherwise their lifetime ends in a "death" (churn). For each
  // lifetime hour t the table reports the at-risk count
  // (lifetime >= t), deaths and censorings AT t, and the
  // conditional survival (n_risk − d)/n_risk — integer counts plus one
  // double division per row; the cumulative KM product is deliberately
  // NOT emitted (a product of ratios is exp/ln territory — libm-
  // dependent, the known cross-engine trap). The at-risk count is a
  // reverse cumulative sum over the tiny per-lifetime-day histogram,
  // never over users — at 100 TB the windowed relation stays bounded
  // by the observation span.
  // -------------------------------------------------------------------
  private val SurvCensorHours = 24

  private def survival(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = ev(s, dir)
      .withColumn("hr", expr(s"tus div $HourUs"))
      .groupBy("user_id")
      .agg(min(col("hr")).as("d_first"), max(col("hr")).as("d_last"))
    val maxDay = spans.agg(max("d_last").as("d_max"))
    val marked = spans
      .crossJoin(broadcast(maxDay))
      .select(
        (col("d_last") - col("d_first")).as("lifetime"),
        (col("d_max") - col("d_last") < SurvCensorHours).as("censored")
      )
    val byT = marked
      .groupBy(col("lifetime").as("t"))
      .agg(
        count(lit(1)).as("ending"),
        sum(when(col("censored"), 0L).otherwise(1L)).as("d"),
        sum(when(col("censored"), 1L).otherwise(0L)).as("c")
      )
    val w = Window.orderBy(col("t").desc).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk", sum(col("ending")).over(w))
      .select(
        col("t"),
        col("n_risk"),
        col("d").as("n_events"),
        col("c").as("n_censored"),
        (round((col("n_risk") - col("d")).cast("double") / col("n_risk").cast("double"), 6) + 0.0)
          .as("cond_surv")
      )
      .transform(Norm.ordered(_, col("t")))
  }

  private val survivalSql: String =
    s"""WITH spans AS (
       |  SELECT user_id,
       |         CAST(min(epoch_us(ts) // $HourUs) AS BIGINT) AS d_first,
       |         CAST(max(epoch_us(ts) // $HourUs) AS BIGINT) AS d_last
       |  FROM events GROUP BY 1
       |), marked AS (
       |  SELECT d_last - d_first AS lifetime,
       |         (SELECT max(d_last) FROM spans) - d_last < $SurvCensorHours AS censored
       |  FROM spans
       |), by_t AS (
       |  SELECT lifetime AS t, CAST(count(*) AS BIGINT) AS ending,
       |         CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS d,
       |         CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT) AS c
       |  FROM marked GROUP BY 1
       |)
       |SELECT t,
       |       CAST(sum(ending) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk,
       |       d AS n_events, c AS n_censored,
       |       round(CAST(sum(ending) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - d AS DOUBLE)
       |             / CAST(sum(ending) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) + 0.0 AS cond_surv
       |FROM by_t
       |ORDER BY t""".stripMargin

  // -------------------------------------------------------------------
  // evt_periodogram — discrete Fourier power spectrum of the DAILY
  // EVENT-COUNT series (seasonality detector — the frequency-domain
  // complement of evt_acf/evt_seasonal_decompose): for each integer
  // frequency f in 1..n/2 over the gap-filled day spine,
  // re = Σ x_t·cos(2πft/n), im = −Σ x_t·sin(2πft/n),
  // power_frac = (re² + im²)/(n·Σx²) — the spectrum NORMALIZED by total
  // energy. The same deterministic O(n²) join-aggregate DFT as
  // [[graft.ccm.FftSurrogate]] (whose oracle established that
  // engine-native cos/sin/sqrt agree bit-for-bit on these inputs); n is
  // the DAY COUNT, so the quadratic term and the single-partition spine
  // stay bounded at any corpus size. f = 0 (the DC bin — just the
  // series sum) is excluded: for f >= 1 the non-demeaned and demeaned
  // spectra coincide mathematically, so no double-valued mean ever
  // enters the sums. Normalization is load-bearing for parity, not
  // cosmetics: RAW power grows like (Σx)² and a 6-dp ABSOLUTE round of
  // a ~1e10 value sits below aggregation-order noise at sf0.1 — the
  // energy fraction is O(1) with ~1e-14 relative noise at any corpus
  // size, so the 6-dp gate is deterministic everywhere.
  // -------------------------------------------------------------------
  private def periodogram(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .groupBy(expr(s"tus div $DayUs").as("day"))
      .agg(count(lit(1)).as("x"))
    val spine = daily
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("d0"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select((col("day") - col("d0")).as("t"), coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint() // feeds the frequency grid AND the DFT join
    val n = spine.agg(count(lit(1)).as("n"), sum(col("x") * col("x")).as("q"))
    val freqs = spine
      .crossJoin(broadcast(n))
      .select(col("t").as("f"), col("n"), col("q"))
      .filter(col("f") >= 1 && col("f") * 2 <= col("n"))
    val angle = lit(FftSurrogate.TwoPi) * (col("f") * col("t")) / col("n")
    freqs
      .crossJoin(spine.select(col("t"), col("x")))
      .groupBy(col("f"), col("n"), col("q"))
      .agg(
        sum(col("x") * cos(angle)).as("re"),
        sum(-col("x") * sin(angle)).as("im")
      )
      .select(
        col("f"),
        col("n"),
        (round((col("re") * col("re") + col("im") * col("im")) / col("n") / col("q"), 6) + 0.0)
          .as("power_frac")
      )
      .transform(Norm.ordered(_, col("f")))
  }

  private val periodogramSql: String =
    s"""WITH daily AS (
       |  SELECT epoch_us(ts) // $DayUs AS day, CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1
       |), spine AS (
       |  SELECT s.day - (SELECT min(day) FROM daily) AS t, COALESCE(d.x, 0) AS x
       |  FROM (SELECT unnest(generate_series((SELECT min(day) FROM daily),
       |                                      (SELECT max(day) FROM daily))) AS day) s
       |  LEFT JOIN daily d ON s.day = d.day
       |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x * x) AS BIGINT) AS q FROM spine),
       |freqs AS (
       |  SELECT t AS f, n, q FROM spine CROSS JOIN nn WHERE t >= 1 AND t * 2 <= n
       |)
       |SELECT f.f, f.n,
       |       round((sum(p.x * cos(${FftSurrogate.TwoPi} * (f.f * p.t) / f.n)) *
       |              sum(p.x * cos(${FftSurrogate.TwoPi} * (f.f * p.t) / f.n)) +
       |              sum(-p.x * sin(${FftSurrogate.TwoPi} * (f.f * p.t) / f.n)) *
       |              sum(-p.x * sin(${FftSurrogate.TwoPi} * (f.f * p.t) / f.n))) / f.n / f.q, 6) + 0.0 AS power_frac
       |FROM freqs f CROSS JOIN spine p
       |GROUP BY f.f, f.n, f.q
       |ORDER BY f.f""".stripMargin

  // -------------------------------------------------------------------
  // evt_pacf — PARTIAL autocorrelation function at lags 1..AcfMaxLag via
  // the Durbin–Levinson recursion — the ACF's companion that isolates
  // each lag's DIRECT effect (the AR-order selection tool: PACF cuts off
  // at the true order where ACF only decays). Inputs are evt_acf's
  // UNROUNDED autocorrelations (one double division of exact int64
  // co-moments — bit-identical across engines), and the recursion runs
  // as a declarative HOF fold (the evt_holt technique, nested one level
  // deeper): the accumulator list carries [φ_{k,1..k} | pacf_{1..k}],
  // each step computes φ_{k,k} = (r_k − Σφ_{k−1,j}·r_{k−j}) /
  // (1 − Σφ_{k−1,j}·r_j) with the inner sums as nested left-folds, so
  // every intermediate is sequential identical arithmetic in both
  // engines and the output ships UNROUNDED. DuckDB carries the fold
  // elements as 1-element double lists (the measured struct-in-fold
  // type-contamination bug; list state is exact).
  // -------------------------------------------------------------------
  private def pacf(s: SparkSession, dir: String): DataFrame = {
    val rs = acfRawFrom(dailySpine(s, dir), AcfMaxLag)
      .agg(expr("transform(array_sort(collect_list(struct(lag, r))), p -> p.r)").as("rs"))
    rs
      .withColumn("pa", expr(s"slice(${dlFoldSpark(AcfMaxLag)}, $AcfMaxLag + 1, $AcfMaxLag)"))
      .select(posexplode(col("pa")).as(Seq("p0", "pacf")))
      .select((col("p0") + 1).cast("long").as("lag"), (col("pacf") + 0.0).as("pacf"))
      .transform(Norm.ordered(_, col("lag")))
  }

  private val pacfSql: String =
    s"""WITH ${acfCtesSql(AcfMaxLag)},
       |rarr AS (SELECT list(r ORDER BY lag) AS rs FROM rrel),
       |fin AS (
       |  SELECT (${dlFoldDuck(AcfMaxLag)})[$AcfMaxLag + 1 : 2 * $AcfMaxLag] AS pa FROM rarr
       |)
       |SELECT CAST(t.i AS BIGINT) AS lag, pa[CAST(t.i AS INTEGER)] + 0.0 AS pacf
       |FROM fin CROSS JOIN range(1, ${AcfMaxLag + 1}) t(i)
       |ORDER BY lag""".stripMargin

  // -------------------------------------------------------------------
  // evt_ar_forecast — AR(p) fit + one-step forecast of the daily count
  // series, completing the Box–Jenkins triple (evt_acf diagnoses, the
  // Durbin–Levinson fold of evt_pacf SOLVES — its φ row at step p IS
  // the Yule–Walker AR(p) coefficient vector): x̂_{n+1} = x̄ +
  // Σ φ_j·(x_{n+1−j} − x̄). Same unrounded integer-co-moment ACF
  // inputs, same list-state fold truncated at ArOrder; the mean enters
  // as ONE double division of exact int64s, so the whole chain stays
  // bit-identical and ships unrounded. Output: one row with the fitted
  // coefficients, the mean, the last observations, and the forecast.
  // -------------------------------------------------------------------
  private val ArOrder = 3

  private def arForecast(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val full = dailySpine(s, dir)
    val base = full.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val rs = acfRawFrom(full, ArOrder)
      .agg(expr("transform(array_sort(collect_list(struct(lag, r))), p -> p.r)").as("rs"))
    val tail = full
      .withColumn("rn", row_number().over(Window.orderBy(col("day").desc)).cast("long"))
      .filter(col("rn") <= ArOrder)
      .agg(expr("transform(array_sort(collect_list(struct(rn, x))), p -> CAST(p.x AS DOUBLE))").as("xt"))
    // xt[j] = x_{n+1-j} (rn ascending = most recent first)
    rs.crossJoin(broadcast(base))
      .crossJoin(broadcast(tail))
      .withColumn("phis", expr(s"slice(${dlFoldSpark(ArOrder)}, 1, $ArOrder)"))
      .withColumn("mu", col("s").cast("double") / col("n").cast("double"))
      .withColumn(
        "forecast",
        expr(s"mu + aggregate(sequence(1, $ArOrder), CAST(0.0 AS DOUBLE), (s2, j) -> s2 + element_at(phis, CAST(j AS INT)) * (element_at(xt, CAST(j AS INT)) - mu))")
      )
      .select(
        col("n").as("n_days"),
        (element_at(col("phis"), 1) + 0.0).as("phi_1"),
        (element_at(col("phis"), 2) + 0.0).as("phi_2"),
        (element_at(col("phis"), 3) + 0.0).as("phi_3"),
        (col("mu") + 0.0).as("mean_x"),
        (element_at(col("xt"), 1) + 0.0).as("x_last"),
        (col("forecast") + 0.0).as("forecast")
      )
  }

  private val arForecastSql: String =
    s"""WITH ${acfCtesSql(ArOrder)},
       |rarr AS (SELECT list(r ORDER BY lag) AS rs FROM rrel),
       |tail_ AS (
       |  SELECT list(CAST(x AS DOUBLE) ORDER BY day DESC)[1 : $ArOrder] AS xt FROM f
       |),
       |fit AS (
       |  SELECT (${dlFoldDuck(ArOrder)})[1 : $ArOrder] AS phis, rs FROM rarr
       |)
       |SELECT b.n AS n_days,
       |       fit.phis[1] + 0.0 AS phi_1, fit.phis[2] + 0.0 AS phi_2, fit.phis[3] + 0.0 AS phi_3,
       |       CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) + 0.0 AS mean_x,
       |       t.xt[1] + 0.0 AS x_last,
       |       CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)
       |       + list_reduce(list_prepend(0.0e0, list_transform(generate_series(1, $ArOrder),
       |           j -> fit.phis[j] * (t.xt[j] - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)))),
       |           (s2, v) -> s2 + v) + 0.0 AS forecast
       |FROM fit CROSS JOIN base b CROSS JOIN tail_ t""".stripMargin

  // -------------------------------------------------------------------
  // evt_stl_anomaly — SEASONALLY-ADJUSTED anomaly detection: the
  // modified-z outlier flag (evt_mad_outliers) applied to the seasonal
  // decomposition's RESIDUALS instead of raw values — a Monday spike
  // that is merely "every Monday" stops alarming, and a mid-week value
  // ordinary in magnitude but wrong FOR ITS SEASON starts. Composes the
  // engine's own layers: [[seasonalResid]]'s 6-dp-rounded residuals
  // (engine-identical doubles — exact order statistics over them are
  // deterministic), per-user median/MAD rank windows, and the
  // Iglewicz–Hoaglin z with the unrounded-z contract.
  // -------------------------------------------------------------------
  private def stlAnomaly(s: SparkSession, dir: String): DataFrame = {
    val resid = seasonalResid(s, dir)
      .filter(col("resid").isNotNull)
      .select("user_id", "day", "resid")
      .localCheckpoint() // median rank, MAD rank, and the output join
    def medianOf(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val wR = Window.partitionBy("user_id").orderBy(col(valueCol).asc, col("day").asc)
      val wU = Window.partitionBy("user_id")
      df.withColumn("rn", row_number().over(wR).cast("long"))
        .withColumn("n", count(lit(1)).over(wU))
        .filter(col("rn") >= expr("(n + 1) div 2") && col("rn") <= expr("(n + 2) div 2"))
        .groupBy("user_id")
        .agg(avg(col(valueCol)).as(out))
    }
    val med = medianOf(resid, "resid", "med")
    val dev = resid
      .join(med, "user_id")
      .withColumn("dev", abs(col("resid") - col("med")))
    val mad = medianOf(dev, "dev", "mad")
    dev
      .join(mad, "user_id")
      .withColumn(
        "z",
        when(col("mad") === 0.0, 0.0)
          .otherwise(lit(MadC) * (col("resid") - col("med")) / col("mad"))
      )
      .select(
        col("user_id"),
        col("day"),
        col("resid"),
        // med/mad/z UNROUNDED (the evt_mad_outliers contract): every
        // operand is an engine-identical double, while a round here is
        // where the engines' HALF_UP semantics split
        (col("med") + 0.0).as("med"),
        (col("mad") + 0.0).as("mad"),
        (col("z") + 0.0).as("z"),
        (abs(col("z")) > MadCut).as("anomaly")
      )
      .transform(Norm.ordered(_, col("user_id"), col("day")))
  }

  private val stlAnomalySql: String =
    s"""WITH daily AS (
       |  SELECT user_id, epoch_us(ts) // $DayUs AS day,
       |         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2
       |), ma AS (
       |  SELECT *, day % $SeasonPeriod AS dow,
       |    CAST(count(*) OVER w AS BIGINT) AS w_cnt,
       |    CAST(sum(cents) OVER w AS BIGINT) AS w_sum
       |  FROM daily
       |  WINDOW w AS (PARTITION BY user_id ORDER BY day
       |               RANGE BETWEEN ${SeasonPeriod / 2} PRECEDING AND ${SeasonPeriod / 2} FOLLOWING)
       |), det AS (
       |  SELECT *,
       |    CASE WHEN w_cnt = $SeasonPeriod THEN CAST(w_sum AS DOUBLE) / $SeasonPeriod END AS trend
       |  FROM ma
       |), seas AS (
       |  SELECT *, avg(cents - trend) OVER (PARTITION BY user_id, dow) AS s_raw
       |  FROM det
       |), cent AS (
       |  SELECT *, avg(s_raw) OVER (PARTITION BY user_id) AS s_mean FROM seas
       |), resid AS (
       |  SELECT user_id, day,
       |         round(cents - trend - (s_raw - s_mean), 6) + 0.0 AS resid
       |  FROM cent
       |  WHERE trend IS NOT NULL
       |), medr AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY user_id ORDER BY resid, day) AS BIGINT) AS rn,
       |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
       |  FROM resid
       |), med AS (
       |  SELECT user_id, avg(resid) AS med FROM medr
       |  WHERE rn >= (n + 1) // 2 AND rn <= (n + 2) // 2 GROUP BY 1
       |), dev AS (
       |  SELECT r.user_id, r.day, r.resid, m.med, abs(r.resid - m.med) AS dev
       |  FROM resid r JOIN med m ON r.user_id = m.user_id
       |), madr AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY user_id ORDER BY dev, day) AS BIGINT) AS rn,
       |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
       |  FROM dev
       |), mad AS (
       |  SELECT user_id, avg(dev) AS mad FROM madr
       |  WHERE rn >= (n + 1) // 2 AND rn <= (n + 2) // 2 GROUP BY 1
       |), z AS (
       |  SELECT d.user_id, d.day, d.resid, d.med, m.mad,
       |         CASE WHEN m.mad = 0.0 THEN 0.0
       |              ELSE $MadC * (d.resid - d.med) / m.mad END AS z
       |  FROM dev d JOIN mad m ON d.user_id = m.user_id
       |)
       |SELECT user_id, day, resid, med + 0.0 AS med, mad + 0.0 AS mad, z + 0.0 AS z,
       |       (abs(z) > $MadCut) AS anomaly
       |FROM z ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // evt_benford — Benford's-law first-digit audit of the value column
  // (the classic fabricated-data / instrumentation-bug detector): the
  // distribution of the first significant digit of positive amounts
  // vs the Benford expectation log10(1 + 1/d). The first digit is
  // extracted from the DECIMAL STRING of integer cents (pure string op,
  // no log10/pow on data — libm never touches a data value); the
  // expected probabilities are compile-time Scala literals spliced into
  // ONE shared CASE expression both engines parse (round-trip doubles,
  // parity by construction). Deviation = round(obs/total − p, 6): a
  // double division of exact integers minus a shared literal.
  // -------------------------------------------------------------------
  private val benfordCase: String =
    "CASE digit " +
      (1 to 9).map(d => s"WHEN $d THEN ${math.log10(1.0 + 1.0 / d)}").mkString(" ") +
      " END"

  private def benford(s: SparkSession, dir: String): DataFrame = {
    val digits = ev(s, dir)
      .withColumn("cents", round(col("value") * 100.0).cast("long"))
      .filter(col("cents") > 0)
      .withColumn("digit", substring(col("cents").cast("string"), 1, 1).cast("long"))
    digits
      .groupBy("digit")
      .agg(count(lit(1)).as("observed"))
      .withColumn("total", sum(col("observed")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("benford_p", expr(benfordCase))
      .select(
        col("digit"),
        col("observed"),
        col("total"),
        (round(col("observed").cast("double") / col("total").cast("double"), 6) + 0.0).as("obs_frac"),
        (round(col("benford_p"), 6) + 0.0).as("benford_p"),
        (round(col("observed").cast("double") / col("total").cast("double") - col("benford_p"), 6) + 0.0)
          .as("dev")
      )
      .transform(Norm.ordered(_, col("digit")))
  }

  private val benfordSql: String =
    s"""WITH digits AS (
       |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM (SELECT CAST(round(value * 100.0) AS BIGINT) AS cents FROM events)
       |  WHERE cents > 0
       |), counts AS (
       |  SELECT digit, CAST(count(*) AS BIGINT) AS observed FROM digits GROUP BY 1
       |), t AS (
       |  SELECT digit, observed, CAST(sum(observed) OVER () AS BIGINT) AS total,
       |         $benfordCase AS benford_p
       |  FROM counts
       |)
       |SELECT digit, observed, total,
       |       round(CAST(observed AS DOUBLE) / CAST(total AS DOUBLE), 6) + 0.0 AS obs_frac,
       |       round(benford_p, 6) + 0.0 AS benford_p,
       |       round(CAST(observed AS DOUBLE) / CAST(total AS DOUBLE) - benford_p, 6) + 0.0 AS dev
       |FROM t
       |ORDER BY digit""".stripMargin

  // -------------------------------------------------------------------
  // evt_holt — Holt's linear-trend method (double exponential
  // smoothing) per user over the GAP-FILLED daily-cents series:
  //   l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
  //   b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1},  l_1 = x_1, b_1 = x_2 − x_1
  // — the trend-aware upgrade of evt_ses_forecast's level-only EWMA.
  // The recurrence is GENUINELY sequential (no kernel/window closed
  // form exists, unlike SES), so it runs as a DECLARATIVE ARRAY FOLD:
  // collect each user's ordered series once, then one higher-order
  // `aggregate` lambda carries the (l, b) pair through the fold —
  // whole-stage-codegen'd, no driver loop, no per-row UDF, and the
  // SAME left-to-right sequential arithmetic replays in DuckDB's
  // list_reduce, so every intermediate double is BIT-IDENTICAL and the
  // outputs ship UNROUNDED (+0.0). State per user = the day-spine
  // array (bounded by the observation span, the evt_acf argument); at
  // 100 TB the fold stays partition-local per user after one shuffle.
  // -------------------------------------------------------------------
  private val HoltAlpha = 0.3
  private val HoltBeta = 0.1

  private def holt(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .withColumn("cents", round(col("value") * 100.0).cast("long"))
      .groupBy(col("user_id"), expr(s"tus div $DayUs").as("day"))
      .agg(sum(col("cents")).as("cents"))
    val spine = daily
      .groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"), col("d0"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), coalesce(col("cents"), lit(0L)).cast("double").as("x"))
    val folded = spine
      .groupBy("user_id")
      .agg(expr("array_sort(collect_list(struct(day, x)))").as("sx"))
      .withColumn("xs", expr("transform(sx, p -> p.x)"))
      .filter(size(col("xs")) >= 3)
      .withColumn(
        "st",
        expr(
          s"""aggregate(
             |  slice(xs, 3, size(xs) - 2),
             |  named_struct('l', element_at(xs, 2), 'b', element_at(xs, 2) - element_at(xs, 1)),
             |  (acc, x) -> named_struct(
             |    'l', $HoltAlpha * x + ${1.0 - HoltAlpha} * (acc.l + acc.b),
             |    'b', $HoltBeta * (($HoltAlpha * x + ${1.0 - HoltAlpha} * (acc.l + acc.b)) - acc.l)
             |         + ${1.0 - HoltBeta} * acc.b))""".stripMargin
        )
      )
    folded
      .select(
        col("user_id"),
        size(col("xs")).cast("long").as("n_days"),
        (col("st.l") + 0.0).as("level"),
        (col("st.b") + 0.0).as("trend"),
        (col("st.l") + col("st.b") + 0.0).as("forecast_1"),
        (col("st.l") + lit(7.0) * col("st.b") + 0.0).as("forecast_7")
      )
      .transform(Norm.ordered(_, col("user_id")))
  }

  // Parity note: the DuckDB fold carries state as a 2-element DOUBLE
  // LIST, not a struct — struct_pack inside list_reduce lambdas was
  // MEASURED to contaminate the accumulator type (decimal/float32
  // truncation of every intermediate); with list state + e0 double
  // literals the fold is bit-identical to Spark's named_struct
  // aggregate (verified against a scalar reference recursion).
  private val holtSql: String = {
    val a = HoltAlpha; val b = HoltBeta
    s"""WITH daily AS (
       |  SELECT user_id, epoch_us(ts) // $DayUs AS day,
       |         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2
       |), rng AS (
       |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
       |), days AS (
       |  SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM rng
       |), spine AS (
       |  SELECT dy.user_id, dy.day, CAST(COALESCE(d.cents, 0) AS DOUBLE) AS x
       |  FROM days dy LEFT JOIN daily d ON d.user_id = dy.user_id AND d.day = dy.day
       |), arrs AS (
       |  SELECT user_id, list(x ORDER BY day) AS xs FROM spine GROUP BY 1
       |), ok AS (SELECT * FROM arrs WHERE len(xs) >= 3),
       |folded AS (
       |  SELECT user_id, CAST(len(xs) AS BIGINT) AS n_days,
       |    list_reduce(
       |      list_prepend([xs[2], xs[2] - xs[1]],
       |                   list_transform(xs[3:], v -> [v, 0.0e0])),
       |      (acc, e) -> [
       |        ${a}e0 * e[1] + ${1.0 - a}e0 * (acc[1] + acc[2]),
       |        ${b}e0 * ((${a}e0 * e[1] + ${1.0 - a}e0 * (acc[1] + acc[2])) - acc[1])
       |             + ${1.0 - b}e0 * acc[2]]) AS st
       |  FROM ok
       |)
       |SELECT user_id, n_days,
       |       st[1] + 0.0 AS level, st[2] + 0.0 AS trend,
       |       st[1] + st[2] + 0.0 AS forecast_1,
       |       st[1] + 7.0 * st[2] + 0.0 AS forecast_7
       |FROM folded ORDER BY user_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // evt_hurst — RESCALED-RANGE (R/S) LONG-MEMORY estimate per event
  // type over the gap-filled hourly count series: the Hurst exponent H
  // from the slope of ln(R/S) vs ln(w) across window sizes w ∈ {8, 16,
  // 32, 64} — the long-memory diagnostic beside evt_acf's short-lag
  // view (H ≈ 0.5 = memoryless, > 0.5 = persistent trends: burstiness/
  // self-similarity is the standard traffic-series question). Per
  // non-overlapping window: cumulative deviations are kept EXACT by
  // scaling with w — D_k = w·Σ_{i≤k}x_i − k·S is int64 — so
  // R/S = (maxD − minD)/√(w·Q − S²) is one division of int64-born
  // doubles (zero-variance windows excluded by the exact w·Q = S² test).
  // Per (type, w) the window R/S values are averaged in integer
  // MICRO-UNITS: deterministic floor(x+0.5) half-up (round(DOUBLE) is
  // engine-divergent on shortest-decimal ties — the evt_mad_outliers
  // measurement), exact int64 sum, then an INTEGER half-up mean
  // (2·s+n) div (2·n) — no double round anywhere. The 4-point log-log
  // OLS runs as an ORDERED FOLD over the sorted points (Σ of 4 doubles
  // is aggregation-order-sensitive; a sequential fold is not), with
  // ln(w) replaced by the EXACT dyadic exponent j = log2(w) ∈ {3..6}
  // (hurst = slope_j / ln2, LN2 a spliced literal) and ln(rs) computed
  // by the engine-shared IEEE-only series in ExactLn — round 11
  // measured the libm ln() here hash-red on the driver while matching
  // locally, so libm never touches the hashed path anymore. hurst is
  // published UNROUNDED (+0.0): every operand is engine-identical by
  // construction, while a 6-dp round() is itself a divergence site.
  // Scale shape: the hour rollup is the only data-sized pass;
  // everything after runs on the BOUNDED spine.
  // -------------------------------------------------------------------
  private val HurstWins = Seq(8, 16, 32, 64)

  private def evtHurst(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val hourly = ev(s, dir)
      .groupBy(expr(s"tus div $HourUs").as("hr"), col("event_type"))
      .agg(count(lit(1)).as("x"))
    val types = hourly.select("event_type").distinct()
    val spine = hourly
      .agg(min("hr").as("h0"), max("hr").as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("hr"), col("h0"))
      .crossJoin(types)
      .join(hourly, Seq("hr", "event_type"), "left")
      .select(col("event_type"), (col("hr") - col("h0")).as("t"), coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint()
    val wsizes = HurstWins.toDF("w")
    val chunked = spine
      .crossJoin(broadcast(wsizes))
      .withColumn("chunk", expr("t div w"))
      .withColumn("k", expr("t % w + 1"))
    val wRun = Window
      .partitionBy("event_type", "w", "chunk")
      .orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sums = chunked
      .groupBy("event_type", "w", "chunk")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("x") * col("x")).as("qx"))
    val devs = chunked
      .withColumn("run", sum(col("x")).over(wRun))
      .join(sums, Seq("event_type", "w", "chunk"))
      .filter(col("n") === col("w")) // complete windows only
      .withColumn("d", col("w") * col("run") - col("k") * col("sx"))
      .groupBy("event_type", "w", "chunk", "sx", "qx")
      .agg(max(col("d")).as("maxd"), min(col("d")).as("mind"))
      .filter(col("w") * col("qx") - col("sx") * col("sx") > 0)
      .withColumn(
        "rs_micro",
        expr(
          "CAST(floor(((CAST(maxd - mind AS DOUBLE) / sqrt(CAST(w * qx - sx * sx AS DOUBLE))) * 1000000.0D) + 0.5D) AS BIGINT)"
        )
      )
    val perW = devs
      .groupBy("event_type", "w")
      .agg(count(lit(1)).as("nw"), sum(col("rs_micro")).as("smicro"))
      .withColumn("rs", expr("((2L * smicro + nw) DIV (2L * nw)) / 1000000.0D"))
      .withColumn("j", expr("CASE w WHEN 8 THEN 3.0D WHEN 16 THEN 4.0D WHEN 32 THEN 5.0D ELSE 6.0D END"))
      .withColumn("lrs", expr(ExactLn.spark("rs")))
    perW
      .groupBy("event_type")
      .agg(expr("array_sort(collect_list(struct(w, rs, j, lrs)))").as("pts"))
      .withColumn(
        "mom",
        expr(
          """aggregate(
            |  pts,
            |  named_struct('n', 0.0D, 'sx', 0.0D, 'sy', 0.0D, 'sxy', 0.0D, 'sxx', 0.0D),
            |  (acc, p) -> named_struct(
            |    'n', acc.n + 1.0D,
            |    'sx', acc.sx + p.j,
            |    'sy', acc.sy + p.lrs,
            |    'sxy', acc.sxy + (p.j * p.lrs),
            |    'sxx', acc.sxx + (p.j * p.j)))""".stripMargin
        )
      )
      .select(
        col("event_type"),
        expr("element_at(transform(filter(pts, p -> p.w = 8), p -> p.rs), 1)").as("rs8"),
        expr("element_at(transform(filter(pts, p -> p.w = 16), p -> p.rs), 1)").as("rs16"),
        expr("element_at(transform(filter(pts, p -> p.w = 32), p -> p.rs), 1)").as("rs32"),
        expr("element_at(transform(filter(pts, p -> p.w = 64), p -> p.rs), 1)").as("rs64"),
        expr(
          s"((((mom.n * mom.sxy) - (mom.sx * mom.sy)) / ((mom.n * mom.sxx) - (mom.sx * mom.sx))) / ${ExactLn.Ln2}D) + 0.0D"
        ).as("hurst")
      )
      .transform(Norm.ordered(_, col("event_type")))
  }

  private val evtHurstSql: String = {
    val wlist = HurstWins.mkString(", ")
    s"""WITH hourly AS (
       |  SELECT epoch_us(ts) // $HourUs AS hr, event_type, CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2
       |), b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM hourly),
       |types AS (SELECT DISTINCT event_type FROM hourly),
       |spine AS MATERIALIZED (
       |  SELECT ty.event_type, s.hr - (SELECT h0 FROM b) AS t, COALESCE(h.x, 0) AS x
       |  FROM (SELECT unnest(generate_series((SELECT h0 FROM b), (SELECT h1 FROM b))) AS hr) s
       |  CROSS JOIN types ty
       |  LEFT JOIN hourly h ON h.hr = s.hr AND h.event_type = ty.event_type
       |), chunked AS (
       |  SELECT sp.event_type, ws.w, sp.t // ws.w AS chunk, sp.t % ws.w + 1 AS k, sp.t, sp.x
       |  FROM spine sp CROSS JOIN (SELECT unnest([$wlist]) AS w) ws
       |), runs AS (
       |  SELECT *, sum(x) OVER (PARTITION BY event_type, w, chunk ORDER BY t
       |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
       |  FROM chunked
       |), sums AS (
       |  SELECT event_type, w, chunk, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS qx
       |  FROM chunked GROUP BY 1, 2, 3
       |), devs AS (
       |  SELECT r.event_type, r.w, r.chunk, s.sx, s.qx,
       |         max(r.w * r.run - r.k * s.sx) AS maxd, min(r.w * r.run - r.k * s.sx) AS mind
       |  FROM runs r JOIN sums s ON s.event_type = r.event_type AND s.w = r.w AND s.chunk = r.chunk
       |  WHERE s.n = r.w
       |  GROUP BY 1, 2, 3, 4, 5
       |), rsw AS (
       |  SELECT event_type, w,
       |         CAST(count(*) AS BIGINT) AS nw,
       |         CAST(sum(CAST(floor(((CAST(maxd - mind AS DOUBLE) / sqrt(CAST(w * qx - sx * sx AS DOUBLE))) * 1000000.0e0) + 0.5e0) AS BIGINT)) AS BIGINT) AS smicro
       |  FROM devs WHERE w * qx - sx * sx > 0 GROUP BY 1, 2
       |), rsv AS (
       |  SELECT event_type, w, ((2 * smicro + nw) // (2 * nw)) / 1000000.0e0 AS rs,
       |         CASE w WHEN 8 THEN 3.0e0 WHEN 16 THEN 4.0e0 WHEN 32 THEN 5.0e0 ELSE 6.0e0 END AS j
       |  FROM rsw
       |), rsl AS (
       |  SELECT event_type, w, rs, j, ${ExactLn.duck("rs")} AS lrs FROM rsv
       |), pts AS (
       |  SELECT event_type, list([j, lrs] ORDER BY w) AS pl FROM rsl GROUP BY 1
       |), mom AS (
       |  SELECT event_type, pl,
       |    list_reduce(
       |      list_prepend([0.0e0, 0.0e0, 0.0e0, 0.0e0, 0.0e0],
       |                   list_transform(pl, p -> [p[1], p[2], 0.0e0, 0.0e0, 0.0e0])),
       |      (acc, e) -> [
       |        acc[1] + 1.0e0,
       |        acc[2] + e[1],
       |        acc[3] + e[2],
       |        acc[4] + (e[1] * e[2]),
       |        acc[5] + (e[1] * e[1])]) AS m
       |  FROM pts
       |)
       |SELECT event_type,
       |  (SELECT rs FROM rsl r WHERE r.event_type = mom.event_type AND r.w = 8) AS rs8,
       |  (SELECT rs FROM rsl r WHERE r.event_type = mom.event_type AND r.w = 16) AS rs16,
       |  (SELECT rs FROM rsl r WHERE r.event_type = mom.event_type AND r.w = 32) AS rs32,
       |  (SELECT rs FROM rsl r WHERE r.event_type = mom.event_type AND r.w = 64) AS rs64,
       |  ((((m[1] * m[4]) - (m[2] * m[3])) / ((m[1] * m[5]) - (m[2] * m[2]))) / ${ExactLn.Ln2}e0) + 0.0e0 AS hurst
       |FROM mom ORDER BY event_type""".stripMargin
  }

  // -------------------------------------------------------------------
  // evt_haar — HAAR WAVELET ENERGY-BY-SCALE per event type over the
  // gap-filled hourly count series: the TIME-LOCALIZED counterpart of
  // evt_periodogram's Fourier view (a burst contributes to every
  // Fourier bin but only to the Haar scales near its duration, so the
  // energy-by-scale profile is the burstiness spectrum). Level-ℓ detail
  // d_ℓ(k) = Σ x·sign over block k of 2^ℓ hours with sign = +1 on the
  // first half, −1 on the second — EXACT int64 — and the orthonormal
  // detail energy is Σ d² / 2^ℓ. Every hashed value is a DYADIC
  // RATIONAL (int / 2^ℓ, exactly representable), so the per-type energy
  // sum behind energy_frac is order-independent (dyadic addition in
  // doubles is exact below 2^53) and the whole query needs NO rounding
  // convention, NO libm, NO waiver. Incomplete tail blocks are excluded
  // exactly (cnt = 2^ℓ). Scale: the hour rollup is the only data-sized
  // pass; the transform runs on spine × 9 levels.
  // -------------------------------------------------------------------
  private val HaarMaxLevel = 9

  private def evtHaar(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val hourly = ev(s, dir)
      .groupBy(expr(s"tus div $HourUs").as("hr"), col("event_type"))
      .agg(count(lit(1)).as("x"))
    val spine = hourly
      .agg(min("hr").as("h0"), max("hr").as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("hr"), col("h0"))
      .crossJoin(hourly.select("event_type").distinct())
      .join(hourly, Seq("hr", "event_type"), "left")
      .select(col("event_type"), (col("hr") - col("h0")).as("t"), coalesce(col("x"), lit(0L)).as("x"))
    val levels = broadcast((1 to HaarMaxLevel).map(_.toLong).toDF("lvl"))
    spine
      .crossJoin(levels)
      .groupBy(col("event_type"), col("lvl"), expr("t div shiftleft(1L, CAST(lvl AS INT))").as("blk"))
      .agg(
        sum(expr("x * IF((t div shiftleft(1L, CAST(lvl AS INT) - 1)) % 2 = 0, 1L, -1L)")).as("d"),
        count(lit(1)).as("cnt")
      )
      .filter(col("cnt") === expr("shiftleft(1L, CAST(lvl AS INT))"))
      .groupBy("event_type", "lvl")
      .agg(count(lit(1)).as("n_blocks"), sum(expr("d * d")).as("e_int"))
      .select(
        col("event_type"),
        col("lvl").as("level"),
        col("n_blocks"),
        expr("CAST(e_int AS DOUBLE) / CAST(shiftleft(1L, CAST(lvl AS INT)) AS DOUBLE)").as("energy")
      )
      .withColumn("tot", sum(col("energy")).over(Window.partitionBy("event_type")))
      .select(
        col("event_type"),
        col("level"),
        col("n_blocks"),
        col("energy"),
        expr("CASE WHEN tot = 0.0D THEN 0.0D ELSE energy / tot END").as("energy_frac")
      )
      .transform(Norm.ordered(_, col("event_type"), col("level")))
  }

  private val evtHaarSql: String =
    s"""WITH hourly AS (
       |  SELECT epoch_us(ts) // $HourUs AS hr, event_type, CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2
       |), b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM hourly),
       |types AS (SELECT DISTINCT event_type FROM hourly),
       |spine AS MATERIALIZED (
       |  SELECT ty.event_type, s.hr - (SELECT h0 FROM b) AS t, COALESCE(h.x, 0) AS x
       |  FROM (SELECT unnest(generate_series((SELECT h0 FROM b), (SELECT h1 FROM b))) AS hr) s
       |  CROSS JOIN types ty
       |  LEFT JOIN hourly h ON h.hr = s.hr AND h.event_type = ty.event_type
       |), lv AS (SELECT CAST(unnest(generate_series(1, $HaarMaxLevel)) AS BIGINT) AS lvl),
       |dd AS (
       |  SELECT event_type, lvl, t // (1 << lvl) AS blk,
       |         CAST(sum(x * (CASE WHEN (t // (1 << (lvl - 1))) % 2 = 0 THEN 1 ELSE -1 END)) AS BIGINT) AS d,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM spine CROSS JOIN lv GROUP BY 1, 2, 3
       |), en AS (
       |  SELECT event_type, lvl AS level, CAST(count(*) AS BIGINT) AS n_blocks,
       |         CAST(sum(d * d) AS BIGINT) AS e_int
       |  FROM dd WHERE cnt = (1 << lvl) GROUP BY 1, 2
       |), fin AS (
       |  SELECT event_type, level, n_blocks,
       |         CAST(e_int AS DOUBLE) / CAST((1 << level) AS DOUBLE) AS energy
       |  FROM en
       |)
       |SELECT event_type, level, n_blocks, energy,
       |  CASE WHEN sum(energy) OVER (PARTITION BY event_type) = 0.0e0 THEN 0.0e0
       |       ELSE energy / sum(energy) OVER (PARTITION BY event_type) END AS energy_frac
       |FROM fin ORDER BY event_type, level""".stripMargin

  // -------------------------------------------------------------------
  // evt_discord — the FULL MATRIX-PROFILE sweep evt_motif is one column
  // of: for EVERY window of every type's hourly series, the nearest
  // OTHER window's NCC (exclusion zone |t−s| >= m, the standard
  // trivial-match guard), and the top-3 DISCORDS per type — the windows
  // whose best match is worst, i.e. the hours that look like nothing
  // else in the series (anomaly detection by similarity, not by
  // threshold). The all-pairs dot products use the DIAGONAL trick: for
  // a pair (t, s) every aligned term x_{t+j}·y_{s+j} lies on the fixed
  // diagonal d = t−s, so ONE self-join on (type, d) builds every
  // product exactly once and ONE m-row window frame per (type, d)
  // yields Σ_j x·y for every t simultaneously — O(n²) pairs for an
  // n-point spine, built relationally with no per-pair recomputation.
  // All co-moments exact int64 (the evt_motif discipline), the same
  // textual r formula, zero-variance windows excluded exactly. Scale:
  // n is the BOUNDED spine length (hours×types — fixed by the time
  // range, not the corpus), so the quadratic term is corpus-size-free;
  // the event→hour rollup remains the only data-sized pass.
  // -------------------------------------------------------------------
  private val DiscordK = 3

  /** Loud O(spine²) guard (VERDICT r11 item 6): the matrix-profile
    * diagonal self-join is quadratic in the SPINE length — bounded by
    * the TIME RANGE, not constant. 8192 hours (~1 year hourly) caps the
    * pair relation at ~34M rows/type; past that the full profile is the
    * wrong tool and the query must fail loudly instead of melting the
    * cluster. The banded twin (evt_discord_banded, O(spine·band)) is
    * the scale path. assert_true evaluates on the 1-row bounds relation
    * (filter keeps the row via IS NULL when the guard holds), so the
    * check is free and cannot be pruned away.
    */
  private val MaxSpineHours = 8192L
  private val DiscordBand = 168L // one week of hourly diagonals

  private[contract] def guardSpine(bounds: DataFrame, who: String): DataFrame =
    bounds.filter(
      expr(
        s"assert_true(h1 - h0 + 1 <= $MaxSpineHours, " +
          s"'$who: hour spine exceeds MaxSpineHours=$MaxSpineHours and the diagonal " +
          s"self-join is O(spine^2) — use evt_discord_banded (O(spine*band)) or narrow " +
          s"the time range') IS NULL"
      )
    )

  private def evtDiscord(s: SparkSession, dir: String): DataFrame =
    evtDiscordWith(s, dir, None)

  private def evtDiscordBanded(s: SparkSession, dir: String): DataFrame =
    evtDiscordWith(s, dir, Some(DiscordBand))

  private def evtDiscordWith(s: SparkSession, dir: String, band: Option[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = MotifLen
    val hourly = ev(s, dir)
      .groupBy(expr(s"tus div $HourUs").as("hr"), col("event_type"))
      .agg(count(lit(1)).as("x"))
    val bounds0 = hourly.agg(min("hr").as("h0"), max("hr").as("h1"))
    // the banded variant is O(spine·band) and needs no guard
    val bounds = if (band.isEmpty) guardSpine(bounds0, "evt_discord") else bounds0
    val types = hourly.select("event_type").distinct()
    val spine = bounds
      .select(col("h0"), explode(sequence(col("h0"), col("h1"))).as("hr"))
      .crossJoin(types)
      .join(hourly, Seq("hr", "event_type"), "left")
      .select(col("event_type"), (col("hr") - col("h0")).as("t"), coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint() // feeds the per-window stats AND the diagonal self-join
    val wFrame = Window
      .partitionBy("event_type")
      .orderBy("t")
      .rowsBetween(Window.currentRow, m - 1)
    val stats = spine
      .withColumn("sx", sum(col("x")).over(wFrame))
      .withColumn("qx", sum(col("x") * col("x")).over(wFrame))
      .withColumn("cnt", count(lit(1)).over(wFrame))
      .filter(col("cnt") === m)
      .withColumn("den", lit(m) * col("qx") - col("sx") * col("sx"))
      .filter(col("den") > 0)
      .select(col("event_type"), col("t"), col("sx"), col("den"))
      .localCheckpoint() // joined twice (t and s sides)
    val wDiag = Window
      .partitionBy("event_type", "d")
      .orderBy("t")
      .rowsBetween(Window.currentRow, m - 1)
    val dots = spine
      .as("a")
      .join(
        spine.as("b"),
        col("a.event_type") === col("b.event_type") &&
          // exclusion zone: |t-s| = |d| >= m; build each unordered pair
          // once via d > 0 (r is symmetric). Banded: only diagonals
          // d in [m, m+band) — nearest neighbor WITHIN the band, the
          // SCRIMP-style O(spine·band) scale path.
          col("b.t") <= col("a.t") - m &&
          band.map(bd => col("b.t") >= col("a.t") - lit(m + bd - 1)).getOrElse(lit(true))
      )
      .select(
        col("a.event_type").as("event_type"),
        (col("a.t") - col("b.t")).as("d"),
        col("a.t").as("t"),
        (col("a.x") * col("b.x")).as("xy")
      )
      .withColumn("dxy", sum(col("xy")).over(wDiag))
      .withColumn("cnt", count(lit(1)).over(wDiag))
      .filter(col("cnt") === m)
      .select(col("event_type"), col("t"), (col("t") - col("d")).as("s"), col("dxy"))
    val scored = dots
      .join(stats.select(col("event_type"), col("t"), col("sx").as("sxa"), col("den").as("dena")), Seq("event_type", "t"))
      .join(
        stats.select(col("event_type"), col("t").as("s"), col("sx").as("sxb"), col("den").as("denb")),
        Seq("event_type", "s")
      )
      .withColumn("num", lit(m) * col("dxy") - col("sxa") * col("sxb"))
      .withColumn(
        "r",
        expr("CAST(num AS DOUBLE) / (sqrt(CAST(dena AS DOUBLE)) * sqrt(CAST(denb AS DOUBLE)))")
      )
    // fold the symmetric pair back onto BOTH endpoints, then per window
    // keep its best match; discords = worst best-match per type
    val best = scored
      .select(col("event_type"), col("t"), col("r"))
      .unionByName(scored.select(col("event_type"), col("s").as("t"), col("r")))
      .groupBy("event_type", "t")
      .agg(max(col("r")).as("best_ncc"))
    val wRank = Window.partitionBy("event_type").orderBy(col("best_ncc").asc, col("t").asc)
    best
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= DiscordK)
      .crossJoin(bounds.select(col("h0")))
      .select(
        col("event_type"),
        col("rank"),
        ((col("h0") + col("t")) * HourUs).as("start_us"),
        Norm.rnd(col("best_ncc"), 6).as("best_ncc")
      )
      .transform(Norm.ordered(_, col("event_type"), col("rank")))
  }

  // lazy: MotifLen is declared LOWER in the file — an eager val here
  // silently bakes m = 0 into the SQL (the measured r9 init-order trap)
  private lazy val evtDiscordSql: String = evtDiscordSqlWith(None)
  private lazy val evtDiscordBandedSql: String = evtDiscordSqlWith(Some(DiscordBand))

  private def evtDiscordSqlWith(band: Option[Long]): String = {
    val m = MotifLen
    val bandPred = band.map(bd => s" AND bb.t >= a.t - ${m + bd - 1}").getOrElse("")
    s"""WITH hourly AS (
       |  SELECT epoch_us(ts) // $HourUs AS hr, event_type, CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2
       |), b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM hourly),
       |types AS (SELECT DISTINCT event_type FROM hourly),
       |spine AS MATERIALIZED (
       |  SELECT ty.event_type, s.hr - (SELECT h0 FROM b) AS t, COALESCE(h.x, 0) AS x
       |  FROM (SELECT unnest(generate_series((SELECT h0 FROM b), (SELECT h1 FROM b))) AS hr) s
       |  CROSS JOIN types ty
       |  LEFT JOIN hourly h ON h.hr = s.hr AND h.event_type = ty.event_type
       |), stats AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT event_type, t,
       |      sum(x) OVER w AS sx, sum(x * x) OVER w AS qx, count(*) OVER w AS cnt
       |    FROM spine
       |    WINDOW w AS (PARTITION BY event_type ORDER BY t ROWS BETWEEN CURRENT ROW AND ${m - 1} FOLLOWING)
       |  ) WHERE cnt = $m AND $m * qx - sx * sx > 0
       |), dots AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT event_type, d, t, t - d AS s,
       |      sum(xy) OVER w AS dxy, count(*) OVER w AS cnt
       |    FROM (
       |      SELECT a.event_type, a.t - bb.t AS d, a.t, a.x * bb.x AS xy
       |      FROM spine a JOIN spine bb
       |        ON bb.event_type = a.event_type AND bb.t <= a.t - $m$bandPred
       |    )
       |    WINDOW w AS (PARTITION BY event_type, d ORDER BY t ROWS BETWEEN CURRENT ROW AND ${m - 1} FOLLOWING)
       |  ) WHERE cnt = $m
       |), scored AS (
       |  SELECT d.event_type, d.t, d.s,
       |    CAST($m * d.dxy - sa.sx * sb.sx AS DOUBLE)
       |      / (sqrt(CAST($m * sa.qx - sa.sx * sa.sx AS DOUBLE)) * sqrt(CAST($m * sb.qx - sb.sx * sb.sx AS DOUBLE))) AS r
       |  FROM dots d
       |  JOIN stats sa ON sa.event_type = d.event_type AND sa.t = d.t
       |  JOIN stats sb ON sb.event_type = d.event_type AND sb.t = d.s
       |), best AS (
       |  SELECT event_type, t, max(r) AS best_ncc
       |  FROM (SELECT event_type, t, r FROM scored UNION ALL SELECT event_type, s, r FROM scored)
       |  GROUP BY 1, 2
       |)
       |SELECT event_type,
       |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY best_ncc, t) AS BIGINT) AS rank,
       |  ((SELECT h0 FROM b) + t) * $HourUs AS start_us,
       |  round(best_ncc, 6) + 0.0 AS best_ncc
       |FROM best
       |QUALIFY rank <= $DiscordK
       |ORDER BY event_type, rank""".stripMargin
  }

  // -------------------------------------------------------------------
  // evt_kalman — LOCAL-LEVEL KALMAN FILTER per user over the gap-filled
  // daily-cents series: the adaptive-gain counterpart of
  // evt_ses_forecast's fixed-α EWMA (steady-state Kalman IS SES; the
  // filter additionally carries the state variance P, so the gain
  // K = (P+Q)/(P+Q+R) adapts — high after gaps/starts, settling as
  // evidence accrues — and the innovation stream gives a whiteness/fit
  // diagnostic). Recurrence per day (predict-then-update, random-walk
  // state, observation noise R, process noise Q):
  //   K = (P+Q)/(P+Q+R);  x̂ ← x̂ + K(x − x̂);  P ← (1−K)(P+Q)
  // Genuinely sequential, so it runs as the declarative ARRAY FOLD
  // (the evt_holt technique) with state (x̂, P, Σv²) — the gain
  // expression is written ONCE as the same text in both engines (the
  // two algebraic forms of P's update differ in float; only textual
  // identity is parity), DuckDB carries state as a 3-double LIST (the
  // measured struct_pack contamination workaround), and outputs ship
  // UNROUNDED (+0.0) except the rms, which is one exact division + one
  // IEEE sqrt of identical doubles. One shuffle on user, fold
  // partition-local — the evt_holt scale shape.
  // -------------------------------------------------------------------
  private val KalQ = 100.0
  private val KalR = 10000.0

  private def evtKalman(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .withColumn("cents", round(col("value") * 100.0).cast("long"))
      .groupBy(col("user_id"), expr(s"tus div $DayUs").as("day"))
      .agg(sum(col("cents")).as("cents"))
    val spine = daily
      .groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), coalesce(col("cents"), lit(0L)).cast("double").as("x"))
    val gain = s"((acc.p + $KalQ) / (acc.p + $KalQ + $KalR))"
    spine
      .groupBy("user_id")
      .agg(expr("array_sort(collect_list(struct(day, x)))").as("sx"))
      .withColumn("xs", expr("transform(sx, p -> p.x)"))
      .filter(size(col("xs")) >= 3)
      .withColumn(
        "st",
        expr(
          s"""aggregate(
             |  slice(xs, 2, size(xs) - 1),
             |  named_struct('x', element_at(xs, 1), 'p', CAST($KalR AS DOUBLE), 's', CAST(0.0 AS DOUBLE)),
             |  (acc, x) -> named_struct(
             |    'x', acc.x + $gain * (x - acc.x),
             |    'p', (1.0 - $gain) * (acc.p + $KalQ),
             |    's', acc.s + (x - acc.x) * (x - acc.x)))""".stripMargin
        )
      )
      .select(
        col("user_id"),
        size(col("xs")).cast("long").as("n_days"),
        (col("st.x") + 0.0).as("level"),
        (col("st.p") + 0.0).as("p_var"),
        (expr("sqrt(st.s / (size(xs) - 1))") + 0.0).as("innovation_rms")
      )
      .transform(Norm.ordered(_, col("user_id")))
  }

  private val evtKalmanSql: String = {
    val gain = s"((acc[2] + $KalQ) / (acc[2] + $KalQ + $KalR))"
    s"""WITH daily AS (
       |  SELECT user_id, epoch_us(ts) // $DayUs AS day,
       |         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2
       |), rng AS (
       |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
       |), days AS (
       |  SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM rng
       |), spine AS (
       |  SELECT dy.user_id, dy.day, CAST(COALESCE(d.cents, 0) AS DOUBLE) AS x
       |  FROM days dy LEFT JOIN daily d ON d.user_id = dy.user_id AND d.day = dy.day
       |), arrs AS (
       |  SELECT user_id, list(x ORDER BY day) AS xs FROM spine GROUP BY 1
       |), ok AS (SELECT * FROM arrs WHERE len(xs) >= 3),
       |folded AS (
       |  SELECT user_id, CAST(len(xs) AS BIGINT) AS n_days,
       |    list_reduce(
       |      list_prepend([xs[1], $KalR, 0.0e0],
       |                   list_transform(xs[2:], v -> [v, 0.0e0, 0.0e0])),
       |      (acc, e) -> [
       |        acc[1] + $gain * (e[1] - acc[1]),
       |        (1.0 - $gain) * (acc[2] + $KalQ),
       |        acc[3] + (e[1] - acc[1]) * (e[1] - acc[1])]) AS st,
       |    len(xs) AS n
       |  FROM ok
       |)
       |SELECT user_id, n_days,
       |       st[1] + 0.0 AS level, st[2] + 0.0 AS p_var,
       |       sqrt(st[3] / (n - 1)) + 0.0 AS innovation_rms
       |FROM folded ORDER BY user_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // evt_cross_corr — sample CROSS-correlation between the hourly CLICK
  // count (x) and the hourly PURCHASE count (y) at lags −CcfMaxLag..
  // +CcfMaxLag over the gap-filled hour spine: the classical lead–lag
  // diagnostic (does x at time t co-vary with y at time t+k?) and the
  // linear counterpart of the CCM family — CCM detects coupling CCF
  // can't see, CCF dates the lag CCM doesn't report; users of the
  // reference run both. Estimator per lag k over the m = n−|k| aligned
  // pairs: r_k = (m·Sxy − Sx·Sy) / √((m·Sxx − Sx²)(m·Syy − Sy²)) with
  // every S an exact int64 co-moment of the integer counts and the √ /
  // division done once on int64-born doubles (the evt_acf lesson:
  // engine-native corr flips 6-dp boundaries, integer co-moments + one
  // IEEE-exact sqrt don't). The hour spine is aggregated-small (hours,
  // not events) so the single window pass is bounded at any corpus
  // size; positive lags pair x with lead(y,k), negative lags pair
  // lead(x,|k|) with y — identical to the oracle's hr+k self-join.
  // -------------------------------------------------------------------
  private val CcfMaxLag = 6
  private val CcfXType = "click"
  private val CcfYType = "purchase"

  /** Gap-filled contiguous hourly two-series spine (hr, x, y) shared by
    * evt_cross_corr / evt_granger: x = hourly count of [[CcfXType]],
    * y = hourly count of [[CcfYType]]; missing hours = 0 on both.
    */
  private def hourlySpine2(s: SparkSession, dir: String): DataFrame = {
    val hourly = ev(s, dir)
      .groupBy(expr(s"tus div $HourUs").as("hr"))
      .agg(
        sum(when(col("event_type") === CcfXType, 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === CcfYType, 1L).otherwise(0L)).as("y")
      )
    hourly
      .agg(min("hr").as("h0"), max("hr").as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("hr"))
      .join(hourly, Seq("hr"), "left")
      .select(col("hr"), coalesce(col("x"), lit(0L)).as("x"), coalesce(col("y"), lit(0L)).as("y"))
      .localCheckpoint()
  }

  /** SQL twin of [[hourlySpine2]] — CTE chain ending at `f2` (hr, x, y). */
  private val hourlySpine2Sql: String =
    s"""hourly2 AS (
       |  SELECT epoch_us(ts) // $HourUs AS hr,
       |         CAST(sum(CASE WHEN event_type = '$CcfXType' THEN 1 ELSE 0 END) AS BIGINT) AS x,
       |         CAST(sum(CASE WHEN event_type = '$CcfYType' THEN 1 ELSE 0 END) AS BIGINT) AS y
       |  FROM events GROUP BY 1
       |), spine2 AS (
       |  SELECT unnest(generate_series((SELECT min(hr) FROM hourly2),
       |                                (SELECT max(hr) FROM hourly2))) AS hr
       |), f2 AS (
       |  SELECT s.hr, COALESCE(h.x, 0) AS x, COALESCE(h.y, 0) AS y
       |  FROM spine2 s LEFT JOIN hourly2 h ON s.hr = h.hr
       |)""".stripMargin

  private def crossCorr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("hr")
    val l = CcfMaxLag
    val leads = (1 to l).foldLeft(hourlySpine2(s, dir)) { (df, k) =>
      df.withColumn(s"ly$k", lead(col("y"), k).over(w))
        .withColumn(s"lx$k", lead(col("x"), k).over(w))
    }
    // lag k >= 0: (x_t, y_{t+k}); lag -j: (x_{t+j}, y_t) == x_a with y_{a-j}
    val cells = Seq(s"0L, x, y") ++
      (1 to l).map(k => s"${k}L, x, ly$k") ++
      (1 to l).map(j => s"${-j}L, lx$j, y")
    leads
      .select(expr(s"stack(${cells.size}, ${cells.mkString(", ")}) AS (lag, xv, yv)"))
      .filter(col("xv").isNotNull && col("yv").isNotNull)
      .groupBy("lag")
      .agg(
        count(lit(1)).as("m"),
        sum(col("xv")).as("sx"),
        sum(col("yv")).as("sy"),
        sum(col("xv") * col("xv")).as("sxx"),
        sum(col("yv") * col("yv")).as("syy"),
        sum(col("xv") * col("yv")).as("sxy")
      )
      .select(
        col("lag"),
        col("m").as("n_pairs"),
        // zero-variance guard (a constant series would divide by √0 —
        // NaN/Inf bytes are not cross-engine-stable): r defined as 0.0,
        // the C9 correlation-guard convention; identical CASE both sides
        (round(
          when(
            (col("m") * col("sxx") - col("sx") * col("sx")) <= 0L ||
              (col("m") * col("syy") - col("sy") * col("sy")) <= 0L,
            lit(0.0)
          ).otherwise(
            (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt(
                (col("m") * col("sxx") - col("sx") * col("sx")).cast("double") *
                  (col("m") * col("syy") - col("sy") * col("sy")).cast("double")
              )
          ),
          6
        ) + 0.0).as("r")
      )
      .transform(Norm.ordered(_, col("lag")))
  }

  private val crossCorrSql: String =
    s"""WITH $hourlySpine2Sql,
       |ks AS (SELECT unnest(generate_series(-$CcfMaxLag, $CcfMaxLag)) AS lag),
       |pairs_k AS (
       |  SELECT k.lag, a.x AS xv, b.y AS yv
       |  FROM f2 a JOIN ks k ON true JOIN f2 b ON b.hr = a.hr + k.lag
       |), agg AS (
       |  SELECT CAST(lag AS BIGINT) AS lag, CAST(count(*) AS BIGINT) AS m,
       |         CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
       |         CAST(sum(xv * xv) AS BIGINT) AS sxx, CAST(sum(yv * yv) AS BIGINT) AS syy,
       |         CAST(sum(xv * yv) AS BIGINT) AS sxy
       |  FROM pairs_k GROUP BY 1
       |)
       |SELECT lag, m AS n_pairs,
       |       round(CASE WHEN m * sxx - sx * sx <= 0 OR m * syy - sy * sy <= 0 THEN 0.0
       |                  ELSE CAST(m * sxy - sx * sy AS DOUBLE)
       |                       / sqrt(CAST(m * sxx - sx * sx AS DOUBLE) * CAST(m * syy - sy * sy AS DOUBLE))
       |             END, 6) + 0.0 AS r
       |FROM agg ORDER BY lag""".stripMargin

  // -------------------------------------------------------------------
  // evt_granger — GRANGER CAUSALITY at lag order p=1 between the hourly
  // click/purchase count series, BOTH directions in one job: the
  // linear-VAR baseline the CCM literature defines itself against
  // (Sugihara et al. 2012 position CCM exactly where Granger's
  // separability assumption fails — an engine shipping CCM without the
  // Granger contrast is half a story). Direction x→y regresses y_t on
  // (1, y_{t−1}, x_{t−1}) vs the restricted (1, y_{t−1}) and reports
  // F = (RSS_r − RSS_u) / (RSS_u / (n−3)). All ten co-moment sums are
  // exact int64 aggregates of integer counts; the 3×3 normal-equation
  // solve is Cramer's rule over those co-moments cast to double ONCE,
  // with the ENTIRE arithmetic built as a single expression string
  // handed verbatim to both Spark `expr()` and DuckDB — identical
  // operation order, bit-identical doubles, parity by construction
  // (the ccm_smap_e3 technique; validated against numpy lstsq in the
  // round-9 prototype). The per-direction relation is ONE row of sums —
  // driver-side cost is constant at any corpus size.
  // -------------------------------------------------------------------

  /** Cramer 3×3 solve + F-stat over the granger co-moment columns
    * (n, sy1, sx1, syy1, sxx1, syx1, st, sty, stx, stt), as expression
    * TEXT shared verbatim by Spark `expr()` and the DuckDB oracle:
    * (beta0, beta_ar, beta_cross, rss_r, rss_u, f_stat), unrounded.
    */
  private val grangerExprs: Seq[(String, String)] = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val (n, sy1, sx1, syy1, sxx1, syx1, st, sty, stx, stt) =
      (d("n"), d("sy1"), d("sx1"), d("syy1"), d("sxx1"), d("syx1"), d("st"), d("sty"), d("stx"), d("stt"))
    val det = s"($n*($syy1*$sxx1-$syx1*$syx1) - $sy1*($sy1*$sxx1-$syx1*$sx1) + $sx1*($sy1*$syx1-$syy1*$sx1))"
    val d0 = s"($st*($syy1*$sxx1-$syx1*$syx1) - $sy1*($sty*$sxx1-$syx1*$stx) + $sx1*($sty*$syx1-$syy1*$stx))"
    val d1 = s"($n*($sty*$sxx1-$syx1*$stx) - $st*($sy1*$sxx1-$syx1*$sx1) + $sx1*($sy1*$stx-$sty*$sx1))"
    val d2 = s"($n*($syy1*$stx-$sty*$syx1) - $sy1*($sy1*$stx-$sty*$sx1) + $st*($sy1*$syx1-$syy1*$sx1))"
    val b0 = s"($d0/$det)"
    val b1 = s"($d1/$det)"
    val b2 = s"($d2/$det)"
    val rssU = s"($stt - ($b0*$st + $b1*$sty + $b2*$stx))"
    val detR = s"($n*$syy1 - $sy1*$sy1)"
    val c0 = s"(($st*$syy1 - $sy1*$sty)/$detR)"
    val c1 = s"(($n*$sty - $st*$sy1)/$detR)"
    val rssR = s"($stt - ($c0*$st + $c1*$sty))"
    val f = s"(($rssR - $rssU) / ($rssU / ($n - 3.0)))"
    // degenerate guards (identical CASE text both engines): a constant
    // series makes det/detR exactly 0 (they are int64-born doubles), a
    // perfect fit makes RSS_u 0 — in each case the statistic is defined
    // as 0.0 instead of letting NaN/Inf bytes reach the hash compare
    def g(e: String) = s"(CASE WHEN $det = 0.0 OR $detR = 0.0 THEN 0.0 ELSE $e END)"
    val fg = s"(CASE WHEN $det = 0.0 OR $detR = 0.0 OR $rssU <= 0.0 THEN 0.0 ELSE $f END)"
    Seq("beta_const" -> g(b0), "beta_ar" -> g(b1), "beta_cross" -> g(b2), "rss_r" -> g(rssR), "rss_u" -> g(rssU), "f_stat" -> fg)
  }

  private def granger(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("hr")
    val lagged = hourlySpine2(s, dir)
      .withColumn("xl", lag(col("x"), 1).over(w))
      .withColumn("yl", lag(col("y"), 1).over(w))
      .filter(col("xl").isNotNull)
    // direction x_to_y: dep = y, cross = x; y_to_x: dep = x, cross = y
    val stacked = lagged.select(
      expr("stack(2, 'x_to_y', y, yl, xl, 'y_to_x', x, xl, yl) AS (direction, yt, dyl, dxl)")
    )
    val sums = stacked
      .groupBy("direction")
      .agg(
        count(lit(1)).as("n"),
        sum(col("dyl")).as("sy1"),
        sum(col("dxl")).as("sx1"),
        sum(col("dyl") * col("dyl")).as("syy1"),
        sum(col("dxl") * col("dxl")).as("sxx1"),
        sum(col("dyl") * col("dxl")).as("syx1"),
        sum(col("yt")).as("st"),
        sum(col("yt") * col("dyl")).as("sty"),
        sum(col("yt") * col("dxl")).as("stx"),
        sum(col("yt") * col("yt")).as("stt")
      )
    grangerExprs
      .foldLeft(sums) { case (df, (name, e)) => df.withColumn(name, round(expr(e), 6) + 0.0) }
      .select(
        (Seq(col("direction"), col("n").as("n_obs")) ++ grangerExprs.map { case (name, _) => col(name) }): _*
      )
      .transform(Norm.ordered(_, col("direction")))
  }

  private val grangerSql: String = {
    val outs = grangerExprs.map { case (name, e) => s"round($e, 6) + 0.0 AS $name" }.mkString(",\n       ")
    s"""WITH $hourlySpine2Sql,
       |lagged AS (
       |  SELECT x, y,
       |         lag(x, 1) OVER (ORDER BY hr) AS xl,
       |         lag(y, 1) OVER (ORDER BY hr) AS yl
       |  FROM f2
       |), stacked AS (
       |  SELECT 'x_to_y' AS direction, y AS yt, yl AS dyl, xl AS dxl FROM lagged WHERE xl IS NOT NULL
       |  UNION ALL
       |  SELECT 'y_to_x' AS direction, x AS yt, xl AS dyl, yl AS dxl FROM lagged WHERE xl IS NOT NULL
       |), sums AS (
       |  SELECT direction, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(dyl) AS BIGINT) AS sy1, CAST(sum(dxl) AS BIGINT) AS sx1,
       |         CAST(sum(dyl * dyl) AS BIGINT) AS syy1, CAST(sum(dxl * dxl) AS BIGINT) AS sxx1,
       |         CAST(sum(dyl * dxl) AS BIGINT) AS syx1,
       |         CAST(sum(yt) AS BIGINT) AS st, CAST(sum(yt * dyl) AS BIGINT) AS sty,
       |         CAST(sum(yt * dxl) AS BIGINT) AS stx, CAST(sum(yt * yt) AS BIGINT) AS stt
       |  FROM stacked GROUP BY 1
       |)
       |SELECT direction, n AS n_obs,
       |       $outs
       |FROM sums ORDER BY direction""".stripMargin
  }

  // -------------------------------------------------------------------
  // evt_partial_corr — PARTIAL correlation r(x,y|z) between the hourly
  // click (x) and purchase (y) count series CONTROLLING for the view
  // count (z): the confounder test that completes the causality
  // diagnostics trio (evt_cross_corr dates the lag, evt_granger tests
  // linear predictability, this asks whether the x–y association
  // survives removing a common driver — the first-order check before
  // reaching for CCM). One aggregation pass collects all nine int64
  // co-moments + n over the shared hour spine; the three pairwise
  // Pearsons and the partial formula
  //   r_xy.z = (r_xy − r_xz·r_zy) / √((1−r_xz²)(1−r_zy²))
  // are built as expression TEXT shared verbatim by both engines
  // (int64-born doubles, identical operation order — the evt_granger
  // technique). The per-corpus relation is ONE row of sums: driver-side
  // cost is constant at any corpus size.
  // -------------------------------------------------------------------
  private val PcorrZType = "view"

  /** Pairwise-Pearson + partial-correlation expression text over the
    * co-moment columns (n, sx, sy, sz, sxx, syy, szz, sxy, sxz, syz),
    * shared verbatim by Spark `expr()` and the DuckDB oracle.
    */
  private val partialCorrExprs: Seq[(String, String)] = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    // integer-exact zero-variance guard per variable (identical text both
    // engines): a constant series' co-moment determinant is exactly 0
    def dz(sa: String, saa: String) = s"n * $saa - $sa * $sa <= 0"
    def r(sa: String, sb: String, sab: String, saa: String, sbb: String) =
      s"(CASE WHEN ${dz(sa, saa)} OR ${dz(sb, sbb)} THEN 0.0 ELSE " +
        s"(${d("n")}*${d(sab)} - ${d(sa)}*${d(sb)}) / sqrt((${d("n")}*${d(saa)} - ${d(sa)}*${d(sa)}) * (${d("n")}*${d(sbb)} - ${d(sb)}*${d(sb)})) END)"
    val rxy = r("sx", "sy", "sxy", "sxx", "syy")
    val rxz = r("sx", "sz", "sxz", "sxx", "szz")
    val rzy = r("sz", "sy", "syz", "szz", "syy")
    // |r| = 1 against the confounder leaves no residual variance to
    // correlate — the partial is defined as 0.0 there
    val part = s"(CASE WHEN $rxz*$rxz >= 1.0 OR $rzy*$rzy >= 1.0 THEN 0.0 ELSE " +
      s"($rxy - $rxz*$rzy) / sqrt((1.0 - $rxz*$rxz) * (1.0 - $rzy*$rzy)) END)"
    Seq("r_xy" -> rxy, "r_xz" -> rxz, "r_zy" -> rzy, "r_xy_given_z" -> part)
  }

  private def partialCorr(s: SparkSession, dir: String): DataFrame = {
    val hourly = ev(s, dir)
      .groupBy(expr(s"tus div $HourUs").as("hr"))
      .agg(
        sum(when(col("event_type") === CcfXType, 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === CcfYType, 1L).otherwise(0L)).as("y"),
        sum(when(col("event_type") === PcorrZType, 1L).otherwise(0L)).as("z")
      )
    val spine = hourly
      .agg(min("hr").as("h0"), max("hr").as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("hr"))
      .join(hourly, Seq("hr"), "left")
      .select(
        coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"),
        coalesce(col("z"), lit(0L)).as("z")
      )
    val sums = spine.agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"),
      sum("y").as("sy"),
      sum("z").as("sz"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("z") * col("z")).as("szz"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("z")).as("sxz"),
      sum(col("y") * col("z")).as("syz")
    )
    partialCorrExprs
      .foldLeft(sums) { case (df, (name, e)) => df.withColumn(name, round(expr(e), 6) + 0.0) }
      .select(
        (Seq(col("n").as("n_hours")) ++ partialCorrExprs.map { case (name, _) => col(name) }): _*
      )
  }

  private val partialCorrSql: String = {
    val outs = partialCorrExprs.map { case (name, e) => s"round($e, 6) + 0.0 AS $name" }.mkString(",\n       ")
    s"""WITH hourly3 AS (
       |  SELECT epoch_us(ts) // $HourUs AS hr,
       |         CAST(sum(CASE WHEN event_type = '$CcfXType' THEN 1 ELSE 0 END) AS BIGINT) AS x,
       |         CAST(sum(CASE WHEN event_type = '$CcfYType' THEN 1 ELSE 0 END) AS BIGINT) AS y,
       |         CAST(sum(CASE WHEN event_type = '$PcorrZType' THEN 1 ELSE 0 END) AS BIGINT) AS z
       |  FROM events GROUP BY 1
       |), spine3 AS (
       |  SELECT unnest(generate_series((SELECT min(hr) FROM hourly3),
       |                                (SELECT max(hr) FROM hourly3))) AS hr
       |), f3 AS (
       |  SELECT COALESCE(h.x, 0) AS x, COALESCE(h.y, 0) AS y, COALESCE(h.z, 0) AS z
       |  FROM spine3 s LEFT JOIN hourly3 h ON s.hr = h.hr
       |), sums AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, CAST(sum(z) AS BIGINT) AS sz,
       |         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
       |         CAST(sum(z * z) AS BIGINT) AS szz,
       |         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * z) AS BIGINT) AS sxz,
       |         CAST(sum(y * z) AS BIGINT) AS syz
       |  FROM f3
       |)
       |SELECT n AS n_hours,
       |       $outs
       |FROM sums""".stripMargin
  }

  // -------------------------------------------------------------------
  // evt_transfer_entropy — TRANSFER ENTROPY (Schreiber 2000) both
  // directions over the hourly click/purchase spine: the
  // information-theoretic member of the causality suite (CCF dates the
  // lag, Granger tests LINEAR predictability, TE detects any
  // predictability — nonlinear included — and CCM recovers the
  // state-space coupling). At history k=l=1:
  //   TE(x→y) = Σ p(y',y,x) · ln[ p(y'|y,x) / p(y'|y) ]
  //           = Σ (n_abc/N) · ln( n_abc·n_b / (n_bc·n_ab) )
  // over 4-bin discretizations (4³ = 64 cells on ~720 samples — the
  // small-sample bias of 8 bins halves; TE's positive bias on finite
  // data is the known caveat and evt_granger's F-test is the calibrated
  // alternative). All cell counts are exact int64; bins use the miTau
  // CASE (integer-born doubles, identical text both engines); marginals
  // are window sums over the ≤128-row cell relation (no joins), ln
  // rides the same cross-engine safety the shipped MI curve proved.
  // -------------------------------------------------------------------
  private val TeBins = 4

  private def transferEntropy(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s) // graft_ln TE series
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("hr")
    def binOf(c: String, mn: String, mx: String) =
      s"CASE WHEN $mx = $mn THEN 0 ELSE least(${TeBins - 1}, CAST(floor(($c - $mn) * $TeBins.0 / ($mx - $mn + 1)) AS INT)) END"
    val spine = hourlySpine2(s, dir)
    val rng = spine.agg(min("x").as("xmn"), max("x").as("xmx"), min("y").as("ymn"), max("y").as("ymx"))
    val binned = spine
      .crossJoin(broadcast(rng))
      .select(
        col("hr"),
        expr(binOf("x", "xmn", "xmx")).as("bx"),
        expr(binOf("y", "ymn", "ymx")).as("by")
      )
      .withColumn("bxn", lead(col("bx"), 1).over(w))
      .withColumn("byn", lead(col("by"), 1).over(w))
      .filter(col("bxn").isNotNull)
    val cells = binned
      .select(expr("stack(2, 'x_to_y', byn, by, bx, 'y_to_x', bxn, bx, by) AS (direction, a, b, c)"))
      .groupBy("direction", "a", "b", "c")
      .agg(count(lit(1)).as("n3"))
    val wAb = Window.partitionBy("direction", "a", "b")
    val wBc = Window.partitionBy("direction", "b", "c")
    val wB = Window.partitionBy("direction", "b")
    val wAll = Window.partitionBy("direction")
    cells
      .withColumn("n2ab", sum(col("n3")).over(wAb))
      .withColumn("n2bc", sum(col("n3")).over(wBc))
      .withColumn("n1b", sum(col("n3")).over(wB))
      .withColumn("n", sum(col("n3")).over(wAll))
      .groupBy("direction")
      .agg(
        max(col("n")).as("n_obs"),
        (round(
          sum(
            (col("n3").cast("double") / col("n").cast("double")) *
              expr(
                "graft_ln((CAST(n3 AS DOUBLE) * CAST(n1b AS DOUBLE))" +
                  " / (CAST(n2bc AS DOUBLE) * CAST(n2ab AS DOUBLE)))"
              )
          ),
          6
        ) + 0.0).as("te")
      )
      .transform(Norm.ordered(_, col("direction")))
  }

  private val transferEntropySql: String = {
    def binOf(c: String, mn: String, mx: String) =
      s"CASE WHEN $mx = $mn THEN 0 ELSE least(${TeBins - 1}, CAST(floor(($c - $mn) * $TeBins.0 / ($mx - $mn + 1)) AS INTEGER)) END"
    s"""WITH $hourlySpine2Sql,
       |rng AS (SELECT min(x) AS xmn, max(x) AS xmx, min(y) AS ymn, max(y) AS ymx FROM f2),
       |binned0 AS (
       |  SELECT hr, ${binOf("x", "xmn", "xmx")} AS bx, ${binOf("y", "ymn", "ymx")} AS by
       |  FROM f2 CROSS JOIN rng
       |), binned AS (
       |  SELECT hr, bx, by,
       |         lead(bx, 1) OVER (ORDER BY hr) AS bxn,
       |         lead(by, 1) OVER (ORDER BY hr) AS byn
       |  FROM binned0
       |), trip AS (
       |  SELECT 'x_to_y' AS direction, byn AS a, by AS b, bx AS c FROM binned WHERE bxn IS NOT NULL
       |  UNION ALL
       |  SELECT 'y_to_x' AS direction, bxn AS a, bx AS b, by AS c FROM binned WHERE bxn IS NOT NULL
       |), cells AS (
       |  SELECT direction, a, b, c, CAST(count(*) AS BIGINT) AS n3 FROM trip GROUP BY 1, 2, 3, 4
       |), marg AS (
       |  SELECT *,
       |         sum(n3) OVER (PARTITION BY direction, a, b) AS n2ab,
       |         sum(n3) OVER (PARTITION BY direction, b, c) AS n2bc,
       |         sum(n3) OVER (PARTITION BY direction, b) AS n1b,
       |         sum(n3) OVER (PARTITION BY direction) AS n
       |  FROM cells
       |)
       |SELECT direction, CAST(max(n) AS BIGINT) AS n_obs,
       |       round(sum((CAST(n3 AS DOUBLE) / CAST(n AS DOUBLE))
       |             * ${ExactLn.duck("(CAST(n3 AS DOUBLE) * CAST(n1b AS DOUBLE)) / (CAST(n2bc AS DOUBLE) * CAST(n2ab AS DOUBLE))")}), 6) + 0.0 AS te
       |FROM marg GROUP BY direction ORDER BY direction""".stripMargin
  }

  // -------------------------------------------------------------------
  // evt_motif — z-NORMALIZED MOTIF SEARCH over the hourly per-type count
  // series ("where else does this shape occur?" — the matrix-profile
  // question, answered for ONE query window declaratively): the query
  // pattern is the LAST MotifLen hours of the purchase series; every
  // window of every type's series is scored by normalized cross-
  // correlation r (z-normalized Euclidean distance is the monotone twin
  // d² = 2m(1−r)) and the top-K windows return, excluding candidates
  // overlapping the query itself. Estimator per candidate t from exact
  // int64 co-moments (the evt_acf discipline): r = (m·Dxq − Sx·Sq) /
  // (√(m·Qx − Sx²)·√(m·Qq − Sq²)) with ONE sqrt/div expression shared
  // textually with the oracle (sqrt is IEEE-exact; the two-√ form keeps
  // the den product out of int64 overflow). Zero-variance (flat)
  // windows have no z-normal form and are excluded exactly (denx = 0 is
  // an integer test). Scale shape: the only data-sized pass is the
  // hour×type rollup; the co-moment build is a |q|-row broadcast
  // crossing the BOUNDED spine (hours×types, fixed by the time range —
  // it does not grow with event volume), so the whole search after the
  // rollup is corpus-size-free. A full self-join matrix profile (every
  // window as query) would be the spine² version of the same plan.
  // -------------------------------------------------------------------
  private val MotifLen = 24
  private val MotifK = 10
  private val MotifQueryType = "purchase"

  private def evtMotif(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = ev(s, dir)
      .groupBy(expr(s"tus div $HourUs").as("hr"), col("event_type"))
      .agg(count(lit(1)).as("x"))
    // same O(spine²) co-moment structure as evt_discord -> same loud guard
    val bounds = guardSpine(hourly.agg(min("hr").as("h0"), max("hr").as("h1")), "evt_motif")
    val types = hourly.select("event_type").distinct()
    val spine = bounds
      .select(col("h0"), explode(sequence(col("h0"), col("h1"))).as("hr"))
      .crossJoin(types)
      .join(hourly, Seq("hr", "event_type"), "left")
      .select(col("event_type"), (col("hr") - col("h0")).as("t"), coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint() // feeds q, the scalar aggs, and the co-moment build
    val nRel = spine.agg((max(col("t")) + 1L).as("n"))
    val q = spine
      .crossJoin(nRel)
      .filter(col("event_type") === MotifQueryType && col("t") >= col("n") - MotifLen)
      .select((col("t") - (col("n") - MotifLen)).as("j"), col("x").as("qj"))
    val qs = q.agg(sum(col("qj")).as("sq"), sum(col("qj") * col("qj")).as("qq"))
    spine
      .crossJoin(broadcast(q))
      .crossJoin(nRel)
      .withColumn("t0", col("t") - col("j"))
      .filter(col("t0") >= 0 && col("t0") <= col("n") - MotifLen)
      .groupBy("event_type", "t0", "n")
      .agg(
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("qx"),
        sum(col("x") * col("qj")).as("dxq")
      )
      .crossJoin(qs)
      .filter(!(col("event_type") === MotifQueryType && col("t0") >= col("n") - 2 * MotifLen + 1))
      .withColumn("num", lit(MotifLen) * col("dxq") - col("sx") * col("sq"))
      .withColumn("denx", lit(MotifLen) * col("qx") - col("sx") * col("sx"))
      .withColumn("denq", lit(MotifLen) * col("qq") - col("sq") * col("sq"))
      .filter(col("denx") > 0)
      .withColumn(
        "r",
        expr("CAST(num AS DOUBLE) / (sqrt(CAST(denx AS DOUBLE)) * sqrt(CAST(denq AS DOUBLE)))")
      )
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("r").desc, col("event_type").asc, col("t0").asc)).cast("long")
      )
      .filter(col("rank") <= MotifK)
      .crossJoin(bounds.select(col("h0")))
      .select(
        col("rank"),
        col("event_type"),
        ((col("h0") + col("t0")) * HourUs).as("start_us"),
        Norm.rnd(col("r"), 6).as("ncc")
      )
      .transform(Norm.ordered(_, col("rank")))
  }

  private val evtMotifSql: String =
    s"""WITH hourly AS (
       |  SELECT epoch_us(ts) // $HourUs AS hr, event_type, CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2
       |), b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM hourly),
       |types AS (SELECT DISTINCT event_type FROM hourly),
       |spine AS MATERIALIZED (
       |  SELECT ty.event_type, s.hr - (SELECT h0 FROM b) AS t, COALESCE(h.x, 0) AS x
       |  FROM (SELECT unnest(generate_series((SELECT h0 FROM b), (SELECT h1 FROM b))) AS hr) s
       |  CROSS JOIN types ty
       |  LEFT JOIN hourly h ON h.hr = s.hr AND h.event_type = ty.event_type
       |), nn AS (SELECT max(t) + 1 AS n FROM spine),
       |q AS MATERIALIZED (
       |  SELECT t - ((SELECT n FROM nn) - $MotifLen) AS j, x AS qj
       |  FROM spine WHERE event_type = '$MotifQueryType' AND t >= (SELECT n FROM nn) - $MotifLen
       |), qs AS (SELECT CAST(sum(qj) AS BIGINT) AS sq, CAST(sum(qj * qj) AS BIGINT) AS qq FROM q),
       |cand AS (
       |  SELECT sp.event_type, sp.t - q.j AS t0,
       |         CAST(sum(sp.x) AS BIGINT) AS sx,
       |         CAST(sum(sp.x * sp.x) AS BIGINT) AS qx,
       |         CAST(sum(sp.x * q.qj) AS BIGINT) AS dxq
       |  FROM spine sp CROSS JOIN q
       |  WHERE sp.t - q.j >= 0 AND sp.t - q.j <= (SELECT n FROM nn) - $MotifLen
       |  GROUP BY 1, 2
       |), sc AS (
       |  SELECT c.*,
       |         $MotifLen * c.dxq - c.sx * (SELECT sq FROM qs) AS num,
       |         $MotifLen * c.qx - c.sx * c.sx AS denx,
       |         $MotifLen * (SELECT qq FROM qs) - (SELECT sq FROM qs) * (SELECT sq FROM qs) AS denq
       |  FROM cand c
       |  WHERE NOT (c.event_type = '$MotifQueryType' AND c.t0 >= (SELECT n FROM nn) - ${2 * MotifLen} + 1)
       |), scored AS (
       |  SELECT *, CAST(num AS DOUBLE) / (sqrt(CAST(denx AS DOUBLE)) * sqrt(CAST(denq AS DOUBLE))) AS r
       |  FROM sc WHERE denx > 0
       |)
       |SELECT CAST(row_number() OVER (ORDER BY r DESC, event_type, t0) AS BIGINT) AS rank,
       |       event_type,
       |       ((SELECT h0 FROM b) + t0) * $HourUs AS start_us,
       |       round(r, 6) + 0.0 AS ncc
       |FROM scored
       |QUALIFY rank <= $MotifK
       |ORDER BY rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_motif" -> evtMotif,
    "evt_kalman" -> evtKalman,
    "evt_hurst" -> evtHurst,
    "evt_haar" -> evtHaar,
    "evt_discord" -> evtDiscord,
    "evt_discord_banded" -> evtDiscordBanded,
    "evt_transfer_entropy" -> transferEntropy,
    "evt_partial_corr" -> partialCorr,
    "evt_interpolate" -> interpolate,
    "evt_gapfill" -> gapfill,
    "evt_ntile" -> ntileStats,
    "evt_rank_stats" -> rankStats,
    "evt_transitions" -> transitions,
    "evt_pii_scrub" -> piiScrub,
    "evt_anomaly" -> anomaly,
    "evt_retention" -> retention,
    "evt_funnel" -> funnel,
    "evt_cube" -> cubeAgg,
    "evt_grouping_sets" -> groupingSetsAgg,
    "evt_range_frame" -> rangeFrame,
    "evt_range_join" -> rangeJoin,
    "evt_pivot" -> pivotTypes,
    "evt_running_metrics" -> runningMetrics,
    "evt_keep_first" -> keepFirst,
    "evt_sessionize" -> sessionize,
    "evt_rollup" -> rollup,
    "evt_asof_purchase" -> asofPurchase,
    "evt_asof_native" -> asofNative,
    "evt_asof_next" -> asofNext,
    "evt_attribution" -> attribution,
    "evt_seasonal_decompose" -> seasonalDecompose,
    "evt_changepoint" -> changepoint,
    "evt_theilsen" -> theilSen,
    "evt_ses_forecast" -> sesForecast,
    "evt_mad_outliers" -> madOutliers,
    "evt_acf" -> acf,
    "evt_pacf" -> pacf,
    "evt_ar_forecast" -> arForecast,
    "evt_survival" -> survival,
    "evt_benford" -> benford,
    "evt_holt" -> holt,
    "evt_stl_anomaly" -> stlAnomaly,
    "evt_periodogram" -> periodogram,
    "evt_percentiles" -> percentiles,
    "evt_window_agg" -> windowAgg,
    "evt_setops" -> setOps,
    "evt_json_props" -> jsonProps,
    "evt_full_outer" -> fullOuter,
    "evt_histogram" -> histogram,
    "evt_cross_corr" -> crossCorr,
    "evt_granger" -> granger
  )

  val oracle: Map[String, String] = Map(
    "evt_motif" -> evtMotifSql,
    "evt_kalman" -> evtKalmanSql,
    "evt_hurst" -> evtHurstSql,
    "evt_haar" -> evtHaarSql,
    "evt_discord" -> evtDiscordSql,
    "evt_discord_banded" -> evtDiscordBandedSql,
    "evt_transfer_entropy" -> transferEntropySql,
    "evt_partial_corr" -> partialCorrSql,
    "evt_interpolate" -> interpolateSql,
    "evt_gapfill" -> gapfillSql,
    "evt_ntile" -> ntileStatsSql,
    "evt_rank_stats" -> rankStatsSql,
    "evt_transitions" -> transitionsSql,
    "evt_pii_scrub" -> piiScrubSql,
    "evt_anomaly" -> anomalySql,
    "evt_retention" -> retentionSql,
    "evt_funnel" -> funnelSql,
    "evt_cube" -> cubeAggSql,
    "evt_grouping_sets" -> groupingSetsSql,
    "evt_range_frame" -> rangeFrameSql,
    "evt_range_join" -> rangeJoinSql,
    "evt_pivot" -> pivotTypesSql,
    "evt_running_metrics" -> runningMetricsSql,
    "evt_keep_first" -> keepFirstSql,
    "evt_sessionize" -> sessionizeSql,
    "evt_rollup" -> rollupSql,
    "evt_asof_purchase" -> asofPurchaseSql,
    "evt_asof_native" -> asofPurchaseSql,
    "evt_asof_next" -> asofNextSql,
    "evt_attribution" -> attributionSql,
    "evt_seasonal_decompose" -> seasonalDecomposeSql,
    "evt_changepoint" -> changepointSql,
    "evt_theilsen" -> theilSenSql,
    "evt_ses_forecast" -> sesForecastSql,
    "evt_mad_outliers" -> madOutliersSql,
    "evt_acf" -> acfSql,
    "evt_pacf" -> pacfSql,
    "evt_ar_forecast" -> arForecastSql,
    "evt_survival" -> survivalSql,
    "evt_benford" -> benfordSql,
    "evt_holt" -> holtSql,
    "evt_stl_anomaly" -> stlAnomalySql,
    "evt_periodogram" -> periodogramSql,
    "evt_percentiles" -> percentilesSql,
    "evt_window_agg" -> windowAggSql,
    "evt_setops" -> setOpsSql,
    "evt_json_props" -> jsonPropsSql,
    "evt_full_outer" -> fullOuterSql,
    "evt_histogram" -> histogramSql,
    "evt_cross_corr" -> crossCorrSql,
    "evt_granger" -> grangerSql
  )
}
