package graft.contract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ccm.DetHash
import graft.streaming.{StreamHarness, Streams}

/** Streaming operators under the DuckDB-oracle gate (VERDICT r5 item 4).
  *
  * Each query replays a driver parquet table through the REAL Structured
  * Streaming engine (`readStream` file source -> stateful transform ->
  * `Trigger.AvailableNow` -> memory sink, via [[StreamHarness]]) and the
  * oracle states the batch-equivalent semantics in ANSI SQL — so the
  * streaming layer's answers are pinned by a hash, not just by
  * MemoryStream assertions in `StreamsSpec`.
  *
  * Determinism notes (what makes a streaming query hash-stable):
  *  - `AvailableNow` over a single parquet file = ONE data micro-batch
  *    (no `maxFilesPerTrigger` split), so "first seen" questions resolve
  *    inside one group call where the operators break ties explicitly.
  *  - (user_id, ts) is unique in `events` (verified at sf0.01/sf0.1), so
  *    the event-time re-sort in the stateful buffers is a total order.
  *  - dedup input timestamps derive monotonically from doc_id, so
  *    "earliest" is well-defined across the injected duplicates.
  */
object StreamQueries {
  private val HourUs: Long = 3600L * 1000 * 1000
  private val runCtr = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Stream the events table: whatever the on-disk encoding, Tables
    * .tsToNanos restores the epoch-nanos BIGINT `ts` contract (same
    * normalization as the batch loader); truncate to micros so both
    * engines meet at the same integers (see EventQueries.ev).
    */
  private def evStream(s: SparkSession, dir: String): DataFrame = {
    val schema = Tables.rawEvents(s, dir).schema
    s.readStream
      .schema(schema)
      // the table is a single parquet FILE: FileStreamSource force-injects
      // basePath = path for NON-GLOB paths and then rejects it ("must be a
      // directory"), so hand it a single-char-class glob matching only this
      // file — glob paths skip the basePath injection entirely
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.tsToNanos)
      .select(
        timestamp_micros(expr("ts div 1000")).as("ts"),
        col("user_id").as("userId"),
        col("event_type").as("eventType"),
        col("value")
      )
  }

  // -------------------------------------------------------------------
  // stream_window_stats — Streams.windowedEventStats through the
  // micro-batch engine, complete output mode (every window emitted
  // regardless of watermark progress), vs a plain batch GROUP BY on
  // epoch-aligned hour buckets. Pins the windowed-aggregation path:
  // window assignment, partial/final agg merge, sink semantics.
  // -------------------------------------------------------------------
  private def windowStats(s: SparkSession, dir: String): DataFrame = {
    val out = StreamHarness.runAvailableNow(
      Streams.windowedEventStats(evStream(s, dir), windowLen = "1 hour"),
      "complete"
    )
    out
      .select(
        unix_micros(col("win_start")).as("hour_us"),
        col("eventType").as("event_type"),
        col("n_events"),
        // mean from the EXACT micro-unit sum, not round(avg(double), 4):
        // the tie-proximity sweep (BASELINE.md round 14) measured this
        // site's double avg sitting EXACTLY on a .5 boundary, where the
        // order-dependent float sum is one ulp from flipping the hash.
        // round(sm/n) is scale-0 over one division of bit-identical
        // integers — the proven-safe class — then the 4-dp grid scale.
        (round(col("sum_value_4dp").cast("double") / col("n_events"))
          .cast("long").cast("double") / 10000.0 + 0.0).as("avg_value")
      )
      .transform(Norm.ordered(_, col("hour_us"), col("event_type")))
  }

  private val windowStatsSql: String =
    s"""SELECT epoch_us(ts) - epoch_us(ts) % $HourUs AS hour_us, event_type,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(round(CAST(sum(CAST(round(value * 10000.0) AS BIGINT)) AS DOUBLE) / count(*)) AS BIGINT) / 10000.0 + 0.0 AS avg_value
       |FROM events GROUP BY 1, 2 ORDER BY hour_us, event_type""".stripMargin

  // -------------------------------------------------------------------
  // stream_window_stats_sink — the SAME windowed aggregation written
  // through a REAL parquet FileStreamSink and read back via its
  // _spark_metadata commit log (VERDICT r6 item 3: the production sink
  // path — commit protocol, exactly-once file listing — was the one
  // untested streaming layer). FileStreamSink is append-only, so unlike
  // the complete-mode memory gate above only WATERMARK-FINALIZED windows
  // reach the files: with AvailableNow over one parquet file the single
  // data batch processes every row (watermark still 0 — nothing dropped),
  // then the final watermark advance to max(ts) - 30s emits exactly the
  // hour windows whose end <= watermark. The oracle encodes that
  // finalization cutoff; StreamSinkBoundarySpec asserts the gate data
  // keeps the cutoff >1s away from any hour boundary at every SF, so the
  // engine's exact <=/<  strictness cannot flip a window (the ADVICE r6
  // sessionize lesson, applied here from the start).
  // -------------------------------------------------------------------
  private val SinkWatermarkUs: Long = 30L * 1000 * 1000

  private def windowStatsSink(s: SparkSession, dir: String): DataFrame = {
    val out = StreamHarness.runAvailableNowToParquet(
      Streams.windowedEventStats(evStream(s, dir), windowLen = "1 hour")
    )
    out
      .select(
        unix_micros(col("win_start")).as("hour_us"),
        col("eventType").as("event_type"),
        col("n_events"),
        // exact micro-unit mean — see windowStats' tie-proximity note
        (round(col("sum_value_4dp").cast("double") / col("n_events"))
          .cast("long").cast("double") / 10000.0 + 0.0).as("avg_value")
      )
      .transform(Norm.ordered(_, col("hour_us"), col("event_type")))
  }

  private val windowStatsSinkSql: String =
    s"""WITH wm AS (SELECT max(epoch_us(ts)) - $SinkWatermarkUs AS w FROM events)
       |SELECT epoch_us(ts) - epoch_us(ts) % $HourUs AS hour_us, event_type,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(round(CAST(sum(CAST(round(value * 10000.0) AS BIGINT)) AS DOUBLE) / count(*)) AS BIGINT) / 10000.0 + 0.0 AS avg_value
       |FROM events GROUP BY 1, 2
       |HAVING hour_us + $HourUs <= (SELECT w FROM wm)
       |ORDER BY hour_us, event_type""".stripMargin

  // -------------------------------------------------------------------
  // stream_dedup — Streams.streamingDedup (flatMapGroupsWithState,
  // event-time TTL) over the documents table with an injected duplicate
  // of every doc (doc_id + DupOffset, later timestamp). The stream must
  // emit exactly the ORIGINAL doc per content hash and drop the copy —
  // the oracle needs only the originals because min(doc_id) over the
  // union equals min(doc_id) over the base table. A dedup that leaks
  // copies fails rows_match; one that picks the wrong representative
  // fails hash_match.
  // -------------------------------------------------------------------
  private val DupOffset = 1000000L

  private def streamDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = Tables.documents(s, dir).schema
    val in = s.readStream
      .schema(schema)
      .parquet(s"$dir/documents.parque[t]") // glob: see evStream
      .select(
        explode(array(col("doc_id"), col("doc_id") + lit(DupOffset))).as("docId"),
        col("text")
      )
      // +1: a row with event time exactly 0 sits ON the engine's initial
      // watermark and is dropped as late — keep every derived ts > 0
      .withColumn("ts", timestamp_micros((col("docId") + 1) * lit(1000L)))
      .select(col("ts"), col("docId"), col("text"))
      .as[Streams.Doc]
    val out = StreamHarness.runAvailableNow(Streams.streamingDedup(in).toDF(), "append")
    out
      .select(
        col("textHash").as("text_hash"),
        col("docId").as("doc_id"),
        unix_micros(col("ts")).as("ts_us")
      )
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val streamDedupSql: String =
    s"""SELECT h AS text_hash, doc_id, (doc_id + 1) * 1000 AS ts_us FROM (
       |  SELECT ${DetHash.polyHashSql("text")} AS h, min(doc_id) AS doc_id
       |  FROM documents GROUP BY 1
       |) ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // stream_dedup_builtin — the same duplicated-documents stream through
  // Spark's BUILT-IN `dropDuplicatesWithinWatermark` instead of the
  // custom flatMapGroupsWithState dedup: state is keyed on the content
  // hash and expired by the watermark, exactly the bounded-state story
  // streamingDedup implements by hand. CONTRACT DIFFERENCE, and why this
  // gate projects no doc_id: within a micro-batch the operator keeps an
  // ARBITRARY row among same-key duplicates (the custom operator
  // guarantees the event-time-first one), so only columns EQUAL across
  // duplicates (the hash, the text length) are deterministic output.
  // The rows_match on the distinct-hash count is the dedup guarantee.
  // -------------------------------------------------------------------
  private def streamDedupBuiltin(s: SparkSession, dir: String): DataFrame = {
    val schema = Tables.documents(s, dir).schema
    val in = s.readStream
      .schema(schema)
      .parquet(s"$dir/documents.parque[t]") // glob: see evStream
      .select(
        explode(array(col("doc_id"), col("doc_id") + lit(DupOffset))).as("docId"),
        col("text")
      )
      .withColumn("ts", timestamp_micros((col("docId") + 1) * lit(1000L)))
      .withColumn("text_hash", DetHash.polyHashCol(col("text")))
      .withColumn("text_len", length(col("text")).cast("long"))
      .select(col("ts"), col("text_hash"), col("text_len"))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("text_hash")
    StreamHarness
      .runAvailableNow(in, "append")
      .select(col("text_hash"), col("text_len"))
      .transform(Norm.ordered(_, col("text_hash")))
  }

  // -------------------------------------------------------------------
  // stream_transform_state — Streams.runningTypeTotals through the Spark 4
  // `transformWithState` API (named typed state cells on a MANDATORY
  // RocksDB store): running count/sum per event type in a ValueState
  // (integer-cents, combine-order independent), update-mode emission.
  // One AvailableNow replay over the whole table, then the gate SELECTS
  // the last update per key (max n — strictly increasing), so even a
  // multi-batch replay reduces to the batch GROUP BY the oracle runs;
  // stale partial totals can never leak. The RocksDB provider is
  // set for this query only and restored after — the other gates keep the
  // default HDFS-backed store they were pinned against.
  // -------------------------------------------------------------------
  private def streamTransformState(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(provKey)
    s.conf.set(provKey, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = evStream(s, dir).as[Streams.Event]
      val out = StreamHarness.runAvailableNow(Streams.runningTypeTotals(in).toDF(), "update")
      // keep the LAST update per key: the update-mode sink appends one row
      // per touched key per micro-batch, so a multi-batch replay would
      // otherwise leak stale partial totals beside the final ones. n is
      // strictly increasing across a key's emissions -> max(n) is final.
      val wLast = Window.partitionBy("eventType").orderBy(col("n").desc)
      out
        .withColumn("rn", row_number().over(wLast))
        .filter(col("rn") === 1)
        .select(
          col("eventType").as("event_type"),
          col("n"),
          (round(col("cents") / 100.0, 2) + lit(0.0)).as("sum_value")
        )
        .transform(Norm.ordered(_, col("event_type")))
    } finally {
      prev match {
        case Some(v) => s.conf.set(provKey, v)
        case None    => s.conf.unset(provKey)
      }
    }
  }

  private val streamTransformStateSql: String =
    s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |       round(CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) / 100.0, 2) + 0.0 AS sum_value
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // stream_topk — Streams.typeTopK: BOUNDED-state streaming top-k per
  // event type through transformWithState's ListState (the third state
  // cell kind beside stream_transform_state's ValueState and the FMGWS
  // gates): state is exactly min(k, seen) entries per key regardless of
  // stream volume — the "top documents per category over a firehose"
  // shape that survives unbounded events at 100 TB/day. Update-mode
  // emission re-publishes a key's current top-k per touched batch; the
  // gate keeps, per (event_type, rank), the (value DESC, user ASC,
  // ts ASC)-first row — for every rank the retained set only improves
  // monotonically under that ordering, so the selection equals the final
  // batch's emission even under a multi-batch replay. Oracle: ONE batch
  // window (row_number over the same ordering).
  // -------------------------------------------------------------------
  private val StreamTopK = 5

  private def streamTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(provKey)
    s.conf.set(provKey, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = evStream(s, dir).as[Streams.Event]
      val out = StreamHarness.runAvailableNow(Streams.typeTopK(in, StreamTopK).toDF(), "update")
      val wLast = Window
        .partitionBy("eventType", "rank")
        .orderBy(col("value").desc, col("userId").asc, col("tsUs").asc)
      out
        .withColumn("rn", row_number().over(wLast))
        .filter(col("rn") === 1)
        .select(
          col("eventType").as("event_type"),
          col("rank").cast("long").as("rank"),
          col("value"),
          col("userId").as("user_id"),
          col("tsUs").as("ts_us")
        )
        .transform(Norm.ordered(_, col("event_type"), col("rank")))
    } finally {
      prev match {
        case Some(v) => s.conf.set(provKey, v)
        case None    => s.conf.unset(provKey)
      }
    }
  }

  private val streamTopkSql: String =
    s"""SELECT event_type, rank, value, user_id, ts_us FROM (
       |  SELECT event_type, value, user_id, epoch_us(ts) AS ts_us,
       |         CAST(row_number() OVER (PARTITION BY event_type
       |              ORDER BY value DESC, user_id ASC, epoch_us(ts) ASC) AS BIGINT) AS rank
       |  FROM events
       |) WHERE rank <= $StreamTopK ORDER BY event_type, rank""".stripMargin

  // -------------------------------------------------------------------
  // stream_kmv — Streams.typeKmv: a K-MINIMUM-VALUES distinct sketch per
  // event type through transformWithState's ListState — the STREAMING
  // sketch gate ("distinct users per category over a firehose" in k·16
  // bytes of state per key, forever). The sketch is DetHash-
  // deterministic, so unlike approx_count_distinct the batch oracle
  // replays it EXACTLY: bottom-k of the distinct user hashes + the
  // (k−1)·P/h_(k) estimator (the sketch_kmv_setops arithmetic), emitted
  // beside the exact distinct count. Multi-batch replays select the
  // final sketch by (nsk DESC, hk ASC) — both improve monotonically.
  // -------------------------------------------------------------------
  private val StreamKmvK = 64
  private val StreamKmvSeed = 29L
  // the estimator text, spliced into BOTH engines' expressions
  private val streamKmvEstText =
    s"CASE WHEN nsk < $StreamKmvK THEN CAST(nsk AS DOUBLE) " +
      s"ELSE ${StreamKmvK - 1}e0 * ${DetHash.P}e0 / hk END"

  private def streamKmv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(provKey)
    s.conf.set(provKey, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = evStream(s, dir).as[Streams.Event]
      val out = StreamHarness.runAvailableNow(
        Streams.typeKmv(in, StreamKmvK, StreamKmvSeed).toDF(),
        "update"
      )
      val wLast = Window.partitionBy("eventType").orderBy(col("nsk").desc, col("hk").asc)
      val fin = out
        .withColumn("rn", row_number().over(wLast))
        .filter(col("rn") === 1)
        .select(col("eventType").as("event_type"), col("nsk"), col("hk"))
      val exact = Tables
        .events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact"))
      fin
        .join(exact, Seq("event_type"))
        .select(
          col("event_type"),
          col("nsk"),
          col("hk"),
          (round(expr(streamKmvEstText), 6) + 0.0).as("est"),
          col("exact")
        )
        .transform(Norm.ordered(_, col("event_type")))
    } finally {
      prev match {
        case Some(v) => s.conf.set(provKey, v)
        case None    => s.conf.unset(provKey)
      }
    }
  }

  // -------------------------------------------------------------------
  // stream_histogram — Streams.typeHistogram: a per-event-type VALUE
  // HISTOGRAM through transformWithState's MapState — the FOURTH state
  // cell kind under gate (ValueState: stream_transform_state; ListState:
  // stream_topk / stream_kmv; FMGWS: the custom dedup/session gates).
  // MapState is the right cell when the per-key state is itself keyed:
  // an observation touches ONE (bucket → count) entry instead of
  // rewriting a list blob — the streaming distribution monitor that
  // feeds drift alarms. Buckets are exact integer arithmetic
  // (HALF_UP cents // bucket width — the stream_transform_state cents
  // convention); per-cell counts grow monotonically, so the multi-batch
  // replay selects the final histogram as max(n) per (type, bucket) and
  // the batch oracle is a plain GROUP BY.
  // -------------------------------------------------------------------
  private val StreamHistBucketCents = 1000L

  private def streamHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(provKey)
    s.conf.set(provKey, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = evStream(s, dir).as[Streams.Event]
      val out = StreamHarness.runAvailableNow(
        Streams.typeHistogram(in, StreamHistBucketCents).toDF(),
        "update"
      )
      out
        .groupBy(col("eventType").as("event_type"), col("bucket"))
        .agg(max(col("n")).as("n"))
        .transform(Norm.ordered(_, col("event_type"), col("bucket")))
    } finally {
      prev match {
        case Some(v) => s.conf.set(provKey, v)
        case None    => s.conf.unset(provKey)
      }
    }
  }

  private val streamHistogramSql: String =
    s"""SELECT event_type,
       |       CAST(round(value * 100.0) AS BIGINT) // $StreamHistBucketCents AS bucket,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val streamKmvSql: String =
    s"""WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
       |h0 AS (SELECT event_type, user_id,
       |        ${DetHash.rankHashSql("user_id", "0", "0", StreamKmvSeed)} AS h
       |      FROM d),
       |h AS (SELECT event_type, h, min(user_id) AS user_id
       |      FROM h0 GROUP BY 1, 2),
       |sk AS (
       |  SELECT event_type, h FROM (
       |    SELECT event_type, h,
       |           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |    FROM h) WHERE rn <= $StreamKmvK
       |),
       |st AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS nsk, CAST(max(h) AS BIGINT) AS hk
       |  FROM sk GROUP BY 1
       |),
       |ex AS (
       |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact
       |  FROM events GROUP BY 1
       |)
       |SELECT s.event_type, s.nsk, s.hk,
       |       round($streamKmvEstText, 6) + 0.0 AS est, e.exact
       |FROM st s JOIN ex e ON s.event_type = e.event_type
       |ORDER BY s.event_type""".stripMargin

  private val streamDedupBuiltinSql: String =
    s"""SELECT ${DetHash.polyHashSql("text")} AS text_hash,
       |       CAST(max(length(text)) AS BIGINT) AS text_len
       |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // stream_rolling_corr — Streams.rollingLagCorrelation (update-mode
  // state with ring buffer + event-time TTL): each user's Pearson r of
  // (x_t, x_{t-1}) over their LAST `window` points. In one micro-batch
  // each key updates exactly once, so the update-mode sink holds one row
  // per user = the batch window-function answer.
  // -------------------------------------------------------------------
  private val CorrWindow = 64

  private def rollingCorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val in = evStream(s, dir).as[Streams.Event]
    val out =
      StreamHarness.runAvailableNow(Streams.rollingLagCorrelation(in, window = CorrWindow).toDF(), "update")
    out
      .select(
        col("userId").as("user_id"),
        col("n").as("n_points"),
        Norm.rnd(col("corr"), 6).as("rho")
      )
      .transform(Norm.ordered(_, col("user_id")))
  }

  private val rollingCorrSql: String =
    s"""WITH ranked AS (
       |  SELECT user_id, ts, value,
       |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
       |  FROM events
       |), seq AS (
       |  SELECT user_id, value,
       |         lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS pv
       |  FROM ranked WHERE rn <= $CorrWindow
       |)
       |SELECT user_id, CAST(count(*) AS INTEGER) AS n_points,
       |  round(coalesce(corr(value, pv), 0.0), 6) + 0.0 AS rho
       |FROM seq GROUP BY user_id ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------------
  // stream_cusum — Streams.streamingCusum: the batch evt_changepoint's
  // streaming twin with O(1) SCALAR state per key (integer moment sums +
  // four CUSUM accumulators — no ring buffer). Self-starting: each point
  // is standardized against the PRIOR-only mean/stddev, so the oracle
  // replays the identical arithmetic with prior-frame running windows
  // (exact integer moments; the only doubles are the same divisions and
  // the correctly-rounded sqrt). The single-file availableNow replay
  // delivers each user's events in one batch, sorted inside the group —
  // the same order the oracle's windows use.
  // -------------------------------------------------------------------
  private val CusumSlack = 0.5
  private val CusumThreshold = 4.0

  private def streamCusum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val in = evStream(s, dir).as[Streams.Event]
    val out = StreamHarness.runAvailableNow(
      Streams.streamingCusum(in, CusumSlack, CusumThreshold).toDF(),
      "update"
    )
    out
      .select(
        col("userId").as("user_id"),
        col("n").as("n_points"),
        Norm.rnd(col("maxSPos"), 6).as("max_s_pos"),
        Norm.rnd(col("maxSNeg"), 6).as("max_s_neg"),
        col("alarms").as("n_alarms")
      )
      .transform(Norm.ordered(_, col("user_id")))
  }

  private val streamCusumSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus,
       |         CAST(round(value * 100.0) AS BIGINT) AS cents
       |  FROM events
       |), mom AS (
       |  SELECT *,
       |    CAST(count(*) OVER wp AS BIGINT) AS pn,
       |    CAST(COALESCE(sum(cents) OVER wp, 0) AS BIGINT) AS psum,
       |    CAST(COALESCE(sum(cents * cents) OVER wp, 0) AS BIGINT) AS psum2
       |  FROM e
       |  WINDOW wp AS (PARTITION BY user_id ORDER BY tus
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |), zs AS (
       |  SELECT *, CASE WHEN pn >= 2 AND (pn * psum2 - psum * psum) > 0
       |    THEN (cents - CAST(psum AS DOUBLE) / pn) /
       |         sqrt(CAST(pn * psum2 - psum * psum AS DOUBLE) / CAST(pn * (pn - 1) AS DOUBLE))
       |    ELSE 0.0 END AS z
       |  FROM mom
       |), r AS (
       |  SELECT *, sum(z - $CusumSlack) OVER wr AS r_pos,
       |            sum(-z - $CusumSlack) OVER wr AS r_neg
       |  FROM zs
       |  WINDOW wr AS (PARTITION BY user_id ORDER BY tus
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |), cus AS (
       |  SELECT *, r_pos - least(0.0, min(r_pos) OVER wr) AS s_pos,
       |            r_neg - least(0.0, min(r_neg) OVER wr) AS s_neg
       |  FROM r
       |  WINDOW wr AS (PARTITION BY user_id ORDER BY tus
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
       |  round(max(s_pos), 6) + 0.0 AS max_s_pos,
       |  round(max(s_neg), 6) + 0.0 AS max_s_neg,
       |  CAST(sum(CASE WHEN s_pos > $CusumThreshold OR s_neg > $CusumThreshold
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms
       |FROM cus GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // stream_sessionize — Streams.streamingSessionize: watermark-governed
  // session finalization. The finite replay has exactly two engine steps:
  // the data batch (watermark 0 — nothing finalizes, all sessions buffer
  // in state) and the watermark-advance batch, where only keys whose
  // EventTimeTimeout fired (timeout = last_end + gap + 1, fires when the
  // watermark maxMs - delay passes it) run and flush ALL their sessions.
  // So the oracle = batch gaps-and-islands sessionization RESTRICTED to
  // users whose last event went quiet before the final watermark — the
  // one real streaming-vs-batch semantic difference, pinned by hash.
  // (Verified on this data: no user's last_end sits within 1 ms of the
  // fire boundary, so the gate is insensitive to the engine's strict-vs-
  // non-strict timeout comparison; 149/150 users finalize at sf0.01.)
  // -------------------------------------------------------------------
  private val GapMs = 30000L
  private val SessionDelayMs = 10000L

  private def streamSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val in = evStream(s, dir).as[Streams.Event]
    val out = StreamHarness.runAvailableNow(
      Streams
        .streamingSessionize(in, gapMs = GapMs, watermarkDelay = s"${SessionDelayMs / 1000} seconds")
        .toDF(),
      "append"
    )
    out
      .select(
        col("userId").as("user_id"),
        col("nEvents").as("n_events"),
        col("startMs").as("start_ms"),
        col("endMs").as("end_ms")
      )
      .transform(Norm.ordered(_, col("user_id"), col("start_ms")))
  }

  private val streamSessionizeSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_ms(ts) AS tms FROM events
       |), mx AS (SELECT max(tms) AS max_ms FROM e),
       |b AS (
       |  SELECT user_id, tms,
       |         CASE WHEN lag(tms) OVER w IS NULL
       |              OR tms - lag(tms) OVER w > $GapMs THEN 1 ELSE 0 END AS brk
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms)
       |), sid AS (
       |  SELECT user_id, tms,
       |         sum(brk) OVER (PARTITION BY user_id ORDER BY tms ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM b
       |), sess AS (
       |  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
       |         min(tms) AS start_ms, max(tms) AS end_ms
       |  FROM sid GROUP BY 1, 2
       |), le AS (SELECT user_id, max(end_ms) AS last_end FROM sess GROUP BY 1)
       |SELECT s.user_id, s.n_events, s.start_ms, s.end_ms
       |FROM sess s JOIN le ON s.user_id = le.user_id CROSS JOIN mx
       |WHERE le.last_end + $GapMs < mx.max_ms - $SessionDelayMs
       |ORDER BY s.user_id, s.start_ms""".stripMargin

  // -------------------------------------------------------------------
  // stream_late_data — watermark LATE-DATA semantics made first-class:
  // the events table is replayed as FOUR file-source micro-batches
  // (maxFilesPerTrigger = 1, file mtimes pinned so the order is
  // deterministic): A (< Jan 24), B ([Jan 24, Jan 27)), C = the LATE
  // batch (re-sent ancient rows from Jan 1-3 — their hour windows sit
  // far below every watermark candidate: DROPPED — plus re-sent rows
  // from the two hours just before Jan 27 — window ends above every
  // candidate: ACCEPTED, double-counting their windows), then D
  // (>= Jan 27), whose fresh event times push the final watermark past
  // the accepted-late windows so append mode actually EMITS them (an
  // accepted late row in the LAST batch is definitionally invisible in
  // append output: emitted means end <= final watermark, accepted means
  // end above it — the 4th batch is what closes that gap). Empirically
  // (LateProbe) the operative late-filter watermark lags the reported
  // one by a batch, so C's two slices are chosen to be dropped/accepted
  // identically under BOTH candidate watermarks (post-A and post-B) —
  // the oracle encodes the predicate against the post-B watermark and
  // the construction makes the lag unobservable.
  // -------------------------------------------------------------------
  private val LateCut1Us: Long =
    java.time.Instant.parse("2024-01-24T00:00:00Z").toEpochMilli * 1000L
  private val LateCut2Us: Long =
    java.time.Instant.parse("2024-01-27T00:00:00Z").toEpochMilli * 1000L
  private val LateOldEndUs: Long =
    java.time.Instant.parse("2024-01-04T00:00:00Z").toEpochMilli * 1000L
  private val LateDelayUs: Long = 3L * HourUs
  private val LateWindowUs: Long = HourUs

  private def streamLateData(s: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempDirectory("graft-late")
    val inDir = tmp.resolve("in")
    java.nio.file.Files.createDirectories(inDir)
    val ev = Tables
      .events(s, dir)
      .select(expr("ts div 1000").as("tus"), col("event_id"), col("value"))
    def writeOne(df: DataFrame, name: String, mtimeMs: Long): Unit = {
      val stage = tmp.resolve(s"stage_$name")
      df.coalesce(1).write.parquet(stage.toString)
      val part = java.nio.file.Files
        .list(stage)
        .iterator()
        .asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .get
      val dest = inDir.resolve(name)
      java.nio.file.Files.move(part, dest)
      java.nio.file.Files
        .setLastModifiedTime(dest, java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
      graft.GateResult.deleteRecursively(stage)
    }
    writeOne(ev.filter(col("tus") < LateCut1Us), "00-batch-a.parquet", 1000000L)
    writeOne(
      ev.filter(col("tus") >= LateCut1Us && col("tus") < LateCut2Us),
      "01-batch-b.parquet",
      2000000L
    )
    writeOne(
      ev.filter(col("tus") < LateOldEndUs)
        .unionByName(
          ev.filter(col("tus") >= LateCut2Us - 2 * HourUs && col("tus") < LateCut2Us)
        ),
      "02-batch-late.parquet",
      3000000L
    )
    writeOne(ev.filter(col("tus") >= LateCut2Us), "03-batch-d.parquet", 4000000L)
    val in = s.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir.toString)
      .withColumn("ts", timestamp_micros(col("tus")))
      .withWatermark("ts", s"${LateDelayUs / (3600L * 1000 * 1000)} hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100.0).cast("long")).as("sum_cents")
      )
    val out = StreamHarness.runAvailableNow(in, "append")
    val res = out
      .select(
        expr("unix_micros(window.start)").as("window_start_us"),
        col("n_events"),
        col("sum_cents")
      )
      .transform(Norm.ordered(_, col("window_start_us")))
    graft.GateResult.materialize(res)(graft.GateResult.deleteRecursively(tmp))
  }

  private val streamLateDataSql: String =
    s"""WITH ev AS (SELECT epoch_us(ts) AS tus, value FROM events),
       |wmb AS (SELECT max(tus) - $LateDelayUs AS wm FROM ev WHERE tus < $LateCut2Us),
       |wmf AS (SELECT max(tus) - $LateDelayUs AS wm FROM ev),
       |accepted AS (
       |  SELECT tus, value FROM ev WHERE tus < $LateCut2Us
       |  UNION ALL
       |  SELECT tus, value FROM ev WHERE tus >= $LateCut2Us
       |  UNION ALL
       |  SELECT c.tus, c.value FROM (
       |    SELECT tus, value FROM ev WHERE tus < $LateOldEndUs
       |    UNION ALL SELECT tus, value FROM ev
       |      WHERE tus >= ${LateCut2Us - 2 * HourUs} AND tus < $LateCut2Us
       |  ) c CROSS JOIN wmb
       |  WHERE (c.tus // $LateWindowUs) * $LateWindowUs + $LateWindowUs > wmb.wm
       |)
       |SELECT (tus // $LateWindowUs) * $LateWindowUs AS window_start_us,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents
       |FROM accepted CROSS JOIN wmf
       |WHERE (tus // $LateWindowUs) * $LateWindowUs + $LateWindowUs <= wmf.wm
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // stream_session_builtin — the SAME sessionization through Spark's
  // built-in `session_window` aggregation (merging session windows in
  // the state store) beside stream_sessionize's hand-rolled
  // flatMapGroupsWithState — the stream_dedup/stream_dedup_builtin
  // pattern applied to sessions. Semantics differ deliberately and the
  // oracle encodes it: the built-in finalizes PER SESSION (append mode
  // emits a window once the watermark passes ITS end = last event +
  // gap), while the custom operator's EventTimeTimeout flushes PER USER
  // (all of a quiet user's sessions at once); and the built-in's
  // end_ms is last_event + gap, not last_event. Same replay: data
  // batch at watermark 0 buffers everything, the watermark-advance
  // batch emits every session with end + gap <= max_ts - delay.
  // -------------------------------------------------------------------
  private def streamSessionBuiltin(s: SparkSession, dir: String): DataFrame = {
    val in = evStream(s, dir)
    val out = StreamHarness.runAvailableNow(
      in.withWatermark("ts", s"${SessionDelayMs / 1000} seconds")
        .groupBy(col("userId"), session_window(col("ts"), s"${GapMs / 1000} seconds"))
        .agg(count(lit(1)).as("n_events")),
      "append"
    )
    out
      .select(
        col("userId").as("user_id"),
        col("n_events"),
        expr("unix_micros(session_window.start) div 1000").as("start_ms"),
        expr("unix_micros(session_window.end) div 1000").as("end_ms")
      )
      .transform(Norm.ordered(_, col("user_id"), col("start_ms")))
  }

  private val streamSessionBuiltinSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_ms(ts) AS tms FROM events
       |), mx AS (SELECT max(tms) AS max_ms FROM e),
       |b AS (
       |  SELECT user_id, tms,
       |         CASE WHEN lag(tms) OVER w IS NULL
       |              OR tms - lag(tms) OVER w > $GapMs THEN 1 ELSE 0 END AS brk
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms)
       |), sid AS (
       |  SELECT user_id, tms,
       |         sum(brk) OVER (PARTITION BY user_id ORDER BY tms ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM b
       |), sess AS (
       |  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
       |         min(tms) AS start_ms, max(tms) + $GapMs AS end_ms
       |  FROM sid GROUP BY 1, 2
       |)
       |SELECT s.user_id, s.n_events, s.start_ms, s.end_ms
       |FROM sess s CROSS JOIN mx
       |WHERE s.end_ms <= mx.max_ms - $SessionDelayMs
       |ORDER BY s.user_id, s.start_ms""".stripMargin

  // -------------------------------------------------------------------
  // stream_enrich — Streams.enrichWithDim: stream-static join (the
  // canonical "enrich a firehose with reference data" shape) followed by
  // a streaming aggregation. The static side is a BATCH aggregate over
  // the same events table (per-user event count -> integer activity
  // tier); Spark replans it per micro-batch. Tier derives from an exact
  // integer count — never from a float aggregate — so the bucket edges
  // cannot flip between engines. Complete output mode; the oracle is the
  // equivalent batch join + GROUP BY.
  // -------------------------------------------------------------------
  private val TierDiv = 10

  private def streamEnrich(s: SparkSession, dir: String): DataFrame = {
    val prof = Tables
      .events(s, dir)
      .groupBy(col("user_id").as("userId"))
      .agg(count(lit(1)).as("n_total"))
      .withColumn("tier", expr(s"n_total div $TierDiv"))
      .select("userId", "tier")
    val enriched = Streams.enrichWithDim(evStream(s, dir), prof, "userId")
    // integer-cents sum (the q10 pattern): exact integer accumulation is
    // combine-order independent, immune to micro-batch partial-agg order
    val agg = enriched
      .groupBy(col("eventType"), col("tier"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100.0).cast("long")).as("cents")
      )
    val out = StreamHarness.runAvailableNow(agg, "complete")
    out
      .select(
        col("eventType").as("event_type"),
        col("tier"),
        col("n_events"),
        Norm.rnd(col("cents") / 100.0, 2).as("sum_value")
      )
      .transform(Norm.ordered(_, col("event_type"), col("tier")))
  }

  private val streamEnrichSql: String =
    s"""WITH prof AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) // $TierDiv AS tier
       |  FROM events GROUP BY user_id
       |)
       |SELECT e.event_type, p.tier, CAST(count(*) AS BIGINT) AS n_events,
       |       round(CAST(sum(CAST(round(e.value * 100.0) AS BIGINT)) AS BIGINT) / 100.0, 2) + 0.0 AS sum_value
       |FROM events e JOIN prof p ON e.user_id = p.user_id
       |GROUP BY 1, 2 ORDER BY event_type, tier""".stripMargin

  // -------------------------------------------------------------------
  // stream_scd2_join — Streams.enrichWithScd2: streaming events enriched
  // against an SCD2 (type-2) dimension by TEMPORAL validity, not just key
  // equality — each event joins the dimension version valid AT ITS EVENT
  // TIME. The dim is built from the batch table: every purchase starts a
  // new version carrying the user's running purchase count (valid until
  // the next purchase; a base version 0 covers each user's pre-purchase
  // history, open-ended Long.MaxValue for the current version). Versions
  // PARTITION each user's timeline, so the inner join is lossless —
  // n_events sums to the full event count, which the oracle hash checks
  // implicitly. Stream-static joins keep no state and re-plan the static
  // side per micro-batch — exactly the SCD2 operational contract (new
  // versions visible to the next batch). Duplicate purchase timestamps
  // produce empty [t, t) intervals that match nothing, identically on
  // both engines (same (ts, event_id) lead ordering).
  // -------------------------------------------------------------------
  private val Scd2MaxUs = Long.MaxValue

  private def streamScd2Join(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purch = ev
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"))
    val pw = Window.partitionBy("user_id").orderBy(col("tus").asc, col("event_id").asc)
    val versions = purch
      .withColumn("n_purch", row_number().over(pw).cast("long"))
      .withColumn("valid_to_us", coalesce(lead(col("tus"), 1).over(pw), lit(Scd2MaxUs)))
      .select(col("user_id").as("dim_user"), col("n_purch"), col("tus").as("valid_from_us"), col("valid_to_us"))
    val base = ev
      .select(col("user_id")).distinct()
      .join(purch.groupBy("user_id").agg(min(col("tus")).as("first_tus")), Seq("user_id"), "left")
      .select(
        col("user_id").as("dim_user"),
        lit(0L).as("n_purch"),
        lit(-1L).as("valid_from_us"),
        coalesce(col("first_tus"), lit(Scd2MaxUs)).as("valid_to_us")
      )
    val dim = base.union(versions)
    val stream = evStream(s, dir).withColumn("tsUs", expr("unix_micros(ts)"))
    val enriched = Streams.enrichWithScd2(stream, dim, "userId", "dim_user", "tsUs")
    val agg = enriched
      .groupBy(col("eventType"), col("n_purch"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100.0).cast("long")).as("cents")
      )
    val out = StreamHarness.runAvailableNow(agg, "complete")
    out
      .select(
        col("eventType").as("event_type"),
        col("n_purch"),
        col("n_events"),
        Norm.rnd(col("cents") / 100.0, 2).as("sum_value")
      )
      .transform(Norm.ordered(_, col("event_type"), col("n_purch")))
  }

  private val streamScd2JoinSql: String =
    s"""WITH p AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id FROM events WHERE event_type = 'purchase'
       |),
       |v AS (
       |  SELECT user_id AS dim_user, CAST(row_number() OVER w AS BIGINT) AS n_purch,
       |         tus AS valid_from_us,
       |         COALESCE(lead(tus, 1) OVER w, ${Scd2MaxUs}) AS valid_to_us
       |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
       |),
       |b AS (
       |  SELECT u.user_id AS dim_user, CAST(0 AS BIGINT) AS n_purch,
       |         CAST(-1 AS BIGINT) AS valid_from_us,
       |         COALESCE(f.first_tus, ${Scd2MaxUs}) AS valid_to_us
       |  FROM (SELECT DISTINCT user_id FROM events) u
       |  LEFT JOIN (SELECT user_id, min(tus) AS first_tus FROM p GROUP BY 1) f
       |    ON u.user_id = f.user_id
       |),
       |dim AS (SELECT * FROM b UNION ALL SELECT * FROM v),
       |j AS (
       |  SELECT e.event_type, d.n_purch, e.value
       |  FROM events e JOIN dim d
       |    ON e.user_id = d.dim_user
       |   AND epoch_us(e.ts) >= d.valid_from_us AND epoch_us(e.ts) < d.valid_to_us
       |)
       |SELECT event_type, n_purch, CAST(count(*) AS BIGINT) AS n_events,
       |       round(CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) / 100.0, 2) + 0.0 AS sum_value
       |FROM j GROUP BY 1, 2 ORDER BY event_type, n_purch""".stripMargin

  // -------------------------------------------------------------------
  // stream_ccm — Streams.streamingCcm: the sliding-window bidirectional
  // CCM re-estimator, replayed over the events table as per-user series
  // points. y cannot be a lag window (streams reject non-time windows),
  // so the second observable derives arithmetically from event_id —
  // integer mod then divide, bit-exact in both engines. With window >=
  // series length the single-batch re-estimation equals full-series CCM,
  // so the oracle is the SAME declarative curve chain that pins
  // ccm_curve, aggregated to the StreamCcmResult shape (mean rho over
  // the explicit lib ladder + convergence, both directions pivoted).
  // -------------------------------------------------------------------
  private val StreamCcmLibs = Seq(20, 40, 60)
  private val StreamCcmSamples = 2
  private val StreamCcmMinPoints = 60 // users below this emit nothing (the
  // minPoints gate IS part of the semantics under test; the oracle mirrors
  // it with a HAVING — 116/150 users emit at sf0.01)

  private val StreamCcmWindow = 128

  private def streamCcm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Gate precondition (ADVICE r6): the full-series oracle is equivalent
    // to the rolling-window operator ONLY while window >= every per-user
    // series length — otherwise takeRight silently truncates and the hash
    // gate breaks with no pointer to the cause. Fail fast, loudly, here.
    val maxPerUser = Tables
      .events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")))
      .head()
      .getLong(0)
    require(
      maxPerUser <= StreamCcmWindow,
      s"stream_ccm gate precondition violated: a user has $maxPerUser events > " +
        s"window=$StreamCcmWindow — the rolling window would truncate and diverge " +
        "from the full-series oracle; raise StreamCcmWindow or shrink the gate SF"
    )
    val schema = Tables.rawEvents(s, dir).schema
    val in = s.readStream
      .schema(schema)
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.tsToNanos)
      .select(
        col("user_id").as("skey"),
        col("ts").as("ord"), // epoch nanos: unique per user -> total order
        col("value").as("x"),
        ((col("event_id") % 1000).cast("double") / 1000.0).as("y")
      )
      .as[Streams.SeriesPoint]
    val out = StreamHarness.runAvailableNow(
      Streams
        .streamingCcm(
          in,
          window = StreamCcmWindow, // asserted >= any per-user series length above
          minPoints = StreamCcmMinPoints,
          spec = graft.ccm.CcmSpec(
            numSamples = StreamCcmSamples,
            seed = CcmQueries.Seed,
            libSizes = Some(StreamCcmLibs)
          )
        )
        .toDF(),
      "append"
    )
    out
      .select(
        col("skey").as("user_id"),
        col("n").as("n_points"),
        col("xCausesY").as("x_causes_y"),
        col("yCausesX").as("y_causes_x"),
        Norm.rnd(col("rhoXY"), 6).as("rho_xy"),
        Norm.rnd(col("rhoYX"), 6).as("rho_yx")
      )
      .transform(Norm.ordered(_, col("user_id")))
  }

  private val streamCcmSql: String =
    CcmQueries.streamCcmSql(
      StreamCcmSamples,
      StreamCcmLibs,
      "(event_id % 1000) / 1000.0",
      StreamCcmMinPoints
    )

  // -------------------------------------------------------------------
  // stream_stream_join — Streams.attributedClicks: a genuine stream-
  // STREAM inner join (purchases x clicks per user within a 30-minute
  // attribution window), the one join class the streaming layer had not
  // gated (stream_enrich is stream-static). Both sides are the SAME
  // file-source stream filtered two ways — a self-join through the
  // micro-batch engine's symmetric hash join with watermarked state on
  // both inputs. With AvailableNow over one parquet file every row
  // arrives in a single data batch (watermark 0 — nothing dropped,
  // nothing evicted early) and inner-join matches emit immediately, so
  // the append-mode result equals the batch join the oracle runs.
  // (user_id, ts) is unique in events, so the match set is
  // duplicate-free and the hash is stable.
  // -------------------------------------------------------------------
  private val ClickLagUs: Long = 1800L * 1000 * 1000

  private def streamStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = evStream(s, dir)
    val joined = Streams.attributedClicks(
      ev.filter(col("eventType") === "purchase"),
      ev.filter(col("eventType") === "click"),
      maxLag = "30 minutes"
    )
    val out = StreamHarness.runAvailableNow(joined, "append")
    out
      .select(
        col("p_user").as("user_id"),
        unix_micros(col("p_ts")).as("purchase_us"),
        unix_micros(col("c_ts")).as("click_us"),
        Norm.rnd(col("p_value"), 4).as("purchase_value")
      )
      .transform(Norm.ordered(_, col("user_id"), col("purchase_us"), col("click_us")))
  }

  private val streamStreamJoinSql: String =
    s"""SELECT p.user_id, epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS click_us,
       |  round(p.value, 4) + 0.0 AS purchase_value
       |FROM events p JOIN events c
       |  ON p.user_id = c.user_id
       | AND p.event_type = 'purchase' AND c.event_type = 'click'
       | AND epoch_us(c.ts) <= epoch_us(p.ts)
       | AND epoch_us(p.ts) - epoch_us(c.ts) <= $ClickLagUs
       |ORDER BY 1, 2, 3""".stripMargin

  // -------------------------------------------------------------------
  // stream_stream_left_join — the WATERMARK-DRIVEN half of stream-stream
  // join semantics: LEFT OUTER emits a null-padded row for a purchase
  // only once the watermark proves no matching click can still arrive
  // (c_ts <= p_ts, so eviction fires when the final watermark passes
  // p_ts). Matches emit immediately (as in the inner gate); the
  // null-padded rows emit in the AvailableNow run's final watermark
  // batch — but ONLY for purchases below the final watermark
  // min(max_p, max_c) - delay, and the oracle states exactly that
  // cutoff. The 700 s delay is chosen so the cutoff sits >= ~58 s from
  // every unmatched purchase at all three gate SFs
  // (StreamJoinBoundarySpec pins the margin), making the engine's
  // exact </<= eviction strictness unobservable — the sessionize-gate
  // lesson (ADVICE r6) applied from the start.
  // -------------------------------------------------------------------
  private[graft] val LeftJoinDelaySec = 700L

  private def streamStreamLeftJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = evStream(s, dir)
    val joined = Streams.attributedClicks(
      ev.filter(col("eventType") === "purchase"),
      ev.filter(col("eventType") === "click"),
      maxLag = "30 minutes",
      watermarkDelay = s"$LeftJoinDelaySec seconds",
      joinType = "left_outer"
    )
    val out = StreamHarness.runAvailableNow(joined, "append")
    out
      .select(
        col("p_user").as("user_id"),
        unix_micros(col("p_ts")).as("purchase_us"),
        unix_micros(col("c_ts")).as("click_us"),
        Norm.rnd(col("p_value"), 4).as("purchase_value")
      )
      .transform(Norm.ordered(_, col("user_id"), col("purchase_us"), col("click_us")))
  }

  private val streamStreamLeftJoinSql: String =
    s"""WITH p AS (
       |  SELECT user_id, epoch_us(ts) AS pt, value FROM events WHERE event_type = 'purchase'
       |), c AS (
       |  SELECT user_id, epoch_us(ts) AS ct FROM events WHERE event_type = 'click'
       |), wm AS (
       |  SELECT least((SELECT max(pt) FROM p), (SELECT max(ct) FROM c))
       |         - ${LeftJoinDelaySec}000000 AS w
       |), matched AS (
       |  SELECT p.user_id, p.pt, c.ct, p.value
       |  FROM p JOIN c ON p.user_id = c.user_id
       |   AND c.ct <= p.pt AND c.ct >= p.pt - $ClickLagUs
       |), unmatched AS (
       |  SELECT p.user_id, p.pt, CAST(NULL AS BIGINT) AS ct, p.value
       |  FROM p CROSS JOIN wm
       |  WHERE p.pt < wm.w
       |    AND NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
       |                    AND c.ct <= p.pt AND c.ct >= p.pt - $ClickLagUs)
       |)
       |SELECT user_id, pt AS purchase_us, ct AS click_us,
       |       round(value, 4) + 0.0 AS purchase_value
       |FROM (SELECT * FROM matched UNION ALL SELECT * FROM unmatched)
       |ORDER BY user_id, purchase_us, click_us NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // stream_asof_join — STREAM-STREAM AS-OF JOIN (Streams.asOfAttribution):
  // each purchase enriched with only the LATEST click at-or-before it
  // within the 30-minute window, the temporal analog of
  // stream_stream_join's interval contract and the streaming counterpart
  // of the custom batch AsOfJoin operator. Built on transformWithState +
  // EVENT-TIME TIMERS (the one timer-driven emission path the streaming
  // matrix lacked): an as-of argmax is only final once the watermark
  // proves the click set below p_ts complete, so rows emit at timer
  // expiry, and purchases above the final watermark NEVER emit — the
  // oracle states that eviction cutoff explicitly as
  // (max event ms − delay ms), the engine's watermark arithmetic — over
  // the FILTERED stream (purchase ∪ click): the watermark node sits
  // above the event-type filter, so a later-timestamped view/error row
  // never advances it (the first cut used max over ALL events and lost
  // exactly one purchase sitting 3.6 s above the true cutoff at sf0.01).
  // The 900 s delay places the cutoff ≥ 45 s from every purchase at all
  // three gate SFs (StreamJoinBoundarySpec pins the margin — delay 800
  // sits 3.4 s from a purchase at sf0.01), so ms-floor and </<= timer
  // strictness are unobservable. Unmatched purchases below the cutoff
  // emit null-padded (as-of LEFT semantics).
  // -------------------------------------------------------------------
  private[graft] val AsOfDelaySec = 900L

  private def streamAsOfJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(provKey)
    s.conf.set(provKey, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = evStream(s, dir)
        .filter(col("eventType").isin("purchase", "click"))
        .as[Streams.Event]
      val out = StreamHarness.runAvailableNow(
        Streams.asOfAttribution(in, ClickLagUs, s"$AsOfDelaySec seconds").toDF(),
        "append"
      )
      out
        .select(
          col("userId").as("user_id"),
          col("purchaseUs").as("purchase_us"),
          Norm.rnd(col("purchaseValue"), 4).as("purchase_value"),
          col("clickUs").as("click_us"),
          (col("purchaseUs") - col("clickUs")).as("lag_us")
        )
        // total order (ADVICE r12): two purchases sharing (user_id, ts)
        // but differing in value would tie under (user_id, purchase_us)
        // and sort engine-dependently — a latent hash flake; value and
        // click_us break the tie identically on both sides
        .transform(
          Norm.ordered(_, col("user_id"), col("purchase_us"), col("purchase_value"), col("click_us"))
        )
    } finally {
      prev match {
        case Some(v) => s.conf.set(provKey, v)
        case None    => s.conf.unset(provKey)
      }
    }
  }

  private val streamAsOfJoinSql: String =
    s"""WITH cutoff AS (
       |  SELECT ((max(epoch_us(ts)) // 1000) - ${AsOfDelaySec}000) * 1000 AS w FROM events
       |  WHERE event_type IN ('purchase', 'click')
       |), p AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS pus, value FROM events WHERE event_type = 'purchase'
       |), c AS (
       |  SELECT user_id AS cu, epoch_us(ts) AS cus FROM events WHERE event_type = 'click'
       |)
       |-- keyed PER PURCHASE EVENT (ADVICE r11): grouping by the display
       |-- columns alone would collapse two purchases sharing (user, ts,
       |-- value) into one row while the streaming processor emits one
       |-- AsOfRow per purchase event; event_id restores 1:1 parity (it is
       |-- grouped on, not projected, so the output schema is unchanged)
       |SELECT p.user_id, p.pus AS purchase_us, round(p.value, 4) + 0.0 AS purchase_value,
       |       max(c.cus) AS click_us, p.pus - max(c.cus) AS lag_us
       |FROM p LEFT JOIN c ON c.cu = p.user_id AND c.cus <= p.pus AND p.pus - c.cus <= $ClickLagUs
       |WHERE p.pus < (SELECT w FROM cutoff)
       |GROUP BY p.event_id, p.user_id, p.pus, p.value
       |ORDER BY 1, 2, 3, 4""".stripMargin

  // -------------------------------------------------------------------
  // stream_upsert — streaming ingestion INTO the year-partitioned table
  // (VERDICT r7 item 5): the restatement updates arrive as a FILE STREAM
  // of micro-batches (maxFilesPerTrigger=1 -> one batch per staged file)
  // and foreachBatch applies SinkQueries.mergeBatch — the same keyed
  // anti-join + dynamic-partition-overwrite unit as the batch gate, so
  // work per batch scales with the touched partitions, never the table.
  // After the stream drains, batch 0 is re-applied OUTSIDE the engine,
  // simulating at-least-once redelivery after a checkpoint loss: the
  // merge is idempotent, so the oracle (shared verbatim with
  // sink_upsert_overwrite) hash-matches ONLY if the replay was a no-op.
  // StreamUpsertSpec additionally pins byte-identical untouched
  // partitions and key uniqueness under a full stream replay.
  // -------------------------------------------------------------------
  private[contract] def stageUpdateBatches(
      s: SparkSession,
      dir: String,
      root: java.nio.file.Path
  ): java.nio.file.Path = {
    import java.nio.file.{Files, Path}
    import scala.jdk.CollectionConverters._
    val in = Files.createDirectory(root.resolve("in"))
    val updates = SinkQueries.updatesBatch(s, dir)
    // two deterministic micro-batches, staged as one parquet file each
    Seq(0, 1).foreach { b =>
      val staging = root.resolve(s"stage$b")
      updates
        .filter(col("o_orderkey") % 2 === b)
        .coalesce(1)
        .write
        .parquet(staging.toString)
      val part = Files
        .list(staging)
        .iterator()
        .asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no parquet part in $staging"))
      Files.move(part, in.resolve(s"batch$b.parquet"): Path)
    }
    in
  }

  private[contract] def runUpsertStream(
      s: SparkSession,
      tbl: String,
      in: java.nio.file.Path,
      ckpt: java.nio.file.Path,
      schema: org.apache.spark.sql.types.StructType
  ): Unit = {
    val q = s.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        SinkQueries.mergeBatch(s, tbl, batch)
      }
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def streamUpsert(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.Files
    val run = s"su${runCtr.incrementAndGet()}"
    val (tbl, tmp) = SinkQueries.writeYearPartitioned(s, dir, run)
    val root = Files.createTempDirectory(s"graft-stream-upsert-$run")
    val in = stageUpdateBatches(s, dir, root)
    val schema = SinkQueries.updatesBatch(s, dir).schema
    runUpsertStream(s, tbl, in, Files.createDirectory(root.resolve("ckpt")), schema)
    // at-least-once redelivery: re-apply batch 0 outside the engine; the
    // keyed merge must leave the table unchanged for the oracle to match
    SinkQueries.mergeBatch(s, tbl, s.read.parquet(in.resolve("batch0.parquet").toString))
    val agg = SinkQueries.yearAgg(s, tbl)
    graft.GateResult.materialize(agg) {
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      graft.GateResult.deleteRecursively(java.nio.file.Paths.get(tmp))
      graft.GateResult.deleteRecursively(root)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_upsert" -> streamUpsert,
    "stream_stream_left_join" -> streamStreamLeftJoin,
    "stream_stream_join" -> streamStreamJoin,
    "stream_asof_join" -> streamAsOfJoin,
    "stream_window_stats" -> windowStats,
    "stream_window_stats_sink" -> windowStatsSink,
    "stream_dedup" -> streamDedup,
    "stream_dedup_builtin" -> streamDedupBuiltin,
    "stream_transform_state" -> streamTransformState,
    "stream_topk" -> streamTopk,
    "stream_kmv" -> streamKmv,
    "stream_histogram" -> streamHistogram,
    "stream_rolling_corr" -> rollingCorr,
    "stream_cusum" -> streamCusum,
    "stream_sessionize" -> streamSessionize,
    "stream_session_builtin" -> streamSessionBuiltin,
    "stream_late_data" -> streamLateData,
    "stream_enrich" -> streamEnrich,
    "stream_scd2_join" -> streamScd2Join,
    "stream_ccm" -> streamCcm
  )

  val oracle: Map[String, String] = Map(
    "stream_upsert" -> SinkQueries.upsertOverwriteSql,
    "stream_stream_left_join" -> streamStreamLeftJoinSql,
    "stream_stream_join" -> streamStreamJoinSql,
    "stream_asof_join" -> streamAsOfJoinSql,
    "stream_window_stats" -> windowStatsSql,
    "stream_window_stats_sink" -> windowStatsSinkSql,
    "stream_dedup" -> streamDedupSql,
    "stream_dedup_builtin" -> streamDedupBuiltinSql,
    "stream_transform_state" -> streamTransformStateSql,
    "stream_topk" -> streamTopkSql,
    "stream_kmv" -> streamKmvSql,
    "stream_histogram" -> streamHistogramSql,
    "stream_rolling_corr" -> rollingCorrSql,
    "stream_cusum" -> streamCusumSql,
    "stream_sessionize" -> streamSessionizeSql,
    "stream_session_builtin" -> streamSessionBuiltinSql,
    "stream_late_data" -> streamLateDataSql,
    "stream_enrich" -> streamEnrichSql,
    "stream_scd2_join" -> streamScd2JoinSql,
    "stream_ccm" -> streamCcmSql
  )
}
