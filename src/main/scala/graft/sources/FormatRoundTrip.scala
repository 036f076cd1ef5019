package graft.sources

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.contract.{Norm, Tables}

/** Source/sink format coverage: write the events table out in a non-parquet
  * format, read it back through that format's reader, and aggregate — the
  * oracle computes the same aggregate from the original parquet, so the
  * round-trip (writer options, reader schema, type mapping) is pinned by
  * hash, not by "it didn't throw".
  *
  * CSV exercises the text-format edges that actually bite in ingest
  * pipelines: explicit schema (no inference nondeterminism), delimiter,
  * header, and LOSSLESS value transport — the epoch-nanos BIGINT and the
  * double `value` survive a text round-trip exactly (longs trivially;
  * doubles because Spark writes round-trippable representations and
  * reads them back with exact binary-to-decimal-to-binary parity).
  * ORC exercises the columnar alternative's type mapping.
  *
  * Scale note: both queries keep the write DISTRIBUTED (no coalesce) —
  * format conversion of a 100 TB table is a map-only job; the aggregate
  * afterwards reads back with normal partition parallelism.
  */
object FormatRoundTrip {
  private val ctr = new AtomicInteger(0)

  /** events projected to stable primitive columns for transport. */
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))

  private def agg(df: DataFrame): DataFrame =
    df.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        // micros, not nanos: DuckDB reads parquet TIMESTAMP(NANOS) at
        // microsecond precision, so the oracle can only see micros
        min(expr("ts div 1000")).as("min_ts"),
        max(expr("ts div 1000")).as("max_ts"),
        sum(round(col("value") * 100.0).cast("long")).as("cents")
      )
      .select(
        col("event_type"),
        col("n_events"),
        col("min_ts"),
        col("max_ts"),
        Norm.rnd(col("cents") / 100.0, 2).as("sum_value")
      )
      .transform(Norm.ordered(_, col("event_type")))

  private val aggSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(min(epoch_us(ts)) AS BIGINT) AS min_ts,
      |  CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts,
      |  round(CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) / 100.0, 2) + 0.0 AS sum_value
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  private def csvRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory(s"graft-csv-${ctr.incrementAndGet()}")
    val src = ev(s, dir)
    src.write.option("header", "true").option("delimiter", "\t").csv(s"$tmp/events_csv")
    val back = s.read
      .schema(src.schema) // explicit schema: no sampling-based inference
      .option("header", "true")
      .option("delimiter", "\t")
      .csv(s"$tmp/events_csv")
    // per-event-type aggregate is bounded; the written files are not —
    // hand the rows back materialized and remove the temp dir (ADVICE r6)
    graft.GateResult.materialize(agg(back))(graft.GateResult.deleteRecursively(tmp))
  }

  private def orcRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory(s"graft-orc-${ctr.incrementAndGet()}")
    val src = ev(s, dir)
    src.write.orc(s"$tmp/events_orc")
    graft.GateResult.materialize(agg(s.read.orc(s"$tmp/events_orc")))(
      graft.GateResult.deleteRecursively(tmp)
    )
  }

  private def jsonRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory(s"graft-json-${ctr.incrementAndGet()}")
    val src = ev(s, dir)
    // JSON Lines: the interchange format half of real ingest feeds arrive
    // in. Explicit schema on read (inference would sample); doubles
    // survive because Spark writes shortest round-trippable reprs and
    // parses them back to the identical binary.
    src.write.json(s"$tmp/events_json")
    val back = s.read.schema(src.schema).json(s"$tmp/events_json")
    graft.GateResult.materialize(agg(back))(graft.GateResult.deleteRecursively(tmp))
  }

  // -------------------------------------------------------------------
  // src_schema_evolution — the ingest reality that half a pipeline's
  // batches predate a column: batch A (even users) is written WITHOUT
  // `score`, batch B (odd users) WITH it; the read unifies the two file
  // schemas via parquet mergeSchema and the old rows surface NULL score.
  // The aggregate pins both the union semantics and the null backfill
  // (n_scored counts only batch-B rows). At scale mergeSchema is a
  // footer-only operation per file — no data rewrite, which is the point.
  // -------------------------------------------------------------------
  private def schemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory(s"graft-evo-${ctr.incrementAndGet()}")
    val src = ev(s, dir)
    src.filter(col("user_id") % 2 === 0).write.parquet(s"$tmp/t/batch=a")
    src
      .filter(col("user_id") % 2 === 1)
      .withColumn("score", round(col("value") * 100.0).cast("long"))
      .write.parquet(s"$tmp/t/batch=b")
    val back = s.read.option("mergeSchema", "true").parquet(s"$tmp/t")
    val out = back
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("score")).as("n_scored"),
        sum(coalesce(col("score"), lit(0L))).as("score_sum")
      )
      .transform(Norm.ordered(_, col("event_type")))
    graft.GateResult.materialize(out)(graft.GateResult.deleteRecursively(tmp))
  }

  private val schemaEvolutionSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
      |  CAST(sum(CASE WHEN user_id % 2 = 1
      |               THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS score_sum
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // src_seriesv2_roundtrip — the CUSTOM DataSource V2 under the hash
  // gate ([[SeriesV2]]): per-user (skey, ord, x, y=lag(x)) series derived
  // from events, written as header CSV, read back through
  // `format("graft.sources.SeriesV2")` with BOTH scan contracts active —
  // the skey range predicate pushes into the reader (rows of other
  // series are rejected after parsing ONE long) and the `ord` column is
  // pruned out of the parse entirely. The aggregate pins value transport
  // exactly (integer cents of round-trippable doubles); SeriesV2Spec
  // additionally pins the pruned read schema, the pushed-filter
  // evaluation, and the malformed-line skip contract.
  // -------------------------------------------------------------------
  private val SvKeyLo = 10L
  private val SvKeyHi = 750L

  private def seriesV2RoundTrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tmp = Files.createTempDirectory(s"graft-sv2-${ctr.incrementAndGet()}")
    val w = Window.partitionBy("user_id").orderBy("ts")
    Tables
      .events(s, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .select(
        col("user_id").as("skey"),
        (row_number().over(w) - 1).cast("long").as("ord"),
        col("value").as("x"),
        lag(col("value"), 1).over(w).as("y")
      )
      .filter(col("y").isNotNull)
      .write
      .option("header", "true")
      .csv(s"$tmp/series_csv")
    val back = s.read
      .format("graft.sources.SeriesV2")
      .load(s"$tmp/series_csv")
      .filter(col("skey") > SvKeyLo && col("skey") <= SvKeyHi)
      .select("skey", "x", "y")
      .groupBy("skey")
      .agg(
        count(lit(1)).as("n_points"),
        sum(round(col("x") * 100.0).cast("long")).as("x_cents"),
        sum(round(col("y") * 100.0).cast("long")).as("y_cents")
      )
      .transform(Norm.ordered(_, col("skey")))
    graft.GateResult.materialize(back)(graft.GateResult.deleteRecursively(tmp))
  }

  private val seriesV2RoundTripSql: String =
    s"""WITH ser AS (
       |  SELECT user_id AS skey,
       |         value AS x,
       |         lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS y
       |  FROM events
       |)
       |SELECT skey, CAST(count(*) AS BIGINT) AS n_points,
       |       CAST(sum(CAST(round(x * 100.0) AS BIGINT)) AS BIGINT) AS x_cents,
       |       CAST(sum(CAST(round(y * 100.0) AS BIGINT)) AS BIGINT) AS y_cents
       |FROM ser
       |WHERE y IS NOT NULL AND skey > $SvKeyLo AND skey <= $SvKeyHi
       |GROUP BY 1 ORDER BY skey""".stripMargin

  // -------------------------------------------------------------------
  // src_seriesv2_agg_pushdown — the V2 source's PARTIAL aggregate
  // pushdown under the hash gate: the same derived series CSV, read back
  // with Aggregate(Filter(Scan)) where the skey filter is fully handled
  // by the reader and the COUNT/MIN/MAX fold happens INSIDE it — the
  // scan emits one row per (file, series), not one per line, and Spark's
  // merge Aggregate finalizes (SeriesV2Spec pins that the plan actually
  // pushed: PushedAggregation=[GROUP BY skey, ...]). COUNT and long
  // MIN/MAX are exact by construction; double MIN/MAX are exact
  // selections of values that round-trip losslessly through the CSV
  // text (Java shortest-repr doubles). SUM over doubles is deliberately
  // NOT here — the source refuses it (merge order is partition-
  // nondeterministic); the long-typed ord_sum exercises pushed SUM.
  // At scale this is the difference between shipping O(lines) and
  // O(series) out of a 100-TB cold-format directory.
  // -------------------------------------------------------------------
  private def seriesV2AggPushdown(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tmp = Files.createTempDirectory(s"graft-sv2agg-${ctr.incrementAndGet()}")
    val w = Window.partitionBy("user_id").orderBy("ts")
    Tables
      .events(s, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .select(
        col("user_id").as("skey"),
        (row_number().over(w) - 1).cast("long").as("ord"),
        col("value").as("x"),
        lag(col("value"), 1).over(w).as("y")
      )
      .filter(col("y").isNotNull)
      .write
      .option("header", "true")
      .csv(s"$tmp/series_csv")
    val back = s.read
      .format("graft.sources.SeriesV2")
      .load(s"$tmp/series_csv")
      .filter(col("skey") > SvKeyLo && col("skey") <= SvKeyHi)
      .groupBy("skey")
      .agg(
        count(lit(1)).as("n_points"),
        min(col("ord")).as("ord_min"),
        max(col("ord")).as("ord_max"),
        sum(col("ord")).as("ord_sum"),
        min(col("x")).as("x_min"),
        max(col("y")).as("y_max")
      )
      .transform(Norm.ordered(_, col("skey")))
    graft.GateResult.materialize(back)(graft.GateResult.deleteRecursively(tmp))
  }

  private val seriesV2AggPushdownSql: String =
    s"""WITH ser AS (
       |  SELECT user_id AS skey,
       |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS BIGINT) AS ord,
       |         value AS x,
       |         lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS y
       |  FROM events
       |)
       |SELECT skey, CAST(count(*) AS BIGINT) AS n_points,
       |       CAST(min(ord) AS BIGINT) AS ord_min,
       |       CAST(max(ord) AS BIGINT) AS ord_max,
       |       CAST(sum(ord) AS BIGINT) AS ord_sum,
       |       min(x) AS x_min,
       |       max(y) AS y_max
       |FROM ser
       |WHERE y IS NOT NULL AND skey > $SvKeyLo AND skey <= $SvKeyHi
       |GROUP BY 1 ORDER BY skey""".stripMargin

  // -------------------------------------------------------------------
  // src_seriesv2_runtime_prune — the V2 source's join-driven runtime
  // filtering under the hash gate: the series CSV joined to a SELECTIVE
  // scan-backed dimension (range + modulo filter — the shape that
  // actually delivers a DynamicPruningExpression; a Seq-backed dim's
  // Filter is folded away by ConvertToLocalRelation and never delivers,
  // see SCALE.md "SeriesV2 connector contracts"). The dim side executes
  // first, its observed skey set reaches the readers, and non-member
  // lines are rejected after one long-parse; the join re-checks keys, so
  // the gate pins VALUE equality of the whole pruned pipeline while
  // SeriesV2Spec/SeriesV2Probe pin the delivery mechanics.
  // -------------------------------------------------------------------
  private def seriesV2RuntimePrune(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tmp = Files.createTempDirectory(s"graft-sv2rt-${ctr.incrementAndGet()}")
    val w = Window.partitionBy("user_id").orderBy("ts")
    Tables
      .events(s, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .select(
        col("user_id").as("skey"),
        (row_number().over(w) - 1).cast("long").as("ord"),
        col("value").as("x"),
        lag(col("value"), 1).over(w).as("y")
      )
      .filter(col("y").isNotNull)
      .write
      .option("header", "true")
      .csv(s"$tmp/series_csv")
    val dim = s.range(0, 1000).toDF("skey").filter(col("skey") % 37 === 3)
    val back = s.read
      .format("graft.sources.SeriesV2")
      .load(s"$tmp/series_csv")
      .join(dim, "skey")
      .groupBy("skey")
      .agg(
        count(lit(1)).as("n_points"),
        sum(round(col("x") * 100.0).cast("long")).as("x_cents")
      )
      .transform(Norm.ordered(_, col("skey")))
    graft.GateResult.materialize(back)(graft.GateResult.deleteRecursively(tmp))
  }

  private val seriesV2RuntimePruneSql: String =
    """WITH ser AS (
      |  SELECT user_id AS skey,
      |         value AS x,
      |         lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS y
      |  FROM events
      |), dim AS (SELECT i AS skey FROM range(0, 1000) t(i) WHERE i % 37 = 3)
      |SELECT s.skey, CAST(count(*) AS BIGINT) AS n_points,
      |       CAST(sum(CAST(round(s.x * 100.0) AS BIGINT)) AS BIGINT) AS x_cents
      |FROM ser s JOIN dim d ON s.skey = d.skey
      |WHERE s.y IS NOT NULL
      |GROUP BY 1 ORDER BY s.skey""".stripMargin

  // -------------------------------------------------------------------
  // src_seriesv2_topn — the V2 source's TOP-N pushdown under the hash
  // gate: the derived series CSV read back with Limit(Sort(Filter(Scan)))
  // where the skey filter is fully handled by the reader and the ORDER BY
  // x DESC, skey, ord + LIMIT runs as a size-n bounded heap INSIDE each
  // file reader — ≤ n survivors per file reach Spark's kept global
  // Sort+Limit (the push is partial by the one-partition-per-file
  // contract; SeriesV2Spec pins PushedTopN=[...] in the plan and value
  // equality against the unpushed sort at both layouts). The tiebreak
  // columns (skey, ord) make the selected row SET unique, so the hash
  // gate is deterministic. At scale this ships O(n · files) rows out of
  // a 100-TB directory instead of O(lines) into a global sort.
  // -------------------------------------------------------------------
  private def seriesV2TopN(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tmp = Files.createTempDirectory(s"graft-sv2topn-${ctr.incrementAndGet()}")
    val w = Window.partitionBy("user_id").orderBy("ts")
    Tables
      .events(s, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .select(
        col("user_id").as("skey"),
        (row_number().over(w) - 1).cast("long").as("ord"),
        col("value").as("x"),
        lag(col("value"), 1).over(w).as("y")
      )
      .filter(col("y").isNotNull)
      .write
      .option("header", "true")
      .csv(s"$tmp/series_csv")
    val back = s.read
      .format("graft.sources.SeriesV2")
      .load(s"$tmp/series_csv")
      .filter(col("skey") > SvKeyLo && col("skey") <= SvKeyHi)
      .orderBy(col("x").desc, col("skey"), col("ord"))
      .limit(25)
      .select(
        col("skey"),
        col("ord"),
        round(col("x") * 100.0).cast("long").as("x_cents")
      )
      .transform(Norm.ordered(_, col("skey"), col("ord")))
    graft.GateResult.materialize(back)(graft.GateResult.deleteRecursively(tmp))
  }

  private val seriesV2TopNSql: String =
    s"""WITH ser AS (
       |  SELECT user_id AS skey,
       |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS BIGINT) AS ord,
       |         value AS x,
       |         lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS y
       |  FROM events
       |), top AS (
       |  SELECT skey, ord, x FROM ser
       |  WHERE y IS NOT NULL AND skey > $SvKeyLo AND skey <= $SvKeyHi
       |  ORDER BY x DESC, skey, ord LIMIT 25
       |)
       |SELECT skey, ord, CAST(round(x * 100.0) AS BIGINT) AS x_cents
       |FROM top ORDER BY skey, ord""".stripMargin

  // -------------------------------------------------------------------
  // src_seriesv2_file_prune — the key-ranged layout's FILE ELIMINATION
  // under the hash gate: the derived series written via
  // SeriesSource.writeKeyRanged (range-partitioned files + a _ranges.csv
  // min/max sidecar — the custom-format analogue of parquet column
  // stats), read back with a selective skey window whose sidecar check
  // opens only the overlapping files, composed with the grouped
  // aggregate pushdown (prune-safe: excluded groups simply don't
  // exist). SeriesV2Spec pins the plan mechanics (pruned partition
  // counts for static AND runtime predicates, the global-agg empty-row
  // safety, pruned size statistics); this gate pins VALUE equality of
  // the whole pruned pipeline. At 100 TB this is the difference between
  // streaming every line ever written and opening the handful of files
  // whose range can hold the probed series.
  // -------------------------------------------------------------------
  private def seriesV2FilePrune(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tmp = Files.createTempDirectory(s"graft-sv2fp-${ctr.incrementAndGet()}")
    val w = Window.partitionBy("user_id").orderBy("ts")
    val series = Tables
      .events(s, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .select(
        col("user_id").as("skey"),
        (row_number().over(w) - 1).cast("long").as("ord"),
        col("value").as("x"),
        lag(col("value"), 1).over(w).as("y")
      )
      .filter(col("y").isNotNull)
    SeriesSource.writeKeyRanged(series, s"$tmp/series_csv", nFiles = 16)
    val back = s.read
      .format("graft.sources.SeriesV2")
      .load(s"$tmp/series_csv")
      .filter(col("skey") > SvKeyLo && col("skey") <= SvKeyHi)
      .groupBy("skey")
      .agg(
        count(lit(1)).as("n_points"),
        min(col("ord")).as("ord_min"),
        sum(col("ord")).as("ord_sum"),
        max(col("x")).as("x_max")
      )
      .transform(Norm.ordered(_, col("skey")))
    graft.GateResult.materialize(back)(graft.GateResult.deleteRecursively(tmp))
  }

  private val seriesV2FilePruneSql: String =
    s"""WITH ser AS (
       |  SELECT user_id AS skey,
       |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS BIGINT) AS ord,
       |         value AS x,
       |         lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS y
       |  FROM events
       |)
       |SELECT skey, CAST(count(*) AS BIGINT) AS n_points,
       |       CAST(min(ord) AS BIGINT) AS ord_min,
       |       CAST(sum(ord) AS BIGINT) AS ord_sum,
       |       max(x) AS x_max
       |FROM ser
       |WHERE y IS NOT NULL AND skey > $SvKeyLo AND skey <= $SvKeyHi
       |GROUP BY 1 ORDER BY skey""".stripMargin

  // -------------------------------------------------------------------
  // src_seriesv2_keygroup — COMPLETE aggregate pushdown on the
  // KEY-GROUPED layout (SeriesSource.writeKeyGrouped: one file per skey,
  // sidecar lo == hi): every group lives wholly inside one file, so the
  // per-file fold IS the global answer — Spark drops its merge Aggregate
  // AND the shuffle under it, and the whole groupBy(skey) plans as
  // scan + project (SeriesV2Spec pins zero HashAggregate / zero Exchange
  // in the core plan; the only exchange in this gate is the final
  // presentation ORDER BY). The series key is user_id % 97 so the file
  // count is bounded at ANY corpus scale; ord is the globally-unique
  // event_id, so no window is needed to derive the series. At 100 TB
  // this turns a corpus-wide grouped aggregate into an embarrassingly
  // parallel per-file fold with no shuffle stage at all.
  // -------------------------------------------------------------------
  private val KgLo = 5L
  private val KgHi = 60L

  private def seriesKeyGrouped(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .select(
        (col("user_id") % 97).as("skey"),
        col("event_id").as("ord"),
        col("value").as("x"),
        (col("value") / 2.0).as("y")
      )

  private val seriesKeyGroupedCte: String =
    """SELECT user_id % 97 AS skey, event_id AS ord, value AS x, value / 2.0 AS y FROM events"""

  private def seriesV2KeyGroup(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory(s"graft-sv2kg-${ctr.incrementAndGet()}")
    SeriesSource.writeKeyGrouped(seriesKeyGrouped(s, dir), s"$tmp/series_kg", nTasks = 16)
    val back = s.read
      .format("graft.sources.SeriesV2")
      .load(s"$tmp/series_kg")
      .filter(col("skey") >= KgLo && col("skey") < KgHi)
      .groupBy("skey")
      .agg(
        count(lit(1)).as("n_points"),
        min(col("ord")).as("ord_min"),
        max(col("ord")).as("ord_max"),
        sum(col("ord")).as("ord_sum"),
        min(col("x")).as("x_min"),
        max(col("y")).as("y_max")
      )
      .transform(Norm.ordered(_, col("skey")))
    graft.GateResult.materialize(back)(graft.GateResult.deleteRecursively(tmp))
  }

  private val seriesV2KeyGroupSql: String =
    s"""WITH ser AS ($seriesKeyGroupedCte)
       |SELECT skey, CAST(count(*) AS BIGINT) AS n_points,
       |       CAST(min(ord) AS BIGINT) AS ord_min,
       |       CAST(max(ord) AS BIGINT) AS ord_max,
       |       CAST(sum(ord) AS BIGINT) AS ord_sum,
       |       min(x) AS x_min,
       |       max(y) AS y_max
       |FROM ser WHERE skey >= $KgLo AND skey < $KgHi
       |GROUP BY 1 ORDER BY skey""".stripMargin

  // -------------------------------------------------------------------
  // src_seriesv2_storagepart — the STORAGE-PARTITIONED READ on the same
  // key-grouped layout for the row-mode shapes the fold can't express
  // (SUM over doubles is refused by the source — merge order would flip
  // low bits): with spark.sql.sources.v2.bucketing.enabled the scan
  // reports KeyGroupedPartitioning(skey) and each file carries its key
  // (HasPartitionKey), so the partial+final aggregate pair runs
  // co-located per key with NO shuffle exchange between them
  // (SeriesV2Spec pins the exchange-free plan). The integer-cents sum
  // keeps the published value aggregation-order-free. At 100 TB this is
  // the optimizer-side twin of the reference decomposition's per-series
  // independence: a series-keyed groupBy never re-shuffles data that the
  // layout already partitioned.
  // -------------------------------------------------------------------
  private def seriesV2StoragePart(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory(s"graft-sv2sp-${ctr.incrementAndGet()}")
    SeriesSource.writeKeyGrouped(seriesKeyGrouped(s, dir), s"$tmp/series_kg", nTasks = 16)
    val prev = s.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // outer try: an analysis failure between conf.set and materialize
    // must not leak the conf into the rest of a 280-query bench session
    try {
      val back = s.read
        .format("graft.sources.SeriesV2")
        .load(s"$tmp/series_kg")
        .filter(col("skey") >= KgLo && col("skey") < KgHi)
        .groupBy("skey")
        .agg(
          count(lit(1)).as("n_points"),
          sum(round(col("x") * 100.0).cast("long")).as("x_cents"),
          sum(round(col("y") * 100.0).cast("long")).as("y_cents")
        )
        .transform(Norm.ordered(_, col("skey")))
      graft.GateResult.materialize(back)(graft.GateResult.deleteRecursively(tmp))
    } finally {
      graft.GateResult.deleteRecursively(tmp) // idempotent: covers pre-materialize throws
      prev match {
        case Some(v) => s.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None    => s.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
    }
  }

  private val seriesV2StoragePartSql: String =
    s"""WITH ser AS ($seriesKeyGroupedCte)
       |SELECT skey, CAST(count(*) AS BIGINT) AS n_points,
       |       CAST(sum(CAST(round(x * 100.0) AS BIGINT)) AS BIGINT) AS x_cents,
       |       CAST(sum(CAST(round(y * 100.0) AS BIGINT)) AS BIGINT) AS y_cents
       |FROM ser WHERE skey >= $KgLo AND skey < $KgHi
       |GROUP BY 1 ORDER BY skey""".stripMargin

  // -------------------------------------------------------------------
  // src_seriesv2_spj — STORAGE-PARTITIONED JOIN under the hash gate: two
  // key-grouped layouts (the event series and its per-key min-x digest,
  // both written via writeKeyGrouped) joined on skey with broadcast
  // disabled, so the planner takes the shuffle-join branch and SPJ
  // removes BOTH exchanges (SeriesV2Spec pins the exchange-free plan;
  // this gate pins the values through the full pipeline). At 100 TB this
  // is the co-located fact-fact join: the layout is the shuffle, written
  // once — joining two series stores on series key moves zero bytes.
  // -------------------------------------------------------------------
  private def seriesV2Spj(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory(s"graft-sv2spj-${ctr.incrementAndGet()}")
    val ser = seriesKeyGrouped(s, dir)
    SeriesSource.writeKeyGrouped(ser, s"$tmp/a", nTasks = 16)
    val digest = ser
      .groupBy("skey")
      .agg(min(col("x")).as("x"))
      .select(col("skey"), lit(0L).as("ord"), col("x"), lit(0.0).as("y"))
    SeriesSource.writeKeyGrouped(digest, s"$tmp/b", nTasks = 16)
    val prevB = s.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevBc = s.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // outer try: an analysis failure between conf.set and materialize
    // must not leave broadcast disabled for the rest of the bench session
    try {
      val a = s.read.format("graft.sources.SeriesV2").load(s"$tmp/a").select(col("skey"), col("x"))
      val b = s.read.format("graft.sources.SeriesV2").load(s"$tmp/b").select(col("skey"), col("x").as("minx"))
      val out = a
        .join(b, "skey")
        .filter(col("skey") >= KgLo && col("skey") < KgHi)
        .groupBy("skey")
        .agg(
          count(lit(1)).as("n_points"),
          // x - minx is one IEEE subtract of bit-identical doubles; the
          // cents round is the repo's canonical money encoding
          sum(round((col("x") - col("minx")) * 100.0).cast("long")).as("spread_cents")
        )
        .transform(Norm.ordered(_, col("skey")))
      graft.GateResult.materialize(out)(graft.GateResult.deleteRecursively(tmp))
    } finally {
      graft.GateResult.deleteRecursively(tmp) // idempotent: covers pre-materialize throws
      prevB match {
        case Some(v) => s.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None    => s.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      prevBc match {
        case Some(v) => s.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None    => s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  private val seriesV2SpjSql: String =
    s"""WITH ser AS ($seriesKeyGroupedCte),
       |mn AS (SELECT skey, min(x) AS minx FROM ser GROUP BY 1)
       |SELECT s.skey, CAST(count(*) AS BIGINT) AS n_points,
       |       CAST(sum(CAST(round((s.x - m.minx) * 100.0) AS BIGINT)) AS BIGINT) AS spread_cents
       |FROM ser s JOIN mn m ON s.skey = m.skey
       |WHERE s.skey >= $KgLo AND s.skey < $KgHi
       |GROUP BY 1 ORDER BY s.skey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_seriesv2_spj" -> seriesV2Spj,
    "src_seriesv2_keygroup" -> seriesV2KeyGroup,
    "src_seriesv2_storagepart" -> seriesV2StoragePart,
    "src_seriesv2_roundtrip" -> seriesV2RoundTrip,
    "src_seriesv2_topn" -> seriesV2TopN,
    "src_seriesv2_file_prune" -> seriesV2FilePrune,
    "src_seriesv2_agg_pushdown" -> seriesV2AggPushdown,
    "src_seriesv2_runtime_prune" -> seriesV2RuntimePrune,
    "src_csv_roundtrip" -> csvRoundTrip,
    "src_orc_roundtrip" -> orcRoundTrip,
    "src_json_roundtrip" -> jsonRoundTrip,
    "src_schema_evolution" -> schemaEvolution
  )

  val oracle: Map[String, String] = Map(
    "src_seriesv2_spj" -> seriesV2SpjSql,
    "src_seriesv2_keygroup" -> seriesV2KeyGroupSql,
    "src_seriesv2_storagepart" -> seriesV2StoragePartSql,
    "src_seriesv2_roundtrip" -> seriesV2RoundTripSql,
    "src_seriesv2_topn" -> seriesV2TopNSql,
    "src_seriesv2_file_prune" -> seriesV2FilePruneSql,
    "src_seriesv2_agg_pushdown" -> seriesV2AggPushdownSql,
    "src_seriesv2_runtime_prune" -> seriesV2RuntimePruneSql,
    "src_csv_roundtrip" -> aggSql,
    "src_orc_roundtrip" -> aggSql,
    "src_json_roundtrip" -> aggSql,
    "src_schema_evolution" -> schemaEvolutionSql
  )
}
