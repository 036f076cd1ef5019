package graft.contract

import java.nio.file.Files

import scala.jdk.CollectionConverters._
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink coverage: bucketed-table write + exchange-free bucket join.
  *
  * SCALE.md's co-located-join story made concrete: `orders` and `lineitem`
  * are WRITTEN as bucketed tables (same bucket count, same key, sorted
  * within buckets), read back through the catalog, and joined — Spark
  * recognizes the matching bucketing on both sides and plans the join with
  * NO Exchange (asserted by `BucketedSinkSpec`). At 100 TB this is the
  * difference between shuffling the fact table on every join and paying
  * the layout cost ONCE at ingest: the dedup signature relation, the
  * orders/lineitem fact pair, and the IVF list tables all want exactly
  * this layout.
  *
  * The oracle computes the same aggregate straight from the raw parquet,
  * proving the bucketed round-trip is value-identical. Revenue is summed
  * in integer cents (the q10 pattern) so the aggregate is combine-order
  * independent.
  */
object SinkQueries {
  private val Buckets = 8
  private val ctr = new AtomicInteger(0)

  private def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (lt, ot, tmp) = writeBucketed(s, dir, s"q${ctr.incrementAndGet()}")
    val agg = joinPlanUnderTest(s, lt, ot)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        Norm.rnd(
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0).cast("long")) / 100.0,
          2
        ).as("revenue")
      )
      .transform(Norm.ordered(_, col("o_orderpriority")))
    // ingest-per-run is the query's cost model; the tables are not —
    // drop them and the temp dir once the (5-row) aggregate is in hand
    graft.GateResult.materialize(agg) {
      s.sql(s"DROP TABLE IF EXISTS $lt")
      s.sql(s"DROP TABLE IF EXISTS $ot")
      graft.GateResult.deleteRecursively(java.nio.file.Paths.get(tmp))
    }
  }

  /** The bucket-joined DataFrame over already-written tables — exposed so
    * the spec can assert the exchange-free plan without re-writing tables.
    */
  private[graft] def joinPlanUnderTest(s: SparkSession, lt: String, ot: String): DataFrame =
    s.table(lt).join(s.table(ot), col("l_orderkey") === col("o_orderkey"))

  private[graft] def writeBucketed(
      s: SparkSession,
      dir: String,
      run: String
  ): (String, String, String) = {
    val tmp = Files.createTempDirectory(s"graft-bucketed-$run").toString
    val ot = s"graft_spec_orders_$run"
    val lt = s"graft_spec_lineitem_$run"
    Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
      .write.bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$tmp/o").saveAsTable(ot)
    Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
      .write.bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$tmp/l").saveAsTable(lt)
    (lt, ot, tmp)
  }

  // -------------------------------------------------------------------
  // sink_partition_prune — the OTHER ingest layout: a table PARTITIONED
  // on a low-cardinality filter/join key (directory-per-value), read
  // back through a join whose dimension-side filter selects a subset of
  // types — the shape DYNAMIC PARTITION PRUNING exists for. The dim's
  // weight filter is not a literal on the fact table, so static pruning
  // cannot fire; DPP turns the broadcast dim into a runtime partition
  // filter and the fact scan reads ONLY the surviving directories
  // (asserted by PartitionPruneSpec on this exact plan). At 100 TB a
  // date/type-partitioned fact table is the default layout, and DPP is
  // what keeps dim-filtered scans from reading the whole table.
  // Weighted sum in integer cents (q10 pattern).
  // -------------------------------------------------------------------
  private[graft] val TypeWeights: Seq[(String, Double)] =
    Seq(("click", 1.5), ("purchase", 3.0), ("view", 0.5), ("signup", 2.0), ("error", 0.0))

  private[graft] def typeDim(s: SparkSession): DataFrame = {
    import s.implicits._
    TypeWeights.toDF("d_type", "weight")
  }

  private def partitionPrune(s: SparkSession, dir: String): DataFrame = {
    val (tbl, dimTbl, tmp) = writePartitioned(s, dir, s"p${ctr.incrementAndGet()}")
    val agg = prunedJoinPlanUnderTest(s, tbl, dimTbl)
    graft.GateResult.materialize(agg) {
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"DROP TABLE IF EXISTS $dimTbl")
      graft.GateResult.deleteRecursively(java.nio.file.Paths.get(tmp))
    }
  }

  /** The DPP-joined aggregate over an already-written partitioned fact
    * table and a FILE-BACKED dim — exposed so the spec can assert the
    * dynamic-pruning plan directly. The dim must come from storage: a
    * LocalRelation dim gets its filter constant-folded away at optimize
    * time, leaving the DPP rule no selective predicate to key on.
    */
  private[graft] def prunedJoinPlanUnderTest(s: SparkSession, tbl: String, dimTbl: String): DataFrame =
    s.table(tbl)
      .join(s.table(dimTbl).filter(col("weight") >= 1.0), col("event_type") === col("d_type"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        Norm.rnd(
          sum(round(col("value") * col("weight") * 100.0).cast("long")) / 100.0,
          2
        ).as("weighted_sum")
      )
      .transform(Norm.ordered(_, col("event_type")))

  private[graft] def writePartitioned(
      s: SparkSession,
      dir: String,
      run: String
  ): (String, String, String) = {
    val tmp = Files.createTempDirectory(s"graft-partitioned-$run").toString
    val tbl = s"graft_spec_events_$run"
    val dimTbl = s"graft_spec_typedim_$run"
    Tables.events(s, dir)
      .select("event_id", "user_id", "value", "event_type")
      .write.partitionBy("event_type")
      .option("path", s"$tmp/e").saveAsTable(tbl)
    typeDim(s).write.option("path", s"$tmp/d").saveAsTable(dimTbl)
    (tbl, dimTbl, tmp)
  }

  private val partitionPruneSql: String = {
    val dimValues = TypeWeights.map { case (t, w) => s"('$t', $w)" }.mkString(", ")
    s"""WITH dim(d_type, weight) AS (VALUES $dimValues)
       |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events,
       |  round(CAST(sum(CAST(round(e.value * d.weight * 100.0) AS BIGINT)) AS BIGINT) / 100.0, 2) + 0.0 AS weighted_sum
       |FROM events e JOIN dim d ON e.event_type = d.d_type
       |WHERE d.weight >= 1.0
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // -------------------------------------------------------------------
  // sink_upsert_overwrite — incremental ingestion by DYNAMIC partition
  // overwrite: a restatement batch (deterministic subset of recent
  // orders with a replacement priority) is merged into a year-partitioned
  // orders table by rewriting ONLY the years the batch touches — base
  // rows of touched years anti-join the updates on the key, union the
  // updates, and `partitionOverwriteMode=dynamic` makes the overwrite
  // replace exactly those directories (UpsertSpec asserts the untouched
  // years' FILES are byte-identical after the upsert). This is the
  // pre-table-format upsert every 100 TB pipeline runs nightly: work
  // scales with the restated partitions, never with table history. The
  // merged relation is localCheckpoint()ed before the write because the
  // overwrite reads the same table it replaces.
  // -------------------------------------------------------------------
  private val UpsertYearFrom = 1999
  private val UpsertKeyMod = 7
  private val UpsertPriority = "9-RESTATED"

  private def upsertOverwrite(s: SparkSession, dir: String): DataFrame = {
    val (tbl, tmp) = writeYearPartitioned(s, dir, s"u${ctr.incrementAndGet()}")
    applyUpsert(s, dir, tbl)
    val agg = yearAgg(s, tbl)
    graft.GateResult.materialize(agg) {
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      graft.GateResult.deleteRecursively(java.nio.file.Paths.get(tmp))
    }
  }

  /** Final-state summary of the year-partitioned table (shared by the
    * batch and streaming upsert gates — same oracle, same shape).
    */
  private[graft] def yearAgg(s: SparkSession, tbl: String): DataFrame =
    s.table(tbl)
      .groupBy("o_year")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderpriority") === UpsertPriority, 1L).otherwise(0L)).as("n_restated"),
        Norm.rnd(
          sum(round(col("o_totalprice") * 100.0).cast("long")) / 100.0,
          2
        ).as("total_price")
      )
      .transform(Norm.ordered(_, col("o_year")))

  private[graft] def writeYearPartitioned(
      s: SparkSession,
      dir: String,
      run: String
  ): (String, String) = {
    val tmp = Files.createTempDirectory(s"graft-upsert-$run").toString
    val tbl = s"graft_spec_orders_part_$run"
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"),
        year(col("o_orderdate")).as("o_year")
      )
      .write.partitionBy("o_year")
      .option("path", s"$tmp/o").saveAsTable(tbl)
    (tbl, tmp)
  }

  /** The restatement batch: every UpsertKeyMod-th recent order with its
    * priority replaced. Deterministic, so the oracle can restate it too.
    */
  private[graft] def updatesBatch(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"),
        year(col("o_orderdate")).as("o_year")
      )
      .filter(col("o_year") >= UpsertYearFrom && col("o_orderkey") % UpsertKeyMod === 0)
      .withColumn("o_orderpriority", lit(UpsertPriority))

  private[graft] def applyUpsert(s: SparkSession, dir: String, tbl: String): Unit =
    mergeBatch(s, tbl, updatesBatch(s, dir))

  /** Keyed merge of one update batch into the year-partitioned table —
    * the unit both the batch upsert gate and the streaming foreachBatch
    * gate (`stream_upsert`) apply. IDEMPOTENT by construction: the same
    * batch re-applied anti-joins away exactly the rows it previously
    * wrote and rewrites them with identical values, so redelivered
    * micro-batches (the at-least-once failure mode) leave the table
    * byte-stable — checkpoint + idempotent merge = effectively-once.
    */
  private[graft] def mergeBatch(s: SparkSession, tbl: String, updates: DataFrame): Unit = {
    val touched = updates.select("o_year").distinct()
    val kept = s.table(tbl)
      .join(broadcast(touched), Seq("o_year"), "left_semi")
      .join(updates.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
    // a using-column semi-join hoists o_year to the front; insertInto is
    // POSITIONAL, so re-select in the table's declared order (partition
    // column last) before writing
    val tableOrder = s.table(tbl).columns.map(col).toIndexedSeq
    val merged = kept.unionByName(updates).select(tableOrder: _*).localCheckpoint()
    val prev = s.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").insertInto(tbl)
    finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  private[graft] val upsertOverwriteSql: String =
    s"""WITH o AS (
       |  SELECT o_orderkey, o_totalprice, o_orderpriority,
       |         CAST(year(o_orderdate) AS INTEGER) AS o_year
       |  FROM orders
       |), merged AS (
       |  SELECT o_orderkey, o_totalprice,
       |         CASE WHEN o_year >= $UpsertYearFrom AND o_orderkey % $UpsertKeyMod = 0
       |              THEN '$UpsertPriority' ELSE o_orderpriority END AS o_orderpriority,
       |         o_year
       |  FROM o
       |)
       |SELECT o_year, CAST(count(*) AS BIGINT) AS n_orders,
       |  CAST(sum(CASE WHEN o_orderpriority = '$UpsertPriority' THEN 1 ELSE 0 END) AS BIGINT) AS n_restated,
       |  round(CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) / 100.0, 2) + 0.0 AS total_price
       |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // sink_compaction — the SMALL-FILE problem and its nightly fix: a
  // landing zone written at full task parallelism (32 shuffle
  // partitions -> 32 small files — what every streaming/micro-batch
  // ingest produces) is compacted by read -> repartition(ceil(bytes /
  // target)) -> rewrite. File count comes from MEASURED landing bytes,
  // not a constant, the way a real compactor sizes output; the value
  // oracle proves the rewrite is lossless and CompactionSpec pins the
  // file-count drop. At 100 TB compaction is what keeps scan task
  // counts (and the NameNode/listing cost) proportional to data size
  // instead of ingest cadence.
  // -------------------------------------------------------------------
  private val CompactTargetBytes = 8L * 1024 * 1024

  private[graft] def writeLandingAndCompact(
      s: SparkSession,
      dir: String,
      run: String
  ): (String, String, String) = {
    val tmp = Files.createTempDirectory(s"graft-compact-$run").toString
    Tables.events(s, dir)
      .select("event_id", "user_id", "value", "event_type")
      .repartition(32)
      .write.parquet(s"$tmp/landing")
    val bytes = Files
      .list(java.nio.file.Paths.get(s"$tmp/landing"))
      .iterator()
      .asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(Files.size)
      .sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / CompactTargetBytes).toInt)
    s.read.parquet(s"$tmp/landing").repartition(nOut).write.parquet(s"$tmp/compacted")
    (s"$tmp/landing", s"$tmp/compacted", tmp)
  }

  private def compaction(s: SparkSession, dir: String): DataFrame = {
    val (_, compacted, tmp) = writeLandingAndCompact(s, dir, s"c${ctr.incrementAndGet()}")
    val agg = s.read.parquet(compacted)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("event_id")).as("id_checksum"),
        Norm.rnd(
          sum(round(col("value") * 100.0).cast("long")) / 100.0,
          2
        ).as("sum_value")
      )
      .transform(Norm.ordered(_, col("event_type")))
    graft.GateResult.materialize(agg)(
      graft.GateResult.deleteRecursively(java.nio.file.Paths.get(tmp))
    )
  }

  private val compactionSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
      |  round(CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) / 100.0, 2) + 0.0 AS sum_value
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // sink_zorder — multi-dimensional data clustering (Delta/Iceberg
  // OPTIMIZE ZORDER, done with plain Spark + parquet): interleave the
  // bits of the two filter dimensions (user bucket, hour bucket) into a
  // Morton key, range-partition + sort the write on it, and every
  // output file/row-group ends up with a NARROW min/max range in BOTH
  // dimensions at once — so a 2-D box predicate prunes most files via
  // footer stats, which neither single-column sort order can do for
  // both dims simultaneously. ZorderSpec measures the effect on the
  // written footers (box intersects a small file fraction under z-order
  // vs ~all under arrival order); this query proves the round-trip is
  // value-lossless: box aggregate over the z-ordered table == the same
  // box straight off the raw events (oracle). At 100 TB the layout is
  // what turns "scan a month of everything" into "read the 1% of files
  // whose (user, time) box overlaps the query".
  // -------------------------------------------------------------------
  private val ZBits = 8
  private val ZFiles = 16
  private val HourNs = 3600L * 1000 * 1000 * 1000
  // the 2-D box the contract query + spec both probe (u range chosen to
  // be populated at every SF: sf0.001 only has user ids 0..14)
  private val ZBoxU = (4, 7)
  private val ZBoxT = (64, 95)

  /** Morton (z-order) interleave of two ZBits-bit ints — pure codegen
    * column arithmetic, bit i of each input lands at bits 2i / 2i+1.
    */
  private[graft] def zval(ux: org.apache.spark.sql.Column, tx: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until ZBits)
      .map { i =>
        (shiftleft(shiftright(ux, i) % 2, 2 * i) +
          shiftleft(shiftright(tx, i) % 2, 2 * i + 1)).cast("long")
      }
      .reduce(_ + _)

  /** ux/tx clustering dimensions over the events table. `ts` is epoch
    * nanos BIGINT — the hour bucket uses integer `div`, NOT `/` (double
    * division would round a ~2^60 nano count at 53-bit precision).
    */
  private[graft] def zDims(df: DataFrame): DataFrame =
    df.withColumn("ux", pmod(col("user_id"), lit(1 << ZBits)).cast("int"))
      .withColumn("tx", pmod(expr(s"ts div ${HourNs}L"), lit(1 << ZBits)).cast("int"))

  /** Write events z-ordered on (ux, tx); returns (zorderPath, tmpRoot). */
  private[graft] def writeZordered(s: SparkSession, dir: String, run: String): (String, String) = {
    val tmp = Files.createTempDirectory(s"graft-zorder-$run").toString
    zDims(Tables.events(s, dir).select("event_id", "user_id", "ts", "value", "event_type"))
      .withColumn("z", zval(col("ux"), col("tx")))
      .repartitionByRange(ZFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.parquet(s"$tmp/zorder")
    (s"$tmp/zorder", tmp)
  }

  private def zorder(s: SparkSession, dir: String): DataFrame = {
    val (zpath, tmp) = writeZordered(s, dir, s"z${ctr.incrementAndGet()}")
    val agg = s.read.parquet(zpath)
      .filter(
        col("ux").between(ZBoxU._1, ZBoxU._2) && col("tx").between(ZBoxT._1, ZBoxT._2)
      )
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("event_id")).as("id_checksum"),
        Norm.rnd(sum(round(col("value") * 100.0).cast("long")) / 100.0, 2).as("sum_value")
      )
      .transform(Norm.ordered(_, col("event_type")))
    graft.GateResult.materialize(agg)(
      graft.GateResult.deleteRecursively(java.nio.file.Paths.get(tmp))
    )
  }

  private val zorderSql: String =
    s"""WITH d AS (
       |  SELECT event_type, event_id, value,
       |    CAST(user_id % ${1 << ZBits} AS INTEGER) AS ux,
       |    CAST((ts // $HourNs) % ${1 << ZBits} AS INTEGER) AS tx
       |  FROM (SELECT event_type, event_id, value, user_id, epoch_ns(ts) AS ts FROM events)
       |)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
       |  round(CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) / 100.0, 2) + 0.0 AS sum_value
       |FROM d
       |WHERE ux BETWEEN ${ZBoxU._1} AND ${ZBoxU._2} AND tx BETWEEN ${ZBoxT._1} AND ${ZBoxT._2}
       |GROUP BY 1 ORDER BY event_type""".stripMargin

  // the box constants, exposed for ZorderSpec
  private[graft] def zBox: ((Int, Int), (Int, Int)) = (ZBoxU, ZBoxT)

  private val bucketedJoinSql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
      |  round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) / 100.0, 2) + 0.0 AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // sink_scd2 — SLOWLY-CHANGING-DIMENSION TYPE 2 history build, the
  // versioned-dimension sibling of sink_upsert_overwrite's SCD1
  // restatement: three deterministic change batches against the
  // customer dimension (batch d revises the balance of keys with
  // c_custkey % 11 == d), folded into validity-interval versions the
  // SET-BASED way — one window pass derives (valid_from, valid_to,
  // is_current) from the change log, the form that scales (a row-by-row
  // MERGE per batch re-reads the dimension B times; the window form is
  // one shuffle on the key regardless of batch count). The versioned
  // table is WRITTEN to parquet partitioned by is_current — serving
  // reads (`is_current=1`) prune to the current-snapshot directory,
  // history queries scan the closed versions — and the gate hashes the
  // READ-BACK, so the partitioned round trip is inside the check.
  // -------------------------------------------------------------------
  private val Scd2Batches = 3
  private val Scd2KeyMod = 11L

  private def scd2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cust = Tables
      .customer(s, dir)
      .select(col("c_custkey").as("key"), round(col("c_acctbal") * 100.0).cast("long").as("bal_cents"))
    val base = cust.withColumn("t", lit(0L))
    val updates = (1 to Scd2Batches)
      .map(d =>
        cust
          .filter(col("key") % Scd2KeyMod === d.toLong)
          .select(col("key"), (col("bal_cents") + d * 1000L).as("bal_cents"), lit(d.toLong).as("t"))
      )
      .reduce(_.unionAll(_))
    val w = Window.partitionBy("key").orderBy("t")
    val versions = base
      .unionAll(updates)
      .withColumn("valid_to", lead(col("t"), 1).over(w))
      .select(
        col("key"),
        col("t").as("valid_from"),
        col("valid_to"),
        when(col("valid_to").isNull, 1L).otherwise(0L).as("is_current"),
        col("bal_cents")
      )
    val tmp = Files.createTempDirectory(s"scd2_${ctr.incrementAndGet()}_").toString
    versions.write.mode("overwrite").partitionBy("is_current").parquet(tmp)
    val back = s.read
      .parquet(tmp)
      .select(
        col("key"),
        col("valid_from"),
        col("valid_to"),
        col("is_current").cast("long").as("is_current"),
        col("bal_cents")
      )
      .transform(Norm.ordered(_, col("key"), col("valid_from")))
    graft.GateResult.materialize(back)(
      graft.GateResult.deleteRecursively(java.nio.file.Paths.get(tmp))
    )
  }

  private val scd2Sql: String = {
    val batches = (1 to Scd2Batches)
      .map(d =>
        s"""SELECT c_custkey AS key,
           |       CAST(round(c_acctbal * 100.0) AS BIGINT) + $d * 1000 AS bal_cents,
           |       CAST($d AS BIGINT) AS t
           |FROM customer WHERE c_custkey % $Scd2KeyMod = $d""".stripMargin
      )
      .mkString("\nUNION ALL\n")
    s"""WITH base AS (
       |  SELECT c_custkey AS key, CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal_cents,
       |         CAST(0 AS BIGINT) AS t
       |  FROM customer
       |), allv AS (
       |  SELECT * FROM base
       |  UNION ALL
       |  $batches
       |)
       |SELECT key, t AS valid_from,
       |       lead(t, 1) OVER (PARTITION BY key ORDER BY t) AS valid_to,
       |       CASE WHEN lead(t, 1) OVER (PARTITION BY key ORDER BY t) IS NULL
       |            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_current,
       |       bal_cents
       |FROM allv ORDER BY key, valid_from""".stripMargin
  }

  // -------------------------------------------------------------------
  // sink_ivm — INCREMENTAL VIEW MAINTENANCE of an aggregate: a
  // materialized (year, status) sales summary is updated with a new
  // year's delta by MERGING PARTIAL AGGREGATES — sum-of-counts and
  // sum-of-cent-sums — instead of recomputing over the base table, and
  // the oracle IS the full recompute, so the hash gate proves
  // merge-equals-recompute. The non-mergeable average is rebuilt
  // algebraically from the merged sufficient statistics (the reason
  // production IVM stores sums+counts, never averages). The
  // "materialized" state is a real parquet round-trip (written, read
  // back), so the merge consumes the view as a downstream job would.
  // Scale shape: the refresh touches O(|delta| + |view|) rows — the
  // view is GROUPS-sized, the delta is one partition — never the base
  // table; this is Spark's own partial/final aggregate contract applied
  // across job boundaries.
  // -------------------------------------------------------------------
  private val IvmDeltaYear = 2001L

  private def sinkIvm(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(
        year(col("o_orderdate")).cast("long").as("yr"),
        col("o_orderstatus").as("status"),
        expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("cents")
      )
    def partial(df: DataFrame): DataFrame =
      df.groupBy("yr", "status").agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    val viewDir = Files.createTempDirectory("graft-ivm").toString
    // materialize the pre-delta view as a REAL parquet round trip
    partial(o.filter(col("yr") =!= IvmDeltaYear)).write.mode("overwrite").parquet(viewDir)
    val view = s.read.parquet(viewDir)
    val merged = view
      .unionByName(partial(o.filter(col("yr") === IvmDeltaYear)))
      .groupBy("yr", "status")
      .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"))
      .select(
        col("yr"),
        col("status"),
        col("n"),
        col("sum_cents"),
        // 4-dp mean by INTEGER half-up — round(sum/n/100, 4) is the measured
        // decimal-vs-binary HALF_UP split class (the ccm_boot_ci lesson):
        // avg_price@4dp = round(sum_cents*100/n) / 1e4, computed exactly
        expr("((2L * sum_cents * 100L + n) DIV (2L * n)) / 10000.0D + 0.0D").as("avg_price")
      )
      .transform(Norm.ordered(_, col("yr"), col("status")))
    graft.GateResult.materialize(merged) {
      graft.GateResult.deleteRecursively(java.nio.file.Paths.get(viewDir))
    }
  }

  private val sinkIvmSql: String =
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderstatus AS status,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents,
       |  ((2 * sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) * 100 + count(*))
       |     // (2 * count(*))) / 10000.0e0 + 0.0e0 AS avg_price
       |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // sink_ivm_join — INCREMENTAL MAINTENANCE OF A JOIN VIEW (VERDICT r11
  // stretch 7): the materialized view is customer ⋈ orders aggregated to
  // (mktsegment, year), and BOTH base relations receive deltas — late
  // orders (the 2001 arrivals) and late customers (custkey % 10 = 0).
  // The refresh applies the classic join-view delta algebra
  //   ΔV = agg(C_old ⋈ ΔO) ∪ agg(ΔC ⋈ O_old) ∪ agg(ΔC ⋈ ΔO)
  // (disjoint because each side is partitioned old/new), merging the
  // three delta partials into the materialized partials — never
  // rejoining the old sides. The oracle IS the full recompute
  // customer ⋈ orders, so the hash gate proves delta-algebra =
  // recompute, including the cross term ΔC ⋈ ΔO that naive one-sided
  // maintenance drops. The view state is a real parquet round trip.
  // Scale shape: each delta term is delta-sized on one side (at scale
  // both bases bucketed by custkey make every term a co-located join);
  // the final merge touches O(|Δterms| + |view|) rows, never the bases.
  // -------------------------------------------------------------------
  private val IvmJoinDeltaYear = 2001L
  private val IvmJoinCustMod = 10L

  private def sinkIvmJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables
      .customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    val o = Tables
      .orders(s, dir)
      .select(
        col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("cents")
      )
    val cOld = c.filter(col("c_custkey") % IvmJoinCustMod =!= 0)
    val cNew = c.filter(col("c_custkey") % IvmJoinCustMod === 0)
    val oOld = o.filter(col("yr") =!= IvmJoinDeltaYear)
    val oNew = o.filter(col("yr") === IvmJoinDeltaYear)
    def partial(cs: DataFrame, os: DataFrame): DataFrame =
      cs.join(os, cs("c_custkey") === os("o_custkey"))
        .groupBy("segment", "yr")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    val viewDir = Files.createTempDirectory("graft-ivmj").toString
    partial(cOld, oOld).write.mode("overwrite").parquet(viewDir)
    val view = s.read.parquet(viewDir)
    val merged = view
      .unionByName(partial(cOld, oNew))
      .unionByName(partial(cNew, oOld))
      .unionByName(partial(cNew, oNew))
      .groupBy("segment", "yr")
      .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"))
      .select(
        col("segment"),
        col("yr"),
        col("n"),
        col("sum_cents"),
        // integer half-up 4-dp mean — same boundary-proof form as sink_ivm
        expr("((2L * sum_cents * 100L + n) DIV (2L * n)) / 10000.0D + 0.0D").as("avg_price")
      )
      .transform(Norm.ordered(_, col("segment"), col("yr")))
    graft.GateResult.materialize(merged) {
      graft.GateResult.deleteRecursively(java.nio.file.Paths.get(viewDir))
    }
  }

  private val sinkIvmJoinSql: String =
    s"""SELECT c.c_mktsegment AS segment, CAST(year(o.o_orderdate) AS BIGINT) AS yr,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents,
       |  ((2 * sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) * 100 + count(*))
       |     // (2 * count(*))) / 10000.0e0 + 0.0e0 AS avg_price
       |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sink_ivm" -> sinkIvm,
    "sink_ivm_join" -> sinkIvmJoin,
    "sink_scd2" -> scd2,
    "sink_bucketed_join" -> bucketedJoin,
    "sink_partition_prune" -> partitionPrune,
    "sink_upsert_overwrite" -> upsertOverwrite,
    "sink_compaction" -> compaction,
    "sink_zorder" -> zorder
  )

  val oracle: Map[String, String] = Map(
    "sink_ivm" -> sinkIvmSql,
    "sink_ivm_join" -> sinkIvmJoinSql,
    "sink_scd2" -> scd2Sql,
    "sink_bucketed_join" -> bucketedJoinSql,
    "sink_partition_prune" -> partitionPruneSql,
    "sink_upsert_overwrite" -> upsertOverwriteSql,
    "sink_compaction" -> compactionSql,
    "sink_zorder" -> zorderSql
  )
}
