package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, SortDirection, SortOrder => V2SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning => V2KeyGroupedPartitioning, Partitioning => V2Partitioning, UnknownPartitioning => V2UnknownPartitioning}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 reader for the engine's series-CSV layout
  * (`skey,ord,x,y` with a header line — [[SeriesSource.wideCsv]]'s
  * format), demonstrating the two scan-time contracts a custom source
  * owes the optimizer:
  *
  *  - '''column pruning''' (`SupportsPushDownRequiredColumns`): only the
  *    columns the query references are parsed and materialized — a
  *    `select(x)` never pays for `y`'s `toDouble`;
  *  - '''filter pushdown''' (`SupportsPushDownFilters`): comparisons on
  *    `skey` are evaluated against the line's FIRST field before the
  *    remaining fields are parsed or a row is allocated, so a
  *    single-series probe of a many-series file does one cheap long-parse
  *    per skipped line. Pushed filters are also FULLY evaluated here
  *    (they do not need re-checking above — they are returned as handled);
  *  - '''limit pushdown''' (`SupportsPushDownLimit`): per-partition early
  *    stop, global Limit kept above;
  *  - '''top-N pushdown''' (`SupportsPushDownTopN`): per-partition
  *    bounded heap over the pushed ORDER BY — ≤ n rows per file reach the
  *    (kept) global Sort+Limit;
  *  - '''offset pushdown''' (`SupportsPushDownOffset`): single-file
  *    layouts only (the promise is global — Spark deletes its Offset
  *    operator), with the judged file listing snapshotted for execution;
  *  - '''partial aggregate pushdown''' (`SupportsPushDownAggregates`):
  *    COUNT/MIN/MAX (+ SUM over long columns) grouped by nothing or by
  *    `skey` fold inside the reader — the scan ships one row per
  *    (file, series), not one per line; Spark's merge Aggregate above
  *    finalizes. See [[SeriesV2.SeriesScanBuilder.pushAggregation]].
  *
  * Layout-level scaling: one [[InputPartition]] per file — the standard
  * file-source parallelism contract (a 1000-file directory fans out to
  * 1000 tasks); within a file the reader streams lines, so memory is
  * O(line). Usage: `spark.read.format("graft.sources.SeriesV2").load(dir)`.
  */
class SeriesV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SeriesV2.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new SeriesV2.SeriesTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object SeriesV2 {

  /** Lists the layout's DATA files: the flat files of `path` plus — one
    * level deep — the files of `pkey=K` subdirectories, which is where
    * [[SeriesSource.writeKeyGrouped]]'s dynamic partitioning puts them.
    * ONLY `pkey=` subdirectories are descended: a stray visible subdir
    * (a stale copy, a user's scratch dir) must not surface as data,
    * because [[relativeSidecarKey]] namespaces only `pkey=` parents — a
    * foreign subdir file would fall back to its bare name and could
    * collide with a root file's sidecar entry, silently applying the
    * wrong [lo, hi] range (wrong pruning, wrong keyed claims).
    * Underscore/dot entries are metadata (`_ranges.csv`, `_SUCCESS`) at
    * either level and never data.
    */
  private[sources] def listDataFiles(fs: FileSystem, p: Path): Array[FileStatus] = {
    val st = fs.getFileStatus(p)
    if (!st.isDirectory) Array(st)
    else
      fs.listStatus(p)
        .filter(s => !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
        .flatMap { s =>
          if (s.isFile) Array(s)
          else if (s.getPath.getName.startsWith("pkey="))
            fs.listStatus(s.getPath)
              .filter(f => f.isFile && !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
          else Array.empty[FileStatus]
        }
  }

  /** The sidecar key for a listed file: its layout-RELATIVE path. Flat
    * layouts key by bare name; the key-grouped layout prefixes the
    * `pkey=K` directory, because one task writes the same
    * `part-00000-<uuid>` name under several pkey dirs — bare names
    * collide across keys there.
    */
  private[sources] def relativeSidecarKey(f: String): String = {
    val p = new Path(f)
    val parent = p.getParent
    if (parent != null && parent.getName.startsWith("pkey=")) s"${parent.getName}/${p.getName}"
    else p.getName
  }

  /** Parses the `_ranges.csv` sidecar at the layout root (see
    * [[SeriesSource.writeKeyRanged]]). Absent/unreadable → empty map
    * (pruning and layout claims just turn off — advisory by design).
    */
  private[sources] def loadRanges(path: String, conf: Configuration): Map[String, (Long, Long)] =
    try {
      val p = new Path(new Path(path), "_ranges.csv")
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Map.empty
      else {
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(fs.open(p), "UTF-8"))
        try
          Iterator
            .continually(in.readLine())
            .takeWhile(_ != null)
            .drop(1) // header
            .flatMap { line =>
              line.split(",", -1) match {
                case Array(f, lo, hi) =>
                  try Some(f -> (lo.trim.toLong, hi.trim.toLong))
                  catch { case _: NumberFormatException => None }
                case _ => None
              }
            }
            .toMap
        finally in.close()
      }
    } catch { case _: java.io.IOException => Map.empty }

  val Schema: StructType = StructType(Seq(
    StructField("skey", LongType, nullable = false),
    StructField("ord", LongType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)
  ))

  private[sources] class SeriesTable(path: String) extends Table with SupportsRead {
    require(path != null, "graft.sources.SeriesV2 requires a load(path)")
    override def name(): String = s"graft_series($path)"
    override def schema(): StructType = Schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new SeriesScanBuilder(path)
  }

  private[sources] class SeriesScanBuilder(path: String)
      extends ScanBuilder
      with SupportsPushDownRequiredColumns
      with SupportsPushDownFilters
      with SupportsPushDownLimit
      with SupportsPushDownTopN
      with SupportsPushDownOffset
      with SupportsPushDownAggregates {
    private var required: StructType = Schema
    private var pushed: Array[Filter] = Array.empty
    private var limit: Int = -1
    private var topN: Option[TopNSpec] = None
    private var offset: Int = -1
    private var agg: Option[AggSpec] = None
    // file listing captured when a layout-dependent claim (COMPLETE
    // aggregate, pushed OFFSET) is made — see singleFileListing's Scaladoc
    private var snapshot: Option[Array[String]] = None

    // one partition per file ⇒ neither a limit nor a top-N can be global:
    // Spark keeps its Limit / Sort+Limit above (both interfaces default to
    // true; the explicit override reconciles the two inherited defaults)
    override def isPartiallyPushed(): Boolean = true

    /** Lists the layout ONCE and returns it only when it is a single data
      * file. Both layout-dependent promises (COMPLETE aggregate pushdown,
      * OFFSET pushdown) key off this, and the returned listing is CAPTURED
      * into the Scan so `planInputPartitions` executes against the exact
      * layout the promise was judged on — a file appearing between
      * planning and execution can otherwise turn "one reader's rows ARE
      * the global answer" into silently-unmerged per-file partials
      * (classic TOCTOU between two directory listings).
      */
    private def singleFileListing(): Option[Array[String]] =
      try {
        val p = new Path(path)
        val fs = p.getFileSystem(org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
        val files = listDataFiles(fs, p).map(_.getPath.toString)
        if (files.length == 1) Some(files) else None
      } catch { case _: java.io.IOException => None }

    /** PARTIAL aggregate pushdown: each file reader folds its lines into
      * per-group accumulators and emits one row per group seen (one row
      * total for a global aggregate, even over zero matching lines — the
      * empty-input contract: `count(*)` over nothing must surface a 0,
      * not a missing row). With one partition per file the source cannot
      * produce the GLOBAL result, so `supportCompletePushDown` stays
      * false and Spark keeps a final merge Aggregate above (count →
      * sum-of-partials, min → min, …) — semantics unchanged, but the
      * scan ships one row per (file, series) instead of one per LINE.
      *
      * Accepted shape: group-by absent or exactly `skey` (the format's
      * series key — the only grouping the layout makes cheap), with
      * COUNT(*)/COUNT(col)/MIN/MAX on any column and SUM on the LONG
      * columns only. SUM over a double column is REFUSED deliberately:
      * the final merge adds per-file partials in nondeterministic
      * partition order, so a pushed double sum could flip low bits
      * run-to-run — the unpushed path keeps Spark's own (equally
      * order-dependent but plan-visible) semantics instead of hiding
      * the hazard inside the source. MIN/MAX over doubles are exact
      * selections and safe. Partial-agg state is O(distinct skeys per
      * file); series layouts keep files key-partitioned, so that is
      * small by construction at any corpus size.
      */
    override def pushAggregation(aggregation: Aggregation): Boolean =
      // per-partition limit/top-N/offset apply pre-agg; composing would change results
      if (limit >= 0 || topN.isDefined || offset >= 0) false
      else
        AggSpec.of(aggregation) match {
          case some @ Some(_) => agg = some; true
          case None           => false
        }

    /** COMPLETE pushdown is claimed only when the layout makes the
      * partial fold globally final, in either of two provable shapes:
      *
      *  - a SINGLE input file holds every row of every group, so the one
      *    reader's per-group rows ARE the answer;
      *  - the aggregation groups by `skey` and the layout is KEY-GROUPED
      *    with a unique key per file ([[SeriesSource.writeKeyGrouped]]:
      *    sidecar lo == hi everywhere, no key repeated across files) —
      *    every group lives wholly inside one file, so each reader's
      *    per-group fold is the global row for that group. This is the
      *    aggregate face of the storage-partitioned read: Spark drops
      *    its merge Aggregate AND the shuffle under it, and the whole
      *    `groupBy(skey)` plans as scan + project. (The
      *    KeyGroupedPartitioning report below covers the row-mode
      *    shapes the fold can't express — e.g. SUM over doubles.)
      *
      * Any other layout keeps the partial contract (a group's rows may
      * span files). The file listing runs once, on the driver, at
      * planning, and is captured so execution reuses the exact judged
      * layout.
      */
    override def supportCompletePushDown(aggregation: Aggregation): Boolean =
      AggSpec.of(aggregation) match {
        case None => false
        case Some(spec) =>
          val single = singleFileListing()
          if (single.isDefined) { snapshot = single; true }
          else if (spec.groupBySkey) {
            val keyed = keyedUniqueListing()
            if (keyed.isDefined) snapshot = keyed
            keyed.isDefined
          } else false
      }

    /** Lists the layout ONCE and returns it only when the sidecar proves
      * a unique single skey per file: every data file has a `lo == hi`
      * range and no key repeats across files. Snapshot semantics match
      * [[singleFileListing]] — the COMPLETE claim must execute against
      * the judged layout.
      */
    private def keyedUniqueListing(): Option[Array[String]] =
      try {
        val p = new Path(path)
        val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
        val ranges = loadRanges(path, conf)
        if (ranges.isEmpty) None
        else {
          val files = listDataFiles(p.getFileSystem(conf), p).map(_.getPath.toString)
          val keys = files.map(f => ranges.get(relativeSidecarKey(f)).collect { case (lo, hi) if lo == hi => lo })
          if (files.nonEmpty && keys.forall(_.isDefined) && keys.flatten.distinct.length == files.length)
            Some(files)
          else None
        }
      } catch { case _: java.io.IOException => None }

    /** LIMIT after a pushed aggregation would early-stop the INPUT of the
      * per-file fold, not its output — refuse (Spark never offers this
      * for partial pushdown, since the merge Aggregate sits between; the
      * guard makes the invariant local).
      */

    /** LIMIT reaches the reader as a PER-PARTITION early stop: each file
      * reader emits at most `limit` rows then closes, so a
      * `.limit(10)` over a many-GB directory reads ~10 lines per file
      * instead of scanning everything. `isPartiallyPushed` stays true
      * (the default): with one partition per file the source cannot
      * enforce the GLOBAL limit, so Spark keeps its Limit node above —
      * semantics unchanged, scan cost bounded.
      */
    override def pushLimit(l: Int): Boolean =
      if (agg.isDefined) false
      else { limit = l; true }

    /** TOP-N (ORDER BY + LIMIT) reaches the reader as a PER-PARTITION
      * bounded selection: each file reader keeps a size-n heap ordered by
      * the pushed sort and emits only its survivors, so an
      * `orderBy(x).limit(10)` over a many-GB directory ships ~10 rows per
      * file instead of every line — the scan-side half of what
      * WindowGroupLimit does post-scan. `isPartiallyPushed` stays true
      * (the default): with one partition per file the source cannot
      * produce the GLOBAL top-n, so Spark keeps its Sort+Limit above and
      * merely re-sorts n·files rows — semantics unchanged, scan output
      * bounded. Heap comparisons use Spark's TOTAL double order
      * (`java.lang.Double.compare`: NaN greatest, -0.0 < 0.0) so the
      * survivors are exactly the rows the Sort above would have kept.
      * Accepted orders: any list of bare column references (the columns
      * are non-null by schema, so null ordering is vacuous).
      */
    override def pushTopN(orders: Array[V2SortOrder], l: Int): Boolean =
      if (agg.isDefined || offset >= 0) false
      else {
        val cols = orders.map { so =>
          so.expression() match {
            case n: NamedReference if n.fieldNames.length == 1 =>
              val i = Schema.fieldNames.indexOf(n.fieldNames()(0))
              if (i >= 0) SortCol(i, so.direction() == SortDirection.DESCENDING) else null
            case _ => null
          }
        }
        if (cols.contains(null) || l <= 0) false
        else { topN = Some(TopNSpec(cols, l)); true }
      }

    /** OFFSET pushdown is a GLOBAL promise — Spark deletes its Offset
      * operator entirely when this returns true — so it is only claimable
      * when one reader sees every row in a deterministic order: the
      * single-file layout, captured as a snapshot exactly like COMPLETE
      * aggregates. Multi-file layouts refuse (per-partition skipping
      * would drop the wrong rows), as does any composition with an
      * already-pushed limit/top-N/aggregate (Spark never offers those —
      * a partially-pushed limit keeps the Offset above — but the guard
      * makes the invariant local).
      */
    override def pushOffset(o: Int): Boolean =
      if (agg.isDefined || limit >= 0 || topN.isDefined || o <= 0) false
      else
        singleFileListing() match {
          case some @ Some(_) => snapshot = some; offset = o; true
          case None           => false
        }

    override def pruneColumns(requiredSchema: StructType): Unit =
      // preserve our parse order; the returned rows must match readSchema.
      // With a pushed aggregation the relation's output is the agg
      // columns, not base columns — the fold already parses only what
      // the accepted aggregates reference, so pruning is a no-op there.
      if (agg.isEmpty)
        required = StructType(Schema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

    /** Accept (and fully handle) skey comparisons; everything else stays
      * with Spark. A filter returned from here is NOT re-evaluated above,
      * so only predicates [[SeriesPartitionReader]] honors exactly may be
      * accepted.
      */
    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      val (ours, rest) = filters.partition {
        case EqualTo("skey", _: java.lang.Long | _: java.lang.Integer) => true
        case GreaterThan("skey", _: java.lang.Long | _: java.lang.Integer) => true
        case GreaterThanOrEqual("skey", _: java.lang.Long | _: java.lang.Integer) => true
        case LessThan("skey", _: java.lang.Long | _: java.lang.Integer) => true
        case LessThanOrEqual("skey", _: java.lang.Long | _: java.lang.Integer) => true
        case _ => false
      }
      pushed = ours
      rest
    }
    override def pushedFilters(): Array[Filter] = pushed

    override def build(): Scan =
      new SeriesScan(path, required, pushed, limit, agg, topN, offset, snapshot)
  }

  /** An accepted pushed TOP-N: sort columns index [[Schema]]. */
  private[sources] case class SortCol(col: Int, descending: Boolean)
  private[sources] case class TopNSpec(cols: Array[SortCol], n: Int) {
    def render: String =
      cols.map(c => s"${Schema.fieldNames(c.col)} ${if (c.descending) "DESC" else "ASC"}").mkString(", ") + s", limit $n"
  }

  private[sources] class SeriesScan(
      path: String,
      required: StructType,
      pushed: Array[Filter],
      limit: Int,
      agg: Option[AggSpec] = None,
      topN: Option[TopNSpec] = None,
      offset: Int = -1,
      snapshot: Option[Array[String]] = None
  ) extends Scan
      with Batch
      with SupportsRuntimeFiltering
      with SupportsReportStatistics
      with SupportsReportPartitioning {
    override def readSchema(): StructType = agg.map(_.readSchema).getOrElse(required)
    override def toBatch: Batch = this
    override def description(): String =
      s"graft_series path=$path, ReadColumns=[${required.fieldNames.mkString(",")}], " +
        s"PushedSkeyFilters=[${pushed.mkString(",")}], PushedLimit=${if (limit < 0) "none" else limit}, " +
        s"PushedTopN=[${topN.map(_.render).getOrElse("")}], PushedOffset=${if (offset < 0) "none" else offset}, " +
        s"PushedAggregation=[${agg.map(_.render).getOrElse("")}], " +
        s"KeyGroupedBySkey=${keyedListing.isDefined}, " +
        s"RuntimeFilterable=[${filterAttributes().map(_.describe()).mkString(",")}]"

    /** Join-driven runtime filtering (the DataSource V2 face of dynamic
      * partition pruning): when this scan sits under a join whose other
      * side is small and selective, Spark executes that side first
      * (reusing its broadcast) and calls [[filter]] with the observed
      * key set — the reader then rejects non-member lines after the one
      * leading long-parse, exactly like a compile-time skey predicate
      * but with values only a runtime join could know. Best-effort is
      * safe by construction: these filters come FROM a join, which
      * re-checks the keys anyway, so dropping only non-members can
      * never change results — unsupported shapes are ignored.
      * At 100 TB this is the difference between parsing every series
      * ever written and parsing the handful a dimension filter selects.
      *
      * skey is advertised ONLY when it survives into the scan's OUTPUT
      * schema: Spark resolves every filterAttribute against the
      * (column-pruned, possibly aggregate-rewritten) scan output and
      * fails planning on a miss — so a `select(ord, x)` projection or a
      * pushed global aggregate (whose output is agg columns, not base
      * columns) must advertise nothing rather than crash valid queries.
      */
    override def filterAttributes(): Array[NamedReference] = {
      val skeyInOutput = agg match {
        case Some(spec) => spec.groupBySkey
        case None       => required.fieldNames.contains("skey")
      }
      if (skeyInOutput) Array(Expressions.column("skey")) else Array.empty
    }

    @volatile private var runtime: Array[FilterSpec] = Array.empty
    override def filter(filters: Array[Filter]): Unit =
      // With a pushed limit/top-N/offset a pre-limit row drop would CHANGE
      // which rows the limit selects (the join above re-checks keys, but
      // only on the rows that survive the limit) — unreachable today
      // (Limit/Sort/Offset nodes break the PhysicalOperation pattern
      // Spark's runtime-filter rules match), but ignoring deliveries is
      // always safe and keeps the invariant local.
      if (limit < 0 && offset < 0 && topN.isEmpty) runtime = filters.flatMap(FilterSpec.ofRuntime)
    private[sources] def runtimeSpecs: Array[FilterSpec] = runtime

    // the SESSION's Hadoop configuration (spark.hadoop.* credentials, fs
    // implementations, defaultFS) — a fresh `new Configuration()` works
    // for local paths but breaks the source on any configured filesystem
    private def sessionHadoopConf(): Configuration =
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

    private def listedFiles(): Array[FileStatus] = {
      val p = new Path(path)
      listDataFiles(p.getFileSystem(sessionHadoopConf()), p)
    }

    /** `_ranges.csv` sidecar ([[SeriesSource.writeKeyRanged]] /
      * [[SeriesSource.writeKeyGrouped]]): per-file exact [min, max] skey.
      * Advisory — absent or partial sidecars just disable pruning for the
      * missing files. Parsed ONCE per scan (planning calls
      * estimateStatistics repeatedly and execution calls
      * planInputPartitions again; the sidecar is immutable once written,
      * and staleness is safe — unknown files are never pruned).
      */
    private lazy val sidecarRanges: Map[String, (Long, Long)] =
      SeriesV2.loadRanges(path, sessionHadoopConf())

    private def sidecarKey(f: String): String = relativeSidecarKey(f)

    /** FILE ELIMINATION on the key-ranged layout: drop files whose skey
      * range provably cannot satisfy the conjunction of pushed static and
      * join-delivered runtime predicates — the partition-elimination half
      * of the pruning story (the per-line reject gate is the other). Not
      * applied under a pushed GLOBAL aggregate: its empty-input contract
      * emits one per-file row (count 0 / NULL extrema) and pruning every
      * file would lose it; grouped aggregates are safe (excluded groups
      * simply don't exist). Runtime filters are join-delivered and
      * re-checked above, so eliminating provably-non-matching files is
      * exactly as safe as the row-level drop.
      */
    private def pruneByRanges(files: Array[String], specs: Array[FilterSpec]): Array[String] = {
      val pruneSafe = agg.isEmpty || agg.exists(_.groupBySkey)
      if (!pruneSafe || specs.isEmpty || files.isEmpty) return files
      val ranges = sidecarRanges
      if (ranges.isEmpty) files
      else
        files.filter { f =>
          ranges.get(sidecarKey(f)) match {
            case Some((lo, hi)) => specs.forall(_.mayMatchRange(lo, hi))
            case None           => true // unknown range: never prune
          }
        }
    }

    /** KEY-GROUPED layout claim (`SupportsReportPartitioning`): Some when
      * the sidecar proves every data file holds exactly ONE skey
      * (lo == hi, [[SeriesSource.writeKeyGrouped]]'s layout) and covers
      * every listed file, the scan's output carries skey (plain read
      * keeping the column, or a grouped pushed aggregate), and no
      * row-bounding pushdown is active (conservative: a limit/top-N/
      * offset never composes with a groupBy anyway). The value is the
      * static-pruned (file, skey) listing, judged ONCE and reused by
      * `planInputPartitions` — the COMPLETE-aggregate TOCTOU discipline:
      * once KeyGroupedPartitioning is promised, every planned partition
      * must carry its key, and the partition-key SET must be identical
      * across plannings (BatchScanExec re-plans under runtime filtering
      * and rejects a changed key set), so runtime specs are deliberately
      * NOT applied to the file list here — the readers still drop
      * non-member ROWS, which leaves partition keys intact.
      *
      * DUPLICATE-KEY FILES ARE DELIBERATELY TOLERATED (ADVICE r15):
      * unlike [[keyedUniqueListing]] (the COMPLETE-aggregate claim,
      * which needs every group wholly inside one file), the
      * partitioning claim only needs every FILE to hold one key — a
      * writeKeyRanged layout where one skey spans two files, or a
      * writeKeyGrouped run split by `maxRecordsPerFile`, yields several
      * splits carrying the same key, and that is the contract
      * `HasPartitionKey` exists for: `DataSourceV2ScanExecBase.
      * groupPartitions` groups equal-key splits into ONE partition
      * before Spark compares partitionings. `numPartitions` reported
      * below is therefore the DISTINCT key count, matching the grouped
      * view Spark plans against, not the file count.
      */
    private lazy val keyedListing: Option[Array[(String, Long)]] = {
      val outputKeyed = agg match {
        case Some(spec) => spec.groupBySkey
        case None       => required.fieldNames.contains("skey")
      }
      if (!outputKeyed || limit >= 0 || topN.isDefined || offset >= 0 || sidecarRanges.isEmpty) None
      else
        try {
          val files = pruneByRanges(
            snapshot.getOrElse(listedFiles().map(_.getPath.toString)),
            pushed.map(FilterSpec.of)
          )
          val keyed = files.map { f =>
            sidecarRanges.get(sidecarKey(f)) match {
              case Some((lo, hi)) if lo == hi => (f, lo)
              case _                          => null
            }
          }
          if (keyed.isEmpty || keyed.contains(null)) None else Some(keyed)
        } catch { case _: java.io.IOException => None }
    }

    /** Storage-partitioned read: on the key-grouped layout every file IS
      * one skey, so the scan reports `KeyGroupedPartitioning(skey)` and
      * each partition carries its key — Spark then plans `groupBy(skey)`
      * / skey-equi-joins over this source with NO shuffle exchange
      * (requires `spark.sql.sources.v2.bucketing.enabled`). Any other
      * layout reports unknown partitioning, exactly as before.
      */
    override def outputPartitioning(): V2Partitioning = keyedListing match {
      case Some(keyed) =>
        new V2KeyGroupedPartitioning(Array(Expressions.identity("skey")), keyed.map(_._2).distinct.length)
      case None => new V2UnknownPartitioning(0)
    }

    // a layout-dependent promise (COMPLETE aggregate, pushed OFFSET,
    // key-grouped partitioning) pins the planning-time listing; otherwise
    // list live at execution. Called AFTER any runtime filter() delivery,
    // so sidecar pruning sees the join-observed key set too — genuine
    // dynamic partition elimination for the custom format. Under an
    // active KeyGroupedPartitioning claim the keyed listing ships
    // verbatim (see keyedListing's Scaladoc for why runtime specs must
    // not eliminate files there).
    override def planInputPartitions(): Array[InputPartition] =
      keyedListing match {
        case Some(keyed) =>
          keyed.sortBy(_._1).map { case (f, k) => KeyedSeriesInputPartition(f, k): InputPartition }
        case None =>
          pruneByRanges(
            snapshot.getOrElse(listedFiles().map(_.getPath.toString)),
            pushed.map(FilterSpec.of) ++ runtime
          ).sorted
            .map(f => SeriesInputPartition(f): InputPartition)
      }

    /** Size statistics from the file listing (`SupportsReportStatistics`):
      * without this a V2 relation defaults to "unknown = effectively
      * infinite" and can NEVER be auto-broadcast — every join against it
      * shuffles, however small the series directory is. Reported size =
      * raw CSV bytes scaled by the read-column fraction (the built-in
      * FileScan convention for pruned reads); row count stays unknown
      * (lines aren't counted at planning). Over-estimating only costs a
      * missed broadcast; the column fraction is FLOORED at one column
      * (an existence-only scan can prune everything, and `raw * 0` would
      * report 1 byte — auto-broadcasting an arbitrarily large directory),
      * so the report never drops below 1/4 of the raw bytes and cannot
      * cause an oversized broadcast OOM.
      */
    // computed once per scan: planning calls estimateStatistics repeatedly
    // (join reorder, broadcast decisions) and each call would otherwise
    // re-list the directory and re-parse the sidecar
    private lazy val estimatedBytes: java.util.OptionalLong =
      try {
        // static sidecar pruning sharpens the estimate: a selective
        // skey probe of a huge key-ranged directory reports only the
        // bytes of files that can match — often the difference between
        // a broadcast and a shuffle for the join above (runtime specs
        // are not known at planning and play no part here)
        val listed = listedFiles()
        val kept = pruneByRanges(listed.map(_.getPath.toString), pushed.map(FilterSpec.of)).toSet
        val raw = listed.filter(s => kept.contains(s.getPath.toString)).map(_.getLen).sum
        java.util.OptionalLong.of(math.max(1L, raw * math.max(1, required.length) / Schema.length))
      } catch { case _: java.io.IOException => java.util.OptionalLong.empty() }

    override def estimateStatistics(): Statistics =
      new Statistics {
        override def sizeInBytes(): java.util.OptionalLong = estimatedBytes
        override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
      }

    // called at execution time, AFTER any runtime filter() delivery —
    // the readers see compile-time and runtime predicates as one algebra
    override def createReaderFactory(): PartitionReaderFactory =
      new SeriesReaderFactory(
        required.fieldNames,
        pushed.map(FilterSpec.of) ++ runtime,
        limit,
        agg,
        topN,
        offset,
        new org.apache.spark.util.SerializableConfiguration(sessionHadoopConf())
      )
  }

  /** One file of the layout. [[KeyedSeriesInputPartition]] is the
    * key-grouped layout's form: the file provably holds exactly one skey
    * (sidecar lo == hi), surfaced through `HasPartitionKey` so Spark can
    * group partitions by key for storage-partitioned reads.
    */
  private[sources] sealed trait SeriesFilePartition extends InputPartition { def file: String }
  private[sources] case class SeriesInputPartition(file: String) extends SeriesFilePartition
  private[sources] case class KeyedSeriesInputPartition(file: String, skey: Long)
      extends SeriesFilePartition
      with HasPartitionKey {
    override def partitionKey(): InternalRow = new GenericInternalRow(Array[Any](skey))
  }

  /** Fast REJECT-only predicate gate: parse the line's FIRST field and
    * test the pushed + runtime skey predicates before paying the full
    * `split`. Returns true only when the line parses far enough to
    * PROVE no filter accepts it; anything uncertain (no comma, garbage
    * first field, empty filter set) falls through to the full path,
    * which re-checks everything — so semantics are exactly the split-
    * first code's, minus the split on provably-rejected lines. Under a
    * selective static or runtime (join-delivered) predicate, rejected
    * lines ARE the scan, and this is the "one cheap long-parse per
    * skipped line" the class contract promises.
    */
  private[sources] def gateRejects(line: String, filters: Array[FilterSpec]): Boolean = {
    if (filters.isEmpty) return false
    val c0 = line.indexOf(',')
    if (c0 <= 0) return false
    try {
      val k = java.lang.Long.parseLong(line.substring(0, c0).trim)
      !filters.forall(_.accepts(k))
    } catch { case _: NumberFormatException => false }
  }

  /** Serializable form of an accepted pushed aggregation: `kind` is
    * 0=COUNT(*), 1=COUNT(col), 2=MIN, 3=MAX, 4=SUM; `col` indexes
    * [[Schema]] (-1 for COUNT(*)). The closed algebra keeps the fold's
    * hot loop a branch on primitives, the [[FilterSpec]] precedent.
    */
  private[sources] case class AggCol(kind: Int, col: Int) {
    def isLongCol: Boolean = col >= 0 && col <= 1 // skey, ord
    def render: String = {
      val name = if (col < 0) "*" else Schema.fieldNames(col)
      kind match {
        case 0 => "COUNT(*)"
        case 1 => s"COUNT($name)"
        case 2 => s"MIN($name)"
        case 3 => s"MAX($name)"
        case 4 => s"SUM($name)"
      }
    }
  }

  private[sources] case class AggSpec(groupBySkey: Boolean, aggs: Array[AggCol]) {
    /** Post-pushdown scan schema: group column(s) first, then one field
      * per aggregate, positionally matched by Spark to the rewritten
      * merge Aggregate. COUNT and SUM-over-long surface LongType; MIN/
      * MAX keep their column's type. MIN/MAX/SUM are nullable (a global
      * aggregate over zero rows has no value); counts never are.
      */
    def readSchema: StructType = {
      val g = if (groupBySkey) Seq(StructField("skey", LongType, nullable = false)) else Nil
      val a = aggs.zipWithIndex.map { case (ac, i) =>
        ac.kind match {
          case 0 | 1 => StructField(s"agg_$i", LongType, nullable = false)
          case 4     => StructField(s"agg_$i", LongType, nullable = true)
          case _     => StructField(s"agg_$i", Schema.fields(ac.col).dataType, nullable = true)
        }
      }
      StructType(g ++ a)
    }
    def render: String =
      (if (groupBySkey) Seq("GROUP BY skey") else Nil).++(aggs.map(_.render)).mkString(", ")
    /** Which base columns the fold must parse (skey is always parsed —
      * it leads the line and carries the pushed filters).
      */
    def needs(col: Int): Boolean = aggs.exists(a => a.col == col)
  }

  private[sources] object AggSpec {
    private def colIdx(e: org.apache.spark.sql.connector.expressions.Expression): Int = e match {
      case n: NamedReference if n.fieldNames.length == 1 => Schema.fieldNames.indexOf(n.fieldNames()(0))
      case _                                             => -2
    }
    private def of(f: AggregateFunc): Option[AggCol] = f match {
      case _: CountStar               => Some(AggCol(0, -1))
      case c: Count if !c.isDistinct  => Some(colIdx(c.column)).filter(_ >= 0).map(AggCol(1, _))
      case m: Min                     => Some(colIdx(m.column)).filter(_ >= 0).map(AggCol(2, _))
      case m: Max                     => Some(colIdx(m.column)).filter(_ >= 0).map(AggCol(3, _))
      // SUM: long columns only — see pushAggregation's Scaladoc
      case s: Sum if !s.isDistinct    => Some(colIdx(s.column)).filter(i => i == 0 || i == 1).map(AggCol(4, _))
      case _                          => None
    }
    def of(a: Aggregation): Option[AggSpec] = {
      val gb = a.groupByExpressions
      val groupOk =
        gb.isEmpty || (gb.length == 1 && (gb(0) match {
          case n: NamedReference => n.fieldNames.sameElements(Array("skey"))
          case _                 => false
        }))
      if (!groupOk || a.aggregateExpressions.isEmpty) None
      else {
        val cols = a.aggregateExpressions.map(of)
        if (cols.forall(_.isDefined)) Some(AggSpec(gb.nonEmpty, cols.map(_.get))) else None
      }
    }
  }

  /** Serializable form of the accepted skey predicates (Filter itself is
    * serializable, but a closed algebra keeps the reader's hot loop a
    * branch on primitives). `op = 5` is runtime IN-membership: `set` is
    * a sorted long array probed by binary search (the runtime key sets
    * come from broadcast-sized join sides, so log2 of a small n).
    */
  private[sources] case class FilterSpec(op: Int, v: Long, set: Array[Long] = null) {
    def accepts(skey: Long): Boolean = op match {
      case 0 => skey == v
      case 1 => skey > v
      case 2 => skey >= v
      case 3 => skey < v
      case 4 => skey <= v
      case 5 => java.util.Arrays.binarySearch(set, skey) >= 0
    }

    /** Can ANY key in [lo, hi] satisfy this predicate? Used for
      * sidecar-driven FILE elimination: a false here proves the file
      * holds no matching row (ranges are exact min/max from the
      * writer), so skipping it cannot change results.
      */
    def mayMatchRange(lo: Long, hi: Long): Boolean = op match {
      case 0 => v >= lo && v <= hi
      case 1 => hi > v
      case 2 => hi >= v
      case 3 => lo < v
      case 4 => lo <= v
      case 5 =>
        val i = java.util.Arrays.binarySearch(set, lo)
        i >= 0 || { val ins = -i - 1; ins < set.length && set(ins) <= hi }
    }
  }
  private[sources] object FilterSpec {
    private def lv(a: Any): Long = a match {
      case l: java.lang.Long    => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    def of(f: Filter): FilterSpec = f match {
      case EqualTo("skey", v)            => FilterSpec(0, lv(v))
      case GreaterThan("skey", v)        => FilterSpec(1, lv(v))
      case GreaterThanOrEqual("skey", v) => FilterSpec(2, lv(v))
      case LessThan("skey", v)           => FilterSpec(3, lv(v))
      case LessThanOrEqual("skey", v)    => FilterSpec(4, lv(v))
      case other => throw new IllegalArgumentException(s"unpushable filter reached the reader: $other")
    }

    /** Runtime (join-delivered) filters are BEST-EFFORT: the join above
      * re-checks every key, so only recognized shapes are converted and
      * the rest are dropped — never an error, unlike the compile-time
      * path where acceptance promised full evaluation.
      */
    def ofRuntime(f: Filter): Option[FilterSpec] = f match {
      case In("skey", vs) =>
        val arr = vs.collect {
          case l: java.lang.Long    => l.longValue()
          case i: java.lang.Integer => i.longValue()
        }
        if (arr.length == vs.length) { java.util.Arrays.sort(arr); Some(FilterSpec(5, 0L, arr)) }
        else None
      case EqualTo("skey", v: java.lang.Long)    => Some(FilterSpec(0, v.longValue()))
      case EqualTo("skey", v: java.lang.Integer) => Some(FilterSpec(0, v.longValue()))
      case _                                     => None
    }
  }

  private[sources] class SeriesReaderFactory(
      columns: Array[String],
      filters: Array[FilterSpec],
      limit: Int,
      agg: Option[AggSpec],
      topN: Option[TopNSpec],
      offset: Int,
      hadoopConf: org.apache.spark.util.SerializableConfiguration
  ) extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val file = partition.asInstanceOf[SeriesFilePartition].file
      (agg, topN) match {
        case (Some(spec), _) => new SeriesAggReader(file, filters, spec, hadoopConf.value)
        case (_, Some(tn))   => new SeriesTopNReader(file, columns, filters, tn, hadoopConf.value)
        case _               => new SeriesPartitionReader(file, columns, filters, limit, offset, hadoopConf.value)
      }
    }
  }

  /** Full parse of one data line into the pruned-column row with the
    * pushed + runtime predicates applied — the ONE definition of the
    * row-reader line contract (malformed → null, filtered → null),
    * shared by the plain and top-N readers so the format and the
    * malformed-skip semantics cannot silently diverge between scans.
    */
  private[sources] def parseRow(line: String, columns: Array[String], filters: Array[FilterSpec]): Array[Any] = {
    val parts = line.split(",", -1)
    if (parts.length != 4) return null
    try {
      val skey = java.lang.Long.parseLong(parts(0).trim)
      if (!filters.forall(_.accepts(skey))) return null
      // explicit Array[Any]: a map over same-primitive columns would
      // specialize to Array[Double] and break the cast
      val vals = new Array[Any](columns.length)
      var i = 0
      while (i < columns.length) {
        vals(i) = columns(i) match {
          case "skey" => skey
          case "ord"  => java.lang.Long.parseLong(parts(1).trim)
          case "x"    => java.lang.Double.parseDouble(parts(2).trim)
          case "y"    => java.lang.Double.parseDouble(parts(3).trim)
        }
        i += 1
      }
      vals
    } catch { case _: NumberFormatException => null } // malformed -> skip
  }

  /** Streams one file: header skipped, skey parsed first and tested
    * against the pushed predicates before the other fields are touched;
    * malformed lines are skipped (the `wideCsv` + `na.drop` contract).
    */
  private[sources] class SeriesPartitionReader(
      file: String,
      columns: Array[String],
      filters: Array[FilterSpec],
      limit: Int,
      offset: Int,
      hadoopConf: Configuration
  ) extends PartitionReader[InternalRow] {
    private val p = new Path(file)
    private val in = p.getFileSystem(hadoopConf).open(p)
    private val reader = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
    private var headerSkipped = false
    private var emitted = 0L
    // pushed OFFSET (single-file layout only — the builder's promise):
    // the first `offset` MATCHED rows are dropped, exactly the rows the
    // deleted Offset operator would have dropped from this file-order scan
    private var toSkip = math.max(0, offset)
    private var current: InternalRow = _

    override def next(): Boolean = {
      if (limit >= 0 && emitted >= limit) return false // pushed per-partition limit
      var line = reader.readLine()
      if (!headerSkipped && line != null) { headerSkipped = true; line = reader.readLine() }
      while (line != null) {
        if (!gateRejects(line, filters)) {
          val vals = parseRow(line, columns, filters)
          if (vals != null) {
            if (toSkip > 0) toSkip -= 1 // pushed offset: drop, keep scanning
            else {
              current = new GenericInternalRow(vals)
              emitted += 1
              return true
            }
          }
        }
        line = reader.readLine()
      }
      false
    }
    override def get(): InternalRow = current
    override def close(): Unit = reader.close()
  }

  /** The pushed TOP-N reader: streams the file once through the same
    * parse + pushed-filter gate as the row reader, keeping a size-n
    * bounded heap ordered by the pushed sort (heap root = current WORST
    * survivor, evicted on overflow), and emits the survivors at EOF in
    * arbitrary order — Spark's Sort+Limit above (kept, because the push
    * is partial) re-orders the n·files candidates into the global answer.
    * Memory is O(n), shipped rows are ≤ n per file regardless of file
    * size. Double keys compare with Spark's total order
    * (`java.lang.Double.compare`) so survivors match the unpushed plan's
    * even with NaN / signed zeros in the data.
    */
  private[sources] class SeriesTopNReader(
      file: String,
      columns: Array[String],
      filters: Array[FilterSpec],
      topN: TopNSpec,
      hadoopConf: Configuration
  ) extends PartitionReader[InternalRow] {
    private val p = new Path(file)
    private val in = p.getFileSystem(hadoopConf).open(p)
    private val reader = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
    private var it: Iterator[InternalRow] = _
    private var current: InternalRow = _

    // sort keys resolved to positions in the emitted row (the Sort above
    // references scan-output columns, so every key is in `columns`)
    private val keyPos: Array[Int] = topN.cols.map(c => columns.indexOf(Schema.fieldNames(c.col)))
    private val keyIsLong: Array[Boolean] = topN.cols.map(_.col <= 1)
    require(keyPos.forall(_ >= 0), s"pushed sort key missing from read columns ${columns.mkString(",")}")

    private def cmp(a: Array[Any], b: Array[Any]): Int = {
      var i = 0
      while (i < keyPos.length) {
        val c =
          if (keyIsLong(i))
            java.lang.Long.compare(a(keyPos(i)).asInstanceOf[Long], b(keyPos(i)).asInstanceOf[Long])
          else
            java.lang.Double.compare(a(keyPos(i)).asInstanceOf[Double], b(keyPos(i)).asInstanceOf[Double])
        if (c != 0) return if (topN.cols(i).descending) -c else c
        i += 1
      }
      0
    }

    private def fold(): Iterator[InternalRow] = {
      // heap root = LARGEST under the pushed order = first to evict
      val heap = new java.util.PriorityQueue[Array[Any]](topN.n + 1, (a, b) => cmp(b, a))
      var line = reader.readLine() // header
      line = reader.readLine()
      while (line != null) {
        if (!gateRejects(line, filters)) {
          val vals = parseRow(line, columns, filters)
          if (vals != null) {
            heap.add(vals)
            if (heap.size > topN.n) heap.poll()
          }
        }
        line = reader.readLine()
      }
      import scala.jdk.CollectionConverters._
      heap.iterator().asScala.map(vals => new GenericInternalRow(vals): InternalRow)
    }

    override def next(): Boolean = {
      if (it == null) it = fold()
      if (it.hasNext) { current = it.next(); true } else false
    }
    override def get(): InternalRow = current
    override def close(): Unit = reader.close()
  }

  private val EmptyParts = new Array[String](0)

  /** Per-group fold state for one file: one slot per aggregate. Counts
    * and long SUM/MIN/MAX live in `longs`; double MIN/MAX in `dbls`;
    * `seen` distinguishes "no value yet" (surfaces NULL for MIN/MAX/SUM
    * over zero rows).
    */
  private[sources] final class AggAccs(n: Int) {
    val longs = new Array[Long](n)
    val dbls = new Array[Double](n)
    val seen = new Array[Boolean](n)
  }

  /** The pushed-aggregation reader: streams the file once through the
    * same parse + pushed-filter gate as the row reader, folds matching
    * lines into per-group accumulators, and emits one row per group —
    * or exactly one row for a global aggregate, even when nothing
    * matched (count 0 / NULL extrema), so the merge Aggregate above
    * always has a partial to fold. Memory is O(groups in this file),
    * never O(lines).
    */
  private[sources] class SeriesAggReader(
      file: String,
      filters: Array[FilterSpec],
      spec: AggSpec,
      hadoopConf: Configuration
  ) extends PartitionReader[InternalRow] {
    private val p = new Path(file)
    private val in = p.getFileSystem(hadoopConf).open(p)
    private val reader = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
    private var it: Iterator[InternalRow] = _
    private var current: InternalRow = _

    private def fold(): Iterator[InternalRow] = {
      val aggs = spec.aggs
      val needOrd = spec.needs(1)
      val needX = spec.needs(2)
      val needY = spec.needs(3)
      // LinkedHashMap: deterministic (file-order) partial emission
      val groups = new java.util.LinkedHashMap[Long, AggAccs]()
      if (!spec.groupBySkey) groups.put(0L, new AggAccs(aggs.length)) // the global row
      var line = reader.readLine() // header
      line = reader.readLine()
      while (line != null) {
        val parts = if (gateRejects(line, filters)) EmptyParts else line.split(",", -1)
        if (parts.length == 4) {
          try {
            val skey = java.lang.Long.parseLong(parts(0).trim)
            if (filters.forall(_.accepts(skey))) {
              val ord = if (needOrd) java.lang.Long.parseLong(parts(1).trim) else 0L
              val x = if (needX) java.lang.Double.parseDouble(parts(2).trim) else 0.0
              val y = if (needY) java.lang.Double.parseDouble(parts(3).trim) else 0.0
              val key = if (spec.groupBySkey) skey else 0L
              var acc = groups.get(key)
              if (acc == null) { acc = new AggAccs(aggs.length); groups.put(key, acc) }
              var i = 0
              while (i < aggs.length) {
                val a = aggs(i)
                a.kind match {
                  case 0 | 1 => acc.longs(i) += 1L // columns are never null post-parse
                  case 4 =>
                    acc.longs(i) += (if (a.col == 0) skey else ord)
                    acc.seen(i) = true
                  case k =>
                    if (a.isLongCol) {
                      val v = if (a.col == 0) skey else ord
                      if (!acc.seen(i) || (if (k == 2) v < acc.longs(i) else v > acc.longs(i)))
                        acc.longs(i) = v
                    } else {
                      val v = if (a.col == 2) x else y
                      // TOTAL double order (NaN greatest, -0.0 < 0.0):
                      // primitive </> would make a pushed MIN/MAX diverge
                      // from the unpushed plan whenever NaN is present
                      // (NaN compares false against everything), breaking
                      // the "exact selections and safe" contract
                      val c = java.lang.Double.compare(v, acc.dbls(i))
                      if (!acc.seen(i) || (if (k == 2) c < 0 else c > 0))
                        acc.dbls(i) = v
                    }
                    acc.seen(i) = true
                }
                i += 1
              }
            }
          } catch { case _: NumberFormatException => () } // malformed -> skip
        }
        line = reader.readLine()
      }
      val off = if (spec.groupBySkey) 1 else 0
      import scala.jdk.CollectionConverters._
      groups.entrySet().iterator().asScala.map { e =>
        val acc = e.getValue
        val vals = new Array[Any](off + aggs.length)
        if (spec.groupBySkey) vals(0) = e.getKey
        var i = 0
        while (i < aggs.length) {
          val a = aggs(i)
          vals(off + i) = a.kind match {
            case 0 | 1                 => acc.longs(i)
            case _ if !acc.seen(i)     => null
            case 4                     => acc.longs(i)
            case _ if a.isLongCol      => acc.longs(i)
            case _                     => acc.dbls(i)
          }
          i += 1
        }
        new GenericInternalRow(vals): InternalRow
      }
    }

    override def next(): Boolean = {
      if (it == null) it = fold()
      if (it.hasNext) { current = it.next(); true } else false
    }
    override def get(): InternalRow = current
    override def close(): Unit = reader.close()
  }
}
