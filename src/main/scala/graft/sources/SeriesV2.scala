package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
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
  *    (they do not need re-checking above — they are returned as handled).
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
      with SupportsPushDownLimit {
    private var required: StructType = Schema
    private var pushed: Array[Filter] = Array.empty
    private var limit: Int = -1

    /** LIMIT reaches the reader as a PER-PARTITION early stop: each file
      * reader emits at most `limit` rows then closes, so a
      * `.limit(10)` over a many-GB directory reads ~10 lines per file
      * instead of scanning everything. `isPartiallyPushed` stays true
      * (the default): with one partition per file the source cannot
      * enforce the GLOBAL limit, so Spark keeps its Limit node above —
      * semantics unchanged, scan cost bounded.
      */
    override def pushLimit(l: Int): Boolean = { limit = l; true }

    override def pruneColumns(requiredSchema: StructType): Unit =
      // preserve our parse order; the returned rows must match readSchema
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

    override def build(): Scan = new SeriesScan(path, required, pushed, limit)
  }

  private[sources] class SeriesScan(path: String, required: StructType, pushed: Array[Filter], limit: Int)
      extends Scan
      with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft_series path=$path, ReadColumns=[${required.fieldNames.mkString(",")}], " +
        s"PushedSkeyFilters=[${pushed.mkString(",")}], PushedLimit=${if (limit < 0) "none" else limit}"

    // the SESSION's Hadoop configuration (spark.hadoop.* credentials, fs
    // implementations, defaultFS) — a fresh `new Configuration()` works
    // for local paths but breaks the source on any configured filesystem
    private def sessionHadoopConf(): Configuration =
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

    override def planInputPartitions(): Array[InputPartition] = {
      val p = new Path(path)
      val fs = p.getFileSystem(sessionHadoopConf())
      val status = fs.getFileStatus(p)
      val files =
        if (status.isDirectory)
          fs.listStatus(p)
            .filter(s => s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
            .map(_.getPath.toString)
        else Array(path)
      files.sorted.map(f => SeriesInputPartition(f): InputPartition)
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new SeriesReaderFactory(
        required.fieldNames,
        pushed.map(FilterSpec.of),
        limit,
        new org.apache.spark.util.SerializableConfiguration(sessionHadoopConf())
      )
  }

  private[sources] case class SeriesInputPartition(file: String) extends InputPartition

  /** Serializable form of the accepted skey predicates (Filter itself is
    * serializable, but a closed algebra keeps the reader's hot loop a
    * branch on primitives).
    */
  private[sources] case class FilterSpec(op: Int, v: Long) {
    def accepts(skey: Long): Boolean = op match {
      case 0 => skey == v
      case 1 => skey > v
      case 2 => skey >= v
      case 3 => skey < v
      case 4 => skey <= v
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
  }

  private[sources] class SeriesReaderFactory(
      columns: Array[String],
      filters: Array[FilterSpec],
      limit: Int,
      hadoopConf: org.apache.spark.util.SerializableConfiguration
  ) extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      new SeriesPartitionReader(
        partition.asInstanceOf[SeriesInputPartition].file,
        columns,
        filters,
        limit,
        hadoopConf.value
      )
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
      hadoopConf: Configuration
  ) extends PartitionReader[InternalRow] {
    private val p = new Path(file)
    private val in = p.getFileSystem(hadoopConf).open(p)
    private val reader = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
    private var headerSkipped = false
    private var emitted = 0L
    private var current: InternalRow = _

    override def next(): Boolean = {
      if (limit >= 0 && emitted >= limit) return false // pushed per-partition limit
      var line = reader.readLine()
      if (!headerSkipped && line != null) { headerSkipped = true; line = reader.readLine() }
      while (line != null) {
        val parts = line.split(",", -1)
        if (parts.length == 4) {
          try {
            val skey = java.lang.Long.parseLong(parts(0).trim)
            if (filters.forall(_.accepts(skey))) {
              // explicit Array[Any]: a map over same-primitive columns
              // would specialize to Array[Double] and break the cast
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
              current = new GenericInternalRow(vals)
              emitted += 1
              return true
            }
          } catch { case _: NumberFormatException => () } // malformed -> skip
        }
        line = reader.readLine()
      }
      false
    }
    override def get(): InternalRow = current
    override def close(): Unit = reader.close()
  }
}
