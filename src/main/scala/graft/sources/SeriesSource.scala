package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ccm.Ccm

/** Series ingestion sources beyond the driver's parquet tables.
  *
  * The reference ingests custom data as two comma-separated text lines
  * (`examples.livemd:203-218`, parsed by [[Ccm.parseSeriesText]]). These
  * readers lift that and ordinary long/wide CSV into the engine's
  * long-format `(skey, ord, x, y)` shape used by [[graft.ccm.Ccm]].
  */
object SeriesSource {

  /** Wide-shape projection with the LAYOUT's exact types: a caller whose
    * ord is an int (or a `id / n` double) must not trip the writers' row
    * encoder — the layout contract is (long, long, double, double), so
    * the writers cast to it rather than demand it. Null rows are DROPPED
    * here — the same `na.drop` contract [[wideCsv]] applies on read (the
    * layout has no null semantics); without the drop a single null skey
    * would crash sidecar derivation AFTER the expensive data write
    * (`pkey=__HIVE_DEFAULT_PARTITION__` parses as no long) or NPE the
    * range fold mid-write.
    */
  private def asWide(df: DataFrame): DataFrame =
    df.select(
      col("skey").cast("long").as("skey"),
      col("ord").cast("long").as("ord"),
      col("x").cast("double").as("x"),
      col("y").cast("double").as("y")
    ).na.drop()

  private val wideSchema = StructType(Seq(
    StructField("skey", LongType, nullable = false),
    StructField("ord", LongType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)
  ))

  /** CSV with header `skey,ord,x,y` -> the wide series shape. An explicit
    * schema (no inference pass) keeps the read single-scan at scale.
    * Malformed values parse to null despite the non-nullable schema (Spark
    * CSV does not enforce nullability) — such rows are dropped here rather
    * than poisoning the numeric kernel downstream.
    */
  def wideCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(wideSchema)
      .csv(path)
      .na
      .drop()

  /** The reference's livemd text format (two comma-separated lines) ->
    * wide series DataFrame with the given series key.
    */
  def fromSeriesText(spark: SparkSession, text: String, skey: Long = 0L): DataFrame = {
    val (xs, ys) = Ccm.parseSeriesText(text)
    import spark.implicits._
    xs.indices.map(i => (skey, i.toLong, xs(i), ys(i))).toDF("skey", "ord", "x", "y")
  }

  /** Writes the wide series shape as a KEY-RANGED layout: files hold
    * disjoint skey ranges (range repartition + within-file sort) and a
    * `_ranges.csv` sidecar records each file's [min, max] skey — the
    * custom-format analogue of parquet's column min/max statistics.
    * [[SeriesV2]] reads the sidecar to ELIMINATE whole files whose range
    * cannot satisfy the pushed (or join-delivered runtime) skey
    * predicates, which is the partition-elimination story the
    * row-streamed layout cannot offer: at 100 TB a selective series
    * probe then opens the handful of files that can contain the key
    * instead of streaming every line ever written. The sidecar is
    * advisory — files absent from it are simply never pruned, and the
    * underscore prefix keeps it out of the data listing.
    *
    * ONE-PASS sidecar (VERDICT r14 item 3): the per-file [min, max] is
    * collected DURING the write through a pass-through `mapPartitions` +
    * collection accumulator, not by re-reading every written file — at
    * 100 TB the old read-back pass read the corpus twice. Partition i
    * lands in file `part-%05d-i…` (the stable FileFormatWriter naming
    * contract), which maps accumulator entries to file names without
    * reading a byte back. A retried task can report its partition id
    * twice; the merge below is min/max per id — idempotent, so
    * speculative/re-run tasks cannot corrupt a range.
    */
  def writeKeyRanged(df: DataFrame, dir: String, nFiles: Int = 32): Unit = {
    val spark = df.sparkSession
    val acc = spark.sparkContext.collectionAccumulator[(Int, Long, Long)]("graft_key_ranges")
    val tracked = asWide(df)
      .repartitionByRange(nFiles, col("skey"), col("ord"))
      .sortWithinPartitions("skey", "ord")
      .mapPartitions { it =>
        // wrap, don't drain: rows stream straight through to the writer,
        // the range is folded as they pass (memory stays O(1))
        new scala.collection.AbstractIterator[org.apache.spark.sql.Row] {
          private var lo = Long.MaxValue
          private var hi = Long.MinValue
          private var any = false
          private var reported = false
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h && any && !reported) {
              acc.add((org.apache.spark.TaskContext.getPartitionId(), lo, hi))
              reported = true
            }
            h
          }
          override def next(): org.apache.spark.sql.Row = {
            val r = it.next()
            val k = r.getLong(0)
            if (k < lo) lo = k
            if (k > hi) hi = k
            any = true
            r
          }
        }
      }(org.apache.spark.sql.Encoders.row(wideSchema))
    tracked.write.option("header", "true").mode("overwrite").csv(dir)
    // merge accumulator entries per partition id (idempotent under task
    // retries), then stamp each id onto its part file by name
    import scala.jdk.CollectionConverters._
    val byPid = acc.value.asScala
      .groupBy(_._1)
      .map { case (pid, es) => pid -> (es.map(_._2).min, es.map(_._3).max) }
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
    val partOf = """part-(\d+)-.*""".r
    val ranges = fs
      .listStatus(dirPath)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .flatMap { s =>
        s.getPath.getName match {
          case partOf(n) => byPid.get(n.toInt).map(r => (s.getPath.getName, r._1, r._2))
          case _         => None // foreign file: leave it out, never pruned
        }
      }
    writeSidecar(fs, dirPath, ranges)
  }

  /** Writes the wide series shape as a KEY-GROUPED layout: every skey's
    * rows land in exactly ONE file (`dir/pkey=K/part-*.csv` — dynamic
    * partitioning on a copy of skey; the hash repartition routes each key
    * to one task, the dynamic writer splits that task's output per key),
    * and the `_ranges.csv` sidecar records `lo == hi == K` per file,
    * derived from the DIRECTORY NAMES — zero bytes read back. One file
    * per series is the natural series layout at scale (series are
    * append-heavy and queried whole).
    *
    * [[SeriesV2]] detects the all-single-key sidecar and reports
    * `KeyGroupedPartitioning(identity(skey))` with per-file
    * `HasPartitionKey` (the DataSource V2 storage-partitioned-read
    * contract), so a `groupBy(skey)` or skey-equi-join over this layout
    * plans with NO shuffle exchange when
    * `spark.sql.sources.v2.bucketing.enabled` is on — the optimizer-side
    * twin of the reference decomposition's per-series independence
    * (SURVEY §4 item 3).
    */
  def writeKeyGrouped(df: DataFrame, dir: String, nTasks: Int = 32): Unit = {
    val spark = df.sparkSession
    asWide(df)
      .withColumn("pkey", col("skey"))
      .repartition(nTasks, col("pkey"))
      .sortWithinPartitions("skey", "ord")
      .write.partitionBy("pkey").option("header", "true").mode("overwrite").csv(dir)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
    val ranges = fs
      .listStatus(dirPath)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("pkey="))
      .flatMap { d =>
        val k = d.getPath.getName.stripPrefix("pkey=").toLong
        fs.listStatus(d.getPath)
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
          // sidecar key = dir-RELATIVE path: the same task writes
          // part-00000-<uuid> under SEVERAL pkey dirs, so bare names
          // collide across keys — a name-keyed sidecar would silently
          // assign one key's range to another's file
          .map(s => (s"${d.getPath.getName}/${s.getPath.getName}", k, k))
      }
    writeSidecar(fs, dirPath, ranges)
  }

  private def writeSidecar(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      ranges: Seq[(String, Long, Long)]
  ): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, "_ranges.csv")
    val w = new java.io.PrintWriter(fs.create(p, true))
    try {
      w.println("file,lo,hi")
      ranges.foreach { case (name, lo, hi) => w.println(s"$name,$lo,$hi") }
    } finally w.close()
  }
}
