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
    */
  def writeKeyRanged(df: DataFrame, dir: String, nFiles: Int = 32): Unit = {
    val spark = df.sparkSession
    df.select(col("skey"), col("ord"), col("x"), col("y"))
      .repartitionByRange(nFiles, col("skey"), col("ord"))
      .sortWithinPartitions("skey", "ord")
      .write.option("header", "true").mode("overwrite").csv(dir)
    // one header-schema pass over the written files builds the sidecar
    val ranges = spark.read
      .option("header", "true")
      .schema(wideSchema)
      .csv(dir)
      .select(input_file_name().as("f"), col("skey"))
      .groupBy("f")
      .agg(min("skey").as("lo"), max("skey").as("hi"))
      .collect()
    val p = new org.apache.hadoop.fs.Path(dir, "_ranges.csv")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val w = new java.io.PrintWriter(fs.create(p, true))
    try {
      w.println("file,lo,hi")
      ranges.foreach { r =>
        val name = new org.apache.hadoop.fs.Path(r.getString(0)).getName
        w.println(s"$name,${r.getLong(1)},${r.getLong(2)}")
      }
    } finally w.close()
  }
}
