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
}
