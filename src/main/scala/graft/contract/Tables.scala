package graft.contract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's read-only parquet tables (TESTDATA.md).
  *
  * `events.ts` contract for every consumer in this repo: **epoch-nanos
  * BIGINT**. The driver has shipped two on-disk encodings across rounds:
  *
  *  - parquet TIMESTAMP(NANOS), which Spark 4 refuses to read natively
  *    ([PARQUET_TYPE_ILLEGAL]); the `nanosAsLong` legacy flag surfaces it
  *    as epoch-nanos BIGINT directly;
  *  - parquet TIMESTAMP(MICROS) without UTC adjustment, which Spark reads
  *    as TIMESTAMP_NTZ — [[tsToNanos]] converts it to the same epoch-nanos
  *    BIGINT under the repo-wide UTC session timezone (DuckDB reads the
  *    same column as a naive TIMESTAMP and its `epoch_ns(ts)` treats the
  *    wall clock as UTC, so the two engines meet at identical integers).
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = raw(spark, sfDir, name)
    if (name == "events") tsToNanos(df) else df
  }

  /** The on-disk schema, un-normalized — what `readStream.schema(...)`
    * must be handed (a user schema that disagrees with the parquet type
    * fails the file-source read).
    */
  def raw(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def rawEvents(spark: SparkSession, sfDir: String): DataFrame = raw(spark, sfDir, "events")

  /** Normalize `ts` to epoch-nanos BIGINT whatever Spark surfaced from the
    * file (BIGINT nanos via `nanosAsLong`, TIMESTAMP_NTZ, or TIMESTAMP).
    * A pure projection — safe on streaming DataFrames too.
    */
  def tsToNanos(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType | TimestampType =>
        // NTZ -> LTZ cast interprets the wall clock in the session
        // timezone; pin UTC (the repo-wide convention every main and spec
        // already sets) so the conversion is deterministic regardless of
        // the host machine.
        df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other — expected BIGINT nanos or a parquet timestamp"
        )
    }

  def events(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "part")
}
