package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scratch probe: does AvailableNow + maxFilesPerTrigger=1 split the two
  * late-data files into separate micro-batches, and what watermark does
  * each batch see? Run:
  *   sbt "Test/runMain graft.tools.LateProbe /root/testdata/sf0.01"
  */
object LateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import scala.jdk.CollectionConverters._
    val cutoff = java.time.Instant.parse("2024-01-26T00:00:00Z").toEpochMilli * 1000L
    val tmp = java.nio.file.Files.createTempDirectory("late-probe")
    val inDir = tmp.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    val ev = graft.contract.Tables.events(spark, dir)
      .select(expr("ts div 1000").as("tus"), col("event_id"), col("value"))
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String, mtimeMs: Long): Unit = {
      val stage = tmp.resolve(s"stage_$name")
      df.coalesce(1).write.parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = inDir.resolve(name)
      java.nio.file.Files.move(part, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }
    writeOne(ev.filter(col("tus") < cutoff), "00-a.parquet", 1000000L)
    val lateEnd = java.time.Instant.parse("2024-01-04T00:00:00Z").toEpochMilli * 1000L
    writeOne(ev.filter(col("tus") >= cutoff), "01-b.parquet", 2000000L)
    writeOne(ev.filter(col("tus") < lateEnd), "02-c.parquet", 3000000L)
    val in = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir.toString)
      .withColumn("ts", timestamp_micros(col("tus")))
      .withWatermark("ts", "3 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val ckpt = java.nio.file.Files.createTempDirectory("late-probe-ckpt")
    val q = in.writeStream.format("memory").queryName("late_probe")
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
        s"wm=${p.eventTime.asScala.getOrElse("watermark", "-")} " +
        s"dropped=${p.stateOperators.map(_.numRowsDroppedByWatermark).mkString(",")}")
    }
    spark.stop()
  }
}
