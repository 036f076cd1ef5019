package graft

import org.apache.spark.sql.SparkSession
import graft.ccm.{Ccm, CcmSpec}

/** Manual driver for the perSeries scale path (incl. the maxPoints guard). */
object DrivePerSeries {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val df = (0 until 2).flatMap { s =>
      (0 until 120).map(i => (s.toLong, i.toLong, math.sin(i * 0.3 + s), math.cos(i * 0.21)))
    }.toDF("skey", "ord", "x", "y")
    val ok = Ccm.perSeries(df, CcmSpec(numSamples = 3), libSizes = Some(Seq(30, 60, 90)))
    println("PER_SERIES_ROWS=" + ok.count())
    try {
      Ccm.perSeries(df, CcmSpec(numSamples = 3), libSizes = Some(Seq(30)), maxPoints = 50).count()
      println("GUARD_DID_NOT_FIRE")
    } catch {
      case e: org.apache.spark.SparkException =>
        val root = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
        println("GUARD_FIRED: " + root.take(120))
    }
    spark.stop()
  }
}
