package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.ccm.{Ccm, CcmSpec}
import org.apache.spark.sql.functions._

class SeriesSourceSpec extends SparkTestBase {

  test("wideCsv round-trips a written series and feeds perSeries") {
    val dir = Files.createTempDirectory("series_csv").toFile
    val rows = (0 until 80).map(i => s"7,$i,${math.sin(i * 0.37)},${math.cos(i * 0.21)}")
    val f = new java.io.File(dir, "s.csv")
    val w = new java.io.PrintWriter(f)
    w.println("skey,ord,x,y"); rows.foreach(w.println); w.close()

    val df = SeriesSource.wideCsv(spark, f.getAbsolutePath)
    assert(df.count() == 80)
    assert(df.schema.fieldNames.toSeq == Seq("skey", "ord", "x", "y"))
    val res = Ccm.perSeries(df, CcmSpec(numSamples = 2), libSizes = Some(Seq(20, 40, 60)))
    assert(res.count() == 6) // 1 series x 2 directions x 3 lib sizes
  }

  test("fromSeriesText parses the reference's livemd format") {
    val text =
      """1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0
        |0.5, 1.5, 2.5, 3.5, 4.5, 5.5, 6.5, 7.5, 8.5, 9.5""".stripMargin
    val df = SeriesSource.fromSeriesText(spark, text, skey = 3L)
    assert(df.count() == 10)
    val first = df.orderBy("ord").collect()(0)
    assert(first.getLong(0) == 3L && first.getDouble(2) == 1.0 && first.getDouble(3) == 0.5)
  }

  test("fromSeriesText enforces the reference's validation contract") {
    intercept[IllegalArgumentException](SeriesSource.fromSeriesText(spark, "1,2,3\n1,2"))     // unequal
    intercept[IllegalArgumentException](SeriesSource.fromSeriesText(spark, "1,2,3\n4,5,6"))   // < 10 points
  }
}
