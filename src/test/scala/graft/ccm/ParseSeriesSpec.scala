package graft.ccm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the I1 ingestion path: the distributed column parser
  * (`Ccm.parseCsvLine`, backing the `ingest_series` contract query) must
  * agree bit-for-bit with the driver-side `Ccm.parseSeriesText` it mirrors.
  */
class ParseSeriesSpec extends SparkTestBase {

  private val text =
    """ 1.5, -2.25 , 0.0,3.125, 10, -0.5, 7.75, 100.0, -12.625, 0.25
      |0.5,1.5,2.5, 3.5 ,4.5,5.5,6.5,7.5,8.5, 9.5""".stripMargin

  test("parseCsvLine matches parseSeriesText on both livemd rows") {
    val (xs, ys) = Ccm.parseSeriesText(text)
    val spark2 = spark
    import spark2.implicits._
    val lines = text.trim.split("\n").toSeq.toDF("line")
    val parsed = lines
      .select(Ccm.parseCsvLine(col("line")).as("vals"))
      .as[Seq[Double]]
      .collect()
    assert(parsed.length == 2)
    assert(parsed(0) == xs.toSeq)
    assert(parsed(1) == ys.toSeq)
  }

  test("parseSeriesText rejects malformed input like the reference") {
    intercept[IllegalArgumentException](Ccm.parseSeriesText("1,2,3"))
    intercept[IllegalArgumentException](
      Ccm.parseSeriesText("1,2,3,4,5,6,7,8,9,10\n1,2,3")
    )
    intercept[IllegalArgumentException](
      Ccm.parseSeriesText("1,2,3\n1,2,3") // < 10 points
    )
  }
}
