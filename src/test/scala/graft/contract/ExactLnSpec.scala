package graft.contract

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Accuracy + determinism pins for the ExactLn IEEE-only series.
  *
  * Parity across engines holds by construction (same operation tree,
  * correctly-rounded IEEE ops); what needs MEASURING is that the series
  * is scientifically a logarithm — range reduction correct over the
  * full caller range and truncation error far below published
  * precision. 5e-13 relative is ~100x the series' analytic bound and
  * ~1000x tighter than any 6-dp contract output.
  */
class ExactLnSpec extends SparkTestBase {

  test("series ln matches Math.log to 5e-13 relative over 12 decades") {
    import spark.implicits._
    val values = Seq(1e-6, 1e-4, 0.03, 0.5, 0.9999, 1.0, 1.0001, 2.0, math.E, 10.0, 123.456,
      9999.25, 1e6, 0.6931471805599453, 42.4242424242)
    val rows = values
      .toDF("y")
      .withColumn("lny", expr(ExactLn.spark("y")))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    rows.foreach { case (y, lny) =>
      val ref = math.log(y)
      val err = math.abs(lny - ref) / math.max(1e-30, math.abs(ref) max 1.0)
      assert(err < 5e-13, s"ln($y): series $lny vs libm $ref (rel err $err)")
    }
  }

  test("series ln is bit-deterministic across evaluations and plans") {
    import spark.implicits._
    def once(): Array[Long] =
      Seq(0.037, 1.75, 88.125, 31337.0)
        .toDF("y")
        .repartition(3) // different plan shape than a local relation
        .withColumn("lny", expr(ExactLn.spark("y")))
        .orderBy("y")
        .collect()
        .map(r => java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    assert(once().toSeq == once().toSeq, "series ln must produce identical BITS on every evaluation")
  }
}
