package graft.functions

import graft.SparkTestBase
import graft.ccm.DetHash
import org.apache.spark.sql.functions._

class WordHashesSpec extends SparkTestBase {

  private val hofForm =
    expr(s"transform(split(text, ' '), w -> ${DetHash.polyHashSparkSql("w")})")

  test("graft_wordhashes equals the HOF formulation incl. empty/multi-space edges") {
    val spark2 = spark
    import spark2.implicits._
    GraftFunctions.register(spark)
    val rng = new scala.util.Random(31)
    val words = Seq("the", "a", "scan", "filter", "X9", "", " ") // "" doubles spaces when joined
    val random = (0 until 120).map { i =>
      val n = rng.nextInt(12)
      (i.toLong, (0 until n).map(_ => words(rng.nextInt(words.size))).mkString(" "))
    }
    val edges = Seq(
      (1000L, ""),
      (1001L, " "),
      (1002L, "  "),
      (1003L, "a"),
      (1004L, "a "),
      (1005L, " a"),
      (1006L, "a  b"),
      (1007L, "hello world")
    )
    val rows = (random ++ edges)
      .toDF("id", "text")
      .select(col("id"), expr("graft_wordhashes(text)").as("native"), hofForm.as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}: '${r.get(1)}' vs '${r.get(2)}'")
    }
  }

  test("per-word hashes equal DetHash.polyHash on BMP unicode") {
    val spark2 = spark
    import spark2.implicits._
    GraftFunctions.register(spark)
    val text = "héllo wörld 日本 語"
    val got = Seq((1L, text))
      .toDF("id", "text")
      .select(expr("graft_wordhashes(text)"))
      .collect()(0)
      .getSeq[Long](0)
    val want = text.split(" ", -1).toSeq.map(DetHash.polyHash)
    assert(got == want)
  }
}
