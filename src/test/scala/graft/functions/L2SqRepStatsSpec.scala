package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class L2SqRepStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def register(): Unit = GraftFunctions.register(spark)

  test("graft_l2sq is bit-identical to the HOF left-fold formulation") {
    register()
    val rng = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rng.nextDouble() * 2 - 1), Array.fill(64)(rng.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      expr("graft_l2sq(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, c) -> (x - c) * (x - c)), CAST(0.0 AS DOUBLE), (acc, d) -> acc + d)").as("hof")
    )
    val bad = cmp.filter(col("native") =!= col("hof")).count()
    assert(bad == 0L)
  }

  test("graft_repstats matches the portable HOF formulation") {
    register()
    val docs = Seq(
      "a b a c a b",
      "a", // single word
      "", // empty string -> one empty token
      "a  b", // consecutive spaces -> empty middle token
      "x y", // exactly two words: 3-grams empty
      "a b a b a b a b", // heavy repetition
      "émoji 😀 émoji 😀 z" // supplementary-plane chars
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    val got = df
      .selectExpr("id", "graft_repstats(text) AS r")
      .selectExpr("id", "r.nw", "r.dw", "r.mw", "r.d2", "r.d3")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    for ((id, text) <- docs) {
      val ws = text.split(" ", -1).toSeq
      val counts = ws.groupBy(identity).view.mapValues(_.length)
      val g2 = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
      val g3 = ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val want = (ws.length.toLong, counts.size.toLong, counts.values.max.toLong, g2.size.toLong, g3.size.toLong)
      assert(got(id) == want, s"doc $id: '$text'")
    }
  }
}
