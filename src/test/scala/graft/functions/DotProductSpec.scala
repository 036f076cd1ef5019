package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  private def register(): Unit = GraftFunctions.register(spark)

  test("graft_dot is bit-identical to the HOF left-fold formulation") {
    register()
    val rng = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rng.nextDouble() * 2 - 1), Array.fill(64)(rng.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      expr("graft_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("hof")
    )
    // bitwise equality, not tolerance: same IEEE op order is the contract
    val bad = cmp.filter(col("native") =!= col("hof")).count()
    assert(bad == 0L)
  }

  test("graft_dot null and length semantics") {
    register()
    val df = Seq(
      (1L, Some(Array(1.0, 2.0, 3.0)), Some(Array(4.0, 5.0, 6.0))), // 32
      (2L, None, Some(Array(1.0, 2.0))), // null
      (3L, Some(Array(1.0, 2.0)), Some(Array(3.0))) // min-length -> 3
    ).toDF("id", "a", "b")
    val out = df.selectExpr("id", "graft_dot(a, b) AS d").orderBy("id").collect()
    assert(out(0).getDouble(1) == 32.0)
    assert(out(1).isNullAt(1))
    assert(out(2).getDouble(1) == 3.0)
  }

  test("graft_dot type checking rejects non-double arrays") {
    register()
    val df = Seq((1L, Array(1, 2), Array(3, 4))).toDF("id", "a", "b")
    val e = intercept[Exception](df.selectExpr("graft_dot(a, b)").collect())
    assert(e.getMessage.contains("graft_dot") || e.getMessage.contains("DATATYPE"))
  }
}
