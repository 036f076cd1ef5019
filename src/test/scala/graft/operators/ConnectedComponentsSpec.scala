package graft.operators

import graft.SparkTestBase

class ConnectedComponentsSpec extends SparkTestBase {

  private def components(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] = {
    val spark2 = spark
    import spark2.implicits._
    ConnectedComponents
      .minLabelPropagation(edges.toDF("src", "dst"), maxIter)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("path graph propagates the min label across the whole chain") {
    // 10 -> 11 -> ... -> 17: diameter 7, needs several propagation rounds
    val path = (10L until 17L).map(i => (i, i + 1))
    val got = components(path)
    assert(got == (10L to 17L).map(_ -> 10L).toMap)
  }

  test("star graph and separate components keep distinct labels") {
    // star centered at 5 (edges to 6,7,8) + separate pair (100, 101)
    val got = components(Seq((5L, 6L), (7L, 5L), (5L, 8L), (101L, 100L)))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L, 100L -> 100L, 101L -> 100L))
  }

  test("cycle converges and labels with its minimum") {
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("non-convergence within maxIter fails loudly instead of returning partial labels") {
    val path = (0L until 10L).map(i => (i, i + 1))
    val ex = intercept[IllegalArgumentException](components(path, maxIter = 2))
    assert(ex.getMessage.contains("did not converge"))
  }
}
