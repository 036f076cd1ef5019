package graft.operators

import graft.SparkTestBase

/** Hand-computed Brandes invariants on graphs small enough to verify on
  * paper — these pin the σ path-counting and the δ dependency recursion
  * exactly (micro-units are 1e6 per unit).
  */
class BetweennessSpec extends SparkTestBase {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) = {
    val df = pairs.toDF("src", "dst")
    df.union(df.select($"dst".as("src"), $"src".as("dst")))
  }

  private def bc(edges: org.apache.spark.sql.DataFrame, seeds: Seq[Long], depth: Int): Map[Long, Long] =
    Betweenness
      .centrality(edges, seeds.toDF("vertex"), depth)
      .collect()
      .map(r => r.getAs[Long]("vertex") -> r.getAs[Long]("bc_micro"))
      .toMap

  test("path graph a-b-c-d-e from one endpoint: delta is 3, 2, 1 down the chain") {
    // from seed 1: δ(e)=0, δ(d)=1, δ(c)=2, δ(b)=3 (each carries its subtree)
    val m = bc(sym(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L), Seq(1L), depth = 4)
    assert(m == Map(2L -> 3000000L, 3L -> 2000000L, 4L -> 1000000L), s"got $m")
  }

  test("depth bound truncates the horizon: the same path at depth 2 sees only b's bridge to c") {
    val m = bc(sym(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L), Seq(1L), depth = 2)
    assert(m == Map(2L -> 1000000L), s"got $m")
  }

  test("diamond a-{b,c}-d splits sigma: both middles get delta 1/2") {
    // σ(d)=2 via b and c; δ(b) = δ(c) = (1/2)·(1+0)
    val m = bc(sym(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L), Seq(1L), depth = 3)
    assert(m == Map(2L -> 500000L, 3L -> 500000L), s"got $m")
  }

  test("star center carries every leaf pair: from a leaf seed, the center's delta is n_leaves - 1") {
    val m = bc(sym(10L -> 1L, 10L -> 2L, 10L -> 3L, 10L -> 4L), Seq(1L), depth = 3)
    assert(m == Map(10L -> 3000000L), s"got $m")
  }

  test("two seeds accumulate: path a-b-c seeded from both endpoints doubles the middle") {
    val m = bc(sym(1L -> 2L, 2L -> 3L), Seq(1L, 3L), depth = 2)
    assert(m == Map(2L -> 2000000L), s"got $m")
  }
}
