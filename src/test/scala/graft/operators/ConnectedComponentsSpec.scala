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

  test("matches a local union-find on seeded random graphs") {
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(v: Long): Long = {
        val p = parent.getOrElse(v, v)
        if (p == v) v else { val r = find(p); parent(v) = r; r }
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(v => v -> find(v)).toMap
    }
    for (seed <- 1 to 5) {
      val rng = new scala.util.Random(seed)
      val edges = Seq.fill(15)((rng.nextInt(12).toLong, rng.nextInt(12).toLong))
        .filter { case (a, b) => a != b }
      val got = components(edges)
      assert(got == unionFind(edges), s"seed=$seed edges=$edges")
    }
  }

  test("non-convergence within maxIter fails loudly instead of returning partial labels") {
    val path = (0L until 10L).map(i => (i, i + 1))
    val ex = intercept[IllegalArgumentException](components(path, maxIter = 2))
    assert(ex.getMessage.contains("did not converge"))
  }
}
