package graft.operators

import graft.SparkTestBase

class BfsSpec extends SparkTestBase {

  private def bfs(
      edges: Seq[(Long, Long)],
      seeds: Seq[Long],
      maxDepth: Int = 8
  ): Map[Long, Int] = {
    val spark2 = spark
    import spark2.implicits._
    Bfs
      .distances(edges.toDF("src", "dst"), seeds.toDF("vertex"), maxDepth)
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
  }

  test("path graph yields hop counts from the single seed") {
    val path = (0L until 5L).map(i => (i, i + 1))
    assert(bfs(path, Seq(0L)) ==
      Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4, 5L -> 5))
  }

  test("multi-source takes the nearest seed and depth bound truncates") {
    // 0-1-2-3-4-5-6 with seeds at both ends, depth 2: middle vertex 3
    // is 3 hops from either seed -> absent
    val path = (0L until 6L).map(i => (i, i + 1))
    assert(bfs(path, Seq(0L, 6L), maxDepth = 2) ==
      Map(0L -> 0, 1L -> 1, 2L -> 2, 6L -> 0, 5L -> 1, 4L -> 2))
  }

  test("edges are undirected and cycles do not inflate distances") {
    val got = bfs(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)), Seq(4L))
    assert(got == Map(4L -> 0, 3L -> 1, 1L -> 2, 2L -> 2))
  }

  test("unreachable components are absent; seeded vertices need no edges") {
    // seed 100 sits in a separate component; 7 unreachable from it
    val got = bfs(Seq((7L, 8L), (100L, 101L)), Seq(100L))
    assert(got == Map(100L -> 0, 101L -> 1))
  }

  test("matches a local BFS on seeded random graphs") {
    def localBfs(edges: Seq[(Long, Long)], seeds: Seq[Long], cap: Int): Map[Long, Int] = {
      val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      edges.foreach { case (a, b) =>
        adj(a) = b :: adj.getOrElse(a, Nil); adj(b) = a :: adj.getOrElse(b, Nil)
      }
      val dist = scala.collection.mutable.Map.empty[Long, Int]
      var frontier = seeds.distinct.toList
      frontier.foreach(dist(_) = 0)
      var d = 0
      while (frontier.nonEmpty && d < cap) {
        d += 1
        frontier = frontier
          .flatMap(v => adj.getOrElse(v, Nil))
          .distinct
          .filterNot(dist.contains)
        frontier.foreach(dist(_) = d)
      }
      dist.toMap
    }
    for (seed <- 1 to 4) {
      val rng = new scala.util.Random(seed)
      val edges = Seq.fill(20)((rng.nextInt(14).toLong, rng.nextInt(14).toLong))
        .filter { case (a, b) => a != b }
      val seeds = Seq(rng.nextInt(14).toLong, rng.nextInt(14).toLong)
      val got = bfs(edges, seeds, maxDepth = 4)
      assert(got == localBfs(edges, seeds, 4), s"seed=$seed edges=$edges seeds=$seeds")
    }
  }
}
