package graft.operators

import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {

  test("matches a local power iteration on seeded random graphs") {
    val spark2 = spark
    import spark2.implicits._
    val rng = new scala.util.Random(23)
    for (trial <- 0 until 3) {
      val n = 20 + trial * 10
      val undirected = (0 until 3 * n)
        .map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val sym = undirected ++ undirected.map { case (a, b) => (b, a) }
      val got = PageRank
        .run(sym.toDF("src", "dst"), iterations = 10, damping = 0.85)
        .collect()
        .map(r => r.getLong(0) -> r.getDouble(1))
        .toMap

      val verts = sym.map(_._1).distinct.sorted
      val nv = verts.size.toDouble
      val deg = sym.groupBy(_._1).map { case (v, es) => v -> es.size.toDouble }
      var rank = verts.map(v => v -> 1.0 / nv).toMap
      for (_ <- 1 to 10) {
        val contrib = sym
          .groupBy(_._2)
          .map { case (v, es) => v -> es.map { case (u, _) => rank(u) / deg(u) }.sum }
        rank = verts.map(v => v -> (0.15 / nv + 0.85 * contrib(v))).toMap
      }
      assert(got.keySet == rank.keySet)
      rank.foreach { case (v, r) =>
        assert(math.abs(got(v) - r) < 1e-9, s"trial=$trial vertex=$v: ${got(v)} vs $r")
      }
      // ranks are a distribution up to the teleport convention: total mass ~1
      assert(math.abs(rank.values.sum - 1.0) < 1e-6)
    }
  }
}
