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

  test("keeps zero-in-degree vertices at their teleport-fed rank on directed graphs") {
    val spark2 = spark
    import spark2.implicits._
    // 0 -> 1 -> 2, 0 -> 2: vertex 0 has in-degree 0 (appears only as src),
    // vertex 2 has out-degree 0 (appears only as dst = dangling, no
    // contribution outward — its mass is deliberately not redistributed)
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("src", "dst")
    val got = PageRank
      .run(edges, iterations = 10, damping = 0.85)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap

    // local reference over the same vertex set {0,1,2}
    val verts = Seq(0L, 1L, 2L)
    val deg = Map(0L -> 2.0, 1L -> 1.0)
    val out = Map(0L -> Seq(1L, 2L), 1L -> Seq(2L))
    var rank = verts.map(v => v -> 1.0 / 3).toMap
    for (_ <- 1 to 10) {
      val contrib = verts.map { v =>
        v -> out.collect { case (u, ds) if ds.contains(v) => rank(u) / deg(u) }.sum
      }.toMap
      rank = verts.map(v => v -> (0.15 / 3 + 0.85 * contrib(v))).toMap
    }
    assert(got.keySet == Set(0L, 1L, 2L), "every vertex (incl. in-degree 0 and dangling) must survive")
    verts.foreach(v => assert(math.abs(got(v) - rank(v)) < 1e-12, s"vertex $v: ${got(v)} vs ${rank(v)}"))
    // vertex 0 never receives mass: teleport-only rank each round
    assert(math.abs(got(0L) - 0.05) < 1e-12)
  }
}
