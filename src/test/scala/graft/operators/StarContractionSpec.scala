package graft.operators

import graft.SparkTestBase

/** Large-star/small-star contraction must produce exactly min-label
  * propagation's labeling on arbitrary graphs, and must converge in
  * O(log n) rounds where propagation needs diameter-many — the whole
  * reason the operator exists.
  */
class StarContractionSpec extends SparkTestBase {

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches min-label propagation on a mixed graph") {
    import spark.implicits._
    // two components with branching + a cycle + an isolated edge
    val edges = Seq(
      (5L, 3L), (3L, 9L), (9L, 5L), (9L, 12L), (12L, 14L), // cycle + tail, min 3
      (20L, 21L), (21L, 22L), (22L, 20L),                   // triangle, min 20
      (30L, 31L)                                            // pair, min 30
    ).toDF("src", "dst")
    val star = labelsOf(StarContraction.connectedComponents(edges))
    val prop = labelsOf(ConnectedComponents.minLabelPropagation(edges))
    assert(star == prop)
    assert(star(14L) == 3L && star(22L) == 20L && star(31L) == 30L)
  }

  test("adversarial diameter: 300-hop path converges within 10 rounds") {
    import spark.implicits._
    // a pure path 0-1-2-...-300: diameter 300. Min-label propagation
    // needs ~300 rounds (its 25-round default cap FAILS here, by design);
    // star contraction must finish in O(log n) — well under 10.
    val path = (0L until 300L).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      ConnectedComponents.minLabelPropagation(path) // default maxIter 25
    }
    val labels = labelsOf(StarContraction.connectedComponents(path, maxIter = 10))
    assert(labels.size == 301)
    assert(labels.values.forall(_ == 0L), "every path vertex must label to the minimum 0")
  }

  test("self-loops and duplicate edges are harmless") {
    import spark.implicits._
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (7L, 7L)).toDF("src", "dst")
    val labels = labelsOf(StarContraction.connectedComponents(edges))
    // 7 appears only in a self-loop: no connectivity, but the vertex is
    // still in the input, so it labels itself — exactly what
    // minLabelPropagation emits, keeping the operators interchangeable on
    // ANY edge list (ADVICE r7)
    assert(labels == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
    assert(labels == labelsOf(ConnectedComponents.minLabelPropagation(edges)))
  }
}
