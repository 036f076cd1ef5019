package graft.contract

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Product-quantization ANN semantics (ann_pq_topk): the DuckDB hash gate
  * pins the exact values; these pin the properties that make those values
  * MEANINGFUL — the compressed search must actually find near neighbors
  * (recall floor vs the exact brute-force top-k) and the result shape
  * must be a full top-k per query.
  */
class PqSpec extends SparkTestBase {
  private val SfDir = "/root/testdata/sf0.001"

  test("PQ ADC top-k achieves nontrivial recall against exact top-k") {
    val exact = SparkEntry
      .queries("ann_topk")(spark, SfDir)
      .select("query_id", "neighbor_id")
      .collect()
      .groupBy(_.getLong(0))
      .view
      .mapValues(_.map(_.getLong(1)).toSet)
      .toMap
    val pq = SparkEntry
      .queries("ann_pq_topk")(spark, SfDir)
      .select("query_id", "neighbor_id")
      .collect()
      .groupBy(_.getLong(0))
      .view
      .mapValues(_.map(_.getLong(1)).toSet)
      .toMap
    assert(pq.keySet == exact.keySet, "PQ must answer every query the exact path answers")
    val recalls = exact.map { case (q, ex) => (pq(q) & ex).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@5 = $mean%.3f")
    // 16 subspaces x 32 centroids x 2 Lloyd steps measures ~0.44 mean
    // recall@5 on this 10-cluster data under full-corpus training and
    // ~0.32 under the 1-in-4 sample-trained codebook (the production
    // shape; parameter sweep in SimQueries' scaladoc); 0.2 is far above
    // the ~1.2% random-guess floor (5 of ~430 candidates) while loose
    // enough to be seed-stable
    assert(mean >= 0.2, s"mean recall@5 $mean < 0.2 — ADC ranking is not tracking true distance")
  }

  test("IVF+PQ: shared ADC scoring, restricted candidates, useful overlap") {
    val pq = SparkEntry
      .queries("ann_pq_topk")(spark, SfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    val ivfpq = SparkEntry
      .queries("ann_ivfpq_topk")(spark, SfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    assert(ivfpq.keys.map(_._1).toSet == pq.keys.map(_._1).toSet,
      "IVF+PQ must answer every query")
    // same codebook, same codes, same LUT: wherever the two top-ks share a
    // (query, neighbor) pair the ADC distance must be IDENTICAL
    val shared = ivfpq.keySet & pq.keySet
    shared.foreach { k =>
      assert(ivfpq(k) == pq(k), s"$k: ADC differs between PQ (${pq(k)}) and IVF+PQ (${ivfpq(k)})")
    }
    // and the probed lists must actually contain near neighbors: a useless
    // coarse quantizer would make the overlap vanish
    assert(shared.size.toDouble / pq.size >= 0.3,
      s"only ${shared.size}/${pq.size} of PQ's top-k survive IVF probing — lists are not capturing neighbors")
  }

  test("every query gets a full dense top-k with positive distances") {
    val rows = SparkEntry
      .queries("ann_pq_topk")(spark, SfDir)
      .collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length), s"query $q: ranks not dense")
      assert(rs.forall(_.getDouble(3) >= 0.0), s"query $q: negative ADC distance")
    }
  }

  test("exact re-rank recovers recall the lossy ADC ranking gives up") {
    def topkSets(name: String) = SparkEntry
      .queries(name)(spark, SfDir)
      .select("query_id", "neighbor_id")
      .collect()
      .groupBy(_.getLong(0))
      .view
      .mapValues(_.map(_.getLong(1)).toSet)
      .toMap
    val exact = topkSets("ann_topk")
    val ivfpq = topkSets("ann_ivfpq_topk")
    val rerank = topkSets("ann_ivfpq_rerank")
    assert(rerank.keySet == ivfpq.keySet, "rerank must answer every IVF+PQ query")
    def meanRecall(m: Map[Long, Set[Long]]) = {
      val rs = exact.collect { case (q, ex) if m.contains(q) => (m(q) & ex).size.toDouble / ex.size }
      rs.sum / rs.size
    }
    val (rIvfPq, rRerank) = (meanRecall(ivfpq), meanRecall(rerank))
    info(f"recall@5: ivfpq=$rIvfPq%.3f rerank=$rRerank%.3f")
    // the candidates are identical (same IVF probes); the rerank stage can
    // only re-ORDER them by true distance, so recall vs the exact baseline
    // must not go down — and on this data it goes measurably up
    assert(rRerank >= rIvfPq,
      s"rerank recall $rRerank < ADC-ranked recall $rIvfPq — exact re-scoring made things worse")
  }
}
