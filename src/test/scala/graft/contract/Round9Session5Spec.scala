package graft.contract

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.DataFrame

/** Semantic + plan invariants of the round-9 session-5 batch (k-center
  * coreset selection, MMR diversification, IRLS rule-distillation
  * classifier) — each assertion states a property the operator's
  * definition promises; the DuckDB hash-match remains the cross-engine
  * gate.
  */
class Round9Session5Spec extends SparkTestBase {
  private val SfDir = "/root/testdata/sf0.001"

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, SfDir)
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, SfDir).queryExecution.executedPlan.toString

  test("select_kcenter: radii strictly decrease after the seed (greedy farthest-point property)") {
    val rows = q("select_kcenter").collect().sortBy(_.getAs[Long]("rank"))
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 8L), "exactly ranks 1..8")
    assert(rows.map(_.getAs[Long]("center_id")).distinct.length == 8, "centers must be distinct")
    assert(rows.head.getAs[Double]("radius") == 0.0, "seed has no prior set; radius 0 by convention")
    val radii = rows.tail.map(_.getAs[Double]("radius"))
    // each pick is the farthest point from the set the PREVIOUS pick joined,
    // so the radii sequence is non-increasing (greedy coverage curve)
    radii.sliding(2).foreach { w =>
      assert(w(1) <= w(0) + 1e-9, s"coverage radius increased: ${w(0)} -> ${w(1)}")
    }
    assert(radii.last > 0.0, "corpus has >8 distinct points; last radius must be positive")
  }

  test("select_kcenter plan: no global sort, no shuffle join anywhere (rounds are checkpointed argmax aggs)") {
    // the per-round broadcast joins materialize inside localCheckpoints, so
    // the final plan is a union of checkpointed picks — pin what it can
    // promise: no range exchange, no sort-merge join, no window sort
    val p = plan("select_kcenter")
    assert(!p.contains("rangepartitioning"), s"global sort (range exchange) in plan:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join may appear:\n$p")
    assert(!p.contains("Window"), s"argmax must be agg-based, not a window sort:\n$p")
  }

  test("vec_mmr: 5 picks per query, all distinct, rank-1 agrees with ann_topk's pure-relevance argmax") {
    val mmr = q("vec_mmr").collect()
    val byQuery = mmr.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (qid, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 5L), s"query $qid must have ranks 1..5")
      assert(rs.map(_.getAs[Long]("neighbor_id")).distinct.length == 5, s"query $qid picks must be distinct")
    }
    // MMR's first pick has no diversity penalty -> it IS the cosine top-1
    val top1 = q("ann_topk")
      .collect()
      .filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    byQuery.foreach { case (qid, rs) =>
      val first = rs.find(_.getAs[Long]("rank") == 1L).get.getAs[Long]("neighbor_id")
      assert(first == top1(qid), s"query $qid rank-1 must equal ann_topk rank-1")
    }
  }

  test("text_quality_lr: distillation beats the majority class and the marker signs are learned") {
    val rows = q("text_quality_lr").collect().map(r => r.getAs[String]("term") -> r.getAs[Double]("value")).toMap
    val acc = rows("accuracy")
    val posRate = rows("pos_rate")
    val majority = math.max(posRate, 1.0 - posRate)
    assert(acc > majority, s"accuracy $acc must beat majority-class $majority")
    assert(acc > 0.85, s"3 Newton iterations on a learnable rule should exceed 0.85, got $acc")
    assert(rows("beta1") > 0.0, "en-marker density must push toward positive")
    assert(rows("beta2") < 0.0, "rival-marker density must push toward negative")
  }

  test("text_quality_lr plan: per-iteration statistics are hash-aggregated (partial agg, no sort)") {
    val p = plan("text_quality_lr")
    assert(p.contains("HashAggregate"), "sufficient statistics must hash-aggregate")
    assert(!p.contains("rangepartitioning"), s"no global sort may appear:\n$p")
  }

  test("sketch_quantile_kmv: sample bounded by m, estimates bracketed by the group's value range") {
    val rows = q("sketch_quantile_kmv").collect()
    rows.foreach { r =>
      val k = r.getAs[Long]("sample_k")
      val n = r.getAs[Long]("n_events")
      assert(k == math.min(256L, n), s"sample_k must be min(m, n), got $k for n=$n")
      assert(r.getAs[Double]("est_p50") <= r.getAs[Double]("est_p90") + 1e-9, "p50 <= p90 within the sample")
      assert(r.getAs[Double]("true_p50") <= r.getAs[Double]("true_p90") + 1e-9, "p50 <= p90 in truth")
      assert(r.getAs[Double]("err_p50") >= 0.0 && r.getAs[Double]("err_p90") >= 0.0)
    }
  }

  test("sketch_quantile_kmv plan: the bottom-m filter rewrites to WindowGroupLimit (map-side truncation)") {
    val p = plan("sketch_quantile_kmv")
    assert(p.contains("WindowGroupLimit"), s"rank<=m must push down as WindowGroupLimit:\n$p")
  }

  test("stream_scd2_join: the temporal join is lossless — n_events sums to the full event count") {
    val total = q("stream_scd2_join").collect().map(_.getAs[Long]("n_events")).sum
    val expected = spark.read.parquet(s"$SfDir/events.parquet").count()
    assert(total == expected, s"version intervals must partition each user's timeline ($total != $expected)")
  }

  test("text_bpe_encode: BPE tokens never exceed chars and never undercut whitespace words") {
    q("text_bpe_encode").collect().foreach { r =>
      val words = r.getAs[Long]("n_words")
      val toks = r.getAs[Long]("n_tokens_bpe")
      val chars = r.getAs[Long]("n_chars")
      assert(toks >= words, "merges only combine WITHIN words; tokens >= word count")
      // chars counts include inter-word spaces, so chars >= tokens strictly
      assert(toks <= chars, "a token is at least one char")
      assert(r.getAs[Double]("chars_per_token") >= 1.0)
    }
  }
}
