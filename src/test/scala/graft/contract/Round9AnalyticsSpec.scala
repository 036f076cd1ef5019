package graft.contract

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-9-continuation analytics batch — the
  * mathematical properties each operator's definition promises, checked at
  * sf0.001 for fast local feedback (the DuckDB hash-match remains the
  * driver's cross-engine gate).
  */
class Round9AnalyticsSpec extends SparkTestBase {
  private val SfDir = "/root/testdata/sf0.001"

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, SfDir)

  test("evt_acf: autocorrelations live in [-1, 1] and all requested lags are present") {
    val r = q("evt_acf").collect()
    assert(r.length == 10, s"expected lags 1..10, got ${r.length}")
    assert(r.forall(row => math.abs(row.getAs[Double]("r")) <= 1.0 + 1e-9))
  }

  test("evt_survival: the at-risk count is non-increasing in lifetime and partitions the cohort") {
    val rows = q("evt_survival").orderBy("t").collect()
    val risks = rows.map(_.getAs[Long]("n_risk"))
    assert(risks.zip(risks.tail).forall { case (a, b) => a >= b }, "n_risk must be non-increasing")
    // everyone ends exactly once: deaths + censorings across all t = initial cohort
    val total = rows.map(r => r.getAs[Long]("n_events") + r.getAs[Long]("n_censored")).sum
    assert(total == risks.head, s"deaths+censorings ($total) must equal the initial at-risk cohort (${risks.head})")
  }

  test("evt_benford: digits are 1..9 and observed fractions sum to ~1") {
    val rows = q("evt_benford").collect()
    assert(rows.map(_.getAs[Long]("digit")).toSet.subsetOf((1L to 9L).toSet))
    val s = rows.map(_.getAs[Double]("obs_frac")).sum
    assert(math.abs(s - 1.0) < 1e-4, s"obs_frac sums to $s")
  }

  test("evt_periodogram: energy fractions are non-negative and sum to at most 1") {
    val p = q("evt_periodogram").collect().map(_.getAs[Double]("power_frac"))
    assert(p.forall(_ >= -1e-12))
    // Parseval: positive-frequency bins carry at most the total energy
    assert(p.sum <= 1.0 + 1e-6, s"spectral mass ${p.sum} exceeds total energy")
  }

  test("graph_cluster_coeff: coefficients live in [0, 1] and triangles respect the wedge bound") {
    val rows = q("graph_cluster_coeff").collect()
    assert(rows.forall { r =>
      val cc = r.getAs[Double]("cc"); cc >= 0.0 && cc <= 1.0 + 1e-9
    })
    assert(rows.forall { r =>
      val d = r.getAs[Long]("deg"); r.getAs[Long]("tri") <= d * (d - 1) / 2
    })
  }

  test("graph_ppr: ranks are non-negative and total mass never exceeds 1") {
    val rows = q("graph_ppr").collect()
    assert(rows.forall(_.getAs[Double]("ppr") >= 0.0))
    val mass = rows.map(_.getAs[Double]("ppr")).sum
    assert(mass <= 1.0 + 1e-4, s"PPR mass $mass exceeds 1 (teleport + damping conserve at most 1)")
  }

  test("text_bpe_pairs: every pair is exactly two characters and counts are rank-ordered") {
    val rows = q("text_bpe_pairs").orderBy("rank").collect()
    assert(rows.forall(_.getAs[String]("pair").length == 2))
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "counts must be non-increasing in rank")
  }

  test("text_collocations: support threshold holds and lift is positive") {
    val rows = q("text_collocations").collect()
    assert(rows.forall(_.getAs[Long]("c12") >= 5L))
    assert(rows.forall(_.getAs[Double]("lift") > 0.0))
  }

  test("corpus_curriculum: ordinal is a permutation of 1..N and buckets are non-decreasing along it") {
    val rows = q("corpus_curriculum").orderBy("ordinal").collect()
    assert(rows.map(_.getAs[Long]("ordinal")).toSeq == (1L to rows.length).toSeq)
    val buckets = rows.map(_.getAs[Long]("bucket"))
    assert(buckets.zip(buckets.tail).forall { case (a, b) => a <= b }, "curriculum must progress easy -> hard")
  }

  test("vec_silhouette: per-cluster means live in [-1, 1] and members partition the corpus") {
    val rows = q("vec_silhouette").collect()
    assert(rows.forall(r => math.abs(r.getAs[Double]("mean_sil")) <= 1.0 + 1e-9))
    val n = rows.map(_.getAs[Long]("n_vecs")).sum
    val corpus = spark.read.parquet(s"$SfDir/embeddings.parquet").count()
    assert(n == corpus, s"cluster sizes sum to $n, corpus has $corpus")
  }

  test("dedup_minhash_est: the estimate is k-quantized and err decomposes as est - exact") {
    val rows = q("dedup_minhash_est").collect()
    assert(rows.forall { r =>
      val m = r.getAs[Long]("matches"); m >= 0 && m <= 8
    })
    assert(rows.forall { r =>
      math.abs(r.getAs[Double]("err") - (r.getAs[Double]("est_j") - r.getAs[Double]("exact_j"))) < 2e-6
    })
  }

  test("graph_jaccard: scores live in (0, 1] and ranks are dense from 1") {
    val rows = q("graph_jaccard").orderBy("rank").collect()
    assert(rows.forall { r =>
      val j = r.getAs[Double]("jac"); j > 0.0 && j <= 1.0 + 1e-9
    })
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length).toSeq)
  }

  test("ann_sq_topk: per-query ranks are dense and exact distances non-decreasing in rank") {
    val rows = q("ann_sq_topk").collect().groupBy(_.getAs[Long]("query_id"))
    rows.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length).toSeq)
      val d = sorted.map(_.getAs[Double]("d2"))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b + 1e-9 })
    }
  }

  test("ann_recall_eval: the SQ8 arm preserves the exact top-k essentially everywhere") {
    val sq = q("ann_recall_eval").filter(col("method") === "sq")
    val mean = sq.agg(avg("recall")).head.getDouble(0)
    // measured 1.0 at both gate SFs; 0.9 floor leaves room for corpus drift
    assert(mean >= 0.9, s"SQ8 rerank recall collapsed to $mean")
  }
}
