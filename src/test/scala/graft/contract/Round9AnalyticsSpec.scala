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

  test("evt_pacf: lag-1 PACF equals lag-1 ACF and all values live in [-1, 1]") {
    val pac = q("evt_pacf").orderBy("lag").collect()
    val ac = q("evt_acf").orderBy("lag").collect()
    assert(math.abs(pac.head.getAs[Double]("pacf") - ac.head.getAs[Double]("r")) < 1e-5,
      "phi_11 must equal r_1 by definition")
    assert(pac.forall(r => math.abs(r.getAs[Double]("pacf")) <= 1.0 + 1e-9))
  }

  test("evt_holt: with zero trend at init and constant series the level equals the constant") {
    import spark.implicits._
    // closed-loop sanity of the fold arithmetic itself, independent of data
    val xs = Seq.fill(10)(42.0)
    var l = xs(1); var b = xs(1) - xs(0)
    for (x <- xs.drop(2)) { val nl = 0.3 * x + 0.7 * (l + b); b = 0.1 * (nl - l) + 0.9 * b; l = nl }
    assert(math.abs(l - 42.0) < 1e-9 && math.abs(b) < 1e-9)
    val rows = q("evt_holt").collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("n_days") >= 3))
  }

  test("evt_ar_forecast: coefficients are finite (phi rows are NOT 1-bounded — only PACF is) and the forecast is sane") {
    val r = q("evt_ar_forecast").head
    val phis = Seq(r.getAs[Double]("phi_1"), r.getAs[Double]("phi_2"), r.getAs[Double]("phi_3"))
    // |phi_j| <= 1 would be mathematically WRONG here: Durbin–Levinson φ-row
    // entries exceed 1 on strongly autocorrelated series (e.g. r1=.99, r2=.97
    // gives φ_{2,1} ≈ 1.49) — only the reflection (PACF) coefficients are
    // 1-bounded, which evt_pacf's own test pins. Here: finiteness + the
    // AR(3) sum bound |Σφ| < 3 that any Yule-Walker solve satisfies on a
    // positive-definite autocorrelation, plus forecast sanity.
    assert(phis.forall(p => !p.isNaN && !p.isInfinite), s"non-finite coefficients: $phis")
    assert(math.abs(phis.sum) < 3.0, s"degenerate Yule-Walker solve: $phis")
    val f = r.getAs[Double]("forecast")
    assert(!f.isNaN && !f.isInfinite)
  }

  test("ccm_boot_ci: the interval brackets the mean and the median sits inside it") {
    val rows = q("ccm_boot_ci").collect()
    assert(rows.forall { r =>
      val lo = r.getAs[Double]("rho_lo"); val hi = r.getAs[Double]("rho_hi")
      val me = r.getAs[Double]("rho_med"); val mn = r.getAs[Double]("rho_mean")
      lo <= me + 1e-9 && me <= hi + 1e-9 && lo - 1e-6 <= mn && mn <= hi + 1e-6
    })
    assert(rows.forall(_.getAs[Long]("n_samples") == 8L))
  }

  test("ccm_smap_coeffs: slopes are finite and each (series, direction) keeps every library point") {
    val rows = q("ccm_smap_coeffs").collect()
    assert(rows.forall(r => !r.getAs[Double]("slope").isNaN && !r.getAs[Double]("slope").isInfinite))
    // per series, the two directions share one library -> equal point counts
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (uid, rs) =>
      val byDir = rs.groupBy(_.getAs[String]("direction")).view.mapValues(_.length).toMap
      assert(byDir.values.toSet.size == 1, s"series $uid directions disagree: $byDir")
    }
  }

  test("corpus_report: the datasheet internally cross-checks") {
    val r = q("corpus_report").head
    assert(r.getAs[Long]("n_docs") > 0)
    assert(r.getAs[Long]("n_distinct_tokens") <= r.getAs[Long]("n_tokens"))
    assert(r.getAs[Double]("mean_quality") >= 0.0 && r.getAs[Double]("mean_quality") <= 1.0)
    assert(r.getAs[Long]("exact_dup_surplus") >= r.getAs[Long]("exact_dup_groups") ||
      r.getAs[Long]("exact_dup_groups") == 0L)
  }

  test("graph_modularity: q terms are bounded and the total matches the integer-sum identity") {
    val rows = q("graph_modularity").collect()
    assert(rows.forall(r => math.abs(r.getAs[Double]("q_term")) <= 1.0 + 1e-9))
    val m = rows.head.getAs[Long]("m").toDouble
    val sin = rows.map(_.getAs[Long]("in_edges")).sum.toDouble
    val sdeg2 = rows.map(r => { val d = r.getAs[Long]("deg_sum").toDouble; d * d }).sum
    val expected = sin / m - sdeg2 / (4.0 * m * m)
    assert(math.abs(rows.head.getAs[Double]("total_q") - expected) < 1e-9)
  }

  test("stream_kmv: sketches are exact below k and estimates land near the exact distinct count") {
    val rows = q("stream_kmv").collect()
    rows.foreach { r =>
      val nsk = r.getAs[Long]("nsk"); val est = r.getAs[Double]("est"); val ex = r.getAs[Long]("exact")
      if (nsk < 64) assert(est == ex.toDouble, "below k the sketch IS the exact count")
      else assert(math.abs(est - ex) <= 0.5 * ex, s"KMV estimate $est too far from exact $ex")
    }
  }
}
