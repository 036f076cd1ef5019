package graft.contract

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ccm.DetHash

/** One spec per driver-contract query at sf0.001: row-count sanity plus the
  * semantic invariants of each operator (the DuckDB hash-match itself is the
  * driver's gate; these pin the operator semantics for fast local feedback).
  */
class ContractQueriesSpec extends SparkTestBase {
  private val SfDir = "/root/testdata/sf0.001"
  private val P = DetHash.P

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, SfDir)

  test("every contract query runs non-empty at sf0.001") {
    val counts = SparkEntry.queries.keys.map(name => name -> q(name).count()).toMap
    val empty = counts.filter(_._2 == 0L).keys.toSeq.sorted
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("every oracleSql key has a matching query and vice-visible") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"oracle keys without query: ${ok.diff(qk)}")
    // every query is oracle-checked since round 3 (the generator noise is
    // DetHash-based and the decode stub's ASCII byte stats are
    // SQL-expressible, so the two former rows-only exceptions got oracles)
    assert(qk.diff(ok).isEmpty, s"queries without oracle: ${qk.diff(ok)}")
  }

  test("det_hash / poly_hash values stay within the field [0, P)") {
    for (name <- Seq("det_hash", "poly_hash")) {
      val bad = q(name).filter(col("h") < 0 || col("h") >= P).count()
      assert(bad == 0L, s"$name out of range")
    }
  }

  test("ccm_embed: e1 is the next value of e0 within each series") {
    // row idx and row idx+1 overlap: e1(idx) == e0(idx+1)  (tau = 1)
    val emb = q("ccm_embed")
    val a = emb.select(col("user_id"), col("idx"), col("e1"))
    val b = emb.select(col("user_id"), (col("idx") - 1).as("idx"), col("e0").as("e0next"))
    val joined = a.join(b, Seq("user_id", "idx"))
    val bad = joined.filter(col("e1") =!= col("e0next")).count()
    assert(bad == 0L)
  }

  test("ccm_lib_ladder matches CcmSpec.libSizeLadder per series") {
    val rows = q("ccm_lib_ladder").collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).toSeq).toMap
    val lengths = Tables.events(spark, SfDir).groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    for ((uid, n) <- lengths) {
      val expected = graft.ccm.CcmSpec.libSizeLadder(n - 2)
      assert(rows(uid) == expected, s"user $uid")
    }
  }

  test("ccm_rank_split: ranks form a permutation 1..n per (series, sample)") {
    val rs = q("ccm_rank_split")
    val stats = rs.groupBy("user_id", "sample_id")
      .agg(count(lit(1)).as("n"), min("rank").as("mn"), max("rank").as("mx"),
        countDistinct("rank").as("nd"))
    val bad = stats.filter(col("mn") =!= 1 || col("mx") =!= col("n") || col("nd") =!= col("n")).count()
    assert(bad == 0L)
  }

  test("ccm_knn_predict: predictions are finite and actual values come from the series") {
    val pr = q("ccm_knn_predict")
    assert(pr.filter(isnan(col("predicted")) || col("predicted").isNull).count() == 0L)
  }

  test("ccm_skill_corr: rho in [-1, 1]") {
    assert(q("ccm_skill_corr").filter(abs(col("rho")) > 1.0).count() == 0L)
  }

  test("ccm_curve: convergent matches slope > 0.001 with 3 lib sizes") {
    val bad = q("ccm_curve")
      .filter(col("convergent") =!= (col("slope") > 0.001))
      .count()
    // slope is rounded to 6dp in the output; only boundary rows could differ
    assert(bad == 0L)
  }

  test("ccm_gen_logistic equals the Scala generator exactly") {
    val rows = q("ccm_gen_logistic").orderBy("t").collect()
    val (xs, ys) = graft.ccm.Generators.coupledLogisticMaps(120, 0.15)
    assert(rows.length == 120)
    for (r <- rows) {
      val t = r.getLong(0).toInt
      assert(r.getDouble(1) == xs(t) && r.getDouble(2) == ys(t), s"t=$t")
    }
  }

  test("lang_id: pred_lang maximizes the marker scores") {
    val bad = q("lang_id").filter(
      greatest(col("s_en"), col("s_de"), col("s_es"), col("s_fr"), col("s_zh")) =!=
        when(col("pred_lang") === "en", col("s_en"))
          .when(col("pred_lang") === "de", col("s_de"))
          .when(col("pred_lang") === "es", col("s_es"))
          .when(col("pred_lang") === "fr", col("s_fr"))
          .otherwise(col("s_zh"))
    ).count()
    assert(bad == 0L)
  }

  test("quality_score in [0, 1]") {
    val bad = q("quality_score").filter(col("quality") < 0.0 || col("quality") > 1.0).count()
    assert(bad == 0L)
  }

  test("dedup_minhash: signature values bounded by the permutation field") {
    val sig = q("dedup_minhash")
    val conds = (0 until 8).map(k => col(s"mh$k") < 0 || col(s"mh$k") >= P).reduce(_ || _)
    assert(sig.filter(conds).count() == 0L)
  }

  test("dedup_lsh_pairs: pairs are ordered and shared bands within [1, 4]") {
    val p = q("dedup_lsh_pairs")
    assert(p.filter(col("doc_a") >= col("doc_b")).count() == 0L)
    assert(p.filter(col("n_shared_bands") < 1 || col("n_shared_bands") > 4).count() == 0L)
  }

  test("dedup_ngram_jaccard: jaccard in [0.02, 1] and union >= common") {
    val j = q("dedup_ngram_jaccard")
    assert(j.filter(col("jaccard") < 0.02 || col("jaccard") > 1.0).count() == 0L)
    assert(j.filter(col("n_union") < col("n_common")).count() == 0L)
  }

  test("dedup_simhash_pairs: hamming within [0, 6] by construction") {
    val p = q("dedup_simhash_pairs")
    assert(p.filter(col("hamming") < 0 || col("hamming") > 6).count() == 0L)
  }

  test("ann_topk: exactly top-5 per query, ranks 1..5, cos in [-1, 1]") {
    val t = q("ann_topk")
    val perQuery = t.groupBy("query_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
    assert(perQuery.filter(col("n") =!= 5 || col("mx") =!= 5).count() == 0L)
    assert(t.filter(abs(col("cos_sim")) > 1.0).count() == 0L)
  }

  test("ann_lsh_topk and ann_ivf_topk are candidate-restricted views of the exact cosine") {
    // every approximate result that also appears in the exact all-pairs
    // ranking must carry the same cosine (the approximate paths only
    // restrict candidates, never change the metric)
    val exact = q("ann_topk").select(col("query_id"), col("neighbor_id"), col("cos_sim").as("c_exact"))
    for (name <- Seq("ann_lsh_topk", "ann_ivf_topk")) {
      val approx = q(name).select(col("query_id"), col("neighbor_id"), col("cos_sim"))
      val joined = approx.join(exact, Seq("query_id", "neighbor_id"), "left")
      val wrongCos = joined.filter(col("c_exact").isNotNull && col("c_exact") =!= col("cos_sim")).count()
      assert(wrongCos == 0L, name)
    }
  }

  test("mm_frames: frame counts cover n_bytes") {
    val f = q("mm_frames")
    val bad = f.groupBy("doc_id").agg(count(lit(1)).as("n"), max("n_frames").as("nf"), max("n_bytes").as("nb"))
      .filter(col("n") =!= col("nf") || col("nf") =!= ceil(col("nb") / 64.0).cast("long"))
      .count()
    assert(bad == 0L)
  }

  test("mm_features: entropy within [0, 8] bits and sizes match documents") {
    val f = q("mm_features")
    assert(f.filter(col("byte_entropy") < 0.0 || col("byte_entropy") > 8.0).count() == 0L)
    val docs = Tables.documents(spark, SfDir).select(col("doc_id").as("id"), length(col("text")).cast("long").as("len"))
    val bad = f.join(docs, "id").filter(col("n_bytes") =!= col("len")).count()
    assert(bad == 0L)
  }

  test("evt_sessionize: session event counts sum to the events count") {
    val total = q("evt_sessionize").agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, SfDir).count())
    // durations are non-negative and sessions are consecutively numbered from 1
    val s = q("evt_sessionize")
    assert(s.filter(col("duration_us") < 0).count() == 0L)
    val bad = s.groupBy("user_id").agg(min("session_id").as("mn"), max("session_id").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n")).count()
    assert(bad == 0L)
  }

  test("evt_rollup: grand total row equals the events count") {
    val total = q("evt_rollup").filter(col("g_type") === 1 && col("g_bucket") === 1)
      .select("n_events").collect()(0).getLong(0)
    assert(total == Tables.events(spark, SfDir).count())
  }

  test("evt_asof_purchase: referenced purchase is strictly prior and same user") {
    val ev = Tables.events(spark, SfDir).select(col("event_id").as("last_purchase_id"),
      col("user_id").as("p_user"), col("event_type").as("p_type"))
    val joined = q("evt_asof_purchase").filter(col("last_purchase_id").isNotNull).join(ev, "last_purchase_id")
    assert(joined.filter(col("p_type") =!= "purchase" || col("p_user") =!= col("user_id")).count() == 0L)
    assert(joined.filter(col("us_since_purchase") <= 0).count() == 0L)
  }

  test("text_top_terms: 5 terms per lang, descending counts") {
    val t = q("text_top_terms").collect().groupBy(_.getString(0))
    for ((_, rows) <- t) {
      assert(rows.length == 5)
      val cnts = rows.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(cnts.sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("text_tfidf: one top term per doc with positive tf and valid df") {
    val t = q("text_tfidf")
    assert(t.count() == Tables.documents(spark, SfDir).count())
    assert(t.filter(col("tf") < 1 || col("df") < 1).count() == 0L)
  }

  test("sample_stratified: ~10% per stratum, deterministic across runs") {
    val s1 = q("sample_stratified").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val s2 = q("sample_stratified").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(s1 == s2) // reproducible
    val perType = q("sample_stratified").groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.events(spark, SfDir).groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((t, n) <- perType) assert(n == math.ceil(totals(t) / 10.0).toLong, s"type $t")
  }

  test("q1_agg: counts sum to the filtered lineitem count") {
    val total = q("q1_agg").agg(sum("count_order")).collect()(0).getLong(0)
    val expected = Tables.lineitem(spark, SfDir)
      .filter(col("l_shipdate") <= expr("TIMESTAMP '1998-09-01 00:00:00'")).count()
    assert(total == expected)
  }

  test("topk_orders: 3 per segment, descending totalprice") {
    val t = q("topk_orders").collect().groupBy(_.getString(0))
    for ((_, rows) <- t) {
      assert(rows.length == 3)
      val prices = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(prices.sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("text_repetition: fractions in [0,1], top word at least 1/n_words") {
    for (r <- q("text_repetition").collect()) {
      val n = r.getLong(1)
      for (i <- 2 to 5) {
        val f = r.getDouble(i)
        assert(f >= 0.0 && f <= 1.0, s"col $i out of range")
      }
      assert(r.getDouble(5) >= 1.0 / n - 1e-6, "top_word_frac lower bound") // 6-decimal rounding slack
    }
  }

  test("evt_pii_scrub: redaction counts cover every digit run") {
    // masked strings must contain no digits at all -> per-type totals equal
    // a direct recount over the raw props
    val got = q("evt_pii_scrub").collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val direct = Tables.events(spark, SfDir)
      .groupBy("event_type")
      .agg(sum(size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)))).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got == direct)
  }

  test("evt_transitions: probabilities sum to ~1 per source type") {
    val bySrc = q("evt_transitions").collect().groupBy(_.getString(0))
    assert(bySrc.nonEmpty)
    for ((src, rows) <- bySrc) {
      val p = rows.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-4, s"src $src sums to $p")
    }
  }

  test("evt_anomaly: every reported z-score clears the threshold") {
    val rows = q("evt_anomaly").collect()
    assert(rows.nonEmpty)
    for (r <- rows) assert(math.abs(r.getDouble(3)) >= 2.5 - 1e-9)
  }

  test("sketch_cms_topk: the count-min estimate never undercounts") {
    val rows = q("sketch_cms_topk").collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getLong(1) >= r.getLong(2), s"${r.getString(0)}: est ${r.getLong(1)} < exact ${r.getLong(2)}")
  }

  test("sketch_bloom_join: no false negatives, pass-count consistency") {
    val rows = q("sketch_bloom_join").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (pass, truem, fp) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pass >= truem, s"${r.getString(0)}: bloom dropped a true member") // no false negatives
      assert(fp == pass - truem)
      assert(pass <= r.getLong(1))
    }
  }

  test("sketch_hll: estimate lands within the m=64 error regime of exact") {
    val rows = q("sketch_hll").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (exact, est) = (r.getLong(1).toDouble, r.getDouble(2))
      // 1.04/sqrt(64) ~ 13% standard error; allow a wide 3-sigma-ish band
      assert(est > exact * 0.6 && est < exact * 1.4, s"${r.getString(0)}: est $est vs exact $exact")
    }
  }
}
