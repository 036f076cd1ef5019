package graft.contract

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.DataFrame

/** Semantic + plan invariants of the round-9 session-4 batch
  * (cross-correlation, Granger, HITS, label propagation, triplet mining,
  * scene cuts, epoch-repeat sampling) — each assertion states a property
  * the operator's definition promises; the DuckDB hash-match remains the
  * cross-engine gate.
  */
class Round9Session4Spec extends SparkTestBase {
  private val SfDir = "/root/testdata/sf0.001"

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, SfDir)
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, SfDir).queryExecution.executedPlan.toString

  test("evt_cross_corr: all 13 lags present, correlations 1-bounded, pair counts shrink with |lag|") {
    val rows = q("evt_cross_corr").collect()
    assert(rows.map(_.getAs[Long]("lag")).sorted.toSeq == (-6L to 6L), "lags must be exactly -6..6")
    assert(rows.forall(r => math.abs(r.getAs[Double]("r")) <= 1.0 + 1e-9))
    val byLag = rows.map(r => r.getAs[Long]("lag") -> r.getAs[Long]("n_pairs")).toMap
    val n = byLag(0L)
    assert((-6L to 6L).forall(k => byLag(k) == n - math.abs(k)), "n_pairs must equal n - |lag|")
  }

  test("evt_cross_corr plan: ONE window pass serves all lags (leads + stack, no per-lag self-join)") {
    val p = plan("evt_cross_corr")
    val windows = "(?m)^\\s*[*+:\\-() 0-9]*Window ".r.findAllIn(p).size
    assert(windows == 1, s"expected ONE Window operator, got $windows in:\n$p")
    assert(p.contains("Generate stack"), "lags must unpivot in-stage via stack")
    assert(!p.contains("SortMergeJoin"), "no per-lag self-join may shuffle")
  }

  test("evt_granger: both directions, unrestricted RSS never exceeds restricted, F non-negative") {
    val rows = q("evt_granger").collect()
    assert(rows.map(_.getAs[String]("direction")).toSet == Set("x_to_y", "y_to_x"))
    rows.foreach { r =>
      val rssR = r.getAs[Double]("rss_r")
      val rssU = r.getAs[Double]("rss_u")
      // adding a regressor can only reduce RSS (up to the 6-dp rounding)
      assert(rssU <= rssR + 1e-5, s"rss_u $rssU > rss_r $rssR in ${r.getAs[String]("direction")}")
      assert(r.getAs[Double]("f_stat") >= -1e-9)
    }
    assert(rows.map(_.getAs[Long]("n_obs")).distinct.length == 1, "both directions see the same n")
  }

  test("graph_hits: both roles present, scores in (0,1], each role's max pinned at 1.0 by normalization") {
    val rows = q("graph_hits").collect()
    val byRole = rows.groupBy(_.getAs[String]("role"))
    assert(byRole.keySet == Set("hub", "authority"))
    byRole.foreach { case (role, rs) =>
      val scores = rs.map(_.getAs[Double]("score"))
      assert(scores.forall(s => s > 0.0 && s <= 1.0 + 1e-9), s"$role scores must be in (0,1]")
      assert(math.abs(scores.max - 1.0) < 1e-9, s"$role max must be 1.0 (max-normalized)")
    }
  }

  test("graph_label_prop: communities partition the candidate-graph vertex set") {
    import org.apache.spark.sql.functions.col
    val members = q("graph_label_prop").collect().map(_.getAs[Long]("n_members")).sum
    val pairs = DedupQueries.lshPairsRaw(spark, SfDir)
    val vertices = pairs
      .select(col("doc_a").as("v"))
      .union(pairs.select(col("doc_b").as("v")))
      .distinct()
      .count()
    assert(members == vertices, s"community sizes sum to $members, vertex set is $vertices")
  }

  test("vec_hard_negatives: margins reconcile, cosines 1-bounded, pos/neg distinct from anchor") {
    val rows = q("vec_hard_negatives").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pos = r.getAs[Double]("pos_cos")
      val neg = r.getAs[Double]("neg_cos")
      assert(math.abs(pos) <= 1.0 + 1e-9 && math.abs(neg) <= 1.0 + 1e-9)
      assert(math.abs(r.getAs[Double]("margin") - (pos - neg)) < 2e-6, "margin = pos_cos - neg_cos")
      assert(r.getAs[Long]("pos_id") != r.getAs[Long]("anchor_id"))
      assert(r.getAs[Long]("neg_id") != r.getAs[Long]("anchor_id"))
    }
  }

  test("vec_hard_negatives plan: per-cohort hardest pick is a WindowGroupLimit, not a full sort") {
    assert(plan("vec_hard_negatives").contains("WindowGroupLimit"))
  }

  test("mm_scene_cuts: every emitted cut clears the threshold and never sits at frame 0") {
    val rows = q("mm_scene_cuts").collect()
    assert(rows.nonEmpty, "driver corpus must contain cuts at the chosen threshold")
    rows.foreach { r =>
      assert(r.getAs[Long]("delta") > 200L)
      assert(r.getAs[Long]("cut_at_frame") >= 1L)
    }
  }

  test("mm_scene_cuts plan: doc-partitioned lag window, no join anywhere") {
    val p = plan("mm_scene_cuts")
    assert(!p.contains("Join"), "scene cuts are per-doc — nothing to join")
    val windows = "(?m)^\\s*[*+:\\-() 0-9]*Window ".r.findAllIn(p).size
    assert(windows == 1, s"expected ONE lag window, got $windows")
  }

  test("sample_repeat: copy counts bracket the target epochs; integer-epoch sources repeat exactly") {
    val rows = q("sample_repeat").collect()
    rows.foreach { r =>
      val w = r.getAs[Long]("w_milli")
      val nDocs = r.getAs[Long]("n_docs")
      val nCopies = r.getAs[Long]("n_copies")
      val nFull = w / 1000
      assert(nCopies >= nFull * nDocs && nCopies <= (nFull + 1) * nDocs, s"copies $nCopies outside [$nFull, ${nFull + 1}] epochs of $nDocs docs")
      if (w % 1000 == 0) assert(nCopies == nFull * nDocs, s"integer epochs must be exact, got $nCopies != ${nFull * nDocs}")
    }
  }

  test("stream_histogram: MapState cells partition the stream — counts sum to the table cardinality") {
    val rows = q("stream_histogram").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    val events = spark.read.parquet(s"$SfDir/events.parquet").count()
    assert(total == events, s"histogram mass $total must equal the event count $events")
    assert(rows.forall(_.getAs[Long]("bucket") >= 0L))
  }

  test("evt_partial_corr: all correlations 1-bounded and the partial formula reconciles from the raw pairwise r's") {
    val r = q("evt_partial_corr").collect().head
    val (rxy, rxz, rzy, part) = (
      r.getAs[Double]("r_xy"),
      r.getAs[Double]("r_xz"),
      r.getAs[Double]("r_zy"),
      r.getAs[Double]("r_xy_given_z")
    )
    Seq(rxy, rxz, rzy, part).foreach(v => assert(math.abs(v) <= 1.0 + 1e-9))
    val expect = (rxy - rxz * rzy) / math.sqrt((1.0 - rxz * rxz) * (1.0 - rzy * rzy))
    assert(math.abs(part - expect) < 1e-4, s"partial $part vs recomputed $expect")
    assert(r.getAs[Long]("n_hours") > 0L)
  }

  test("text_hashing_trick: one vector per doc; nnz bounded by dims; L1 bounded by token count") {
    val rows = q("text_hashing_trick").collect()
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    assert(rows.length.toLong == docs.count(), "every doc gets a hashed vector")
    import org.apache.spark.sql.functions.{col, size, split}
    val toks = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nt"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    rows.foreach { r =>
      val nnz = r.getAs[Long]("nnz")
      val l1 = r.getAs[Long]("l1")
      val id = r.getAs[Long]("doc_id")
      assert(nnz <= 64L, "nnz cannot exceed the hash width")
      assert(l1 <= toks(id), "L1 mass cannot exceed the token count (signs only cancel)")
      assert(nnz <= l1)
    }
  }

  test("ccm_auto_params: picks live on their grids and agree with the underlying diagnostics") {
    val rows = q("ccm_auto_params").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert((1 to 6).contains(r.getAs[Int]("best_tau")), "tau* on the MI grid 1..6")
      assert((1 to 4).contains(r.getAs[Int]("best_e")), "E* on the FNN grid 1..4")
    }
    // the panel's rows are exactly the diagnostics' selected rows
    val mi = q("ccm_mi_tau").collect().filter(r => r.getAs[Int]("tau") == r.getAs[Int]("best_tau"))
    assert(rows.length == mi.length, "one row per series with a selected tau")
  }

  test("sink_scd2: exactly one current version per key and contiguous validity intervals") {
    val rows = q("sink_scd2").collect()
    val byKey = rows.groupBy(_.getAs[Long]("key"))
    byKey.foreach { case (key, vs) =>
      assert(vs.count(_.getAs[Long]("is_current") == 1L) == 1, s"key $key must have ONE current version")
      val sorted = vs.sortBy(_.getAs[Long]("valid_from"))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getAs[Long]("valid_to") == b.getAs[Long]("valid_from"), s"key $key intervals must chain")
      }
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to")), "the current version is open-ended")
    }
  }

  test("ann_ivf_probe_curve: recall and scan fraction are monotone in nprobe (nested candidate sets)") {
    val rows = q("ann_ivf_probe_curve").collect().sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L, 8L))
    val recalls = rows.map(_.getAs[Double]("recall"))
    val scans = rows.map(_.getAs[Double]("scan_frac"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a - 1e-9 }, "more probes cannot lose truth hits")
    assert(scans.zip(scans.tail).forall { case (a, b) => b > a }, "more probes scan strictly more")
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("mm_audio_vad: segments are well-formed runs whose frame counts match their spans") {
    val rows = q("mm_audio_vad").collect()
    assert(rows.nonEmpty, "driver corpus contains active segments at the chosen threshold")
    rows.foreach { r =>
      val a = r.getAs[Long]("seg_start")
      val b = r.getAs[Long]("seg_end")
      assert(a <= b)
      assert(r.getAs[Long]("n_frames") == b - a + 1, "a segment is a CONTIGUOUS run of active frames")
      assert(r.getAs[Long]("energy_sum") > (b - a + 1) * 3800000L, "every member frame cleared the threshold")
    }
  }

  test("dedup_lsh_curve: rates are probabilities and the analytic curve is the exact (b=4, r=2) polynomial") {
    val rows = q("dedup_lsh_curve").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bucket = r.getAs[Long]("bucket")
      val emp = r.getAs[Double]("emp_rate")
      assert(emp >= 0.0 && emp <= 1.0)
      val mid = bucket * 0.1 + 0.05
      val expect = math.floor((1.0 - math.pow(1.0 - mid * mid, 4)) * 1e6 + 0.5) / 1e6
      assert(math.abs(r.getAs[Double]("analytic_rate") - expect) < 2e-6, s"bucket $bucket analytic mismatch")
      assert(r.getAs[Long]("n_detected") <= r.getAs[Long]("n_pairs"))
    }
  }

  test("pack_ffd: bin counts respect the lower bound and waste reconciles exactly") {
    val rows = q("pack_ffd").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bins = r.getAs[Long]("n_bins")
      val lb = r.getAs[Long]("bins_lower_bound")
      val tot = r.getAs[Long]("total_tokens")
      assert(bins >= lb, "cannot beat the volume lower bound")
      assert(r.getAs[Long]("padding_waste") == bins * 512L - tot)
      assert(bins <= r.getAs[Long]("n_docs"), "FFD never opens more bins than docs")
    }
  }

  test("text_bpe_train: merges shrink the corpus monotonically and counts stay consistent") {
    val rows = q("text_bpe_train").collect().sortBy(_.getAs[Long]("rank"))
    assert(rows.length == 3)
    val totals = rows.map(_.getAs[Long]("symbols_after"))
    assert(totals.zip(totals.tail).forall { case (a, b) => b < a }, "each merge must reduce total symbols")
    rows.foreach { r =>
      assert(r.getAs[Long]("pair_count") >= 1L)
      // non-overlapping greedy merges collapse at most pair_count occurrences
      assert(r.getAs[String]("merge_left").nonEmpty && r.getAs[String]("merge_right").nonEmpty)
    }
    // counts when chosen are non-increasing across rounds (the argmax can
    // only fall as pairs get consumed or stay untouched)
    val cnts = rows.map(_.getAs[Long]("pair_count"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => b <= a })
  }

  test("evt_transfer_entropy: TE is a KL divergence — non-negative both directions, same sample count") {
    val rows = q("evt_transfer_entropy").collect()
    assert(rows.map(_.getAs[String]("direction")).toSet == Set("x_to_y", "y_to_x"))
    rows.foreach(r => assert(r.getAs[Double]("te") >= -1e-9, "plug-in TE cannot be negative"))
    assert(rows.map(_.getAs[Long]("n_obs")).distinct.length == 1)
  }

  test("dedup_cdc: every reported chunk group is a real duplicate with consistent counts") {
    val rows = q("dedup_cdc").collect()
    assert(rows.nonEmpty, "the driver corpus contains duplicate chunks at this divisor")
    rows.foreach { r =>
      val occ = r.getAs[Long]("n_occ")
      val docs = r.getAs[Long]("n_docs")
      assert(occ >= 2L)
      assert(docs >= 1L && docs <= occ)
      assert(r.getAs[Long]("clen") >= 1L, "no empty chunks")
    }
  }

  test("dedup_cdc plan: chunking is join-free — text never reaches a shuffle") {
    val p = plan("dedup_cdc")
    assert(!p.contains("Join"), "boundary detection and chunk hashing happen inside one projection")
    assert(!p.contains("Window"), "spans come from HOF arrays, not a lag window")
  }

  test("sample_repeat plan: map-only after the weights broadcast — no shuffle-join, no window") {
    val p = plan("sample_repeat")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), "weights must attach by broadcast")
    assert(!p.contains("SortMergeJoin"), "no data-proportional relation may shuffle for a join")
    assert(!p.contains("Window"), "repeat decisions are per-row hash compares, never ranked")
  }
}
