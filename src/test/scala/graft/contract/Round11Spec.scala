package graft.contract

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Semantic + plan pins for the round-11 additions (the
  * Round9AnalyticsSpec discipline): each new query's defining contract,
  * stated against live data so the DuckDB hash gate is not the only
  * thing standing between the semantics and a silent rewrite.
  */
class Round11Spec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.01"

  test("sample_weighted plans the per-source top-K as WindowGroupLimit, no shuffle join") {
    val p = SparkEntry.queries("sample_weighted")(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"per-source top-K must prune map-side:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), "priority sampling needs no join")
  }

  test("sample_weighted is weight-biased: sampled docs are longer than the corpus average") {
    // at sf0.1 the per-source K binds (≈500 docs/source vs K=100), so a
    // weight-proportional draw must overselect long docs
    val d = "/root/testdata/sf0.1"
    val sampled = SparkEntry
      .queries("sample_weighted")(spark, d)
      .agg(avg(col("n_tokens")))
      .head()
      .getDouble(0)
    val corpus = Tables
      .documents(spark, d)
      .agg(avg(size(split(col("text"), " "))))
      .head()
      .getDouble(0)
    assert(
      sampled > corpus * 1.1,
      s"sampled mean $sampled vs corpus mean $corpus — weighting had no effect"
    )
  }

  test("text_boilerplate removes ALL instances of every block present in >= 2 docs") {
    val out = SparkEntry.queries("text_boilerplate")(spark, dir)
    val removed = out.agg(sum(col("blocks_removed"))).head().getLong(0)
    // independent recomputation on block TEXT (the query works on the
    // polyHash): instances whose 16-token block occurs in >= 2 docs
    val blocks = Tables
      .documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        explode(
          expr(
            "transform(sequence(0, (size(toks) - 1) div 16), i -> array_join(slice(toks, i * 16 + 1, 16), ' '))"
          )
        ).as("btxt")
      )
    val boiler = blocks
      .groupBy("btxt")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .select("btxt")
    val expected = blocks.join(boiler, Seq("btxt")).count()
    assert(removed == expected, s"blocks_removed=$removed, expected $expected (all instances, df>=2)")
    assert(removed > 0, "gate corpus must actually contain boilerplate for the pin to bite")
  }

  test("evt_motif: scores are valid NCC, ranked descending, and never overlap the query window") {
    val rows = SparkEntry
      .queries("evt_motif")(spark, dir)
      .orderBy("rank")
      .collect()
    assert(rows.length == 10)
    val nccs = rows.map(_.getDouble(3))
    assert(nccs.forall(v => v <= 1.000001 && v >= -1.000001), s"NCC out of range: ${nccs.toSeq}")
    assert(nccs.zip(nccs.tail).forall { case (a, b) => a >= b }, "rank order must follow NCC desc")
    // query window = last 24 hours of the purchase series: no returned
    // purchase window may overlap it
    val hourUs = 3600L * 1000 * 1000
    val ev = Tables.events(spark, dir).select(expr("ts div 1000").as("tus"))
    val h0 = ev.agg(min(expr(s"tus div $hourUs"))).head().getLong(0)
    val h1 = ev.agg(max(expr(s"tus div $hourUs"))).head().getLong(0)
    val queryStartUs = (h1 - 24 + 1) * hourUs
    rows.filter(_.getString(1) == "purchase").foreach { r =>
      val startUs = r.getLong(2)
      assert(
        startUs + 24 * hourUs <= queryStartUs,
        s"purchase candidate at $startUs overlaps the query window starting $queryStartUs (h0=$h0)"
      )
    }
  }

  test("evt_kalman: P converges below R (gain settles) and the innovation diagnostic is live") {
    val rows = SparkEntry.queries("evt_kalman")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getDouble(3)
      val rms = r.getDouble(4)
      // steady-state P* of the local-level filter solves
      // P = (1-K)(P+Q) with K=(P+Q)/(P+Q+R): strictly between 0 and R
      assert(p > 0.0 && p < 10000.0, s"p_var=$p escaped (0, R) for ${r.getLong(0)}")
      assert(rms >= 0.0 && !rms.isNaN, s"rms=$rms")
    }
    // the fold actually filters: the level is NOT just the last
    // observation for every user (that would be gain pinned at 1)
    val spine = Tables
      .events(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("tus"), col("value"))
    assert(spine.count() > 0)
  }

  test("profile_drift: exact-integer L1 lands in [0, 2] and the monitor separates the columns") {
    val rows = SparkEntry.queries("profile_drift")(spark, dir).collect()
    val l1s = rows.filter(_.getString(1) == "hist_l1").map(r => (r.getString(0), r.getDouble(4)))
    assert(l1s.forall { case (_, v) => v >= 0.0 && v <= 2.0 }, s"L1 out of range: ${l1s.toSeq}")
    // the gate data's REAL signal: numeric drift fires, categoricals hold
    val byCol = rows.map(r => (r.getString(0) + "/" + r.getString(1), r.getBoolean(5))).toMap
    assert(!byCol("o_orderstatus/hist_l1"), "status histogram is stable on this data")
    assert(byCol("o_totalprice/mean_shift"), "the totalprice mean shift is the planted signal")
  }

  test("graph_truss_quality pins the measured inversion: peeled pairs are MORE similar") {
    // duplicates arrive as 2-doc pairs -> isolated edges -> zero triangle
    // support -> peeled; if this flips, either the corpus or the peel
    // semantics changed and the scaladoc's finding must be re-measured
    val rows = SparkEntry
      .queries("graph_truss_quality")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L))
    val (peeled, survived) = (rows(0), rows(1))
    assert(
      peeled._3 > survived._3,
      s"peeled mean ${peeled._3} vs survived ${survived._3} — the 2-doc-duplicate finding flipped"
    )
    assert(peeled._2 > 0 && survived._2 > 0)
  }

  test("evt_discord: discords rank by worst best-match, NCC valid, exclusion zone respected") {
    val rows = SparkEntry.queries("evt_discord")(spark, dir).orderBy("event_type", "rank").collect()
    assert(rows.length == 15) // 3 per type x 5 types
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val nccs = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(nccs.zip(nccs.tail).forall { case (a, b) => a <= b }, s"discord rank must be ASC best_ncc: ${nccs.toSeq}")
      assert(nccs.forall(v => v >= -1.000001 && v <= 1.000001))
    }
    // a discord's best match is still a REAL match: no NCC may be the
    // degenerate -1/NaN of an empty candidate set
    assert(rows.forall(r => !r.getDouble(3).isNaN))
  }

  test("evt_hurst: R/S grows with window size and H lands in the open unit interval") {
    val rows = SparkEntry.queries("evt_hurst")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rs = (1 to 4).map(i => r.getDouble(i))
      assert(rs.zip(rs.tail).forall { case (a, b) => b > a }, s"R/S must grow with w: $rs")
      val h = r.getDouble(5)
      assert(h > 0.0 && h < 1.0, s"Hurst exponent $h escaped (0, 1)")
    }
  }

  test("graph_ktruss peel rounds chain: edges monotone non-increasing, stable once converged") {
    val rows = SparkEntry
      .queries("graph_ktruss")(spark, dir)
      .orderBy("round")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.foreach { case (_, before, after, _) => assert(after <= before) }
    rows.zip(rows.tail).foreach { case ((_, _, after1, ck1), (_, before2, after2, ck2)) =>
      assert(before2 == after1, "round r+1 must start from round r's survivors")
      if (before2 == after2) assert(ck1 == ck2 || after1 != after2, "converged rounds must carry the same edge set")
    }
    assert(rows.head._3 < rows.head._2, "round 1 must actually peel at the gate SF")
  }
}
