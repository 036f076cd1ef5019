package graft.contract

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Semantic pins for the round-12 additions. */
class Round12Spec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.01"

  test("ccm_pairwise_screen: gate covers all pairs, CCM runs ONLY on survivors, both directions") {
    val rows = SparkEntry.queries("ccm_pairwise_screen")(spark, dir).collect()
    val gate = rows.filter(_.getString(2) == "gate")
    val ccm = rows.filterNot(_.getString(2) == "gate")
    // 12-series panel -> C(12,2) = 66 gated pairs, every one exactly once
    assert(gate.length == 66, s"expected 66 gate rows, got ${gate.length}")
    assert(gate.map(r => (r.getLong(0), r.getLong(1))).distinct.length == 66)
    // the screen's whole point: the expensive stage runs on a strict subset
    val survivors = gate.filter(_.getLong(5) == 1L).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(survivors.nonEmpty && survivors.size < 66, s"degenerate split: ${survivors.size}/66")
    assert(survivors.size == 16, s"measured survivor count moved: ${survivors.size} (threshold drift?)")
    assert(ccm.length == survivors.size * 2, "exactly two direction rows per survivor")
    ccm.foreach { r =>
      assert(survivors.contains((r.getLong(0), r.getLong(1))), "CCM ran on a gated-out pair")
      assert(Set("x_causes_y", "y_causes_x").contains(r.getString(2)))
      assert(!r.isNullAt(6), "survivor CCM row must carry rho")
    }
    gate.foreach { r =>
      assert(r.isNullAt(6), "gate rows must not carry rho")
      val ccf = r.getDouble(4)
      assert(math.abs(ccf) <= 1.0 + 1e-9, s"ccf $ccf escaped [-1,1]")
      val survived = r.getLong(5) == 1L
      assert(survived == (math.abs(ccf) >= 0.4 - 1e-9), s"threshold mismatch at ccf=$ccf")
    }
  }

  test("evt_discord_banded: an in-band best match can only be <= the full profile's") {
    val full = SparkEntry
      .queries("evt_discord")(spark, dir)
      .collect()
      .map(r => ((r.getString(0), r.getLong(2)), r.getDouble(3)))
      .toMap
    val banded = SparkEntry
      .queries("evt_discord_banded")(spark, dir)
      .collect()
      .map(r => ((r.getString(0), r.getLong(2)), r.getDouble(3)))
    assert(banded.length == 15)
    val common = banded.filter(kv => full.contains(kv._1))
    common.foreach { case (k, bNcc) =>
      assert(bNcc <= full(k) + 1e-9, s"banded best $bNcc > full best ${full(k)} at $k")
    }
  }

  test("the O(spine²) guard fires loudly past MaxSpineHours and is silent under it") {
    import spark.implicits._
    val ok = Seq((0L, 700L)).toDF("h0", "h1")
    assert(EventQueries.guardSpine(ok, "test").collect().length == 1)
    val tooLong = Seq((0L, 9000L)).toDF("h0", "h1")
    val e = intercept[Exception](EventQueries.guardSpine(tooLong, "test").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("O(spine^2)")), s"guard error not loud: ${msgs(e)}")
  }

  test("ccm_pairwise_screen_banded: band-restricted gate is a strict subset with identical ccf") {
    val flat = SparkEntry
      .queries("ccm_pairwise_screen")(spark, dir)
      .collect()
      .filter(_.getString(2) == "gate")
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4)))
      .toMap
    val banded = SparkEntry
      .queries("ccm_pairwise_screen_banded")(spark, dir)
      .collect()
      .filter(_.getString(2) == "gate")
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4)))
    // 12 series in 3 equal activity bands of 4 -> 3 * C(4,2) = 18 gated pairs
    assert(banded.length == 18, s"expected 18 in-band pairs, got ${banded.length}")
    banded.foreach { case (k, ccf) =>
      assert(flat.contains(k), s"banded pair $k missing from the flat screen")
      assert(flat(k) == ccf, s"in-band pair $k: banded ccf $ccf != flat ${flat(k)} — banding must not change gate values")
    }
  }

  test("ccm_screen_sig: the null-model audit rejects every uncoupled top pair") {
    val rows = SparkEntry.queries("ccm_screen_sig")(spark, dir).collect()
    assert(rows.length == 8, s"top-4 pairs x 2 directions expected, got ${rows.length}")
    rows.foreach { r =>
      val (nSurr, nGe, p) = (r.getLong(4), r.getLong(5), r.getDouble(6))
      assert(nSurr == 3L)
      assert(p == (1.0 + nGe) / 4.0, "p must be the exact dyadic (1+n_ge)/4")
      // the synthetic corpus has NO planted cross-user coupling: if any pair
      // ever clears the null (p < 0.5), either the generator changed or the
      // surrogate destroys less than it should — re-measure before shipping
      assert(p >= 0.5, s"uncoupled pair cleared the surrogate null: $r")
    }
  }

  test("evt_haar: full level grid, dyadic-exact energies, fractions sum to 1") {
    val rows = SparkEntry.queries("evt_haar")(spark, dir).collect()
    assert(rows.length == 45, s"5 types x 9 levels expected, got ${rows.length}") // 720h spine: every level has >=1 complete block
    rows.foreach { r =>
      val (level, nb, e) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nb >= 1 && e >= 0.0)
      // energy must be EXACTLY e_int / 2^level (dyadic rational — the whole
      // query's no-waiver claim rests on this)
      val scaled = e * (1L << level).toDouble
      assert(scaled == math.rint(scaled), s"energy $e at level $level is not dyadic-exact")
    }
    rows.groupBy(_.getString(0)).foreach { case (ty, rs) =>
      val fracSum = rs.map(_.getDouble(4)).sum
      assert(math.abs(fracSum - 1.0) < 1e-12, s"$ty energy_frac sums to $fracSum")
    }
  }

  test("sink_ivm_join: every delta-algebra term is live at the gate (incl. the cross term)") {
    // if any of C_old⋈ΔO / ΔC⋈O_old / ΔC⋈ΔO were empty here, the hash gate
    // would vacuously pass a refresh that drops that term — pin them nonempty
    val c = Tables.customer(spark, dir).select(col("c_custkey"))
    val o = Tables
      .orders(spark, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).cast("long").as("yr"))
    def n(cMod: Boolean, dYear: Boolean): Long =
      c.filter(if (cMod) col("c_custkey") % 10 === 0 else col("c_custkey") % 10 =!= 0)
        .join(o.filter(if (dYear) col("yr") === 2001L else col("yr") =!= 2001L), c("c_custkey") === o("o_custkey"))
        .count()
    assert(n(cMod = false, dYear = true) > 0, "C_old ⋈ ΔO is empty — delta year has no old-customer orders")
    assert(n(cMod = true, dYear = false) > 0, "ΔC ⋈ O_old is empty — late customers have no old orders")
    assert(n(cMod = true, dYear = true) > 0, "ΔC ⋈ ΔO is empty — the cross term is untested")
  }

  test("split_cluster_safe eliminates the leakage split_leakage measures") {
    val leaky = SparkEntry.queries("split_leakage")(spark, dir).count()
    assert(leaky > 0, "the doc-keyed split no longer leaks — the contrast this test pins is gone")
    val rows = SparkEntry.queries("split_cluster_safe")(spark, dir).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "val"))
    rows.foreach { r =>
      assert(r.getLong(3) == 0L, s"cluster-keyed split leaked: $r")
      assert(r.getLong(1) >= r.getLong(2), "docs >= clusters per split")
    }
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.documents(spark, dir).count(), "every document must land in exactly one split")
  }

  test("ann_ivf_persist: the maintained index serves delta vectors as first-class neighbors") {
    val rows = SparkEntry.queries("ann_ivf_persist")(spark, dir).collect()
    assert(rows.nonEmpty)
    // vec_id % 7 == 0 vectors arrived AFTER the persisted build; if none ever
    // surfaces as a neighbor the delta-assignment path is vacuous
    val deltaNeighbors = rows.count(_.getLong(2) % 7 == 0)
    assert(deltaNeighbors > 0, "no delta vector surfaced as a neighbor")
  }

  test("ccm_pairwise_screen prunes most of the expensive work (the S² control)") {
    val rows = SparkEntry.queries("ccm_pairwise_screen")(spark, dir).collect()
    val gate = rows.filter(_.getString(2) == "gate")
    val pruned = gate.count(_.getLong(5) == 0L).toDouble / gate.length
    assert(pruned >= 0.5, f"only $pruned%.2f of pairs pruned — the gate is not earning its keep")
  }
}
