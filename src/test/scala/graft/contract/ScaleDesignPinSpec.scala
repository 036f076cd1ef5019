package graft.contract

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Structure pins for the measured scale-design properties of the
  * heaviest late-round-9 additions (VERDICT r9 item 8): each property
  * SCALE.md argues from a measurement is stated here as a failing test,
  * so it cannot silently regress — the NewQueryPlanSpec discipline
  * applied to graph_betweenness's seed-panel Brandes, pack_ffd's shard
  * bound, and text_bpe_train's vocabulary-only folds.
  */
class ScaleDesignPinSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("betweenness forward round: one edge join, map-side partial sigma sums, one anti-join") {
    val spark2 = spark
    import spark2.implicits._
    val e = (1L to 200L).map(i => (i, i + 1)).toDF("src", "dst")
    val f = Seq((1L, 1L, 0, 1L)).toDF("seed", "v", "dep", "sigma")
    val p = graft.operators.Betweenness
      .forwardRound(f, e, f, 1)
      .queryExecution
      .executedPlan
      .toString
    val joins = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r.findAllIn(p).size
    assert(joins == 2, s"expected exactly the edge join + the visited anti-join, got $joins in:\n$p")
    assert(p.contains("LeftAnti"), "the visited set must attach as an anti-join")
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs >= 2, s"sigma sums must combine map-side (partial+final HashAggregate), got $aggs")
    assert(!p.contains("Window"), "no window pass belongs in a forward round")
  }

  test("dedup_substring_banded: SHUFFLE_HASH joins by default, spillable SMJ under lowMemoryMode") {
    // round 16 (SCALE.md "Memory pressure"): the hash joins are the 2.8x
    // wall win and the conf is the measured small-executor escape hatch —
    // both plan shapes are pinned so neither can silently vanish
    def planOf(): String =
      SparkEntry.queries("dedup_substring_banded")(spark, dir).queryExecution.executedPlan.toString
    def scans(p: String): Int = "Scan ExistingRDD".r.findAllIn(p).size
    val default = planOf()
    assert(default.contains("ShuffledHashJoin"), s"default plan lost its SHUFFLE_HASH joins:\n$default")
    spark.conf.set("spark.graft.lowMemoryMode", "true")
    try {
      val lowMem = planOf()
      assert(!lowMem.contains("ShuffledHashJoin"), s"lowMemoryMode must drop the un-spillable hash builds:\n$lowMem")
      // the truth-scale survivors checkpoint stays in both modes; the
      // data-proportional SHINGLE checkpoint must be gone in low-mem
      assert(
        scans(lowMem) < scans(default),
        s"lowMemoryMode must not localCheckpoint the shingle relation (checkpoint scans: ${scans(lowMem)} vs ${scans(default)})"
      )
    } finally spark.conf.unset("spark.graft.lowMemoryMode")
  }

  test("graph_betweenness's seed panel is a FIXED size while the eligible set grows with SF") {
    // the O(seeds·E·depth) knob: a stride-only panel grows with the key
    // space (40 seeds measured 39 s at sf0.1 before the cap). sf0.001 is
    // below the pin's reach — its eligible set (1 vertex) is smaller
    // than the cap, so the decade compared is sf0.01 -> sf0.1.
    val sym1 = GraphQueries.bcGraph(spark, "/root/testdata/sf0.01")
    val sym2 = GraphQueries.bcGraph(spark, "/root/testdata/sf0.1")
    val panel1 = GraphQueries.bcSeedPanel(sym1).count()
    val panel2 = GraphQueries.bcSeedPanel(sym2).count()
    def eligible(sym: org.apache.spark.sql.DataFrame): Long =
      sym.select(col("src").as("vertex")).distinct().filter(col("vertex") % 50 === 0).count()
    assert(panel1 == panel2, s"panel grew with the SF: $panel1 -> $panel2")
    assert(
      eligible(sym2) > eligible(sym1),
      "the eligible set must grow with SF for this pin to mean anything"
    )
    assert(eligible(sym2) > panel2, "the cap must actually be binding at sf0.01")
  }

  test("graph_betweenness's job count is round-structured, not data-sized") {
    def jobs(d: String): Int = {
      val sc = spark.sparkContext
      val g = s"bc-pin-$d"
      sc.setJobGroup(g, "pin", interruptOnCancel = false)
      try SparkEntry.queries("graph_betweenness")(spark, d).collect()
      finally sc.clearJobGroup()
      sc.statusTracker.getJobIdsForGroup(g).length
    }
    val j1 = jobs("/root/testdata/sf0.001")
    val j2 = jobs("/root/testdata/sf0.01")
    // AQE stage materialization can wobble by a couple of jobs; a
    // data-sized regression (per-round edge snapshots, a panel that
    // grows with the key space) moves this by far more
    assert(
      math.abs(j1 - j2) <= 4,
      s"job count moved with the data (sf0.001=$j1, sf0.01=$j2) — the round structure leaked a data-sized term"
    )
  }

  test("pack_ffd folds run per bounded shard: shard key in the aggregate, no join, no window") {
    val p = SparkEntry.queries("pack_ffd")(spark, dir).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "FFD packing needs no join")
    assert(!p.contains("Window"), "FFD packing needs no window")
    assert(
      p.contains("div 256"),
      s"the bounded-shard key (doc_id div 256) must partition the fold groups — " +
        s"whole-source folds measured 118 s at 10x data:\n$p"
    )
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs >= 4, s"expected shard-level + source-level aggregation (partial+final each), got $aggs")
  }

  test("text_bpe_train: the vocabulary build is the only corpus pass; a merge round is map-only") {
    val words = TextQueries.bpeWords(spark, dir)
    val pw = words.queryExecution.executedPlan.toString
    assert(!pw.contains("Join"), "the vocabulary build must not join")
    val exchanges = "Exchange".r.findAllIn(pw).size
    assert(
      exchanges <= 2, // partial/final agg around ONE hash exchange (AQE may print a reused node)
      s"the trainer's only corpus-sized exchange is the vocabulary groupBy, got $exchanges:\n$pw"
    )
    val round = TextQueries.bpeMergeRound(words.localCheckpoint(), "a", "b")
    val pr = round.queryExecution.executedPlan.toString
    assert(!pr.contains("Exchange"), s"a merge round must be MAP-ONLY over the vocabulary:\n$pr")
    assert(!pr.contains("Join"), s"a merge round must not join:\n$pr")
  }
}
