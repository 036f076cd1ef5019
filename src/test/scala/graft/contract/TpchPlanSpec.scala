package graft.contract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

import graft.{SparkEntry, SparkTestBase}

/** Plan-regression pins for the TPC-H-shaped joins (VERDICT r7 item 6):
  * the round-7 plan audit found these properties by reading `.explain`
  * output — this spec makes losing any of them a test failure:
  *
  *  - dim predicates are PUSHED into the parquet scans (PushedFilters
  *    reaches the file source, so at scale row groups are skipped before
  *    any join sees the rows);
  *  - hinted dimension sides actually plan as broadcast joins;
  *  - the single-fact-scan property: queries whose derived relation
  *    feeds two consumers (q15 rev, q17 joined, q2 cost, q20 ps) pin the
  *    relation once — the FINAL plan contains ZERO parquet scans of the
  *    fact table, proving both consumers reuse the materialization
  *    instead of rescanning;
  *  - join semantics that carry correctness (q13's LEFT OUTER keeping
  *    the zero bucket, q22's anti join, q20's semi join) stay the
  *    planned join type.
  */
class TpchPlanSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def executedPlanOf(name: String): SparkPlan = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.collect() // finalize AQE
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  // descend through AQE stage boundaries and reused exchanges
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p.children ++ (p match {
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Nil
    })
    p +: kids.flatMap(allNodes)
  }

  private def scansOf(p: SparkPlan, table: String): Seq[FileSourceScanExec] =
    allNodes(p).collect {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains(s"$table.parquet")) =>
        s
    }

  private def pushed(s: FileSourceScanExec): String =
    s.metadata.getOrElse("PushedFilters", "")

  test("q7_volume: nation IN-predicates pushed, single lineitem scan, broadcast dims") {
    val p = executedPlanOf("q7_volume")
    val nationScans = scansOf(p, "nation")
    assert(nationScans.nonEmpty, "expected nation parquet scans")
    nationScans.foreach(sc =>
      assert(pushed(sc).contains("In(n_name"), s"nation filter not pushed: ${pushed(sc)}")
    )
    assert(scansOf(p, "lineitem").size == 1, "lineitem must be scanned exactly once")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"), "expected broadcast dim joins")
  }

  test("q13_custdist: priority predicate pushed into orders scan, LEFT OUTER preserved") {
    val p = executedPlanOf("q13_custdist")
    val orderScans = scansOf(p, "orders")
    assert(orderScans.size == 1, "orders must be scanned exactly once")
    assert(
      pushed(orderScans.head).contains("Not(EqualTo(o_orderpriority"),
      s"priority filter not pushed: ${pushed(orderScans.head)}"
    )
    assert(p.toString.contains("LeftOuter"), "zero-order customers need the LEFT OUTER join")
  }

  test("q15_topsupp: no fact rescan (checkpoint reuse) and a broadcast max attach") {
    val p = executedPlanOf("q15_topsupp")
    assert(
      scansOf(p, "lineitem").isEmpty,
      "final plan must consume the checkpointed revenue relation, not rescan lineitem"
    )
    assert(p.toString.contains("BroadcastHashJoin"), "1-row max should attach by broadcast")
  }

  test("q17_smallqty: no fact rescan — both aggregate levels share one materialization") {
    val p = executedPlanOf("q17_smallqty")
    assert(scansOf(p, "lineitem").isEmpty, "lineitem must not be rescanned after the checkpoint")
    assert(scansOf(p, "part").isEmpty, "the brand-filtered join must not be recomputed")
  }

  test("q22_lapsed: date predicate pushed, anti join planned, 1-row threshold broadcast") {
    val p = executedPlanOf("q22_lapsed")
    val orderScans = scansOf(p, "orders")
    assert(orderScans.size == 1, "orders must be scanned exactly once")
    assert(
      pushed(orderScans.head).contains("GreaterThanOrEqual(o_orderdate"),
      s"date filter not pushed: ${pushed(orderScans.head)}"
    )
    val s = p.toString
    assert(s.contains("LeftAnti"), "NOT EXISTS must plan as an anti join")
    assert(
      s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
      "the 1-row positive-balance aggregate must attach by broadcast"
    )
  }

  test("q2_mincost: dim predicates pushed, no fact rescan of the cost relation") {
    val p = executedPlanOf("q2_mincost")
    val regionScans = scansOf(p, "region")
    val partScans = scansOf(p, "part")
    // region feeds the checkpointed cost relation, so it is invisible in
    // the final plan; part joins AFTER the checkpoint and must be pushed
    assert(partScans.size == 1, "part must be scanned exactly once")
    assert(
      pushed(partScans.head).contains("EqualTo(p_size"),
      s"p_size filter not pushed: ${pushed(partScans.head)}"
    )
    assert(regionScans.isEmpty, "region belongs to the pre-checkpoint supplier pruning")
    assert(
      scansOf(p, "lineitem").isEmpty,
      "both min and equality consumers must reuse the checkpointed cost relation"
    )
    assert(p.toString.contains("BroadcastHashJoin"), "part dim must broadcast")
  }

  test("q9_profit: name predicate pushed, single lineitem scan, broadcast dims") {
    val p = executedPlanOf("q9_profit")
    val partScans = scansOf(p, "part")
    assert(partScans.size == 1, "part must be scanned exactly once")
    assert(
      pushed(partScans.head).contains("StringContains(p_name"),
      s"p_name filter not pushed: ${pushed(partScans.head)}"
    )
    assert(scansOf(p, "lineitem").size == 1, "lineitem must be scanned exactly once")
    val bhj = allNodes(p).count(_.getClass.getSimpleName == "BroadcastHashJoinExec")
    assert(bhj >= 3, s"part/supplier/nation must broadcast, found $bhj broadcast joins")
  }

  test("q8_marketshare: type+region predicates pushed, single lineitem scan, broadcast dims") {
    val p = executedPlanOf("q8_marketshare")
    val partScans = scansOf(p, "part")
    assert(partScans.size == 1, "part must be scanned exactly once")
    assert(
      pushed(partScans.head).contains("EqualTo(p_type"),
      s"p_type filter not pushed: ${pushed(partScans.head)}"
    )
    val regionScans = scansOf(p, "region")
    assert(regionScans.size == 1, "region must be scanned exactly once")
    assert(
      pushed(regionScans.head).contains("EqualTo(r_name"),
      s"r_name filter not pushed: ${pushed(regionScans.head)}"
    )
    assert(scansOf(p, "lineitem").size == 1, "lineitem must be scanned exactly once")
    val bhj = allNodes(p).count(_.getClass.getSimpleName == "BroadcastHashJoinExec")
    assert(bhj >= 3, s"part/supplier-nation/customer-nation must broadcast, found $bhj")
  }

  test("q11_stock: nation predicate pushed, no fact rescan, 1-row total broadcast") {
    val p = executedPlanOf("q11_stock")
    assert(
      scansOf(p, "lineitem").isEmpty,
      "total and threshold consumers must reuse the checkpointed per-part relation"
    )
    val s = p.toString
    assert(
      s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
      "the 1-row global total must attach by broadcast"
    )
  }

  test("q12_shipmode: shipdate range pushed, both facts scanned exactly once") {
    val p = executedPlanOf("q12_shipmode")
    val lineScans = scansOf(p, "lineitem")
    assert(lineScans.size == 1, "lineitem must be scanned exactly once")
    assert(
      pushed(lineScans.head).contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate range not pushed: ${pushed(lineScans.head)}"
    )
    assert(scansOf(p, "orders").size == 1, "orders must be scanned exactly once")
  }

  test("q16_partsupp: part predicates pushed, anti join planned, single lineitem scan") {
    val p = executedPlanOf("q16_partsupp")
    val partScans = scansOf(p, "part")
    assert(partScans.size == 1, "part must be scanned exactly once")
    assert(
      pushed(partScans.head).contains("In(p_size"),
      s"p_size IN filter not pushed: ${pushed(partScans.head)}"
    )
    assert(
      pushed(partScans.head).contains("Not(EqualTo(p_brand"),
      s"brand exclusion not pushed: ${pushed(partScans.head)}"
    )
    assert(scansOf(p, "lineitem").size == 1, "lineitem must be scanned exactly once")
    // At sf0.001 the negative-balance denylist is EMPTY and AQE replaces
    // the left-anti with a pass-through (empty-build-side elimination) —
    // the plan improvement we'd want at scale too. Accept either shape,
    // but only license the elimination when the denylist really is empty.
    val denyEmpty = spark.read.parquet(s"$dir/supplier.parquet")
      .filter(org.apache.spark.sql.functions.col("s_acctbal") < 0.0).isEmpty
    assert(
      p.toString.contains("LeftAnti") || denyEmpty,
      "the denylist must plan as an anti join (or be AQE-eliminated when empty)"
    )
  }

  test("q20_excess: region predicate pushed, semi join planned, no fact rescan") {
    val p = executedPlanOf("q20_excess")
    val regionScans = scansOf(p, "region")
    assert(regionScans.size == 1, "region must be scanned exactly once")
    assert(
      pushed(regionScans.head).contains("EqualTo(r_name"),
      s"region filter not pushed: ${pushed(regionScans.head)}"
    )
    assert(
      scansOf(p, "lineitem").isEmpty,
      "both aggregation levels must reuse the checkpointed (part, supplier) relation"
    )
    assert(p.toString.contains("LeftSemi"), "the dominating-supplier set must attach as a semi join")
  }
}
