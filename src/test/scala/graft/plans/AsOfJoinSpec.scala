package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Pins for the custom as-of Catalyst operator: the physical node actually
  * plans, it agrees with the window form row-for-row on the driver data,
  * and the edge semantics (strict-prior, same-instant ties, empty right,
  * no-match nulls) hold on a hand-built frame.
  */
class AsOfJoinSpec extends SparkTestBase {
  private val SfDir = "/root/testdata/sf0.001"

  test("the plan goes through AsOfJoinExec (strategy fires), with both children sorted") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 20L)).toDF("user_id", "tus")
    val p = Seq((1L, 5L, 100L)).toDF("p_user", "p_tus", "p_event_id")
    val joined = AsOf.backwardStrict(l, p, "user_id", "tus", "p_user", "p_tus", "p_event_id")
    val plan = joined.queryExecution.executedPlan.toString
    // physical nodes print with the "Exec" suffix stripped
    assert(plan.contains("AsOfJoin "), s"custom operator missing from:\n$plan")
    assert(plan.contains("Sort [user_id"), "left child must sort on (key, time)")
    assert(joined.count() == 2)
  }

  test("agrees with the window-form as-of row-for-row on the driver data") {
    val native = SparkEntry.queries("evt_asof_native")(spark, SfDir).collect().toSet
    val window = SparkEntry.queries("evt_asof_purchase")(spark, SfDir).collect().toSet
    assert(native.nonEmpty)
    assert(native == window)
  }

  test("edge semantics: strict-prior, max-tie on same-instant rights, null on no match") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 15L), (2L, 10L), (3L, 10L)).toDF("k", "t")
    val r = Seq(
      (1L, 10L, 7L), // same instant as left(1,10) -> strictly-prior excludes it there
      (1L, 8L, 5L),
      (1L, 8L, 6L), // same-instant pair -> tie resolves to event 6
      (2L, 11L, 9L) // only LATER than left(2,10) -> no match
    ).toDF("rk", "rt", "rid")
    val out = AsOf
      .backwardStrict(l, r, "k", "t", "rk", "rt", "rid")
      .select(col("k"), col("t"), col("rid"), col("rt"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), if (x.isNullAt(2)) -1L else x.getLong(2)))
      .toSet
    assert(
      out == Set(
        (1L, 10L, 6L), // ties at t=8 -> rid 6, the (1,10) row at t=10 excluded by strictness
        (1L, 15L, 7L), // now the t=10 row is prior and latest
        (2L, 10L, -1L), // right exists but only later -> null
        (3L, 10L, -1L) // no right rows for the key at all -> null
      ),
      s"got $out"
    )
  }
}
