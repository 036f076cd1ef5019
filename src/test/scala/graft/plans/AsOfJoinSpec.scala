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

  test("self-join (shared expression IDs) re-aliases the right side instead of mis-binding") {
    import spark.implicits._
    val base = Seq((1L, 10L, 100L), (1L, 20L, 200L)).toDF("k", "t", "v")
    // both sides from the SAME analyzed relation, right columns renamed but
    // sharing k/t expression IDs with the left — pre-fix, BindReferences
    // would bind the right expressions to LEFT ordinals silently
    val right = base.select(col("k").as("rk"), col("t").as("rt"), col("v").as("rid"))
    val out = AsOf
      .backwardStrict(base, right, "k", "t", "rk", "rt", "rid")
      .select(col("t"), col("rid"))
      .collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toSet
    // t=10 has no strictly-prior row; t=20's latest prior is (10, 100)
    assert(out == Set((10L, -1L), (20L, 100L)), s"got $out")
  }

  test("null key/time fails loudly instead of joining as key 0") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(10L)), (None, Some(20L))).toDF("k", "t")
    val r = Seq((0L, 5L, 42L)).toDF("rk", "rt", "rid")
    val ex = intercept[org.apache.spark.SparkException] {
      AsOf.backwardStrict(l, r, "k", "t", "rk", "rt", "rid").collect()
    }
    def chain(e: Throwable): List[Throwable] =
      if (e == null) Nil else e :: chain(e.getCause)
    assert(
      chain(ex).exists(c => Option(c.getMessage).exists(_.contains("as-of join: NULL"))),
      s"expected the loud NULL guard, got ${ex.getMessage}"
    )
  }

  test("non-LONG join columns are rejected at construction") {
    import spark.implicits._
    val l = Seq((1, 10L)).toDF("k", "t") // k is INT
    val r = Seq((1L, 5L, 42L)).toDF("rk", "rt", "rid")
    val ex = intercept[IllegalArgumentException] {
      AsOf.backwardStrict(l, r, "k", "t", "rk", "rt", "rid")
    }
    assert(ex.getMessage.contains("must be LONG"))
  }
}
