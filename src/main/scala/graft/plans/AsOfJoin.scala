package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending,
  Attribute,
  BindReferences,
  Expression,
  GenericInternalRow,
  JoinedRow,
  SortOrder,
  UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A WHOLE-OPERATOR Catalyst extension (the brief's extension ladder,
  * rung (c)): backward strict as-of join as a custom logical plan, a
  * planner [[SparkStrategy]], and a physical merge operator — the
  * third join implementation beside the engine's window form
  * (`evt_asof_purchase`) and DuckDB's native `ASOF JOIN` in the oracle.
  *
  * Semantics: for every left row, the right row of the SAME key with the
  * LATEST time strictly before the left time; ties on time resolve to
  * the greatest tie column — exactly the window form's
  * `max(struct(time, tie))` argmax. No match → right columns null.
  *
  * Why a physical operator: the window form shuffles the UNION of both
  * relations and carries the running argmax through every left row's
  * frame; the merge form co-partitions the two inputs on the key,
  * sort-merges each partition in ONE forward pass with O(1) state (the
  * current candidate), and never materializes a frame. Both are
  * key-sharded single-shuffle plans — at 100 TB the merge form wins when
  * the right side is much smaller than the left (it shuffles each input
  * once instead of their union through one window).
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTie: Expression
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; registered at runtime via
  * `spark.experimental.extraStrategies` (the public injection point — no
  * session restart or extensions conf needed).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie) :: Nil
    case _ => Nil
  }
}

/** Partition-local merge as-of join. Declares the SortMergeJoin contract
  * to the planner — both children CLUSTERED on their key (EnsureRequirements
  * co-partitions them and equalizes partition counts) and sorted by
  * (key, time[, tie]) — then zips partitions and advances a single right
  * cursor per left row. State per partition is ONE buffered right row and
  * one candidate copy: memory O(1) regardless of key cardinality or skew,
  * and each input row is touched exactly once.
  */
final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTie: Expression
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending), SortOrder(rightTie, Ascending))
  )

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    val fullOutput = output
    val leftOutput = left.output
    val rightOutput = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind against a NULLABLE view of the right input: a non-nullable
      // right child (e.g. a local relation) would otherwise bind
      // null-check-free getters and read the no-match null row as zeros
      val proj = UnsafeProjection.create(fullOutput, leftOutput ++ rightOutput.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // a NULL key or time would unbox to 0L in Scala and silently join as
      // key 0 — fail loudly instead (the constructor documents non-null)
      @inline def evalLong(e: Expression, row: InternalRow, what: String): Long = {
        val v = e.eval(row)
        if (v == null)
          throw new IllegalStateException(
            s"as-of join: NULL $what — key/time columns must be non-null (a null would unbox to 0)"
          )
        v.asInstanceOf[Long]
      }
      // the O(1) merge state: the best strictly-prior right row for the
      // key currently being scanned (rows arrive time-asc, tie-asc, so a
      // plain overwrite IS the max(struct(time, tie)) argmax)
      var candKey = 0L
      var cand: InternalRow = null
      lIter.map { lRow =>
        val k = evalLong(lk, lRow, "left key")
        val t = evalLong(lt, lRow, "left time")
        var advance = true
        while (advance && rBuf.hasNext) {
          val head = rBuf.head
          val hk = evalLong(rk, head, "right key")
          if (hk < k || (hk == k && evalLong(rt, head, "right time") < t)) {
            if (hk == k) { cand = head.copy(); candKey = hk }
            rBuf.next()
          } else advance = false
        }
        if (cand != null && candKey == k) proj(joined(lRow, cand))
        else proj(joined(lRow, nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** User-facing constructor: resolves the named columns on each side,
  * registers the strategy once per session, and returns the joined frame
  * (all left columns + all right columns, right side nullable). Key,
  * time, and tie columns must be LONG on both sides (the engine's
  * epoch-micros/id convention); callers disambiguate right column names
  * BEFORE the join.
  */
object AsOf {
  def backwardStrict(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      rightTie: String
  ): DataFrame = {
    val s = leftDf.sparkSession
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy))
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ AsOfJoinStrategy
    val l = leftDf.queryExecution.analyzed
    val r0 = rightDf.queryExecution.analyzed
    // When both sides derive from the SAME base relation, left and right can
    // share expression IDs; BindReferences over leftOutput ++ rightOutput
    // would then silently bind right-side expressions to LEFT ordinals.
    // Fresh-alias the whole right output in that case.
    val r: LogicalPlan =
      if (l.outputSet.intersect(r0.outputSet).isEmpty) r0
      else
        org.apache.spark.sql.catalyst.plans.logical.Project(
          r0.output.map(a => org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
          r0
        )
    def attr(plan: LogicalPlan, name: String): Attribute = {
      val a = plan.output
        .find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
      require(
        a.dataType == org.apache.spark.sql.types.LongType,
        s"as-of join column $name must be LONG (epoch-micros/id convention), got ${a.dataType}"
      )
      a
    }
    org.apache.spark.sql.graft.GraftPlanApi.ofRows(
      s,
      AsOfJoinPlan(l, r, attr(l, leftKey), attr(l, leftTime), attr(r, rightKey), attr(r, rightTime), attr(r, rightTie))
    )
  }
}
