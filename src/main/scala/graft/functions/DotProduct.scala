package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The portable formulation used elsewhere —
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)` — is a
  * higher-order function: Spark evaluates the lambda per element in the
  * interpreter and materializes the zipped intermediate array, and the
  * enclosing projection falls out of whole-stage codegen. This expression
  * generates a tight Java loop instead (`doGenCode`), stays inside codegen,
  * allocates nothing, and preserves EXACTLY the same left-to-right IEEE
  * summation order — so FOR EQUAL-LENGTH ARRAYS OF NON-NULL ELEMENTS
  * results are bit-identical to the HOF form and the DuckDB oracle SQL is
  * unchanged. That precondition holds for every caller here (fixed-dim
  * embedding vectors cast from parquet `array<float>`).
  *
  * Outside the precondition the two forms deliberately differ — this
  * expression is total where the HOF form degenerates: unequal lengths
  * dot the common prefix (`zip_with` null-pads to the longer length and
  * `aggregate` then returns null); a null ELEMENT reads as 0.0 via
  * `ArrayData.getDouble` (the HOF form nulls the whole result). Top-level
  * null arrays return null in both forms (`nullSafeEval`).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<double>, array<double>), got (${left.dataType.sql}, ${right.dataType.sql})"
      )
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** The one registry both registration paths iterate:
    * (name, implementing class, builder, usage).
    */
  private[functions] val fns: Seq[(String, String, Seq[Expression] => Expression, String)] = Seq(
    (
      "graft_dot",
      classOf[DotProduct].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot expects 2 arguments")
        DotProduct(children.head, children(1))
      },
      "graft_dot(a, b) - dot product of two array<double> columns (codegen)"
    ),
    (
      "graft_winhash",
      classOf[WindowHashMinMax].getName,
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_winhash expects (text, width, stride)")
        WindowHashMinMax(children.head, children(1), children(2))
      },
      "graft_winhash(text, width, stride) - struct(win_min, win_max) of sliding-window poly hashes (codegen)"
    ),
    (
      "graft_wordhashes",
      classOf[WordHashes].getName,
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_wordhashes expects 1 argument")
        WordHashes(children.head)
      },
      "graft_wordhashes(text) - array of per-word polynomial hashes, single-space split (codegen)"
    ),
    (
      "graft_winhashes",
      classOf[WindowHashes].getName,
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_winhashes expects (text, width, stride)")
        WindowHashes(children.head, children(1), children(2))
      },
      "graft_winhashes(text, w, s) - array of all w-char window polynomial hashes at stride s (codegen)"
    ),
    (
      "graft_minhashsig",
      classOf[MinHashSig].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_minhashsig expects (word_hashes, num_perms)")
        MinHashSig(children.head, children(1))
      },
      "graft_minhashsig(wh, k) - k-permutation MinHash signature over word-3-gram shingles (codegen)"
    ),
    (
      "graft_l2sq",
      classOf[L2Sq].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_l2sq expects 2 arguments")
        L2Sq(children.head, children(1))
      },
      "graft_l2sq(a, b) - squared L2 distance of two array<double> columns (codegen)"
    ),
    (
      "graft_repstats",
      classOf[RepStats].getName,
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_repstats expects 1 argument")
        RepStats(children.head)
      },
      "graft_repstats(text) - struct(nw, dw, mw, d2, d3) repetition stats over the single-space split (codegen)"
    ),
    (
      "graft_minimizers",
      classOf[Minimizers].getName,
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_minimizers expects (text, width, sel)")
        Minimizers(children.head, children(1), children(2))
      },
      "graft_minimizers(text, w, s) - robust-winnowing minimizer hashes of stride-1 w-char windows (codegen)"
    ),
    (
      "graft_exp",
      classOf[ExactExpExpr].getName,
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_exp expects 1 argument")
        ExactExpExpr(children.head)
      },
      "graft_exp(x) - IEEE-only exp series, bit-identical to ExactExp's SQL trees (codegen)"
    ),
    (
      "graft_ln",
      classOf[ExactLnExpr].getName,
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_ln expects 1 argument")
        ExactLnExpr(children.head)
      },
      "graft_ln(y) - IEEE-only ln series, bit-identical to ExactLn's SQL trees (codegen)"
    )
  )

  /** Idempotent per-session registration (for sessions created without the
    * extensions config, e.g. the driver's Verify/Bench sessions). Skips
    * names that already resolve — re-registering is harmless but logs a
    * "replaced a previously registered function" WARN per call site.
    */
  /** 11-arg ExpressionInfo (the only non-deprecated ctor with a usage
    * string): (class, db, name, usage, arguments, examples, note, group,
    * since, deprecated, source).
    */
  private[functions] def info(cls: String, name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(cls, null, name, usage, "", "", "", "", "", "", "built-in")

  def register(spark: SparkSession): Unit = fns.foreach { case (name, cls, builder, usage) =>
    val id = FunctionIdentifier(name)
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      spark.sessionState.functionRegistry.registerFunction(id, info(cls, name, usage), builder)
    }
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — injects the
  * engine's native functions AND the as-of join planner strategy at
  * session build time (the deployment path; [[GraftFunctions.register]] /
  * `AsOfJoin.ensureRegistered` are the programmatic equivalents). Both
  * paths iterate the same [[GraftFunctions.fns]] registry and the same
  * strategy object, so names, builders (incl. arity checks),
  * ExpressionInfo and planner behavior can never diverge between a
  * config-built session and a programmatic one.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.fns.foreach { case (name, cls, builder, usage) =>
      e.injectFunction(
        (FunctionIdentifier(name), GraftFunctions.info(cls, name, usage), builder)
      )
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
