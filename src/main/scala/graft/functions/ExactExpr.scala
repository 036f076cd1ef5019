package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `graft_exp(x)` — the codegen'd emission of the engine-shared
  * IEEE-only exp series ([[graft.contract.ExactExp]]). The portable HOF
  * text runs two interpreted `aggregate` folds per row and drops the
  * enclosing projection out of whole-stage codegen — on the CCM weight
  * kernel (the engine's hottest scalar, 25 queries) that cost is paid
  * per neighbor pair. This stays inside codegen as one static call;
  * bit-equality with the HOF text (and hence with the DuckDB oracle
  * text, same tree by construction) is pinned by ExactSeriesSpec.
  */
case class ExactExpExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_exp expects a double, got ${child.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_exp"

  override protected def nullSafeEval(input: Any): Any =
    ExactMath.exp(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.ExactMath.exp($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_ln(y)` — codegen'd emission of [[graft.contract.ExactLn]]'s
  * IEEE-only ln series, same three-way bit-equality contract.
  */
case class ExactLnExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_ln expects a double, got ${child.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_ln"

  override protected def nullSafeEval(input: Any): Any =
    ExactMath.ln(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.ExactMath.ln($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
