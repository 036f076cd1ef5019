package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native MinHash signature: `graft_minhashsig(wh, k)` fuses word-3-gram
  * shingling and all `k` affine permutations over a word-hash array into
  * one compiled pass — shingle hashes are never materialized and each is
  * folded into every permutation's running minimum as it is produced.
  *
  * Arithmetic is exactly the portable chain it replaces
  * (`transform(sequence…)` shingles from [[graft.ccm.DetHash]] word hashes,
  * then `array_min(transform(shh, minhashPerm_k))` per k), including the
  * degenerate case: fewer than 3 words ⇒ no shingles ⇒ every `array_min`
  * of the HOF form is NULL ⇒ this expression returns a NULL array (and
  * `element_at` of it yields NULL per signature column). The DuckDB
  * oracles are unchanged.
  */
case class MinHashSig(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case ArrayType(LongType, _) =>
        if (right.dataType != IntegerType || !right.foldable)
          TypeCheckResult.TypeCheckFailure("graft_minhashsig perm count must be an int literal")
        else if (right.eval() == null || right.eval().asInstanceOf[Int] < 1)
          TypeCheckResult.TypeCheckFailure("graft_minhashsig perm count must be >= 1 and non-null")
        else TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"graft_minhashsig expects array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhashsig"

  private lazy val k: Int = right.eval().asInstanceOf[Int]

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val wh = left.eval(input)
    if (wh == null) null else MinHashSig.compute(wh.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (wh, _) => s"""
        ${ev.value} = graft.functions.MinHashSig.compute($wh, $k);
        ${ev.isNull} = ${ev.value} == null;
      """
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinHashSig {
  private val P = graft.ccm.DetHash.P
  private val ASample = graft.ccm.DetHash.A_SAMPLE

  /** Null when there are fewer than 3 word hashes (no shingles). */
  def compute(wh: ArrayData, perms: Int): ArrayData = {
    val n = wh.numElements()
    if (n < 3) return null
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i + 2 < n) {
      val sh = ((wh.getLong(i) * 131 + wh.getLong(i + 1)) * 131 + wh.getLong(i + 2)) % P
      var k = 0
      while (k < perms) {
        val v = (sh * (2L * k + 1L) + (k.toLong * ASample + 7L)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
