package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-word polynomial hashes: `graft_wordhashes(text)` =
  * `transform(split(text, ' '), w -> polyHash(w))` as ONE compiled pass.
  *
  * This is the innermost loop of the whole dedup/graph family (MinHash,
  * LSH banding, SimHash, shingling, corpus-prep, every graph_* query): the
  * portable HOF form evaluates an interpreted lambda per CHARACTER
  * (`aggregate(split(w, ''), …)` inside `transform`), materializing a
  * per-char array per word. Here a single scan over the string's code
  * points accumulates the Horner hash and emits a word boundary at every
  * space — exactly `split`'s single-space semantics (consecutive spaces
  * yield empty tokens hashing to 0, a trailing space yields a trailing
  * empty token, the empty string is one empty token), and exactly
  * [[graft.ccm.DetHash.polyHash]]'s code-point arithmetic, so the DuckDB
  * oracle (`string_split` + per-char fold) is unchanged.
  */
case class WordHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_wordhashes expects a string, got ${child.dataType.sql}"
      )

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_wordhashes"

  override protected def nullSafeEval(input: Any): Any =
    WordHashes.hashWords(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.WordHashes.hashWordsUtf8($c);"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordHashes {
  private val P = graft.ccm.DetHash.P

  /** One scan: Horner hash per token, boundary at every single space. */
  def hashWords(s: String): ArrayData = {
    val len = s.length
    var nw = 1
    var k = 0
    while (k < len) {
      if (s.charAt(k) == ' ') nw += 1
      k += 1
    }
    val out = new Array[Long](nw)
    var wi = 0
    var h = 0L
    var off = 0
    while (off < len) {
      val cp = s.codePointAt(off)
      if (cp == 32) { out(wi) = h; wi += 1; h = 0L }
      else h = (h * 31 + cp) % P
      off += Character.charCount(cp)
    }
    out(wi) = h
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def hashWordsUtf8(u: UTF8String): ArrayData = hashWords(u.toString)
}
