package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document repetition statistics:
  * `graft_repstats(text)` = struct(nw, dw, mw, d2, d3) where
  *   nw = token count of the single-space split,
  *   dw = distinct tokens, mw = multiplicity of the most frequent token,
  *   d2/d3 = distinct word 2-/3-grams.
  *
  * The portable formulation (`array_distinct` + a `transform`/`filter`
  * count per DISTINCT word + gram-building `transform`s) runs interpreted
  * lambdas quadratic in the vocabulary per row. This is one pass over the
  * split tokens with hash sets, inside codegen. Tokenization is exactly
  * `split(text, ' ')` (consecutive spaces yield empty tokens, empty string
  * is one empty token) and distinctness is over the actual gram STRINGS —
  * not hashes — so the DuckDB oracle (`string_split` + `list_distinct`)
  * is unchanged and collision-free.
  */
case class RepStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_repstats expects a string, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(
    Seq(
      StructField("nw", LongType, nullable = false),
      StructField("dw", LongType, nullable = false),
      StructField("mw", LongType, nullable = false),
      StructField("d2", LongType, nullable = false),
      StructField("d3", LongType, nullable = false)
    )
  )
  override def prettyName: String = "graft_repstats"

  override protected def nullSafeEval(input: Any): Any =
    RepStats.stats(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.RepStats.statsUtf8($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepStats {
  def stats(s: String): InternalRow = {
    val words = s.split(" ", -1)
    val nw = words.length
    val wordCounts = new java.util.HashMap[String, Int](nw * 2)
    var i = 0
    while (i < nw) {
      wordCounts.merge(words(i), 1, (a, b) => a + b)
      i += 1
    }
    var mw = 0
    val it = wordCounts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > mw) mw = c }
    val g2 = new java.util.HashSet[String]((nw + 1) * 2)
    val g3 = new java.util.HashSet[String]((nw + 1) * 2)
    i = 0
    while (i < nw - 1) {
      g2.add(words(i) + " " + words(i + 1))
      if (i < nw - 2) g3.add(words(i) + " " + words(i + 1) + " " + words(i + 2))
      i += 1
    }
    new GenericInternalRow(
      Array[Any](nw.toLong, wordCounts.size().toLong, mw.toLong, g2.size().toLong, g3.size().toLong)
    )
  }

  def statsUtf8(u: UTF8String): InternalRow = stats(u.toString)
}
