package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native min/max of polynomial hashes over sliding character windows —
  * the winnowing-style document fingerprint kernel.
  *
  * `graft_winhash(text, width, stride)` hashes every `width`-char window
  * at offsets 1, 1+stride, 1+2*stride, … with the [[graft.ccm.DetHash]]
  * polynomial (Horner, base 31, mod P over per-char code units) and
  * returns `struct(win_min, win_max)`; NULL when the text is shorter than
  * `width` (mirroring `array_min/array_max` of an empty window list).
  *
  * Why native: the portable formulation —
  * `transform(sequence(1, len-width+1, stride), i -> aggregate(split(
  * substring(text, i, width), ''), …))` — evaluates two nested
  * interpreted lambdas per window and materializes per-window substrings
  * and per-char arrays. This expression runs the same arithmetic as one
  * compiled nested loop over the string's CODE POINTS — the same unit
  * Spark's `length`/`substring` (and therefore the HOF form's window
  * boundaries) and [[graft.ccm.DetHash.polyHash]] count by, so window
  * offsets, the below-width null boundary, and hash inputs all agree
  * with the portable formulation and the DuckDB oracle for any text.
  */
case class WindowHashMinMax(text: Expression, width: Expression, stride: Expression)
    extends TernaryExpression {

  override def first: Expression = text
  override def second: Expression = width
  override def third: Expression = stride

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"graft_winhash expects a string, got ${text.dataType.sql}")
    else if (width.dataType != IntegerType || !width.foldable)
      TypeCheckResult.TypeCheckFailure("graft_winhash width must be an int literal")
    else if (stride.dataType != IntegerType || !stride.foldable)
      TypeCheckResult.TypeCheckFailure("graft_winhash stride must be an int literal")
    else if (width.eval() == null || width.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("graft_winhash width must be >= 1 and non-null")
    else if (stride.eval() == null || stride.eval().asInstanceOf[Int] < 1)
      // stride 0 would make the window loop infinite
      TypeCheckResult.TypeCheckFailure("graft_winhash stride must be >= 1 and non-null")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    StructType(Seq(StructField("win_min", LongType), StructField("win_max", LongType)))

  override def nullable: Boolean = true
  override def prettyName: String = "graft_winhash"

  private lazy val w: Int = width.eval().asInstanceOf[Int]
  private lazy val st: Int = stride.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) return null
    WindowHashMinMax.minMax(t.asInstanceOf[UTF8String].toString, w, st)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tEv = text.genCode(ctx)
    val s = ctx.freshName("s")
    val n = ctx.freshName("n")
    val mn = ctx.freshName("mn")
    val mx = ctx.freshName("mx")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val h = ctx.freshName("h")
    val ww = w
    val ss = st
    val p = graft.ccm.DetHash.P
    val rowCls = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
    val cps = ctx.freshName("cps")
    val ci = ctx.freshName("ci")
    val off = ctx.freshName("off")
    val cp = ctx.freshName("cp")
    val len = ctx.freshName("len")
    ev.copy(code = code"""
      ${tEv.code}
      boolean ${ev.isNull} = true;
      InternalRow ${ev.value} = null;
      if (!${tEv.isNull}) {
        String $s = ${tEv.value}.toString();
        int $len = $s.length();
        int $n = $s.codePointCount(0, $len);
        if ($n >= $ww) {
          int[] $cps = new int[$n];
          int $ci = 0;
          int $off = 0;
          while ($off < $len) {
            int $cp = $s.codePointAt($off);
            $cps[$ci++] = $cp;
            $off += java.lang.Character.charCount($cp);
          }
          long $mn = Long.MAX_VALUE;
          long $mx = Long.MIN_VALUE;
          for (int $i = 0; $i + $ww <= $n; $i += $ss) {
            long $h = 0L;
            for (int $j = 0; $j < $ww; $j++) {
              $h = ($h * 31L + (long) $cps[$i + $j]) % ${p}L;
            }
            if ($h < $mn) $mn = $h;
            if ($h > $mx) $mx = $h;
          }
          ${ev.isNull} = false;
          ${ev.value} = new $rowCls(new Object[] {
            java.lang.Long.valueOf($mn), java.lang.Long.valueOf($mx) });
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression
  ): Expression = copy(text = newFirst, width = newSecond, stride = newThird)
}

/** All sliding-window polynomial hashes with positions:
  * `graft_winhashes(text, width, stride)` = array of the [[WindowHashMinMax]]
  * window hashes in offset order (element i = window at code-point offset
  * i*stride), so `posexplode` yields (position, hash) pairs — the shingle
  * relation of the exact-substring dedup family (`dedup_substring`).
  * EMPTY array (not NULL) for texts shorter than `width`, mirroring the
  * oracle's `generate_series(1, len-width+1)` being empty there (unnest
  * then drops the doc); NULL only for NULL input.
  */
case class WindowHashes(text: Expression, width: Expression, stride: Expression)
    extends TernaryExpression {

  override def first: Expression = text
  override def second: Expression = width
  override def third: Expression = stride

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"graft_winhashes expects a string, got ${text.dataType.sql}")
    else if (width.dataType != IntegerType || !width.foldable)
      TypeCheckResult.TypeCheckFailure("graft_winhashes width must be an int literal")
    else if (stride.dataType != IntegerType || !stride.foldable)
      TypeCheckResult.TypeCheckFailure("graft_winhashes stride must be an int literal")
    else if (width.eval() == null || width.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("graft_winhashes width must be >= 1 and non-null")
    else if (stride.eval() == null || stride.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("graft_winhashes stride must be >= 1 and non-null")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = text.nullable
  override def prettyName: String = "graft_winhashes"

  private lazy val w: Int = width.eval().asInstanceOf[Int]
  private lazy val st: Int = stride.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null
    else WindowHashes.hashWindows(t.asInstanceOf[UTF8String].toString, w, st)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tEv = text.genCode(ctx)
    ev.copy(code = code"""
      ${tEv.code}
      boolean ${ev.isNull} = ${tEv.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.WindowHashes.hashWindowsUtf8(${tEv.value}, $w, $st);
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression
  ): Expression = copy(text = newFirst, width = newSecond, stride = newThird)
}

/** Robust-winnowing minimizer fingerprints (Schleimer et al. 2003):
  * `graft_minimizers(text, width, w)` = struct(pos, h) of the windows
  * selected by sliding a w-length selection window over the stride-1
  * `width`-char window hashes and keeping each selection window's
  * RIGHTMOST minimum. Selection density ≈ 2/(w+1) of stride-1; any
  * shared substring of ≥ w + width - 1 chars yields a common selected
  * hash, and one of ≥ 2w + width - 1 chars yields TWO at the same
  * relative offset (selection depends only on window contents,
  * identical inside the run) — the same-diagonal candidate guarantee
  * `dedup_substring_banded` builds on. Positions are code-point offsets
  * of the window start (0-based, matching graft_winhashes' posexplode
  * minus 1... positions here are 0-based selected indices; only
  * DIFFERENCES of positions are consumed, so the base cancels).
  * EMPTY array for texts shorter than `width`; NULL only for NULL input.
  */
case class Minimizers(text: Expression, width: Expression, sel: Expression)
    extends TernaryExpression {

  override def first: Expression = text
  override def second: Expression = width
  override def third: Expression = sel

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"graft_minimizers expects a string, got ${text.dataType.sql}")
    else if (width.dataType != IntegerType || !width.foldable)
      TypeCheckResult.TypeCheckFailure("graft_minimizers width must be an int literal")
    else if (sel.dataType != IntegerType || !sel.foldable)
      TypeCheckResult.TypeCheckFailure("graft_minimizers selection window must be an int literal")
    else if (width.eval() == null || width.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("graft_minimizers width must be >= 1 and non-null")
    else if (sel.eval() == null || sel.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("graft_minimizers selection window must be >= 1 and non-null")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false), StructField("h", LongType, nullable = false))),
    containsNull = false
  )
  override def nullable: Boolean = text.nullable
  override def prettyName: String = "graft_minimizers"

  private lazy val w: Int = width.eval().asInstanceOf[Int]
  private lazy val sw: Int = sel.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null
    else Minimizers.select(t.asInstanceOf[UTF8String].toString, w, sw)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tEv = text.genCode(ctx)
    ev.copy(code = code"""
      ${tEv.code}
      boolean ${ev.isNull} = ${tEv.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.Minimizers.selectUtf8(${tEv.value}, $w, $sw);
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression
  ): Expression = copy(text = newFirst, width = newSecond, sel = newThird)
}

object Minimizers {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

  /** Hash every stride-1 window (the [[WindowHashes]] arithmetic), then
    * mark, for each selection window of `sel` consecutive window
    * positions, the rightmost position holding the minimum hash; emit
    * the marked hashes in position order.
    */
  def select(s: String, width: Int, sel: Int): ArrayData = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < width)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val m = n - width + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < width) {
        h = (h * 31L + cps(i + j).toLong) % graft.ccm.DetHash.P
        j += 1
      }
      hs(i) = h
      i += 1
    }
    val selected = new Array[Boolean](m)
    val lastWin = math.max(0, m - sel)
    i = 0
    while (i <= lastWin) {
      val end = math.min(i + sel, m)
      var best = i
      var j = i + 1
      while (j < end) {
        if (hs(j) <= hs(best)) best = j // rightmost min (robust winnowing)
        j += 1
      }
      selected(best) = true
      i += 1
    }
    var cnt = 0
    i = 0
    while (i < m) { if (selected(i)) cnt += 1; i += 1 }
    val out = new Array[Any](cnt)
    var k = 0
    i = 0
    while (i < m) {
      if (selected(i)) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i, hs(i))
        )
        k += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def selectUtf8(u: UTF8String, width: Int, sel: Int): ArrayData =
    select(u.toString, width, sel)
}

object WindowHashes {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

  /** One compiled pass: code points once, then the Horner hash per window
    * (same arithmetic as [[WindowHashMinMax.minMax]], all values kept).
    */
  def hashWindows(s: String, width: Int, stride: Int): ArrayData = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < width) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long]((n - width) / stride + 1)
    var i = 0
    var k = 0
    while (i + width <= n) {
      var h = 0L
      var j = 0
      while (j < width) {
        h = (h * 31L + cps(i + j).toLong) % graft.ccm.DetHash.P
        j += 1
      }
      out(k) = h
      k += 1
      i += stride
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def hashWindowsUtf8(u: UTF8String, width: Int, stride: Int): ArrayData =
    hashWindows(u.toString, width, stride)
}

object WindowHashMinMax {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** Interpreted twin of the codegen loop (also the spec's reference). */
  def minMax(s: String, width: Int, stride: Int): GenericInternalRow = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < width) return null
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var i = 0
    while (i + width <= n) {
      var h = 0L
      var j = 0
      while (j < width) {
        h = (h * 31L + cps(i + j).toLong) % graft.ccm.DetHash.P
        j += 1
      }
      if (h < mn) mn = h
      if (h > mx) mx = h
      i += stride
    }
    new GenericInternalRow(Array[Any](mn, mx))
  }
}
