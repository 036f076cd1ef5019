package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Winnowing-minimizer kernel pins (graft_minimizers): the selection
  * guarantee that any shared substring of >= sel + width - 1 chars
  * yields a common selected hash, density, and codegen/interpreted
  * agreement. (The dedup_substring_banded doc records the measured
  * NEGATIVE finding that doc-level minimizer banding does not pay on
  * this corpus shape — the kernel itself stays correct and available.)
  */
class MinimizersSpec extends SparkTestBase {

  private def minsOf(text: String, width: Int, sel: Int): Seq[(Int, Long)] = {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(text)
      .toDF("t")
      .select(explode(expr(s"graft_minimizers(t, $width, $sel)")).as("m"))
      .select(col("m.pos"), col("m.h"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .toSeq
  }

  test("selection guarantee: a shared run of >= sel+width-1 chars yields a common hash") {
    val run = "The quick brown fox jumps over the lazy dog again and again!" // 61 chars
    val a = "AAAA-prefix-one-" + run + "-suffix-alpha"
    val b = "completely different preamble text " + run + " and another tail"
    val (w, sel) = (24, 13)
    val ha = minsOf(a, w, sel).map(_._2).toSet
    val hb = minsOf(b, w, sel).map(_._2).toSet
    assert((ha intersect hb).nonEmpty, "61-char shared run must share a minimizer (guarantee is 36)")
  }

  test("density and determinism: ~2/(sel+1) of stride-1 windows, stable across evaluations") {
    val text = ('a' to 'z').mkString * 40 // 1040 chars, aperiodic enough via mixed casing below
    val salted = text.zipWithIndex.map { case (c, i) => if (i % 7 == 0) c.toUpper else c }.mkString
    val m1 = minsOf(salted, 24, 13)
    val m2 = minsOf(salted, 24, 13)
    assert(m1 == m2)
    val windows = salted.length - 24 + 1
    assert(m1.size < windows / 3, s"selected ${m1.size} of $windows — density should be ~2/14")
    assert(m1.map(_._1) == m1.map(_._1).sorted, "positions in order")
    // short-text edges
    assert(minsOf("tiny", 24, 13).isEmpty)
    assert(minsOf("x" * 24, 24, 13).size == 1)
  }
}
