package graft.functions

import graft.SparkTestBase
import graft.ccm.DetHash
import org.apache.spark.sql.functions._

class WindowHashSpec extends SparkTestBase {

  private def hofForm(width: Int, stride: Int) =
    expr(
      s"CASE WHEN length(text) >= $width THEN transform(sequence(1, length(text) - ${width - 1}, $stride), " +
        s"i -> ${DetHash.polyHashSparkSql(s"substring(text, i, $width)")}) " +
        s"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )

  test("graft_winhash equals the interpreted HOF formulation on random ASCII strings") {
    val spark2 = spark
    import spark2.implicits._
    GraftFunctions.register(spark)
    val rng = new scala.util.Random(7)
    val texts = (0 until 60).map { i =>
      // lengths straddle the width-8 null boundary, incl. empty
      val n = rng.nextInt(40)
      (i.toLong, (0 until n).map(_ => (32 + rng.nextInt(95)).toChar).mkString)
    }
    val df = texts.toDF("id", "text")
      .select(
        col("id"),
        expr("graft_winhash(text, 8, 4)").as("native"),
        array_min(hofForm(8, 4)).as("hof_min"),
        array_max(hofForm(8, 4)).as("hof_max")
      )
      .collect()
    df.foreach { r =>
      val native = r.getStruct(1)
      if (native == null) {
        assert(r.isNullAt(2) && r.isNullAt(3), s"id=${r.getLong(0)}: HOF non-null where native null")
      } else {
        assert(native.getLong(0) == r.getLong(2), s"id=${r.getLong(0)} min mismatch")
        assert(native.getLong(1) == r.getLong(3), s"id=${r.getLong(0)} max mismatch")
      }
    }
  }

  test("graft_winhash equals the HOF formulation on multi-byte and supplementary-plane text") {
    val spark2 = spark
    import spark2.implicits._
    GraftFunctions.register(spark)
    // Spark's length/substring count CODE POINTS; supplementary-plane chars
    // (emoji) are 2 UTF-16 chars, so a charAt-based native impl would window
    // at the wrong offsets and split surrogate pairs. ADVICE r3.
    val rng = new scala.util.Random(13)
    val alphabet: IndexedSeq[String] =
      ("abcXYZ".map(_.toString) ++ Seq("é", "ß", "日", "本", "語", "中", "🌍", "🚀", "😀", "𝕊", "🇺🇸", "é", "é"))
    val texts = (0 until 80).map { i =>
      val n = rng.nextInt(30)
      (i.toLong, (0 until n).map(_ => alphabet(rng.nextInt(alphabet.size))).mkString)
    } ++ Seq((1000L, "🌍🚀😀𝕊🌍🚀😀𝕊🌍🚀😀𝕊"), (1001L, "日本語中日本語中"), (1002L, "🌍"))
    val rows = texts.toDF("id", "text")
      .select(
        col("id"),
        expr("graft_winhash(text, 8, 4)").as("native"),
        array_min(hofForm(8, 4)).as("hof_min"),
        array_max(hofForm(8, 4)).as("hof_max")
      )
      .collect()
    rows.foreach { r =>
      val native = r.getStruct(1)
      if (native == null) {
        assert(r.isNullAt(2) && r.isNullAt(3), s"id=${r.getLong(0)}: HOF non-null where native null")
      } else {
        assert(native.getLong(0) == r.getLong(2), s"id=${r.getLong(0)} min mismatch")
        assert(native.getLong(1) == r.getLong(3), s"id=${r.getLong(0)} max mismatch")
      }
    }
  }

  test("interpreted eval path matches the reference loop") {
    val s = "abcdefghijklmnop"
    val ref = WindowHashMinMax.minMax(s, 8, 4)
    // manual: windows at 0, 4, 8 (i + 8 <= 16)
    val hashes = Seq(0, 4, 8).map(i => DetHash.polyHash(s.substring(i, i + 8)))
    assert(ref.getLong(0) == hashes.min && ref.getLong(1) == hashes.max)
    assert(WindowHashMinMax.minMax("short", 8, 4) == null)
  }
}
