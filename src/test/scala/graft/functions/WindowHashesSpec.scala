package graft.functions

import graft.SparkTestBase
import graft.ccm.DetHash
import org.apache.spark.sql.functions._

/** graft_winhashes (all window hashes with positions, the dedup_substring
  * shingle kernel): must equal the interpreted HOF formulation element by
  * element — same offsets, same code-point arithmetic, empty array below
  * width — on ASCII and multi-byte/supplementary-plane text.
  */
class WindowHashesSpec extends SparkTestBase {

  private def hofForm(width: Int, stride: Int) =
    expr(
      s"CASE WHEN length(text) >= $width THEN transform(sequence(1, length(text) - ${width - 1}, $stride), " +
        s"i -> ${DetHash.polyHashSparkSql(s"substring(text, i, $width)")}) " +
        s"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )

  private def check(texts: Seq[(Long, String)], width: Int, stride: Int): Unit = {
    val spark2 = spark
    import spark2.implicits._
    GraftFunctions.register(spark)
    val rows = texts.toDF("id", "text")
      .select(
        col("id"),
        expr(s"graft_winhashes(text, $width, $stride)").as("native"),
        hofForm(width, stride).as("hof")
      )
      .collect()
    rows.foreach { r =>
      val native = r.getSeq[Long](1)
      val hof = r.getSeq[Long](2)
      assert(native == hof, s"id=${r.getLong(0)}: $native != $hof")
    }
  }

  test("graft_winhashes equals the HOF formulation on random ASCII strings") {
    val rng = new scala.util.Random(7)
    val texts = (0 until 60).map { i =>
      val n = rng.nextInt(60) // straddles the width boundary, incl. empty
      (i.toLong, (0 until n).map(_ => (32 + rng.nextInt(95)).toChar).mkString)
    }
    check(texts, width = 8, stride = 1)
    check(texts, width = 24, stride = 3)
  }

  test("graft_winhashes equals the HOF formulation on multi-byte text") {
    val rng = new scala.util.Random(13)
    val alphabet: IndexedSeq[String] =
      ("abcXYZ".map(_.toString) ++ Seq("é", "ß", "日", "本", "語", "🌍", "🚀", "😀", "𝕊"))
    val texts = (0 until 60).map { i =>
      val n = rng.nextInt(20)
      (i.toLong, (0 until n).map(_ => alphabet(rng.nextInt(alphabet.size))).mkString)
    } ++ Seq((1000L, "🌍🚀😀𝕊🌍🚀😀𝕊🌍🚀😀𝕊"), (1001L, "日本語中日本語中"), (1002L, "🌍"))
    check(texts, width = 4, stride = 1)
  }
}
