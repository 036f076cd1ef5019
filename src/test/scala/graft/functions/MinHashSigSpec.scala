package graft.functions

import graft.SparkTestBase
import graft.ccm.DetHash
import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkTestBase {

  private val P = DetHash.P
  private val whForm = s"transform(split(text, ' '), w -> ${DetHash.polyHashSparkSql("w")})"
  private val shingleForm =
    s"CASE WHEN size(wh) >= 3 THEN transform(sequence(0, size(wh) - 3), i -> " +
      s"((element_at(wh, i + 1) * 131 + element_at(wh, i + 2)) * 131 + element_at(wh, i + 3)) % $P) " +
      s"ELSE CAST(array() AS ARRAY<BIGINT>) END"

  test("graft_minhashsig equals the HOF shingle+array_min formulation incl. short docs") {
    val spark2 = spark
    import spark2.implicits._
    GraftFunctions.register(spark)
    val rng = new scala.util.Random(41)
    val words = Seq("the", "scan", "hash", "join", "row", "X", "batch")
    val texts = (0 until 100).map { i =>
      val n = rng.nextInt(10) // includes 0, 1, 2 words -> null signature
      (i.toLong, (0 until n).map(_ => words(rng.nextInt(words.size))).mkString(" "))
    }
    val hofCols = (0 until 8).map { k =>
      expr(s"array_min(transform(shh, h -> ${DetHash.minhashPermSql("h", k)}))").as(s"hof$k")
    }
    val rows = texts
      .toDF("id", "text")
      .select(col("id"), expr(whForm).as("wh"))
      .select(col("id"), col("wh"), expr(shingleForm).as("shh"))
      .select(col("id") +: expr("graft_minhashsig(wh, 8)").as("sig") +: hofCols: _*)
      .collect()
    rows.foreach { r =>
      val sig = if (r.isNullAt(1)) null else r.getSeq[Long](1)
      (0 until 8).foreach { k =>
        val hof = if (r.isNullAt(2 + k)) None else Some(r.getLong(2 + k))
        if (sig == null) assert(hof.isEmpty, s"id=${r.getLong(0)} k=$k: HOF non-null where native null")
        else assert(hof.contains(sig(k)), s"id=${r.getLong(0)} k=$k mismatch")
      }
    }
  }
}
