package graft.contract

import java.nio.file.Files

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** Regression tests for latent edge cases found in review: short/empty
  * documents (Spark's descending `sequence` trap), and as-of timestamp
  * ties. Queries run against a temp sfDir with adversarial fixtures.
  */
class EdgeCaseSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("edge_sf").toFile.getAbsolutePath
    Seq(
      (0L, "one two", "en", "src0", 7L),                     // 2 tokens, 7 chars
      (1L, "", "en", "src0", 0L),                            // empty text
      (2L, "a b c d e f g h i j k l m n o p", "de", "src1", 31L) // normal-ish
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_minhash survives documents with fewer than 3 tokens") {
    val sig = SparkEntry.queries("dedup_minhash")(spark, fixtureDir).collect()
    assert(sig.length == 3)
    // short/empty docs have empty shingle sets -> null minhashes
    val shortDoc = sig.find(_.getLong(0) == 0L).get
    assert(shortDoc.isNullAt(1))
    val normal = sig.find(_.getLong(0) == 2L).get
    assert(!normal.isNullAt(1))
  }

  test("doc_fingerprint survives texts shorter than the window") {
    val fp = SparkEntry.queries("doc_fingerprint")(spark, fixtureDir).collect()
    assert(fp.length == 3)
    val empty = fp.find(_.getLong(0) == 1L).get
    assert(empty.isNullAt(2) && empty.isNullAt(3)) // no windows -> null min/max
  }

  test("mm_frames emits zero frames for an empty payload, not phantom ones") {
    val frames = SparkEntry.queries("mm_frames")(spark, fixtureDir)
      .groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!frames.contains(1L)) // empty doc -> no frame rows at all
    assert(frames(0L) == 1L)     // 7 bytes -> one frame
  }

  test("dedup_ngram_jaccard and text_top_terms run on the adversarial fixture") {
    SparkEntry.queries("dedup_ngram_jaccard")(spark, fixtureDir).collect() // no crash
    assert(SparkEntry.queries("text_top_terms")(spark, fixtureDir).count() > 0)
  }

  test("evt_asof_purchase excludes a purchase at the SAME instant (strictly prior)") {
    val dir = Files.createTempDirectory("edge_evt").toFile.getAbsolutePath
    // ts stored as long nanos like the production read path surfaces it
    Seq(
      (1L, 1000000000L, 9L, "purchase", 1.0),
      (2L, 1000000000L, 9L, "click", 2.0), // same microsecond as the purchase
      (3L, 2000000000L, 9L, "click", 3.0)  // later -> sees the purchase
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("evt_asof_purchase")(spark, dir)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(rows(2L).isEmpty, "same-instant purchase must NOT be visible")
    assert(rows(3L).contains(1L), "later event must see the purchase")
    assert(rows(1L).isEmpty)
  }
}
