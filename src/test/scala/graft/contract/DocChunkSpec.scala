package graft.contract

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** doc_chunk arithmetic guard: for every document, the chunk windows must
  * tile the token sequence exactly — first chunk starts at token 1, each
  * subsequent chunk starts one stride later, the last chunk ends at the
  * last token, and no chunk is empty. Verified against the real
  * documents table via the contract query's own (doc_id, chunk_id,
  * n_tokens) output.
  */
class DocChunkSpec extends SparkTestBase {
  private val Size = 64
  private val Stride = 48
  private val dir = "/root/testdata/sf0.001"

  test("chunks tile each document's token sequence exactly") {
    val chunks = SparkEntry
      .queries("doc_chunk")(spark, dir)
      .select("doc_id", "chunk_id", "n_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val docLens = Tables
      .documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(chunks.keySet == docLens.keySet, "every doc must produce chunks")
    chunks.foreach { case (docId, rows) =>
      val n = docLens(docId)
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq, s"doc $docId: gap in chunk ids")
      sorted.foreach { case (_, cid, len) =>
        assert(len > 0, s"doc $docId chunk $cid empty")
        val start = cid * Stride // 0-based
        val expectedLen = math.min(Size.toLong, n - start)
        assert(len == expectedLen, s"doc $docId chunk $cid: len $len != $expectedLen (n=$n)")
      }
      val (_, lastCid, lastLen) = sorted.last
      assert(lastCid * Stride + lastLen == n, s"doc $docId: last chunk must end at token $n")
      assert(lastCid == 0 || (lastCid - 1) * Stride + Size < n,
        s"doc $docId: chunk $lastCid would be redundant (previous chunk already reaches the end)")
    }
  }
}
