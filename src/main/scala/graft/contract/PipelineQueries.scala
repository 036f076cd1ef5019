package graft.contract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ccm.DetHash
import graft.operators.PrefixSum

/** End-to-end training-corpus preparation operators over
  * `documents.parquet` — the composition layer on top of the text/dedup
  * primitives: quality filter → exact dedup → near-dup removal
  * (corpus_prep), curriculum bucketing by quality (quantile_bucket), and
  * context-window packing (pack_windows).
  *
  * Scale notes:
  *  - corpus_prep is three hash-shuffles (quality is a map-only stage, the
  *    exact-dedup window shuffles on prefix_hash, the LSH stage shuffles on
  *    band keys) — no stage is keyed on anything lower-cardinality than the
  *    data itself, so there is no driver or single-task funnel;
  *  - quantile_bucket and pack_windows both need a GLOBAL total order,
  *    which at scale must NOT be a single unpartitioned window — they run
  *    on [[graft.operators.PrefixSum]]'s two-phase range-partitioned scan
  *    (the one driver interaction is numPartitions totals — metadata);
  *  - every stage is whole-stage-codegen'd built-ins over [[DetHash]]
  *    integer arithmetic, so the DuckDB oracles match bit-for-bit.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  // -------------------------------------------------------------------
  // corpus_prep — per-doc disposition through the standard LLM-corpus
  // pipeline: quality gate, leading-content exact dedup (first 8 tokens'
  // hash, keep lowest doc_id), then near-dup removal over MinHash-LSH
  // candidate pairs (drop a doc iff a candidate partner with a smaller
  // doc_id survived the earlier stages — the deterministic keep-first
  // greedy; the full transitive version is dedup_cluster).
  // -------------------------------------------------------------------
  private val QualityThreshold = 0.9
  private val PrefixTokens = 8

  private val prefixHashSpark =
    DetHash.polyHashSparkSql(s"array_join(slice(split(text, ' '), 1, $PrefixTokens), ' ')")
  private val prefixHashDuck =
    DetHash.polyHashSql(s"array_to_string(list_slice(string_split(text, ' '), 1, $PrefixTokens), ' ')")

  private def corpusPrep(s: SparkSession, dir: String): DataFrame = {
    val base = TextQueries.qualityBase(docs(s, dir))
      .select(col("doc_id"), col("lang"), col("text"), col("n_tokens"), col("quality"))
    val qok = base.filter(col("quality") >= QualityThreshold)
    // one checkpoint serves both consumers (the LSH stage and the final
    // status join) — without it the window+hash subtree would re-execute
    // per consumer (self-join rule, see DedupQueries scaladoc)
    val exRanked = qok
      .withColumn("prefix_hash", expr(prefixHashSpark))
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy("prefix_hash").orderBy("doc_id")).cast("long")
      )
      .select("doc_id", "text", "rn")
      .localCheckpoint()
    val survivors = exRanked.filter(col("rn") === 1).select("doc_id", "text")
    // sig checkpointed before the band self-join (self-join rule): without
    // it the 8-permutation MinHash stage executes once per join side
    val bands = DedupQueries.bandsFrom(DedupQueries.minhashSigFrom(survivors).localCheckpoint())
    val nearDropped = bands
      .as("a")
      .join(
        bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .select(col("b.doc_id").as("doc_id"))
      .distinct()
      .withColumn("nd", lit(1))
    base
      .select("doc_id", "lang", "n_tokens", "quality")
      .join(exRanked.select("doc_id", "rn"), Seq("doc_id"), "left")
      .join(nearDropped, Seq("doc_id"), "left")
      .withColumn(
        "status",
        when(col("quality") < QualityThreshold, "low_quality")
          .when(col("rn") > 1, "exact_dup")
          .when(col("nd") === 1, "near_dup")
          .otherwise("kept")
      )
      .select("doc_id", "lang", "n_tokens", "status")
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val corpusPrepSql: String =
    s"""WITH ${TextQueries.qualityCteSql},
       |qok AS (SELECT doc_id, text FROM qc WHERE quality >= $QualityThreshold),
       |ex AS (SELECT doc_id, text,
       |         CAST(row_number() OVER (PARTITION BY $prefixHashDuck ORDER BY doc_id) AS BIGINT) AS rn
       |       FROM qok),
       |e AS (SELECT doc_id, text FROM ex WHERE rn = 1),
       |${DedupQueries.whDuckCteFrom("e")},
       |ds AS (SELECT doc_id, ${DedupQueries.shingleFromWhDuck} AS shh FROM dw),
       |sig AS (SELECT doc_id,
       |  ${DedupQueries.sigColsSql}
       |  FROM ds),
       |bands AS (
       |  ${DedupQueries.bandSelectSql}
       |),
       |nd AS (SELECT DISTINCT b.doc_id FROM bands a JOIN bands b
       |       ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
       |SELECT qc.doc_id, qc.lang, qc.n_tokens,
       |  CASE WHEN qc.quality < $QualityThreshold THEN 'low_quality'
       |       WHEN ex.rn > 1 THEN 'exact_dup'
       |       WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
       |       ELSE 'kept' END AS status
       |FROM qc
       |LEFT JOIN ex ON ex.doc_id = qc.doc_id
       |LEFT JOIN nd ON nd.doc_id = qc.doc_id
       |ORDER BY qc.doc_id""".stripMargin

  // -------------------------------------------------------------------
  // quantile_bucket — curriculum bucketing: global rank by (quality desc,
  // doc_id), k equal-frequency buckets via the rank formula
  // bucket = ((rank-1)*k) div N (same arithmetic on both engines — no
  // reliance on either engine's ntile tie rules). The global rank comes
  // from PrefixSum's two-phase scan, NOT a single-partition window.
  // -------------------------------------------------------------------
  private val NBuckets = 10

  private def quantileBucket(s: SparkSession, dir: String): DataFrame = {
    val q = TextQueries.qualityBase(docs(s, dir)).select("doc_id", "n_tokens", "quality")
    val nDocs = docs(s, dir).count() // driver scalar — metadata, like the oracle's subquery
    PrefixSum
      .runningSum(q, Seq(col("quality").desc, col("doc_id")), lit(1L), "rank")
      .withColumn("bucket", expr(s"((rank - 1) * $NBuckets) div $nDocs"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("quality")).as("q_min"),
        max(col("quality")).as("q_max"),
        sum(col("n_tokens")).as("tok_sum")
      )
      .transform(Norm.ordered(_, col("bucket")))
  }

  private val quantileBucketSql: String =
    s"""WITH ${TextQueries.qualityCteSql},
       |r AS (SELECT doc_id, n_tokens, quality,
       |        CAST(row_number() OVER (ORDER BY quality DESC, doc_id) AS BIGINT) AS rank
       |      FROM qc)
       |SELECT ((rank - 1) * $NBuckets) // (SELECT count(*) FROM documents) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  min(quality) AS q_min, max(quality) AS q_max,
       |  CAST(sum(n_tokens) AS BIGINT) AS tok_sum
       |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin

  // -------------------------------------------------------------------
  // pack_windows — context-window packing, exactly what LLM pretraining
  // does to a corpus: concatenate documents in a canonical order and cut
  // fixed-size token windows. A doc belongs to the window where it STARTS
  // (start offset = exclusive prefix sum of token counts). Output is the
  // per-window packing manifest.
  // -------------------------------------------------------------------
  private val WindowTokens = 512L

  private def packWindows(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    PrefixSum
      .runningSum(t, Seq(col("doc_id")), col("n_tokens"), "cum")
      .withColumn("window_id", expr(s"(cum - n_tokens) div $WindowTokens"))
      .groupBy("window_id")
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        sum(col("n_tokens")).as("win_tokens")
      )
      .transform(Norm.ordered(_, col("window_id")))
  }

  private val packWindowsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents
       |), c AS (
       |  SELECT doc_id, n_tokens,
       |         CAST(sum(n_tokens) OVER (ORDER BY doc_id
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM t
       |)
       |SELECT (cum - n_tokens) // $WindowTokens AS window_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       |  CAST(sum(n_tokens) AS BIGINT) AS win_tokens
       |FROM c GROUP BY 1 ORDER BY window_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_prep" -> corpusPrep,
    "quantile_bucket" -> quantileBucket,
    "pack_windows" -> packWindows
  )

  val oracle: Map[String, String] = Map(
    "corpus_prep" -> corpusPrepSql,
    "quantile_bucket" -> quantileBucketSql,
    "pack_windows" -> packWindowsSql
  )
}
