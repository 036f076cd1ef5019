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
      .runningSumPinned(q, Seq(col("quality").desc, col("doc_id")), lit(1L), "rank")
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
      .runningSumPinned(t, Seq(col("doc_id")), col("n_tokens"), "cum")
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

  // -------------------------------------------------------------------
  // contam_check — benchmark decontamination: flag training documents
  // whose word-3-gram shingles overlap a held-out benchmark set (source
  // 'src0' stands in for the eval suite). The benchmark shingle set is
  // DISTINCT and tiny relative to the corpus, so it broadcasts — the scan
  // over 100 TB of training docs is then map-side: explode, broadcast-hash
  // probe, partial-count. No training-side self-join anywhere.
  // -------------------------------------------------------------------
  private val BenchmarkSource = "src0"
  private val ContamThreshold = 0.2

  private def contamCheck(s: SparkSession, dir: String): DataFrame = {
    val sh = DedupQueries
      .shingled(s, dir)
      .select(col("doc_id"), col("source"), expr("array_distinct(shh)").as("sh"))
    val bench = sh
      .filter(col("source") === BenchmarkSource)
      .select(explode(col("sh")).as("h"))
      .distinct()
    val train = sh
      .filter(col("source") =!= BenchmarkSource)
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"), col("sh"))
      .localCheckpoint() // feeds the hit join AND the left-join base
    val hits = train
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .join(broadcast(bench), "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit"))
    train
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_contaminated", coalesce(col("n_hit"), lit(0L)))
      .withColumn(
        "contam_ratio",
        Norm.rnd(
          when(col("n_shingles") === 0, 0.0)
            .otherwise(col("n_contaminated") / col("n_shingles").cast("double")),
          6
        )
      )
      .withColumn("contaminated", col("contam_ratio") >= ContamThreshold)
      .select("doc_id", "n_shingles", "n_contaminated", "contam_ratio", "contaminated")
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val contamCheckSql: String =
    s"""WITH ${DedupQueries.whDuckCte},
       |ds AS (SELECT doc_id, source, list_distinct(${DedupQueries.shingleFromWhDuck}) AS sh FROM dw),
       |bench AS (SELECT DISTINCT unnest(sh) AS h FROM ds WHERE source = '$BenchmarkSource'),
       |train AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles, sh FROM ds
       |          WHERE source <> '$BenchmarkSource'),
       |tok AS (SELECT doc_id, unnest(sh) AS h FROM train),
       |hits AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hit
       |         FROM tok t JOIN bench b ON t.h = b.h GROUP BY 1),
       |scored AS (
       |  SELECT tr.doc_id, tr.n_shingles,
       |    COALESCE(h.n_hit, CAST(0 AS BIGINT)) AS n_contaminated,
       |    round(CASE WHEN tr.n_shingles = 0 THEN 0.0
       |               ELSE COALESCE(h.n_hit, 0) / CAST(tr.n_shingles AS DOUBLE) END, 6) + 0.0 AS contam_ratio
       |  FROM train tr LEFT JOIN hits h ON h.doc_id = tr.doc_id
       |)
       |SELECT doc_id, n_shingles, n_contaminated, contam_ratio,
       |       contam_ratio >= $ContamThreshold AS contaminated
       |FROM scored ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // split_leakage — the cross-split contamination audit: near-duplicate
  // pairs (the LSH band machinery, verbatim) whose two documents landed
  // in DIFFERENT train/val/test splits (the doc_split hash, verbatim).
  // A random-by-id split leaks near-dups across the boundary by
  // construction — this query is the measurement a pipeline runs before
  // trusting its eval numbers, and the reason production splits key on
  // CLUSTER id (dedup_cluster), not doc id. Candidates come per LSH
  // band bucket — never all-pairs — and the split labels attach by two
  // key joins; nothing in the composition adds a shuffle class the
  // primitives didn't already have.
  // -------------------------------------------------------------------
  private def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    val pairs = DedupQueries.lshPairsRaw(s, dir)
    val bucket = DetHash.rankHashCol(col("doc_id"), lit(1), lit(0), TextQueries.SplitSeed) % 100
    val splits = docs(s, dir)
      .select(
        col("doc_id"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split")
      )
    pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), Seq("doc_a"))
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"), col("n_shared_bands"))
      .transform(Norm.ordered(_, col("doc_a"), col("doc_b")))
  }

  // -------------------------------------------------------------------
  // split_cluster_safe — the FIX split_leakage measures the need for:
  // key the train/val/test split on the near-dup CLUSTER id (connected
  // components over the LSH pair graph; singletons keep their own id),
  // so both endpoints of every near-dup pair share a cluster, hence a
  // split, hence leaked_pairs = 0 BY CONSTRUCTION — and the oracle
  // proves the construction through its independent recursive-CTE
  // transitive closure. Output: per split, doc count, cluster count,
  // and the (zero) cross-split near-dup pair count — the manifest row
  // a pipeline records next to its eval numbers. Scale: the cluster
  // labels are the dedup_cluster relation (O(log n) star-contraction
  // path available); the split is one hash of the label; the audit is
  // the split_leakage join shape.
  // -------------------------------------------------------------------
  private def splitClusterSafe(s: SparkSession, dir: String): DataFrame = {
    val pairs = DedupQueries
      .lshPairsRaw(s, dir)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint() // feeds CC and the audit join
    val labels = graft.operators.ConnectedComponents
      .minLabelPropagation(pairs, 25)
      .select(col("vertex").as("doc_id"), col("component").as("cid"))
    val all = docs(s, dir)
      .select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cid"), col("doc_id")).as("cluster_id"))
    val bucket = DetHash.rankHashCol(col("cluster_id"), lit(1), lit(0), TextQueries.SplitSeed) % 100
    val splits = all
      .withColumn(
        "split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
      )
      .localCheckpoint() // feeds the per-split agg + both audit sides
    val leaks = pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
      .filter(col("sa") =!= col("sb"))
    val leakPerSplit = leaks
      .select(col("sa").as("split"))
      .unionByName(leaks.select(col("sb").as("split")))
      .groupBy("split")
      .agg(count(lit(1)).as("leaked_pairs"))
    splits
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("cluster_id")).as("n_clusters"))
      .join(leakPerSplit, Seq("split"), "left")
      .select(
        col("split"),
        col("n_docs"),
        col("n_clusters"),
        coalesce(col("leaked_pairs"), lit(0L)).as("leaked_pairs")
      )
      .transform(Norm.ordered(_, col("split")))
  }

  private val splitClusterSafeSql: String = {
    val bucket = s"(${DetHash.rankHashSql("cluster_id", "1", "0", TextQueries.SplitSeed)} % 100)"
    s"""WITH RECURSIVE ${DedupQueries.bandsCteSql},
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |),
       |sym AS (SELECT doc_a AS s, doc_b AS d FROM pairs
       |        UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(s, d) AS (
       |  SELECT s, s FROM (SELECT DISTINCT s FROM sym)
       |  UNION
       |  SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s
       |),
       |lbl AS (SELECT s AS doc_id, min(d) AS lid FROM reach GROUP BY 1),
       |allc AS (
       |  SELECT d.doc_id, COALESCE(l.lid, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN lbl l ON l.doc_id = d.doc_id
       |),
       |sp AS (
       |  SELECT doc_id, cluster_id,
       |    CASE WHEN $bucket < 80 THEN 'train' WHEN $bucket < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM allc
       |),
       |lk AS (
       |  SELECT a.split AS sa, b.split AS sb
       |  FROM pairs p JOIN sp a ON a.doc_id = p.doc_a JOIN sp b ON b.doc_id = p.doc_b
       |  WHERE a.split <> b.split
       |),
       |lkc AS (
       |  SELECT split, CAST(count(*) AS BIGINT) AS leaked_pairs
       |  FROM (SELECT sa AS split FROM lk UNION ALL SELECT sb AS split FROM lk) GROUP BY 1
       |),
       |ag AS (
       |  SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters
       |  FROM sp GROUP BY 1
       |)
       |SELECT ag.split, ag.n_docs, ag.n_clusters,
       |       COALESCE(l.leaked_pairs, CAST(0 AS BIGINT)) AS leaked_pairs
       |FROM ag LEFT JOIN lkc l ON l.split = ag.split
       |ORDER BY 1""".stripMargin
  }

  private val splitLeakageSql: String = {
    val bucket = s"(${DetHash.rankHashSql("doc_id", "1", "0", TextQueries.SplitSeed)} % 100)"
    s"""WITH ${DedupQueries.bandsCteSql},
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared_bands
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), sp AS (
       |  SELECT doc_id,
       |    CASE WHEN $bucket < 80 THEN 'train' WHEN $bucket < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM documents
       |)
       |SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b, p.n_shared_bands
       |FROM pairs p
       |JOIN sp sa ON p.doc_a = sa.doc_id
       |JOIN sp sb ON p.doc_b = sb.doc_id
       |WHERE sa.split <> sb.split
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // -------------------------------------------------------------------
  // sample_mixture — language-mixture rebalancing: given target mixture
  // weights (per-mille), find the LARGEST corpus achievable without
  // upsampling any language (cap = min over langs of n_l/w_l) and keep
  // each doc with probability w_l*cap/n_l via a deterministic hash
  // threshold. The scale shape is deliberate: unlike sample_stratified's
  // exact-count per-stratum rank (a per-stratum total order), the
  // threshold test is MAP-ONLY after a |langs|-row broadcast — the form
  // that survives 100 TB strata, trading exact per-stratum counts for
  // binomial-concentrated ones. Output is the per-language audit a
  // mixture job emits: corpus count, kept count, kept-id checksum.
  // -------------------------------------------------------------------
  private val MixTargetsMilli: Seq[(String, Int)] =
    Seq("en" -> 500, "de" -> 150, "zh" -> 150, "es" -> 100, "fr" -> 100)
  private val MixSeed = 271L

  private def sampleMixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir).select(col("doc_id"), col("lang"))
    val w = MixTargetsMilli.toDF("lang", "w_milli")
    // |langs| rows: corpus count per language + its target weight.
    val counts = d.groupBy("lang").agg(count(lit(1)).as("n_lang")).join(w, "lang")
    // The no-upsampling capacity: cap = min(n_l * 1000 / w_l), in docs.
    val cap = counts.agg(min(col("n_lang") * lit(1000.0) / col("w_milli")).as("cap"))
    // Integer keep-threshold per language on the DetHash range [0, P):
    // keep iff h < floor(min(1, w*cap/1000/n) * P). Float arithmetic is
    // confined to this |langs|-row relation, written in the same
    // operation order as the oracle so IEEE 754 makes it bit-identical.
    val thr = counts
      .crossJoin(cap)
      .select(
        col("lang"), col("n_lang"), col("w_milli"),
        floor(
          least(lit(1.0), col("w_milli") * col("cap") / lit(1000.0) / col("n_lang")) *
            lit(DetHash.P.toDouble)
        ).cast("long").as("thr")
      )
    val h = DetHash.rankHashCol(col("doc_id"), lit(7), lit(3), MixSeed)
    d.withColumn("h", h)
      .join(broadcast(thr), "lang")
      .filter(col("h") < col("thr"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("kept_id_sum")
      )
      .join(broadcast(thr.select(col("lang"), col("n_lang"), col("w_milli"))), "lang")
      .select(
        col("lang"),
        col("n_lang"),
        col("w_milli").cast("long").as("w_milli"),
        col("n_kept"),
        col("kept_id_sum")
      )
      .transform(Norm.ordered(_, col("lang")))
  }

  private val sampleMixtureSql: String = {
    val h = DetHash.rankHashSql("doc_id", "7", "3", MixSeed)
    val wRows = MixTargetsMilli.map { case (l, m) => s"('$l', $m)" }.mkString(", ")
    s"""WITH w(lang, w_milli) AS (VALUES $wRows),
       |counts AS (
       |  SELECT d.lang, CAST(count(*) AS BIGINT) AS n_lang, w.w_milli
       |  FROM documents d JOIN w ON d.lang = w.lang GROUP BY d.lang, w.w_milli
       |),
       |cap AS (SELECT min(n_lang * 1000.0 / w_milli) AS cap FROM counts),
       |thr AS (
       |  SELECT lang, n_lang, w_milli,
       |    CAST(floor(least(1.0, w_milli * cap / 1000.0 / n_lang) * ${DetHash.P}.0) AS BIGINT) AS thr
       |  FROM counts, cap
       |),
       |kept AS (
       |  SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept,
       |         CAST(sum(d.doc_id) AS BIGINT) AS kept_id_sum
       |  FROM documents d JOIN thr t ON d.lang = t.lang
       |  WHERE $h < t.thr
       |  GROUP BY d.lang
       |)
       |SELECT t.lang, t.n_lang, CAST(t.w_milli AS BIGINT) AS w_milli,
       |       k.n_kept, k.kept_id_sum
       |FROM kept k JOIN thr t ON k.lang = t.lang
       |ORDER BY t.lang""".stripMargin
  }

  // -------------------------------------------------------------------
  // sample_temperature — temperature-based multilingual rebalancing
  // (the exponential-smoothing mixture of XLM-R/mBERT): sampling weight
  // w_l ∝ (n_l/N)^α at α=0.5, realized as per-doc hash acceptance with
  // rate_l = (w_l/n_l) / max_m(w_m/n_m) — the no-upsampling normalization
  // (the rarest language keeps everything; big languages are damped
  // toward sqrt scale). Unlike sample_mixture's FIXED targets, the rates
  // here are DATA-DEPENDENT: float arithmetic is confined to the
  // |langs|-row relation and written as the same expression text on both
  // engines (IEEE-identical: sqrt and / are correctly rounded), then
  // folded into an integer DetHash threshold so the per-doc decision is
  // pure int64 compare — the map-only shape that survives 100-TB strata.
  // -------------------------------------------------------------------
  private val TempSeed = 331L

  private def sampleTemperature(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("lang"))
    val counts = d.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val total = counts.agg(sum(col("n_lang")).as("total_docs"))
    val wp = counts
      .crossJoin(total)
      .withColumn("wpn", expr("sqrt(CAST(n_lang AS DOUBLE) / total_docs) / n_lang"))
    val mx = wp.agg(max(col("wpn")).as("mx"))
    val thr = wp
      .crossJoin(mx)
      .select(
        col("lang"),
        col("n_lang"),
        (round(expr("wpn / mx"), 6) + lit(0.0)).as("rate"),
        expr(s"CAST(floor(wpn / mx * ${DetHash.P}.0) AS BIGINT)").as("thr")
      )
    val h = DetHash.rankHashCol(col("doc_id"), lit(9), lit(4), TempSeed)
    d.withColumn("h", h)
      .join(broadcast(thr), "lang")
      .filter(col("h") < col("thr"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
      .join(broadcast(thr.select("lang", "n_lang", "rate")), "lang")
      .select("lang", "n_lang", "rate", "n_kept", "kept_id_sum")
      .transform(Norm.ordered(_, col("lang")))
  }

  private val sampleTemperatureSql: String = {
    val h = DetHash.rankHashSql("doc_id", "9", "4", TempSeed)
    s"""WITH counts AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_lang FROM documents GROUP BY 1
       |),
       |total AS (SELECT CAST(sum(n_lang) AS BIGINT) AS total_docs FROM counts),
       |wp AS (
       |  SELECT lang, n_lang,
       |    sqrt(CAST(n_lang AS DOUBLE) / total_docs) / n_lang AS wpn
       |  FROM counts, total
       |),
       |mxr AS (SELECT max(wpn) AS mx FROM wp),
       |thr AS (
       |  SELECT lang, n_lang, round(wpn / mx, 6) + 0.0 AS rate,
       |    CAST(floor(wpn / mx * ${DetHash.P}.0) AS BIGINT) AS thr
       |  FROM wp, mxr
       |),
       |kept AS (
       |  SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept,
       |         CAST(sum(d.doc_id) AS BIGINT) AS kept_id_sum
       |  FROM documents d JOIN thr t ON d.lang = t.lang
       |  WHERE $h < t.thr
       |  GROUP BY d.lang
       |)
       |SELECT t.lang, t.n_lang, t.rate, k.n_kept, k.kept_id_sum
       |FROM kept k JOIN thr t ON k.lang = t.lang
       |ORDER BY t.lang""".stripMargin
  }

  // -------------------------------------------------------------------
  // corpus_curriculum — the training-ORDER manifest: easy→hard
  // curriculum over quality buckets with a deterministic shuffle INSIDE
  // each bucket (straight quality order would correlate adjacent
  // batches; the hash shuffle decorrelates them while keeping the
  // bucket progression). Composes the engine's own primitives: quality
  // quartile rank (PrefixSum two-phase global rank — no single-
  // partition window), [[graft.ccm.DetHash]] as the seeded in-bucket
  // shuffle key, and a second PrefixSum pass for the final ordinal.
  // Every ordering key is exact-integer; the output is the
  // (ordinal → doc) manifest a trainer would consume.
  // -------------------------------------------------------------------
  private val CurrSeed = 7L

  private def corpusCurriculum(s: SparkSession, dir: String): DataFrame = {
    val q = TextQueries.qualityBase(docs(s, dir)).select("doc_id", "n_tokens", "quality")
    val nDocs = docs(s, dir).count() // driver scalar — metadata, like the oracle's subquery
    val bucketed = PrefixSum
      .runningSumPinned(q, Seq(col("quality").desc, col("doc_id")), lit(1L), "rank")
      .withColumn("bucket", expr(s"((rank - 1) * $NBuckets) div $nDocs"))
      .withColumn("shuffle_key", DetHash.rankHashCol(col("doc_id"), lit(2), lit(0), CurrSeed))
    PrefixSum
      .runningSumPinned(bucketed, Seq(col("bucket").asc, col("shuffle_key").asc, col("doc_id").asc), lit(1L), "ordinal")
      .select(col("ordinal"), col("doc_id"), col("bucket"), col("shuffle_key"), col("n_tokens"))
      .transform(Norm.ordered(_, col("ordinal")))
  }

  private val corpusCurriculumSql: String = {
    val shuffleKey = DetHash.rankHashSql("doc_id", "2", "0", CurrSeed)
    s"""WITH ${TextQueries.qualityCteSql},
       |r AS (SELECT doc_id, n_tokens, quality,
       |        CAST(row_number() OVER (ORDER BY quality DESC, doc_id) AS BIGINT) AS rank
       |      FROM qc),
       |b AS (SELECT doc_id, n_tokens,
       |        ((rank - 1) * $NBuckets) // (SELECT count(*) FROM documents) AS bucket,
       |        $shuffleKey AS shuffle_key
       |      FROM r)
       |SELECT CAST(row_number() OVER (ORDER BY bucket, shuffle_key, doc_id) AS BIGINT) AS ordinal,
       |       doc_id, bucket, shuffle_key, n_tokens
       |FROM b
       |ORDER BY ordinal""".stripMargin
  }

  // -------------------------------------------------------------------
  // corpus_report — the one-row corpus DATASHEET (the summary table a
  // dataset card leads with): volume (docs / tokens / distinct tokens /
  // chars), composition (languages, sources), central tendency (exact
  // median doc length, mean quality), and duplication (exact-dup groups
  // and surplus docs, LSH candidate pairs). Pure composition of the
  // engine's own primitives — every figure is an integer aggregate or
  // an exact order statistic; the mean quality follows the ccm_boot_ci
  // rule (micro-integer sum, round(sm/n) where exact .5 boundaries are
  // binary-representable, THEN scale — never a 6-dp round of a
  // terminating decimal). Each component is one aggregation pass over
  // its own relation; the one-row results cross-join for free.
  // -------------------------------------------------------------------
  private def corpusReport(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val q = TextQueries.qualityBase(d).select("doc_id", "n_tokens", "quality")
    val vol = q.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      sum(expr("CAST(round(quality * 1000000.0) AS BIGINT)")).as("qm")
    )
    val chars = d.agg(sum(length(col("text")).cast("long")).as("n_chars"))
    val distinctToks = d
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w")).as("n_distinct_tokens"))
    val comp = d.agg(
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources")
    )
    // Exact median via the VALUE HISTOGRAM, not a global row_number over
    // every doc: groupBy(n_tokens) reduces the corpus to one row per
    // distinct doc length (bounded by the max doc length, corpus-size-
    // free), and the cumulative rank window runs over THAT — the global
    // sort touches hundreds of rows at any SF instead of every document
    // through one task. Rank straddle = the standard median identity:
    // value v holds ranks [lo, hi]; the median positions are (n+1)/2 and
    // (n+2)/2, averaged (equal when n is odd) — exactly the row_number
    // form's avg over the middle row(s), bit-for-bit (integer inputs,
    // one halving).
    val wV = Window.orderBy(col("n_tokens").asc).rowsBetween(Window.unboundedPreceding, 0)
    // checkpoint the (distinct-lengths-sized) histogram: both the rank
    // window AND the total-docs scalar derive from it, so the corpus is
    // scanned once — n is Σc over the histogram, not a second full
    // qualityBase pass (at 100 TB that second pass is a whole read of
    // documents for one scalar)
    val hist = q.groupBy("n_tokens").agg(count(lit(1)).as("c")).localCheckpoint()
    val medTok = hist
      .withColumn("hi", sum(col("c")).over(wV))
      .withColumn("lo", col("hi") - col("c") + 1L)
      .crossJoin(broadcast(hist.agg(sum(col("c")).cast("long").as("n"))))
      .agg(
        ((max(when(col("lo") <= expr("(n + 1) div 2") && col("hi") >= expr("(n + 1) div 2"), col("n_tokens")))
          + max(when(col("lo") <= expr("(n + 2) div 2") && col("hi") >= expr("(n + 2) div 2"), col("n_tokens"))))
          .cast("double") / 2.0 + 0.0).as("median_doc_tokens")
      )
    val dups = d
      .groupBy(DetHash.polyHashCol(col("text")).as("h"))
      .agg(count(lit(1)).as("n"))
      .agg(
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("exact_dup_groups"),
        sum(when(col("n") > 1, col("n") - 1).otherwise(0L)).as("exact_dup_surplus")
      )
    val lsh = DedupQueries.lshPairsRaw(s, dir).agg(count(lit(1)).as("lsh_candidate_pairs"))
    vol
      .crossJoin(chars)
      .crossJoin(distinctToks)
      .crossJoin(comp)
      .crossJoin(medTok)
      .crossJoin(dups)
      .crossJoin(lsh)
      .select(
        col("n_docs"),
        col("n_tokens"),
        col("n_distinct_tokens"),
        col("n_chars"),
        col("n_langs"),
        col("n_sources"),
        col("median_doc_tokens"),
        (expr("CAST(round(CAST(qm AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS BIGINT)").cast("double")
          / 1000000.0 + 0.0).as("mean_quality"),
        col("exact_dup_groups"),
        col("exact_dup_surplus"),
        col("lsh_candidate_pairs")
      )
  }

  private val corpusReportSql: String =
    s"""WITH ${TextQueries.qualityCteSql},
       |${DedupQueries.bandsCteSql},
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |),
       |vol AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |         CAST(sum(CAST(round(quality * 1000000.0) AS BIGINT)) AS BIGINT) AS qm
       |  FROM qc
       |),
       |medr AS (
       |  SELECT n_tokens,
       |         CAST(row_number() OVER (ORDER BY n_tokens, doc_id) AS BIGINT) AS rn,
       |         CAST(count(*) OVER () AS BIGINT) AS n
       |  FROM qc
       |),
       |med AS (
       |  SELECT avg(n_tokens) + 0.0 AS median_doc_tokens FROM medr
       |  WHERE rn >= (n + 1) // 2 AND rn <= (n + 2) // 2
       |),
       |dups AS (
       |  SELECT CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS exact_dup_groups,
       |         CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) AS exact_dup_surplus
       |  FROM (SELECT ${DetHash.polyHashSql("text")} AS h, count(*) AS n FROM documents GROUP BY 1)
       |)
       |SELECT v.n_docs, v.n_tokens,
       |  (SELECT CAST(count(DISTINCT w) AS BIGINT)
       |   FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)) AS n_distinct_tokens,
       |  (SELECT CAST(sum(length(text)) AS BIGINT) FROM documents) AS n_chars,
       |  (SELECT CAST(count(DISTINCT lang) AS BIGINT) FROM documents) AS n_langs,
       |  (SELECT CAST(count(DISTINCT source) AS BIGINT) FROM documents) AS n_sources,
       |  m.median_doc_tokens,
       |  CAST(CAST(round(CAST(v.qm AS DOUBLE) / CAST(v.n_docs AS DOUBLE)) AS BIGINT) AS DOUBLE)
       |    / 1000000.0 + 0.0 AS mean_quality,
       |  du.exact_dup_groups, du.exact_dup_surplus,
       |  (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS lsh_candidate_pairs
       |FROM vol v CROSS JOIN med m CROSS JOIN dups du""".stripMargin

  // -------------------------------------------------------------------
  // sample_repeat — EPOCH-WEIGHTED repetition sampling, the >1-epoch
  // counterpart of sample_mixture's keep/drop thresholding: a training
  // mixture that UPSAMPLES high-value sources runs some domains for 2–3
  // epochs while others see a fraction of one (the Llama/GPT data-mixing
  // recipe). Per source, weight w in per-mille epochs: every doc emits
  // floor(w) full copies unconditionally, plus one more iff its per-copy
  // DetHash draw clears the fractional threshold — so realized copies
  // concentrate binomially around n·w with NO per-stratum total order
  // (map-only after a |sources|-row broadcast, the mixture shape that
  // survives 100-TB strata). Output is the per-source audit: docs,
  // target per-mille, realized copies, and the copy-weighted id checksum
  // that pins every individual repeat decision into the hash compare.
  // -------------------------------------------------------------------
  private val RepeatMilliBySource: Seq[(String, Long)] =
    Seq("src0" -> 2300L, "src1" -> 1500L, "src2" -> 700L, "src3" -> 400L)
  private val RepeatDefaultMilli = 1000L
  private val RepeatSeed = 733L

  private def sampleRepeat(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = RepeatMilliBySource.toDF("source", "w_milli")
    val d = docs(s, dir)
      .select(col("doc_id"), col("source"))
      .join(broadcast(w), Seq("source"), "left")
      .withColumn("w_milli", coalesce(col("w_milli"), lit(RepeatDefaultMilli)))
    // copy c in 1..ceil(w): kept unconditionally while c <= floor(w);
    // the last (fractional) copy keeps iff h < (w mod 1000)/1000 * P.
    val fracThr = floor((col("w_milli") % 1000L).cast("double") / lit(1000.0) * lit(DetHash.P.toDouble))
      .cast("long")
    d.withColumn("n_full", expr("w_milli div 1000"))
      .withColumn("frac_thr", fracThr)
      .withColumn("copy_id", explode(sequence(lit(1L), col("n_full") + 1L)))
      .withColumn("h", DetHash.rankHashCol(col("doc_id"), col("copy_id"), lit(11L), RepeatSeed))
      .filter(col("copy_id") <= col("n_full") || col("h") < col("frac_thr"))
      .groupBy(col("source"))
      .agg(
        count_distinct(col("doc_id")).as("n_docs"),
        max(col("w_milli")).as("w_milli"),
        count(lit(1)).as("n_copies"),
        sum(col("doc_id") * col("copy_id")).as("copy_checksum")
      )
      .transform(Norm.ordered(_, col("source")))
  }

  private val sampleRepeatSql: String = {
    val weights = RepeatMilliBySource
      .map { case (src, w) => s"('$src', CAST($w AS BIGINT))" }
      .mkString(", ")
    s"""WITH w(source, w_milli) AS (VALUES $weights),
       |d AS (
       |  SELECT doc_id, dd.source,
       |         COALESCE(w.w_milli, $RepeatDefaultMilli) AS w_milli
       |  FROM documents dd LEFT JOIN w ON dd.source = w.source
       |), copies AS (
       |  SELECT doc_id, source, w_milli,
       |         w_milli // 1000 AS n_full,
       |         CAST(floor(CAST(w_milli % 1000 AS DOUBLE) / 1000.0 * ${DetHash.P.toDouble}) AS BIGINT) AS frac_thr,
       |         unnest(generate_series(1, w_milli // 1000 + 1)) AS copy_id
       |  FROM d
       |), kept AS (
       |  SELECT *, ${DetHash.rankHashSql("doc_id", "copy_id", "11", RepeatSeed)} AS h
       |  FROM copies
       |)
       |SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       max(w_milli) AS w_milli, CAST(count(*) AS BIGINT) AS n_copies,
       |       CAST(sum(doc_id * copy_id) AS BIGINT) AS copy_checksum
       |FROM kept
       |WHERE copy_id <= n_full OR h < frac_thr
       |GROUP BY source ORDER BY source""".stripMargin
  }

  // -------------------------------------------------------------------
  // pack_ffd — FIRST-FIT-DECREASING bin packing per source (context-
  // window packing with padding minimization — the efficiency audit
  // beside pack_windows' concatenate-and-cut): docs sorted by token
  // count descending, each placed into the first 512-token bin with
  // room, else a new bin. FFD is inherently sequential, so the fold is
  // the DECLARATIVE ARRAY FOLD (evt_holt technique) over the per-source
  // token list, with the first-fit index itself an inner fold over bin
  // loads (nested folds, the evt_pacf precedent); the inner index fold
  // runs over an EMPTY sequence when no bins exist yet (sequence(1,0)
  // DESCENDS — the known trap — so the empty case is made explicit).
  // Packing is per bounded SHARD (doc_id div 256 within source), then
  // aggregated per source — the production shape, and a MEASURED
  // necessity, not a style choice: the first cut packed whole sources
  // and went 0.44 → 118 s at 10× data (the fold is O(docs·bins) per
  // group — quadratic in group size); bounded shards make every fold
  // constant-cost and the shard count the only data-sized term
  // (re-measured 3.6 s at 10×). The trade is slightly more padding than
  // global FFD — exactly the trade real packers make, and the manifest
  // reports it against the per-source ceil(total/cap) lower bound.
  // -------------------------------------------------------------------
  private val FfdCap = 512L
  private val FfdShard = 256L

  private def packFfd(s: SparkSession, dir: String): DataFrame = {
    val idx =
      s"""aggregate(
         |  IF(size(acc) = 0, CAST(array() AS ARRAY<BIGINT>), sequence(1, size(acc))),
         |  CAST(-1 AS BIGINT),
         |  (f, i) -> IF(f >= 0, f, IF(element_at(acc, CAST(i AS INT)) + t <= $FfdCap, i, CAST(-1 AS BIGINT))))""".stripMargin
    val fold =
      s"""aggregate(
         |  toks,
         |  CAST(array() AS ARRAY<BIGINT>),
         |  (acc, t) -> IF(size(acc) = 0 OR $idx = -1,
         |                 concat(acc, array(t)),
         |                 transform(sequence(1, size(acc)),
         |                           i -> IF(i = $idx,
         |                                   element_at(acc, CAST(i AS INT)) + t,
         |                                   element_at(acc, CAST(i AS INT))))))""".stripMargin
    docs(s, dir)
      .select(
        col("source"),
        expr(s"doc_id div $FfdShard").as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")
      )
      .groupBy("source", "shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sort_array(collect_list(col("n_tokens")), asc = false).as("toks")
      )
      .withColumn("shard_bins", size(expr(fold)).cast("long"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_shards"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"),
        sum(col("shard_bins")).as("n_bins")
      )
      .select(
        col("source"),
        col("n_shards"),
        col("n_docs"),
        col("total_tokens"),
        col("n_bins"),
        expr(s"(total_tokens + ${FfdCap - 1}) div $FfdCap").as("bins_lower_bound"),
        (col("n_bins") * FfdCap - col("total_tokens")).as("padding_waste")
      )
      .transform(Norm.ordered(_, col("source")))
  }

  private val packFfdSql: String = {
    val idx =
      s"""list_reduce(
         |  list_prepend(CAST(-1 AS BIGINT), list_transform(range(1, len(acc) + 1), i -> i)),
         |  (f, i) -> CASE WHEN f >= 0 THEN f
         |                 WHEN acc[i] + e[1] <= $FfdCap THEN i
         |                 ELSE CAST(-1 AS BIGINT) END)""".stripMargin
    val fold =
      s"""list_reduce(
         |  list_prepend(CAST([] AS BIGINT[]), list_transform(toks, t -> [t])),
         |  (acc, e) -> CASE WHEN len(acc) = 0 OR $idx = -1
         |                   THEN list_concat(acc, [e[1]])
         |                   ELSE list_transform(range(1, len(acc) + 1),
         |                                       i -> CASE WHEN i = $idx THEN acc[i] + e[1] ELSE acc[i] END)
         |              END)""".stripMargin
    s"""WITH t AS (
       |  SELECT source, doc_id // $FfdShard AS shard,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), g AS (
       |  SELECT source, shard, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |         list_sort(list(n_tokens), 'DESC') AS toks
       |  FROM t GROUP BY 1, 2
       |), packed AS (
       |  SELECT source, n_docs, total_tokens, CAST(len($fold) AS BIGINT) AS shard_bins
       |  FROM g
       |), agg AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_shards,
       |         CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |         CAST(sum(total_tokens) AS BIGINT) AS total_tokens,
       |         CAST(sum(shard_bins) AS BIGINT) AS n_bins
       |  FROM packed GROUP BY 1
       |)
       |SELECT source, n_shards, n_docs, total_tokens, n_bins,
       |       (total_tokens + ${FfdCap - 1}) // $FfdCap AS bins_lower_bound,
       |       n_bins * $FfdCap - total_tokens AS padding_waste
       |FROM agg ORDER BY source""".stripMargin
  }

  // -------------------------------------------------------------------
  // sample_weighted — weight-proportional sampling WITHOUT replacement
  // (priority / sequential-Poisson sampling: Ohlsson's scheme, the form
  // Duffield et al. analyze as priority sampling): each doc draws
  // u ~ Uniform(0,1] from the seeded DetHash and gets priority w/u; the
  // top-K priorities per source are the sample. Unlike
  // sample_temperature's expected-count reweighting, this is the
  // production "pick exactly K docs, longer docs proportionally more
  // often" corpus draw. Scale shape: the priority is MAP-ONLY
  // arithmetic and the per-source top-K plans as WindowGroupLimit
  // (partial top-K map-side before the exchange — no full sort, no
  // data-proportional state; ScaleDesignPinSpec-style pin in
  // NewQueryPlanSpec). Parity: u = (h+1)/P with h exact int64, so
  // priority = (w·P)/(h+1) is ONE exact-int-derived IEEE division —
  // bit-identical ordering in both engines. The textbook exponential
  // key -ln(u)/w would be libm-dependent (the measured pow/ln trap);
  // w/u is monotone-equivalent to it rank-wise and needs no
  // transcendental. The output itself carries integers only.
  // -------------------------------------------------------------------
  private val WSampleK = 100
  private val WSampleSeed = 577L

  private def sampleWeighted(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("pri").desc, col("doc_id").asc)
    docs(s, dir)
      .select(
        col("source"),
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        DetHash.rankHashCol(col("doc_id"), lit(0L), lit(0L), WSampleSeed).as("h")
      )
      .withColumn("pri", (col("n_tokens") * lit(DetHash.P)).cast("double") / (col("h") + 1))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= WSampleK)
      .select(col("source"), col("rk"), col("doc_id"), col("n_tokens"), col("h"))
      .transform(Norm.ordered(_, col("source"), col("rk")))
  }

  private val sampleWeightedSql: String = {
    val h = DetHash.rankHashSql("doc_id", "0", "0", WSampleSeed)
    s"""WITH d AS (
       |  SELECT source, doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         $h AS h
       |  FROM documents
       |), r AS (
       |  SELECT source, doc_id, n_tokens, h,
       |         CAST(row_number() OVER (
       |           PARTITION BY source
       |           ORDER BY CAST(n_tokens * ${DetHash.P} AS DOUBLE) / (h + 1) DESC, doc_id
       |         ) AS BIGINT) AS rk
       |  FROM d
       |)
       |SELECT source, rk, doc_id, n_tokens, h FROM r
       |WHERE rk <= $WSampleK
       |ORDER BY source, rk""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_weighted" -> sampleWeighted,
    "pack_ffd" -> packFfd,
    "sample_repeat" -> sampleRepeat,
    "contam_check" -> contamCheck,
    "corpus_prep" -> corpusPrep,
    "corpus_curriculum" -> corpusCurriculum,
    "corpus_report" -> corpusReport,
    "quantile_bucket" -> quantileBucket,
    "pack_windows" -> packWindows,
    "sample_mixture" -> sampleMixture,
    "sample_temperature" -> sampleTemperature,
    "split_leakage" -> splitLeakage,
    "split_cluster_safe" -> splitClusterSafe
  )

  val oracle: Map[String, String] = Map(
    "sample_weighted" -> sampleWeightedSql,
    "pack_ffd" -> packFfdSql,
    "sample_repeat" -> sampleRepeatSql,
    "contam_check" -> contamCheckSql,
    "corpus_prep" -> corpusPrepSql,
    "corpus_curriculum" -> corpusCurriculumSql,
    "corpus_report" -> corpusReportSql,
    "quantile_bucket" -> quantileBucketSql,
    "pack_windows" -> packWindowsSql,
    "sample_mixture" -> sampleMixtureSql,
    "sample_temperature" -> sampleTemperatureSql,
    "split_leakage" -> splitLeakageSql,
    "split_cluster_safe" -> splitClusterSafeSql
  )
}
