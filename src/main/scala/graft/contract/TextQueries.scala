package graft.contract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ccm.DetHash

/** Text-analysis operators over `documents.parquet` — the LLM-data-pipeline
  * surface (language ID, quality scoring, token counting, fingerprinting).
  *
  * Portability rules: tokens come from a literal single-space split (both
  * engines treat consecutive spaces identically); all scores are arithmetic
  * on integer counts so the double results are bit-identical across engines
  * before the final (cosmetic) rounding; hashes are [[DetHash.polyHash]].
  */
object TextQueries {
  private val P = DetHash.P

  /** The 31-word corpus vocabulary is shared across all langs, so language
    * ID is a deterministic marker-frequency heuristic (not recoverable truth
    * — the `lang` column is an independent label).
    */
  private val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "value"),
    "de" -> Seq("table", "row", "key"),
    "es" -> Seq("scan", "filter", "group"),
    "fr" -> Seq("join", "merge", "sort"),
    "zh" -> Seq("hash", "batch", "stream")
  )

  private val Stopwords = Seq("the", "a", "value", "key", "row")

  private def docs(s: SparkSession, dir: String): DataFrame = {
    // every text query may reach the codegen'd graft_* functions
    // (graft_ln idf/LM/KL series, graft_wordhashes, ...) — register once
    // per session here, the shared entry every builder goes through
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
  }

  // -------------------------------------------------------------------
  // text_stats — char/token counts + average token length.
  // -------------------------------------------------------------------
  private def textStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars_calc"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        col("n_chars_calc"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct_tokens"),
        Norm.rnd(
          expr("aggregate(toks, CAST(0 AS BIGINT), (a, t) -> a + length(t))")
            / size(col("toks")).cast("double"),
          6
        ).as("avg_token_len")
      )
      .transform(Norm.ordered(_, col("doc_id")))

  private val textStatsSql: String =
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars_calc,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
       |  round(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |          list_transform(string_split(text, ' '), t -> CAST(length(t) AS BIGINT))),
       |          (a, t) -> a + t)
       |        / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) + 0.0 AS avg_token_len
       |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // token_count — whitespace tokens + a BPE-ish regex tokenizer count
  // (letter runs | digit runs | single non-alnum) per doc.
  // -------------------------------------------------------------------
  private val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  private def tokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).cast("long").as("n_bpe_tokens")
      )
      .transform(Norm.ordered(_, col("doc_id")))

  private val tokenCountSql: String =
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       |  CAST(len(regexp_extract_all(text, '$BpePattern')) AS BIGINT) AS n_bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // lang_id — n-gram/marker-word heuristic language scores + argmax with a
  // fixed priority tie-break (en > de > es > fr > zh).
  // -------------------------------------------------------------------
  private def langId(s: SparkSession, dir: String): DataFrame = {
    val scoreCols = Markers.map { case (lang, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      expr(s"CAST(size(filter(toks, t -> t IN ($inList))) AS BIGINT)").as(s"s_$lang")
    }
    val langs = Markers.map(_._1)
    val pred = langs
      .dropRight(1)
      .foldRight(lit(langs.last)) { case (lang, elseCol) =>
        val ge = langs.filter(_ != lang).map(o => col(s"s_$lang") >= col(s"s_$o")).reduce(_ && _)
        when(ge, lit(lang)).otherwise(elseCol)
      }
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id") +: scoreCols: _*)
      .withColumn("pred_lang", pred)
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val langIdSql: String = {
    val scores = Markers
      .map { case (lang, ws) =>
        val inList = ws.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ($inList))) AS BIGINT) AS s_$lang"
      }
      .mkString(",\n  ")
    val langs = Markers.map(_._1)
    val caseChain = langs
      .dropRight(1)
      .map { lang =>
        val ge = langs.filter(_ != lang).map(o => s"s_$lang >= s_$o").mkString(" AND ")
        s"WHEN $ge THEN '$lang'"
      }
      .mkString("\n    ")
    s"""WITH sc AS (
       |  SELECT doc_id,
       |  $scores
       |  FROM documents
       |)
       |SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
       |  CASE $caseChain ELSE '${langs.last}' END AS pred_lang
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // quality_score — length/punctuation/stopword-ratio quality heuristic.
  // All inputs are integer counts, so the score is bit-identical across
  // engines before rounding.
  // -------------------------------------------------------------------
  /** (doc_id, lang, text, counts…, quality) over any documents-shaped
    * relation — the quality formula shared with the corpus-prep pipeline.
    */
  private[contract] def qualityBase(df: DataFrame): DataFrame = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    df.select(col("doc_id"), col("lang"), col("text"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        col("lang"),
        col("text"),
        length(col("text")).cast("long").as("n_chars_calc"),
        size(col("toks")).cast("long").as("n_tokens"),
        length(regexp_replace(col("text"), "[A-Za-z0-9 ]", "")).cast("long").as("punct_cnt"),
        expr(s"CAST(size(filter(toks, t -> t IN ($stopList))) AS BIGINT)").as("stop_cnt")
      )
      .withColumn(
        "quality",
        Norm.rnd(
          lit(0.4) * least(lit(1.0), col("n_tokens") / lit(50.0))
            + lit(0.3) * (lit(1.0) - least(lit(1.0), col("punct_cnt") * lit(5.0) / col("n_chars_calc")))
            + lit(0.3) * least(lit(1.0), col("stop_cnt") * lit(10.0) / col("n_tokens")),
          6
        )
      )
  }

  /** SQL twin of [[qualityBase]]: a `qc` CTE over `documents`. */
  private[contract] def qualityCteSql: String = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""qc AS (
       |  SELECT doc_id, lang, text, n_chars_calc, n_tokens, punct_cnt, stop_cnt,
       |    round(0.4 * least(1.0, n_tokens / 50.0)
       |        + 0.3 * (1.0 - least(1.0, punct_cnt * 5.0 / n_chars_calc))
       |        + 0.3 * least(1.0, stop_cnt * 10.0 / n_tokens), 6) + 0.0 AS quality
       |  FROM (
       |    SELECT doc_id, lang, text,
       |      CAST(length(text) AS BIGINT) AS n_chars_calc,
       |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |      CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS punct_cnt,
       |      CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS BIGINT) AS stop_cnt
       |    FROM documents
       |  )
       |)""".stripMargin
  }

  private def qualityScore(s: SparkSession, dir: String): DataFrame =
    qualityBase(docs(s, dir))
      .select("doc_id", "n_chars_calc", "n_tokens", "punct_cnt", "stop_cnt", "quality")
      .transform(Norm.ordered(_, col("doc_id")))

  private val qualityScoreSql: String =
    s"""WITH $qualityCteSql
       |SELECT doc_id, n_chars_calc, n_tokens, punct_cnt, stop_cnt, quality
       |FROM qc ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // doc_fingerprint — whole-doc polynomial hash + min/max of rolling
  // 8-char window hashes (winnowing-style document fingerprint).
  // -------------------------------------------------------------------
  private def fingerprint(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    docs(s, dir)
      .select(
        col("doc_id"),
        DetHash.polyHashCol(col("text")).as("full_hash"),
        // native codegen rolling-window hash (graft.functions.WindowHash):
        // one compiled nested loop per doc instead of two interpreted HOF
        // lambdas per window; NULL struct for texts shorter than the
        // window, so win_min/max are NULL on both sides like the oracle's
        // min/max over an empty generate_series
        expr("graft_winhash(text, 8, 4)").as("wh")
      )
      .select(
        col("doc_id"),
        col("full_hash"),
        col("wh.win_min").as("win_min_hash"),
        col("wh.win_max").as("win_max_hash")
      )
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val fingerprintSql: String =
    s"""SELECT doc_id,
       |  ${DetHash.polyHashSql("text")} AS full_hash,
       |  list_min(list_transform(generate_series(1, length(text) - 7, 4),
       |           i -> ${DetHash.polyHashSql("substr(text, CAST(i AS INTEGER), 8)")})) AS win_min_hash,
       |  list_max(list_transform(generate_series(1, length(text) - 7, 4),
       |           i -> ${DetHash.polyHashSql("substr(text, CAST(i AS INTEGER), 8)")})) AS win_max_hash
       |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // text_top_terms — top-5 terms per lang by frequency (explode + count +
  // per-group window top-k; WindowGroupLimit keeps it a partial top-k).
  // -------------------------------------------------------------------
  private def topTerms(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs(s, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy("lang", "term")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("term").asc)
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("lang", "rank", "term", "cnt")
      .transform(Norm.ordered(_, col("lang"), col("rank")))
  }

  private val topTermsSql: String =
    """WITH counts AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
      |), agg AS (
      |  SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt FROM counts GROUP BY 1, 2
      |), ranked AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS BIGINT) AS rank
      |  FROM agg
      |)
      |SELECT lang, rank, term, cnt FROM ranked WHERE rank <= 5 ORDER BY lang, rank""".stripMargin

  // -------------------------------------------------------------------
  // text_tfidf — per-document top term by tf-idf (tf * ln(N/df)).
  // Ranking uses the ROUNDED score: mathematically equal scores (e.g.
  // 2*ln(10) vs ln(100)) can differ by an ulp between engines' ln — the
  // rounded comparison makes cross-engine ordering identical, with the
  // term as the deterministic tie-break.
  // -------------------------------------------------------------------
  private def tfidf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val nDocs = d.count() // tiny metadata (driver-side count, same as oracle's scalar subquery)
    val terms = d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df_ = terms.select("doc_id", "term").distinct().groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
    tf.join(df_, "term")
      .withColumn("score", Norm.rnd(col("tf") * expr(s"graft_ln(${nDocs.toDouble}D / df)"), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("term").as("top_term"), col("tf"), col("df"), col("score"))
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val tfidfSql: String =
    s"""WITH terms AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |), tf AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM terms GROUP BY 1, 2
      |), dfreq AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1
      |), scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
      |         round(tf.tf * ${ExactLn.duck("(SELECT CAST(count(*) AS DOUBLE) FROM documents) / dfreq.df")}, 6) + 0.0 AS score
      |  FROM tf JOIN dfreq ON tf.term = dfreq.term
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn FROM scored
      |)
      |SELECT doc_id, term AS top_term, tf, df, score FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // doc_split — deterministic train/val/test split (80/10/10): the
  // canonical training-data op. Bucket = DetHash permutation of doc_id
  // mod 100 — a pure function of the row's id, so the split is stable
  // across runs, engines, and repartitioning (df.randomSplit is none of
  // those), and a later incremental batch lands in the same buckets.
  // -------------------------------------------------------------------
  private[contract] val SplitSeed = 42L

  private def docSplit(s: SparkSession, dir: String): DataFrame = {
    import graft.ccm.DetHash
    val bucket = DetHash.rankHashCol(col("doc_id"), lit(1), lit(0), SplitSeed) % 100
    docs(s, dir)
      .select(col("doc_id"), bucket.as("bucket"))
      .withColumn(
        "split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test")
      )
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val docSplitSql: String = {
    import graft.ccm.DetHash
    val bucket = s"(${DetHash.rankHashSql("doc_id", "1", "0", SplitSeed)} % 100)"
    s"""SELECT doc_id, $bucket AS bucket,
       |  CASE WHEN $bucket < 80 THEN 'train' WHEN $bucket < 90 THEN 'val' ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // text_bm25 — BM25 relevance (k1 = 1.2, b = 0.75) of every document
  // against a fixed query-term set; top-20 by rounded score. Corpus
  // statistics (N, total tokens) are two driver scalars — metadata, like
  // the oracle's scalar subqueries; ranking compares the ROUNDED score
  // with doc_id tie-break so cross-engine ln/sum ulp differences cannot
  // reorder the cut (same device as text_tfidf). The top-k is
  // orderBy+limit = TakeOrderedAndProject (per-partition heap, no global
  // sort).
  // -------------------------------------------------------------------
  private val BmK1 = 1.2
  private val BmB = 0.75
  private val BmTopK = 20
  private val BmQuery = Seq("the", "scan", "hash", "join", "table")

  private def bm25(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    val stats = d.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot")).collect()(0)
    val nDocs = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / nDocs.toDouble // same division the oracle performs
    val tf = d
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(BmQuery: _*))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val score =
      expr(s"graft_ln((${nDocs.toDouble}D - df + 0.5D) / (df + 0.5D) + 1.0D)") *
        (col("tf") * lit(BmK1 + 1.0)) /
        (col("tf") + lit(BmK1) * (lit(1.0) - lit(BmB) + lit(BmB) * col("dl") / lit(avgdl)))
    tf.join(dfq, "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), Norm.rnd(sum(score), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(BmTopK)
  }

  private val bm25Sql: String = {
    val terms = BmQuery.map(t => s"'$t'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM documents
       |), stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE) AS tot FROM t
       |), terms AS (
       |  SELECT doc_id, dl, unnest(toks) AS term FROM t
       |), tf AS (
       |  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM terms WHERE term IN ($terms) GROUP BY 1, 2, 3
       |), dfq AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
       |), scored AS (
       |  SELECT tf.doc_id,
       |    ${ExactLn.duck("((SELECT n FROM stats) - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0")}
       |      * (tf.tf * ${BmK1 + 1.0})
       |      / (tf.tf + $BmK1 * (1.0 - $BmB + $BmB * tf.dl / ((SELECT tot FROM stats) / (SELECT n FROM stats)))) AS score
       |  FROM tf JOIN dfq ON tf.term = dfq.term
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms, round(sum(score), 6) + 0.0 AS bm25
       |FROM scored GROUP BY 1 ORDER BY bm25 DESC, doc_id LIMIT $BmTopK""".stripMargin
  }

  // -------------------------------------------------------------------
  // text_repetition — Gopher-style repetition signals: duplicate-word /
  // duplicate-2-gram / duplicate-3-gram fractions and the most-frequent-
  // word fraction. Everything is computed INSIDE the row from the token
  // array (no explode, no shuffle): the scale-correct shape for per-doc
  // corpus filtering — a 100 TB corpus maps each document once and emits
  // five numbers. All fractions are ratios of integer counts, so the
  // doubles are bit-identical across engines before rounding.
  //
  // Spark trap: `sequence(1, 0)` DESCENDS ([1, 0]) instead of returning
  // empty — every gram builder is guarded by a CASE on the word count.
  // -------------------------------------------------------------------
  private def grams(n: Int): (String, String) = {
    val sparkParts = (0 until n).map(k => s"element_at(ws, i + $k)").mkString(", ' ', ")
    val duckParts = (0 until n).map(k => s"ws[i + $k]").mkString(" || ' ' || ")
    (
      s"CASE WHEN nw >= $n THEN transform(sequence(1, CAST(nw AS INT) - ${n - 1}), i -> concat($sparkParts)) ELSE array() END",
      s"CASE WHEN nw >= $n THEN list_transform(generate_series(1, CAST(nw AS INTEGER) - ${n - 1}), i -> $duckParts) ELSE [] END"
    )
  }

  private def dupFrac(arr: String, distinctFn: String, lenFn: String): String =
    s"CASE WHEN $lenFn($arr) = 0 THEN 0.0 ELSE " +
      s"CAST($lenFn($arr) - $lenFn($distinctFn($arr)) AS DOUBLE) / CAST($lenFn($arr) AS DOUBLE) END"

  /** All five signals come out of ONE native pass per row
    * ([[graft.functions.RepStats]]); the gram totals are nw-1 / nw-2 by
    * construction, so only the distinct counts need the scan. The portable
    * HOF formulation (array_distinct + a filter-count per distinct word)
    * is what the oracle still runs.
    */
  private def textRepetition(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    def frac(total: String, distinct: String) =
      s"CASE WHEN $total <= 0 THEN 0.0 ELSE CAST($total - $distinct AS DOUBLE) / CAST($total AS DOUBLE) END"
    docs(s, dir)
      .select(col("doc_id"), expr("graft_repstats(text)").as("r"))
      .select(
        col("doc_id"),
        col("r.nw").as("n_words"),
        Norm.rnd(expr(frac("r.nw", "r.dw")), 6).as("dup_word_frac"),
        Norm.rnd(expr(frac("(r.nw - 1)", "r.d2")), 6).as("dup_2gram_frac"),
        Norm.rnd(expr(frac("(r.nw - 2)", "r.d3")), 6).as("dup_3gram_frac"),
        Norm.rnd(col("r.mw").cast("double") / col("r.nw").cast("double"), 6).as("top_word_frac")
      )
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val textRepetitionSql: String = {
    val (_, g2d) = grams(2)
    val (_, g3d) = grams(3)
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
       |  FROM documents
       |), g AS (
       |  SELECT doc_id, ws, nw, $g2d AS g2, $g3d AS g3 FROM t
       |)
       |SELECT doc_id, nw AS n_words,
       |  round(${dupFrac("ws", "list_distinct", "len")}, 6) + 0.0 AS dup_word_frac,
       |  round(${dupFrac("g2", "list_distinct", "len")}, 6) + 0.0 AS dup_2gram_frac,
       |  round(${dupFrac("g3", "list_distinct", "len")}, 6) + 0.0 AS dup_3gram_frac,
       |  round(CAST(list_max(list_transform(list_distinct(ws), w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE)
       |        / CAST(nw AS DOUBLE), 6) + 0.0 AS top_word_frac
       |FROM g ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // text_lm_score — CCNet-style unigram language-model scoring: MLE word
  // probabilities from the corpus itself, per-doc mean negative
  // log-likelihood as the quality/typicality signal (high = unusual
  // vocabulary). The vocabulary is CAPPED to the top-K words by frequency
  // (deterministic (count desc, word) order) with every out-of-vocabulary
  // token scored by the pooled <unk> mass (total OOV count / N) — exactly
  // what production LM scoring does, and what makes the broadcast BOUNDED
  // BY CONSTRUCTION (VERDICT r6 item 5: an uncapped Heaps-law vocabulary
  // reaches 1e8-1e9 types at 100 TB of web text and a forced hint there
  // is an executor OOM). Top-K via orderBy+limit = distributed
  // TakeOrderedAndProject, not a single-partition window. The scan side
  // is explode + broadcast-hash-join + one per-doc agg — no all-pairs
  // anything. ln() parity with DuckDB is established by text_bm25.
  // K = 16 < the gate corpora's 31-word vocabulary, so the OOV path is
  // genuinely exercised under the hash gate.
  // -------------------------------------------------------------------
  private val LmVocabTopK = 16

  private def lmScore(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val vocabK = toks
      .groupBy("w")
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(LmVocabTopK)
      .localCheckpoint() // feeds the OOV-mass scalar AND the scoring join
    val total = toks.count() // corpus size: one scalar, computed once
    // pooled <unk> count: every OOV token shares this mass (floored at 1
    // so a zero-OOV corpus cannot produce log(0))
    val inVocab = vocabK.agg(sum(col("c"))).head().getLong(0)
    val oovC = math.max(total - inVocab, 1L)
    toks
      .join(broadcast(vocabK), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        Norm.rnd(
          sum(-expr(s"graft_ln(CAST(coalesce(c, ${oovC}L) AS DOUBLE) / ${total.toDouble}D)"))
            / count(lit(1)),
          6
        ).as("lm_nll")
      )
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val lmScoreSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
       |), counts AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1
       |), vocab AS (
       |  SELECT w, c FROM counts ORDER BY c DESC, w LIMIT $LmVocabTopK
       |), total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
       |oov AS (
       |  SELECT greatest((SELECT n FROM total) - sum(c), 1) AS oc FROM vocab
       |)
       |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  round(sum(-(${ExactLn.duck("CAST(coalesce(v.c, (SELECT oc FROM oov)) AS DOUBLE) / CAST((SELECT n FROM total) AS DOUBLE)")})) / count(*), 6) + 0.0 AS lm_nll
       |FROM toks t LEFT JOIN vocab v ON t.w = v.w
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  // -------------------------------------------------------------------
  // text_bigram_lm — interpolated bigram language model (Jelinek-Mercer
  // smoothing): p(w2|w1) = λ·c(w1w2)/c(w1·) + (1−λ)·c(w2)/N, per-doc mean
  // negative log-likelihood over bigrams — the sequence-aware upgrade of
  // text_lm_score's unigram typicality signal (KenLM-style filtering in
  // corpus pipelines). The unigram relations (bigram-start, unigram) are
  // vocabulary-bounded and broadcast; the bigram count relation shuffles
  // (bigram types grow ~linearly with corpus size).
  // c(w1·) counts bigram STARTS, not unigrams — each doc's last token
  // continues nothing, and the two differ exactly there.
  // -------------------------------------------------------------------
  private val LmLambda = 0.9

  private def bigramLm(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), split(col("text"), " ").as("ws"))
    val bg = d
      .filter(size(col("ws")) >= 2)
      .select(
        col("doc_id"),
        explode(expr(
          "transform(sequence(1, size(ws) - 1), i -> named_struct('w', element_at(ws, i), 'w2', element_at(ws, i + 1)))"
        )).as("b")
      )
      .select(col("doc_id"), col("b.w").as("w"), col("b.w2").as("w2"))
      .localCheckpoint() // feeds the count relations AND the scoring scan
    val toks = d.select(col("doc_id"), explode(col("ws")).as("w"))
    val big = bg.groupBy("w", "w2").agg(count(lit(1)).as("c12"))
    val starts = bg.groupBy("w").agg(count(lit(1)).as("c1"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c2")).withColumnRenamed("w", "w2")
    val total = toks.count() // corpus token count: one scalar
    val p = lit(LmLambda) * col("c12").cast("double") / col("c1").cast("double") +
      lit(1.0 - LmLambda) * col("c2").cast("double") / lit(total.toDouble)
    // graft_ln: IEEE-only series, bit-identical to the oracle's ExactLn tree
    val pLn = expr(
      s"graft_ln($LmLambda" + "D * CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) + " +
        s"${1.0 - LmLambda}D * CAST(c2 AS DOUBLE) / ${total.toDouble}D)"
    )
    // NO broadcast hints anywhere (VERDICT r6 item 5): bigram TYPES grow
    // near-linearly with the corpus (Heaps' law) and even unigram types
    // grow ~N^0.5± — at 100 TB of web text (typos, numbers, code) the
    // unigram vocabulary reaches 1e8-1e9 rows, so a FORCED hint on
    // `starts`/`uni` is an executor OOM too. All three joins key on
    // (w)/(w2)/(w, w2); AQE still broadcasts any side that is actually
    // small at runtime. (text_lm_score shows the other fix: a top-K+OOV
    // vocabulary that is bounded by construction and safely hintable.)
    bg.join(big, Seq("w", "w2"))
      .join(starts, Seq("w"))
      .join(uni, Seq("w2"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        Norm.rnd(sum(-pLn) / count(lit(1)), 6).as("bigram_nll")
      )
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val bigramLmSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |), bg0 AS (
       |  SELECT doc_id, unnest(list_transform(range(len(ws) - 1), i ->
       |           struct_pack(w := ws[i + 1], w2 := ws[i + 2]))) AS b
       |  FROM d
       |), bg AS (
       |  SELECT doc_id, b.w AS w, b.w2 AS w2 FROM bg0
       |), toks AS (
       |  SELECT doc_id, unnest(ws) AS w FROM d
       |), big AS (
       |  SELECT w, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2
       |), starts AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY 1
       |), uni AS (
       |  SELECT w AS w2, CAST(count(*) AS BIGINT) AS c2 FROM toks GROUP BY 1
       |), total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks)
       |SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  round(sum(-(${ExactLn.duck(s"$LmLambda * CAST(big.c12 AS DOUBLE) / CAST(starts.c1 AS DOUBLE) + ${1.0 - LmLambda} * CAST(uni.c2 AS DOUBLE) / (SELECT n FROM total)")}))
       |        / count(*), 6) + 0.0 AS bigram_nll
       |FROM bg
       |JOIN big ON big.w = bg.w AND big.w2 = bg.w2
       |JOIN starts ON starts.w = bg.w
       |JOIN uni ON uni.w2 = bg.w2
       |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin

  // -------------------------------------------------------------------
  // doc_chunk — overlapping token-window chunking (context/RAG prep):
  // each doc splits into windows of ChunkSize tokens advancing by
  // ChunkStride (16-token overlap); the last window may be short. Chunk
  // count derives from INTEGER arithmetic (truncation-vs-floor safe
  // after greatest(0, ·)), and the emitted chunk content is pinned by
  // its poly hash rather than shipping the text. Scale: explode fans out
  // inside the doc's partition — no shuffle until a consumer asks for
  // one; at 100 TB this is the map-only pre-tokenization pass.
  // -------------------------------------------------------------------
  private val ChunkSize = 64
  private val ChunkStride = 48

  private def docChunk(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn(
        "chunk_id",
        // integer `div`: trunc-vs-floor divergence only occurs for n < 17,
        // where greatest(0, ·) pins both engines to 0
        explode(
          sequence(
            lit(0L),
            expr(s"greatest(CAST(0 AS BIGINT), CAST(n - $ChunkSize + $ChunkStride - 1 AS BIGINT) div $ChunkStride)")
          )
        )
      )
      .withColumn(
        "chunk",
        slice(col("toks"), (col("chunk_id") * ChunkStride + 1).cast("int"), lit(ChunkSize))
      )
      .select(
        col("doc_id"),
        col("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        graft.ccm.DetHash.polyHashCol(array_join(col("chunk"), " ")).as("chunk_hash")
      )
      .transform(Norm.ordered(_, col("doc_id"), col("chunk_id")))

  private val docChunkSql: String = {
    val slice = s"toks[CAST(chunk_id * $ChunkStride + 1 AS BIGINT) : CAST(chunk_id * $ChunkStride + $ChunkSize AS BIGINT)]"
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks, len(string_split(text, ' ')) AS n
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, toks,
       |         unnest(generate_series(CAST(0 AS BIGINT),
       |           greatest(CAST(0 AS BIGINT), CAST((n - $ChunkSize + $ChunkStride - 1) AS BIGINT) // $ChunkStride))) AS chunk_id
       |  FROM t
       |)
       |SELECT doc_id, chunk_id,
       |  CAST(len($slice) AS BIGINT) AS n_tokens,
       |  ${graft.ccm.DetHash.polyHashSql(s"array_to_string($slice, ' ')")} AS chunk_hash
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // text_source_divergence — distribution drift per corpus slice:
  // KL(P_source || P_corpus) over unigram distributions. No smoothing
  // is needed because every source word is by construction in the
  // corpus distribution (support(P_s) ⊆ support(P)). The per-source and
  // corpus totals ride 1-row/`#sources`-row relations (cross/equi join,
  // auto-broadcast) — no collect. The KL sum is a per-source sum of
  // ~thousands of tiny doubles; combine-order noise is ~1e-12, rounded
  // at 6. At 100 TB this is two shuffles on the word key + one tiny
  // join — the standard "is this week's crawl drifting?" probe.
  // -------------------------------------------------------------------
  private def sourceDivergence(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val bySrcWord = toks.groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
    val byWord = toks.groupBy("w").agg(count(lit(1)).as("c_w"))
    val bySrc = toks.groupBy("source").agg(count(lit(1)).as("n_s"))
    val total = toks.agg(count(lit(1)).as("n_all"))
    bySrcWord
      .join(byWord, "w")
      .join(bySrc, "source")
      .crossJoin(total)
      .withColumn("p", col("c_sw").cast("double") / col("n_s"))
      .withColumn("q", col("c_w").cast("double") / col("n_all"))
      .groupBy("source")
      .agg(
        first(col("n_s")).as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        Norm.rnd(sum(col("p") * expr("graft_ln(p / q)")), 6).as("kl_vs_corpus")
      )
      .transform(Norm.ordered(_, col("source")))
  }

  private val sourceDivergenceSql: String =
    s"""WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
      |), sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c_sw FROM toks GROUP BY 1, 2),
      |cw AS (SELECT w, CAST(count(*) AS BIGINT) AS c_w FROM toks GROUP BY 1),
      |ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM toks GROUP BY 1),
      |na AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM toks)
      |SELECT sw.source, any_value(ns.n_s) AS n_tokens,
      |  CAST(count(*) AS BIGINT) AS vocab_size,
      |  round(sum((CAST(c_sw AS DOUBLE) / n_s) * ${ExactLn.duck("(CAST(c_sw AS DOUBLE) / n_s) / (CAST(c_w AS DOUBLE) / n_all)")}), 6) + 0.0 AS kl_vs_corpus
      |FROM sw JOIN cw ON sw.w = cw.w JOIN ns ON sw.source = ns.source CROSS JOIN na
      |GROUP BY sw.source ORDER BY sw.source""".stripMargin

  // -------------------------------------------------------------------
  // text_inverted_index — posting-list construction, the retrieval-side
  // counterpart of text_tfidf/text_bm25's scoring: per term, document
  // frequency, total occurrences, and the posting list head (first
  // PostingsCap doc ids, ascending). The cap is explicit and in the
  // column name: an UNCAPPED collect per term is the classic 100 TB
  // failure (a stopword's posting list is the corpus); real indexes
  // shard postings by (term, doc-range). df/n_occur stay exact — they
  // are partial-aggregating counts, not collects.
  // -------------------------------------------------------------------
  private val PostingsCap = 64

  private def invertedIndex(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term")
      .agg(
        countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("n_occur"),
        array_join(slice(sort_array(collect_set(col("doc_id"))), 1, PostingsCap), ",")
          .as("postings_head")
      )
      .transform(Norm.ordered(_, col("term")))

  private val invertedIndexSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
       |)
       |SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       |  CAST(count(*) AS BIGINT) AS n_occur,
       |  array_to_string(list_sort(list(DISTINCT doc_id))[1:$PostingsCap], ',') AS postings_head
       |FROM toks GROUP BY term ORDER BY term""".stripMargin

  // -------------------------------------------------------------------
  // text_phrase_search — positional-index phrase lookup: for each query
  // phrase "w1 w2", intersect the two words' postings on (doc, adjacent
  // position). Both sides of the intersection are the token stream
  // PRE-FILTERED by a broadcast of the phrase words (map-side semi
  // filter), so the join input is |postings of queried words|, not the
  // corpus — the posting-intersection shape search engines run. Phrases
  // with no hits stay in the output via the left join (count 0).
  // -------------------------------------------------------------------
  private val Phrases: Seq[(String, String, String)] = Seq(
    ("customer join", "customer", "join"),
    ("merge group", "merge", "group"),
    ("part filter", "part", "filter"),
    ("scan scan", "scan", "scan"),
    ("table hash", "table", "hash")
  )

  private def phraseSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ph = Phrases.toDF("phrase", "w1", "w2")
    val pos = docs(s, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
    val hits = pos.as("a")
      .join(broadcast(ph), col("a.term") === col("w1"))
      .join(
        pos.as("b"),
        col("b.doc_id") === col("a.doc_id") &&
          col("b.pos") === col("a.pos") + 1 && col("b.term") === col("w2")
      )
      .groupBy("phrase")
      .agg(
        countDistinct(col("a.doc_id")).as("n_docs"),
        count(lit(1)).as("n_occur")
      )
    ph.select("phrase")
      .join(hits, Seq("phrase"), "left")
      .select(
        col("phrase"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_occur"), lit(0L)).as("n_occur")
      )
      .transform(Norm.ordered(_, col("phrase")))
  }

  private val phraseSearchSql: String = {
    val rows = Phrases.map { case (p, a, b) => s"('$p', '$a', '$b')" }.mkString(", ")
    s"""WITH ph(phrase, w1, w2) AS (VALUES $rows),
       |toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |pos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos FROM toks
       |),
       |hits AS (
       |  SELECT ph.phrase, CAST(count(DISTINCT a.doc_id) AS BIGINT) AS n_docs,
       |         CAST(count(*) AS BIGINT) AS n_occur
       |  FROM ph
       |  JOIN pos a ON a.term = ph.w1
       |  JOIN pos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.term = ph.w2
       |  GROUP BY ph.phrase
       |)
       |SELECT ph.phrase, CAST(coalesce(h.n_docs, 0) AS BIGINT) AS n_docs,
       |       CAST(coalesce(h.n_occur, 0) AS BIGINT) AS n_occur
       |FROM ph LEFT JOIN hits h ON ph.phrase = h.phrase
       |ORDER BY ph.phrase""".stripMargin
  }

  // -------------------------------------------------------------------
  // text_collocations — collocation mining by POINTWISE LIFT (the PMI
  // exponential: lift = N·c(w1w2) / (c(w1)·c(w2)), PMI = log2(lift)):
  // adjacent-token pairs whose corpus frequency beats the independence
  // expectation. The log is deliberately NOT taken — lift carries the
  // identical ranking and stays a single double division of exact int64
  // products (log2 would drag libm in). Pairs below CollMinCount are
  // pruned BEFORE the unigram joins (the classic support threshold —
  // it also bounds the scored relation, so the top-k window sees only
  // frequent-pair candidates, never the long bigram tail). Unigram
  // denominators use TOKEN counts (not bigram starts — the standard
  // collocation formulation).
  // -------------------------------------------------------------------
  private val CollMinCount = 5
  private val CollTopK = 50

  private def collocations(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir).select(col("doc_id"), split(col("text"), " ").as("ws"))
    val toks = d.select(explode(col("ws")).as("w")).localCheckpoint() // feeds uni counts + N
    val bg = d
      .filter(size(col("ws")) >= 2)
      .select(
        explode(expr(
          "transform(sequence(1, size(ws) - 1), i -> named_struct('w1', element_at(ws, i), 'w2', element_at(ws, i + 1)))"
        )).as("b")
      )
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val big = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12")).filter(col("c12") >= CollMinCount)
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val total = toks.agg(count(lit(1)).as("n"))
    val scored = big
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(total))
      .withColumn("lift", (col("n") * col("c12")).cast("double") / (col("c1") * col("c2")).cast("double"))
    val w = Window.orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= CollTopK)
      .select(
        col("rank"),
        col("w1"),
        col("w2"),
        col("c12"),
        col("c1"),
        col("c2"),
        (round(col("lift"), 6) + 0.0).as("lift")
      )
      .transform(Norm.ordered(_, col("rank")))
  }

  private val collocationsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |), toks AS (
       |  SELECT unnest(ws) AS w FROM d
       |), bg AS (
       |  SELECT b.w1 AS w1, b.w2 AS w2
       |  FROM (SELECT unnest(list_transform(range(len(ws) - 1), i ->
       |                 struct_pack(w1 := ws[i + 1], w2 := ws[i + 2]))) AS b
       |        FROM d WHERE len(ws) >= 2)
       |), big AS (
       |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2
       |  HAVING count(*) >= $CollMinCount
       |), uni AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1
       |), total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
       |scored AS (
       |  SELECT b.w1, b.w2, b.c12, u1.c AS c1, u2.c AS c2,
       |         CAST(t.n * b.c12 AS DOUBLE) / CAST(u1.c * u2.c AS DOUBLE) AS lift
       |  FROM big b
       |  JOIN uni u1 ON b.w1 = u1.w
       |  JOIN uni u2 ON b.w2 = u2.w
       |  CROSS JOIN total t
       |)
       |SELECT CAST(row_number() OVER (ORDER BY lift DESC, w1, w2) AS BIGINT) AS rank,
       |       w1, w2, c12, c1, c2, round(lift, 6) + 0.0 AS lift
       |FROM scored
       |QUALIFY rank <= $CollTopK
       |ORDER BY rank""".stripMargin

  // -------------------------------------------------------------------
  // text_keyphrases — RAKE keyphrase extraction (Rose et al. 2010):
  // candidate phrases are MAXIMAL RUNS of non-stopword tokens (stopwords
  // are the delimiters), each word scores deg(w)/freq(w) over the
  // candidate corpus (deg = Σ phrase length over the word's phrase
  // occurrences — long-phrase membership raises a word's score; freq =
  // occurrence count), and a phrase scores the sum of its words'
  // ratios. Identical phrase texts share one corpus-wide score (deg and
  // freq are corpus-level), so the output groups by phrase text with
  // its occurrence count; top RakeTopK by (score desc, phrase). The
  // phrase-sum is accumulated in integer MICRO-UNITS of the per-word
  // ratio (round(deg·1e6/freq) — one double division then exact integer
  // sums; a double Σ of ratios would be aggregation-order-sensitive).
  // Segmentation is one window pass per doc (running stopword count =
  // phrase id — the sessionize shape applied to token streams).
  // -------------------------------------------------------------------
  private val RakeTopK = 50
  private val RakeMinWords = 2
  private val RakeMinOccur = 2

  private def keyphrases(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    val toks = docs(s, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "w")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("w"))
      .withColumn("stop", expr(s"w IN ($stopList)"))
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val seg = toks
      .withColumn("pid", sum(when(col("stop"), 1L).otherwise(0L)).over(wDoc))
      .filter(!col("stop"))
      .select("doc_id", "pid", "pos", "w")
      .localCheckpoint() // feeds phrase texts, word stats, and phrase scores
    val plens = seg.groupBy("doc_id", "pid").agg(count(lit(1)).as("plen"))
    val wstats = seg
      .join(plens, Seq("doc_id", "pid"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("micro", expr("CAST(round(deg * 1000000.0 / freq) AS BIGINT)"))
    val scored = seg
      .join(wstats.select("w", "micro"), Seq("w"))
      .groupBy("doc_id", "pid")
      .agg(
        expr("array_join(transform(array_sort(collect_list(struct(pos, w))), x -> x.w), ' ')").as("phrase"),
        count(lit(1)).as("plen"),
        sum(col("micro")).as("score_micro")
      )
      .filter(col("plen") >= RakeMinWords)
    val byPhrase = scored
      .groupBy("phrase")
      .agg(
        count(lit(1)).as("n_occur"),
        first(col("plen")).as("n_words"),
        first(col("score_micro")).as("score_micro")
      )
      .filter(col("n_occur") >= RakeMinOccur)
    val w = Window.orderBy(col("score_micro").desc, col("phrase").asc)
    byPhrase
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= RakeTopK)
      .select(
        col("rank"),
        col("phrase"),
        col("n_words"),
        col("n_occur"),
        (round(col("score_micro").cast("double") / 1000000.0, 6) + 0.0).as("score")
      )
      .transform(Norm.ordered(_, col("rank")))
  }

  private val keyphrasesSql: String = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH t0 AS (
       |  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS w
       |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
       |), toks AS (
       |  SELECT doc_id, CAST(pos AS BIGINT) AS pos, w, w IN ($stopList) AS stop FROM t0
       |), seg AS (
       |  SELECT doc_id, pos, w,
       |         sum(CASE WHEN stop THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY pos) AS pid
       |  FROM toks
       |  QUALIFY NOT stop
       |), plens AS (
       |  SELECT doc_id, pid, CAST(count(*) AS BIGINT) AS plen FROM seg GROUP BY 1, 2
       |), wstats AS (
       |  SELECT s.w, CAST(count(*) AS BIGINT) AS freq, CAST(sum(p.plen) AS BIGINT) AS deg
       |  FROM seg s JOIN plens p ON s.doc_id = p.doc_id AND s.pid = p.pid
       |  GROUP BY 1
       |), wmicro AS (
       |  SELECT w, CAST(round(deg * 1000000.0 / freq) AS BIGINT) AS micro FROM wstats
       |), scored AS (
       |  SELECT s.doc_id, s.pid,
       |         string_agg(s.w, ' ' ORDER BY s.pos) AS phrase,
       |         CAST(count(*) AS BIGINT) AS plen,
       |         CAST(sum(m.micro) AS BIGINT) AS score_micro
       |  FROM seg s JOIN wmicro m ON s.w = m.w
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $RakeMinWords
       |), by_phrase AS (
       |  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occur,
       |         min(plen) AS n_words, min(score_micro) AS score_micro
       |  FROM scored GROUP BY 1
       |  HAVING count(*) >= $RakeMinOccur
       |)
       |SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, phrase) AS BIGINT) AS rank,
       |       phrase, n_words, n_occur,
       |       round(CAST(score_micro AS DOUBLE) / 1000000.0, 6) + 0.0 AS score
       |FROM by_phrase
       |QUALIFY rank <= $RakeTopK
       |ORDER BY rank""".stripMargin
  }

  // -------------------------------------------------------------------
  // text_langid_eval — the EVALUATION layer for lang_id (the
  // dedup_lsh_quality / ann_recall_eval methodology applied to the
  // classifier): the documents table carries GOLD language labels, so
  // the marker-word predictor can be scored against truth — full
  // confusion matrix (gold × predicted, with each cell's share of its
  // gold row) plus the per-gold-language recall. Same score/argmax
  // expressions as lang_id VERBATIM (the eval measures the shipped
  // predictor, not a reimplementation); shares are exact-int ratios.
  // MEASURED FINDING (sf0.01): per-language recall 0.12–0.21 ≈ the
  // 1-in-5 chance line — the synthetic corpus draws its `lang` labels
  // independently of the word soup, so marker words carry no signal
  // here (the vec_knn_classify finding's text-side twin; on real
  // multilingual text the same eval is the predictor's report card).
  // -------------------------------------------------------------------
  private def langIdEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scoreCols = Markers.map { case (lang, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      expr(s"CAST(size(filter(toks, t -> t IN ($inList))) AS BIGINT)").as(s"s_$lang")
    }
    val langs = Markers.map(_._1)
    val pred = langs
      .dropRight(1)
      .foldRight(lit(langs.last)) { case (lang, elseCol) =>
        val ge = langs.filter(_ != lang).map(o => col(s"s_$lang") >= col(s"s_$o")).reduce(_ && _)
        when(ge, lit(lang)).otherwise(elseCol)
      }
    val wTrue = Window.partitionBy("true_lang")
    docs(s, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
      .select(col("doc_id") +: col("lang") +: scoreCols: _*)
      .withColumn("pred_lang", pred)
      .groupBy(col("lang").as("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lang_total", sum(col("n")).over(wTrue))
      .withColumn(
        "recall",
        round(
          sum(when(col("true_lang") === col("pred_lang"), col("n")).otherwise(0L)).over(wTrue)
            .cast("double") / col("lang_total").cast("double"),
          6
        ) + 0.0
      )
      .select(
        col("true_lang"),
        col("pred_lang"),
        col("n"),
        col("lang_total"),
        (round(col("n").cast("double") / col("lang_total").cast("double"), 6) + 0.0).as("share"),
        col("recall")
      )
      .transform(Norm.ordered(_, col("true_lang"), col("pred_lang")))
  }

  private val langIdEvalSql: String = {
    val scores = Markers
      .map { case (lang, ws) =>
        val inList = ws.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ($inList))) AS BIGINT) AS s_$lang"
      }
      .mkString(",\n  ")
    val langs = Markers.map(_._1)
    val caseChain = langs
      .dropRight(1)
      .map { lang =>
        val ge = langs.filter(_ != lang).map(o => s"s_$lang >= s_$o").mkString(" AND ")
        s"WHEN $ge THEN '$lang'"
      }
      .mkString("\n    ")
    s"""WITH sc AS (
       |  SELECT doc_id, lang,
       |  $scores
       |  FROM documents
       |), pr AS (
       |  SELECT lang AS true_lang, CASE $caseChain ELSE '${langs.last}' END AS pred_lang FROM sc
       |), cm AS (
       |  SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n FROM pr GROUP BY 1, 2
       |)
       |SELECT true_lang, pred_lang, n,
       |       CAST(sum(n) OVER (PARTITION BY true_lang) AS BIGINT) AS lang_total,
       |       round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY true_lang) AS DOUBLE), 6) + 0.0 AS share,
       |       round(CAST(sum(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END) OVER (PARTITION BY true_lang) AS DOUBLE)
       |             / CAST(sum(n) OVER (PARTITION BY true_lang) AS DOUBLE), 6) + 0.0 AS recall
       |FROM cm
       |ORDER BY true_lang, pred_lang""".stripMargin
  }

  // -------------------------------------------------------------------
  // text_bpe_pairs — the counting step of ONE byte-pair-encoding merge
  // iteration (the inner loop of BPE tokenizer training): every
  // adjacent CHARACTER pair inside every word occurrence, counted
  // corpus-wide, top BpeTopK by frequency. substring(w, i, 2) emits the
  // pair directly (no concat of two probes); at training scale the same
  // plan runs over the word-frequency table (count-weighted) instead of
  // raw occurrences — here occurrences ARE the weights. Integer counts
  // only; deterministic (cnt desc, pair asc) ranking.
  // -------------------------------------------------------------------
  private val BpeTopK = 30

  private def bpePairs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
    val counts = pairs.groupBy("pair").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("cnt").desc, col("pair").asc)
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= BpeTopK)
      .select(col("rank"), col("pair"), col("cnt"))
      .transform(Norm.ordered(_, col("rank")))
  }

  private val bpePairsSql: String =
    s"""WITH words AS (
       |  SELECT unnest(string_split(text, ' ')) AS w FROM documents
       |), pairs AS (
       |  SELECT unnest(list_transform(range(length(w) - 1), i -> substr(w, i + 1, 2))) AS pair
       |  FROM words WHERE length(w) >= 2
       |), counts AS (
       |  SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM pairs GROUP BY 1
       |)
       |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rank, pair, cnt
       |FROM counts
       |QUALIFY rank <= $BpeTopK
       |ORDER BY rank""".stripMargin

  // -------------------------------------------------------------------
  // text_bpe_train — THREE FULL ROUNDS of byte-pair-encoding merge
  // training (the loop text_bpe_pairs only counts one step of): per
  // round, (1) count adjacent symbol pairs corpus-wide, (2) pick the
  // most frequent pair (count DESC, pair ASC — BPE's random tie is made
  // deterministic), (3) rewrite every word by the greedy left-to-right
  // merge of that pair. The merge is the genuinely sequential part and
  // runs as the declarative ARRAY FOLD (the evt_holt technique): the
  // accumulator is the word's merged-symbol prefix, and a match against
  // the pair collapses the last symbol — newly created symbols cannot
  // chain within the round (last(acc) becomes the merged text ≠ left),
  // which IS BPE's non-overlapping greedy semantics. Driver state per
  // round is ONE collected row (the argmax pair — the k-means-centroid
  // license); words stay distributed and re-checkpoint per round. The
  // oracle unrolls the three rounds as MATERIALIZED CTEs with the
  // DuckDB list-state fold (1-element-list elements, the measured
  // struct-contamination workaround). Output: the merge table a
  // tokenizer trainer emits — rank, pair, its count when chosen, and
  // the corpus symbol total after applying it (≠ count when
  // occurrences overlap, e.g. "aaa").
  // -------------------------------------------------------------------
  private val BpeTrainRounds = 3

  /** The WORD-FREQUENCY table BPE training folds over — package-visible
    * so ScaleDesignPinSpec can pin the scale lever structurally: this is
    * the ONLY corpus-sized pass in the trainer (one explode + one
    * vocabulary groupBy), and every later round runs over it.
    */
  private[graft] def bpeWords(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("wcnt"))
      .select(expr("split(w, '')").as("syms"), col("wcnt"))

  private[graft] def bpeEsc(x: String): String =
    x.replace("\\", "\\\\").replace("'", "\\'")

  /** One greedy merge rewrite round over the vocabulary relation —
    * package-visible so ScaleDesignPinSpec can pin that a round is
    * MAP-ONLY (no Exchange, no Join: the fold rides the vocabulary
    * rows; nothing corpus-sized ever shuffles inside the loop).
    */
  private[graft] def bpeMergeRound(words: DataFrame, l: String, r: String): DataFrame = {
    val merged = l + r
    val mergeExpr =
      s"""aggregate(
         |  slice(syms, 2, size(syms) - 1),
         |  array(element_at(syms, 1)),
         |  (acc, s2) -> IF(element_at(acc, -1) = '${bpeEsc(l)}' AND s2 = '${bpeEsc(r)}',
         |                  concat(slice(acc, 1, size(acc) - 1), array('${bpeEsc(merged)}')),
         |                  concat(acc, array(s2))))""".stripMargin
    words.select(expr(mergeExpr).as("syms"), col("wcnt"))
  }

  private def bpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the WORD-FREQUENCY table, not raw occurrences — textbook BPE
    // training shape, and the scale lever: every per-round fold and pair
    // count runs over the VOCABULARY (count-weighted), not the corpus
    // (measured 5.45 → 1.50 s at sf0.1; merged words stay distinct, so
    // no re-grouping is ever needed)
    var words = bpeWords(s, dir).localCheckpoint()
    val rows = Seq.newBuilder[(Long, String, String, Long, Long)]
    for (round <- 1 to BpeTrainRounds) {
      val top = words
        // single-symbol words have no pairs — and Spark's sequence(1, 0)
        // DESCENDS (the known trap), so they must not reach the transform
        .filter(size(col("syms")) >= 2)
        .select(
          col("wcnt"),
          explode(
            expr(
              "transform(sequence(1, size(syms) - 1), i -> struct(element_at(syms, CAST(i AS INT)) AS l, element_at(syms, CAST(i AS INT) + 1) AS r))"
            )
          ).as("p")
        )
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wcnt")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()(0)
      val (l, r, cnt) = (top.getString(0), top.getString(1), top.getLong(2))
      val next = bpeMergeRound(words, l, r).localCheckpoint()
      val symsAfter =
        next.agg(sum(size(col("syms")).cast("long") * col("wcnt")).cast("long")).collect()(0).getLong(0)
      rows += ((round.toLong, l, r, cnt, symsAfter))
      words = next
    }
    rows
      .result()
      .toDF("rank", "merge_left", "merge_right", "pair_count", "symbols_after")
      .transform(Norm.ordered(_, col("rank")))
  }

  // -------------------------------------------------------------------
  // text_bpe_encode — ENCODE the corpus with the tokenizer text_bpe_train
  // produces: re-run the 3 merge rounds with the WORD key carried through
  // (same argmax pairs, same greedy fold — the train query's oracle pins
  // those), then tokenize every document by joining its words against the
  // merged vocabulary (word → post-merge token count). This is the
  // production tokenize step's shape: the corpus-sized relation only ever
  // carries (doc_id, word); all symbol-array work happens on the
  // VOCABULARY relation, and the doc join is a plain hash join on the
  // word — at 100 TB the vocab side is the small one (broadcast or
  // bucket), and per-doc token counts come from one map-side-combined
  // aggregation. Output: per-doc whitespace words vs BPE tokens plus
  // chars-per-token (the compression-ratio curve a tokenizer report
  // shows).
  // -------------------------------------------------------------------
  private def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    def esc(x: String) = x.replace("\\", "\\\\").replace("'", "\\'")
    var vocab = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("wcnt"))
      .select(col("w"), expr("split(w, '')").as("syms"), col("wcnt"))
      .localCheckpoint()
    for (_ <- 1 to BpeTrainRounds) {
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(
          col("wcnt"),
          explode(
            expr(
              "transform(sequence(1, size(syms) - 1), i -> struct(element_at(syms, CAST(i AS INT)) AS l, element_at(syms, CAST(i AS INT) + 1) AS r))"
            )
          ).as("p")
        )
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wcnt")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()(0)
      val (l, r) = (top.getString(0), top.getString(1))
      val merged = l + r
      val mergeExpr =
        s"""aggregate(
           |  slice(syms, 2, size(syms) - 1),
           |  array(element_at(syms, 1)),
           |  (acc, s2) -> IF(element_at(acc, -1) = '${esc(l)}' AND s2 = '${esc(r)}',
           |                  concat(slice(acc, 1, size(acc) - 1), array('${esc(merged)}')),
           |                  concat(acc, array(s2))))""".stripMargin
      vocab = vocab.withColumn("syms", expr(mergeExpr)).localCheckpoint()
    }
    val toklen = vocab.select(col("w"), size(col("syms")).cast("long").as("tlen"))
    docs(s, dir)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        explode(split(col("text"), " ")).as("w")
      )
      .join(toklen, Seq("w"))
      .groupBy("doc_id")
      .agg(
        max(col("n_chars")).as("n_chars"),
        count(lit(1)).as("n_words"),
        sum(col("tlen")).as("n_tokens_bpe")
      )
      .select(
        col("doc_id"), col("n_chars"), col("n_words"), col("n_tokens_bpe"),
        Norm.rnd(col("n_chars").cast("double") / col("n_tokens_bpe").cast("double"), 6).as("chars_per_token")
      )
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val bpeEncodeSql: String = {
    def pairsOf(w: String) =
      s"""SELECT (p).l AS l, (p).r AS r, CAST(sum(wcnt) AS BIGINT) AS cnt FROM (
         |    SELECT wcnt, unnest(list_transform(range(1, len(syms)),
         |                  i -> struct_pack(l := syms[i], r := syms[i + 1]))) AS p
         |    FROM $w) GROUP BY 1, 2""".stripMargin
    def round(i: Int) = {
      val prev = s"w${i - 1}"
      s"""p$i AS MATERIALIZED (
         |  ${pairsOf(prev)}
         |), t$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT w,
         |         list_reduce(
         |           list_prepend([syms[1]], list_transform(syms[2:], s2 -> [s2])),
         |           (acc, e) -> CASE WHEN acc[-1] = t.l AND e[1] = t.r
         |                            THEN list_concat(acc[1:len(acc) - 1], [t.l || t.r])
         |                            ELSE list_concat(acc, e) END) AS syms,
         |         wcnt
         |  FROM $prev CROSS JOIN t$i t
         |)""".stripMargin
    }
    val rounds = (1 to BpeTrainRounds).map(round).mkString(",\n")
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT w, string_split(w, '') AS syms, CAST(count(*) AS BIGINT) AS wcnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY w
       |),
       |$rounds,
       |tok AS (SELECT w, CAST(len(syms) AS BIGINT) AS tlen FROM w$BpeTrainRounds)
       |SELECT d.doc_id, max(d.n_chars) AS n_chars,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(t.tlen) AS BIGINT) AS n_tokens_bpe,
       |       round(CAST(max(d.n_chars) AS DOUBLE) / CAST(sum(t.tlen) AS DOUBLE), 6) + 0.0 AS chars_per_token
       |FROM (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       |             unnest(string_split(text, ' ')) AS w
       |      FROM documents) d
       |JOIN tok t ON d.w = t.w
       |GROUP BY d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  private val bpeTrainSql: String = {
    def pairsOf(w: String) =
      s"""SELECT (p).l AS l, (p).r AS r, CAST(sum(wcnt) AS BIGINT) AS cnt FROM (
         |    SELECT wcnt, unnest(list_transform(range(1, len(syms)),
         |                  i -> struct_pack(l := syms[i], r := syms[i + 1]))) AS p
         |    FROM $w) GROUP BY 1, 2""".stripMargin
    def round(i: Int) = {
      val prev = s"w${i - 1}"
      s"""p$i AS MATERIALIZED (
         |  ${pairsOf(prev)}
         |), t$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT list_reduce(
         |           list_prepend([syms[1]], list_transform(syms[2:], s2 -> [s2])),
         |           (acc, e) -> CASE WHEN acc[-1] = t.l AND e[1] = t.r
         |                            THEN list_concat(acc[1:len(acc) - 1], [t.l || t.r])
         |                            ELSE list_concat(acc, e) END) AS syms,
         |         wcnt
         |  FROM $prev CROSS JOIN t$i t
         |), s$i AS (SELECT CAST(sum(len(syms) * wcnt) AS BIGINT) AS tot FROM w$i)""".stripMargin
    }
    val rounds = (1 to BpeTrainRounds).map(round).mkString(",\n")
    val outs = (1 to BpeTrainRounds)
      .map(i =>
        s"SELECT CAST($i AS BIGINT) AS rank, t.l AS merge_left, t.r AS merge_right, t.cnt AS pair_count, (SELECT tot FROM s$i) AS symbols_after FROM t$i t"
      )
      .mkString("\nUNION ALL\n")
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT string_split(w, '') AS syms, CAST(count(*) AS BIGINT) AS wcnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY w
       |),
       |$rounds
       |$outs
       |ORDER BY rank""".stripMargin
  }

  // -------------------------------------------------------------------
  // text_hashing_trick — FEATURE-HASHING vectorization (Weinberger et
  // al. 2009, the sklearn HashingVectorizer / Vowpal Wabbit front-end):
  // token → dimension polyHash(t) mod D with a SIGN drawn from the next
  // hash bit so colliding tokens cancel in expectation instead of
  // stacking — the fixed-width, vocabulary-free featurizer a streaming
  // trainer uses when a fitted vocabulary is impossible. All weights are
  // signed integer counts (no floats anywhere); the per-doc output pins
  // the entire sparse vector through three exact aggregates (nnz after
  // cancellation, L1 mass, the dim-weighted checksum) so the result
  // stays ~|docs| rows while hash-checking every vector component. The
  // token hashes ride the native graft_wordhashes scan (one compiled pass
  // per doc) instead of the interpreted per-character HOF fold.
  // -------------------------------------------------------------------
  private val HashDims = 64L

  private def textHashingTrick(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(expr("graft_wordhashes(text)")).as("h"))
      .select(
        col("doc_id"),
        pmod(col("h"), lit(HashDims)).as("dim"),
        when(pmod(expr(s"(h div $HashDims)"), lit(2L)) === 0L, 1L)
          .otherwise(-1L)
          .as("sgn")
      )
      .groupBy("doc_id", "dim")
      .agg(sum(col("sgn")).as("w"))
      .groupBy("doc_id")
      .agg(
        sum(when(col("w") =!= 0L, 1L).otherwise(0L)).as("nnz"),
        sum(abs(col("w"))).as("l1"),
        sum(col("dim") * col("w")).as("checksum")
      )
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val textHashingTrickSql: String = {
    val h = graft.ccm.DetHash.polyHashSql("tok")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
       |), hashed AS (
       |  SELECT doc_id,
       |         (($h) % $HashDims + $HashDims) % $HashDims AS dim,
       |         CASE WHEN (($h) // $HashDims) % 2 = 0 THEN 1 ELSE -1 END AS sgn
       |  FROM toks
       |), vec AS (
       |  SELECT doc_id, dim, CAST(sum(sgn) AS BIGINT) AS w FROM hashed GROUP BY 1, 2
       |)
       |SELECT doc_id,
       |       CAST(sum(CASE WHEN w <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz,
       |       CAST(sum(abs(w)) AS BIGINT) AS l1,
       |       CAST(sum(dim * w) AS BIGINT) AS checksum
       |FROM vec GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_hashing_trick" -> textHashingTrick,
    "text_bpe_train" -> bpeTrain,
    "text_bpe_encode" -> bpeEncode,
    "text_inverted_index" -> invertedIndex,
    "text_phrase_search" -> phraseSearch,
    "text_collocations" -> collocations,
    "text_bpe_pairs" -> bpePairs,
    "text_keyphrases" -> keyphrases,
    "text_langid_eval" -> langIdEval,
    "text_bigram_lm" -> bigramLm,
    "text_vocab_coverage" -> vocabCoverage,
    "text_para_dedup" -> paraDedup,
    "text_boilerplate" -> textBoilerplate,
    "text_zipf" -> textZipf,
    "text_lm_score" -> lmScore,
    "text_repetition" -> textRepetition,
    "text_bm25" -> bm25,
    "doc_split" -> docSplit,
    "text_stats" -> textStats,
    "token_count" -> tokenCount,
    "lang_id" -> langId,
    "quality_score" -> qualityScore,
    "doc_fingerprint" -> fingerprint,
    "text_top_terms" -> topTerms,
    "text_tfidf" -> tfidf,
    "doc_chunk" -> docChunk,
    "text_source_divergence" -> sourceDivergence
  )

  // -------------------------------------------------------------------
  // text_vocab_coverage — pre-tokenizer-training measurement: per lang,
  // the vocabulary size needed to cover {50,90,95,99}% of all token
  // occurrences when the vocab is filled greedily by frequency. Computed
  // over the count-of-counts HISTOGRAM: the per-term relation is
  // aggregated twice (term counts, then (lang, cnt) buckets) and the
  // running sum runs over the tiny histogram — no per-term window
  // anywhere, so at 100 TB the vocabulary can be billions of terms while
  // the windowed relation stays ~O(sqrt(tokens)) distinct frequencies.
  // Coverage-threshold arithmetic is INTEGER-exact (cum*pct vs total*100
  // comparisons + ceil-div inside the boundary bucket) — no doubles, so
  // cross-engine parity is structural. Within a frequency bucket all
  // terms are interchangeable for coverage, so the bucket-granular
  // formula reproduces the per-term greedy rank exactly.
  // -------------------------------------------------------------------
  private val CoveragePcts = Seq(50, 90, 95, 99)

  private def vocabCoverage(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val counts = docs(s, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy("lang", "term")
      .agg(count(lit(1)).as("cnt"))
    val hist = counts.groupBy("lang", "cnt").agg(count(lit(1)).as("n_terms"))
    val wRun = Window
      .partitionBy("lang")
      .orderBy(col("cnt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy("lang")
    val enriched = hist
      .withColumn("tokens_above", coalesce(sum(col("cnt") * col("n_terms")).over(wRun), lit(0L)))
      .withColumn("terms_above", coalesce(sum(col("n_terms")).over(wRun), lit(0L)))
      .withColumn("total_tokens", sum(col("cnt") * col("n_terms")).over(wAll))
      .withColumn("total_vocab", sum(col("n_terms")).over(wAll))
    enriched
      .crossJoin(broadcast(CoveragePcts.toDF("pct")))
      .withColumn("target", expr("(total_tokens * pct + 99) div 100"))
      .filter(
        col("tokens_above") < col("target") &&
          col("tokens_above") + col("cnt") * col("n_terms") >= col("target")
      )
      .withColumn(
        "vocab_needed",
        col("terms_above") + expr("(target - tokens_above + cnt - 1) div cnt")
      )
      .select("lang", "pct", "vocab_needed", "total_vocab", "total_tokens")
      .transform(Norm.ordered(_, col("lang"), col("pct")))
  }

  private val vocabCoverageSql: String = {
    val pctList = CoveragePcts.mkString(", ")
    s"""WITH counts AS (
       |  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
       |), agg AS (
       |  SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt FROM counts GROUP BY 1, 2
       |), hist AS (
       |  SELECT lang, cnt, CAST(count(*) AS BIGINT) AS n_terms FROM agg GROUP BY 1, 2
       |), enriched AS (
       |  SELECT lang, cnt, n_terms,
       |    CAST(COALESCE(sum(cnt * n_terms) OVER (PARTITION BY lang ORDER BY cnt DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_above,
       |    CAST(COALESCE(sum(n_terms) OVER (PARTITION BY lang ORDER BY cnt DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS terms_above,
       |    CAST(sum(cnt * n_terms) OVER (PARTITION BY lang) AS BIGINT) AS total_tokens,
       |    CAST(sum(n_terms) OVER (PARTITION BY lang) AS BIGINT) AS total_vocab
       |  FROM hist
       |), pcts AS (
       |  SELECT unnest([$pctList]) AS pct
       |)
       |SELECT e.lang, p.pct,
       |  e.terms_above + ((e.total_tokens * p.pct + 99) // 100 - e.tokens_above + e.cnt - 1) // e.cnt AS vocab_needed,
       |  e.total_vocab, e.total_tokens
       |FROM enriched e CROSS JOIN pcts p
       |WHERE e.tokens_above < (e.total_tokens * p.pct + 99) // 100
       |  AND e.tokens_above + e.cnt * e.n_terms >= (e.total_tokens * p.pct + 99) // 100
       |ORDER BY 1, 2""".stripMargin
  }

  // -------------------------------------------------------------------
  // text_para_dedup — corpus-wide PARAGRAPH dedup (the CCNet/RefinedWeb
  // op: duplicated paragraphs are removed across the whole corpus while
  // their documents survive). This corpus has no sentence markers, so a
  // "paragraph" is a non-overlapping 16-token block; each block is
  // polyHashed and globally deduped keep-first by (doc_id, block_idx) —
  // one window over the block-hash partition, exactly the exact-dedup
  // shuffle shape, so the op is one explode + one shuffle regardless of
  // corpus size. Output: per-doc block census + tokens retained.
  // -------------------------------------------------------------------
  private val ParaTokens = 16

  private def paraDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val blocks = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        posexplode(
          expr(
            s"transform(sequence(0, (size(toks) - 1) div $ParaTokens), i -> array_join(slice(toks, i * $ParaTokens + 1, $ParaTokens), ' '))"
          )
        )
      )
      .select(
        col("doc_id"),
        col("pos").as("blk"),
        expr(DetHash.polyHashSparkSql("col")).as("bh"),
        size(split(col("col"), " ")).cast("long").as("n_toks")
      )
    val wH = Window.partitionBy("bh").orderBy(col("doc_id").asc, col("blk").asc)
    blocks
      .withColumn("rn", row_number().over(wH))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_blocks"),
        sum(when(col("rn") === 1, col("n_toks")).otherwise(0L)).as("n_tokens_kept")
      )
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val paraDedupSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), blocks AS (
       |  SELECT doc_id, u.blk AS blk,
       |         ${DetHash.polyHashSql("u.btxt")} AS bh,
       |         CAST(len(string_split(u.btxt, ' ')) AS BIGINT) AS n_toks
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(range((len(toks) - 1) // $ParaTokens + 1),
       |             i -> struct_pack(blk := i,
       |                              btxt := array_to_string(list_slice(toks, i * $ParaTokens + 1, i * $ParaTokens + $ParaTokens), ' ')))) AS u
       |  FROM t)
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY bh ORDER BY doc_id, blk) AS rn FROM blocks
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
       |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_blocks,
       |  CAST(sum(CASE WHEN rn = 1 THEN n_toks ELSE 0 END) AS BIGINT) AS n_tokens_kept
       |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // text_boilerplate — corpus-frequency boilerplate removal: a 16-token
  // block whose text appears in >= BoilerDf DISTINCT documents is
  // boilerplate (headers, footers, navigation chrome, license
  // blurbs — the Common-Crawl cleaning step), and EVERY instance is
  // dropped, including the first. That ALL-instances contract is the
  // deliberate contrast with text_para_dedup's keep-first global dedup:
  // dedup preserves one copy of repeated content, boilerplate removal
  // preserves none. Scale shape: the block relation shuffles once on
  // the block hash (the text_para_dedup exchange), the df side
  // aggregates to the distinct-block relation (vocabulary-sized, like
  // every text fold here), and the verdict returns by one hash join on
  // bh — no all-pairs term at any corpus size. Output: the per-source
  // removal audit a cleaning job emits.
  // -------------------------------------------------------------------
  private val BoilerDf = 2

  private def textBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val blocks = docs(s, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        col("source"),
        explode(
          expr(
            s"transform(sequence(0, (size(toks) - 1) div $ParaTokens), i -> array_join(slice(toks, i * $ParaTokens + 1, $ParaTokens), ' '))"
          )
        ).as("btxt")
      )
      .select(
        col("doc_id"),
        col("source"),
        expr(DetHash.polyHashSparkSql("btxt")).as("bh"),
        size(split(col("btxt"), " ")).cast("long").as("n_toks")
      )
      .localCheckpoint() // feeds the df aggregate AND the verdict join
    val boiler = blocks
      .groupBy("bh", "doc_id")
      .agg(count(lit(1)).as("m"))
      .groupBy("bh")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= BoilerDf)
      .select(col("bh"), lit(1L).as("is_boiler"))
    blocks
      .join(boiler, Seq("bh"), "left")
      .withColumn("rm", coalesce(col("is_boiler"), lit(0L)))
      .groupBy("source")
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_blocks"),
        sum(col("rm")).as("blocks_removed"),
        countDistinct(when(col("rm") === 1L, col("doc_id"))).as("docs_touched"),
        sum(when(col("rm") === 1L, col("n_toks")).otherwise(0L)).as("tokens_removed"),
        sum(col("n_toks")).as("tokens_total")
      )
      .select(
        col("source"),
        col("n_docs"),
        col("n_blocks"),
        col("blocks_removed"),
        col("docs_touched"),
        col("tokens_removed"),
        Norm.rnd(col("tokens_removed").cast("double") / col("tokens_total"), 6).as("removed_frac")
      )
      .transform(Norm.ordered(_, col("source")))
  }

  private val textBoilerplateSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
       |), blocks AS (
       |  SELECT doc_id, source,
       |         ${DetHash.polyHashSql("u")} AS bh,
       |         CAST(len(string_split(u, ' ')) AS BIGINT) AS n_toks
       |  FROM (
       |    SELECT doc_id, source, unnest(list_transform(range((len(toks) - 1) // $ParaTokens + 1),
       |             i -> array_to_string(list_slice(toks, i * $ParaTokens + 1, i * $ParaTokens + $ParaTokens), ' '))) AS u
       |  FROM t)
       |), boiler AS (
       |  SELECT bh FROM (SELECT bh, doc_id FROM blocks GROUP BY 1, 2)
       |  GROUP BY bh HAVING count(*) >= $BoilerDf
       |), marked AS (
       |  SELECT b.*, CASE WHEN x.bh IS NULL THEN 0 ELSE 1 END AS rm
       |  FROM blocks b LEFT JOIN boiler x ON b.bh = x.bh
       |)
       |SELECT source,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_blocks,
       |  CAST(sum(rm) AS BIGINT) AS blocks_removed,
       |  CAST(count(DISTINCT CASE WHEN rm = 1 THEN doc_id END) AS BIGINT) AS docs_touched,
       |  CAST(sum(CASE WHEN rm = 1 THEN n_toks ELSE 0 END) AS BIGINT) AS tokens_removed,
       |  round(CAST(sum(CASE WHEN rm = 1 THEN n_toks ELSE 0 END) AS DOUBLE) / sum(n_toks), 6) + 0.0 AS removed_frac
       |FROM marked GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // text_zipf — corpus-naturalness diagnostic: weighted log-log OLS fit
  // of the term frequency distribution against Zipf's law (natural text
  // has slope ≈ −1; synthetic, templated or spammy corpora deviate — a
  // standard pretraining-data QA signal). Runs over the count-of-counts
  // HISTOGRAM like text_vocab_coverage: each distinct frequency is one
  // weighted point (x = ln of the bucket's midpoint rank, y = ln cnt,
  // weight = n_terms), so the fit touches ~O(√tokens) rows, never the
  // vocabulary. ln() agreement between Java's Math.log and DuckDB's libm
  // is empirical (both are correctly-rounded in practice) with residual
  // ulps absorbed by the family's 6-dp round.
  // -------------------------------------------------------------------
  private def textZipf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs(s, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy("lang", "term")
      .agg(count(lit(1)).as("cnt"))
    val hist = counts.groupBy("lang", "cnt").agg(count(lit(1)).as("n_terms"))
    val wRun = Window
      .partitionBy("lang")
      .orderBy(col("cnt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("terms_above", coalesce(sum(col("n_terms")).over(wRun), lit(0L)))
      .withColumn("x", expr("graft_ln(terms_above + (n_terms + 1) / 2.0D)"))
      .withColumn("y", expr("graft_ln(CAST(cnt AS DOUBLE))"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(col("n_terms").cast("double")).as("sw"),
        sum(col("n_terms") * col("x")).as("sx"),
        sum(col("n_terms") * col("y")).as("sy"),
        sum(col("n_terms") * col("x") * col("y")).as("sxy"),
        sum(col("n_terms") * col("x") * col("x")).as("sxx"),
        sum(col("n_terms") * col("y") * col("y")).as("syy")
      )
      .withColumn("dx", col("sw") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dy", col("sw") * col("syy") - col("sy") * col("sy"))
      .withColumn("cov", col("sw") * col("sxy") - col("sx") * col("sy"))
      .select(
        col("lang"),
        col("n_buckets"),
        Norm.rnd(col("cov") / col("dx"), 6).as("zipf_slope"),
        Norm.rnd(col("cov") * col("cov") / (col("dx") * col("dy")), 6).as("r2")
      )
      .transform(Norm.ordered(_, col("lang")))
  }

  private val textZipfSql: String =
    s"""WITH counts AS (
       |  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
       |), agg AS (
       |  SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt FROM counts GROUP BY 1, 2
       |), hist AS (
       |  SELECT lang, cnt, CAST(count(*) AS BIGINT) AS n_terms FROM agg GROUP BY 1, 2
       |), pts AS (
       |  SELECT lang, cnt, n_terms,
       |    ${ExactLn.duck("CAST(COALESCE(sum(n_terms) OVER (PARTITION BY lang ORDER BY cnt DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) + (n_terms + 1) / 2.0")} AS x,
       |    ${ExactLn.duck("cnt")} AS y
       |  FROM hist
       |), mom AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_buckets,
       |    sum(CAST(n_terms AS DOUBLE)) AS sw,
       |    sum(n_terms * x) AS sx, sum(n_terms * y) AS sy,
       |    sum(n_terms * x * y) AS sxy, sum(n_terms * x * x) AS sxx, sum(n_terms * y * y) AS syy
       |  FROM pts GROUP BY 1
       |)
       |SELECT lang, n_buckets,
       |  round((sw * sxy - sx * sy) / (sw * sxx - sx * sx), 6) + 0.0 AS zipf_slope,
       |  round((sw * sxy - sx * sy) * (sw * sxy - sx * sy) /
       |        ((sw * sxx - sx * sx) * (sw * syy - sy * sy)), 6) + 0.0 AS r2
       |FROM mom ORDER BY 1""".stripMargin

  val oracle: Map[String, String] = Map(
    "text_hashing_trick" -> textHashingTrickSql,
    "text_bpe_train" -> bpeTrainSql,
    "text_bpe_encode" -> bpeEncodeSql,
    "text_zipf" -> textZipfSql,
    "text_para_dedup" -> paraDedupSql,
    "text_boilerplate" -> textBoilerplateSql,
    "text_vocab_coverage" -> vocabCoverageSql,
    "text_inverted_index" -> invertedIndexSql,
    "text_phrase_search" -> phraseSearchSql,
    "text_collocations" -> collocationsSql,
    "text_bpe_pairs" -> bpePairsSql,
    "text_keyphrases" -> keyphrasesSql,
    "text_langid_eval" -> langIdEvalSql,
    "text_bigram_lm" -> bigramLmSql,
    "text_lm_score" -> lmScoreSql,
    "text_repetition" -> textRepetitionSql,
    "text_bm25" -> bm25Sql,
    "doc_split" -> docSplitSql,
    "text_stats" -> textStatsSql,
    "token_count" -> tokenCountSql,
    "lang_id" -> langIdSql,
    "quality_score" -> qualityScoreSql,
    "doc_fingerprint" -> fingerprintSql,
    "text_top_terms" -> topTermsSql,
    "text_tfidf" -> tfidfSql,
    "doc_chunk" -> docChunkSql,
    "text_source_divergence" -> sourceDivergenceSql
  )
}
