package graft.contract

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ccm.DetHash
import graft.functions.GraftFunctions

/** Deduplication operators over `documents.parquet` / `embeddings.parquet`:
  * exact (hash-groupBy), MinHash signatures + LSH banding (candidate pairs
  * from bucket joins only — never all-pairs), SimHash, n-gram Jaccard within
  * blocking keys, and embedding-cosine near-dup.
  *
  * Everything is integer [[DetHash]] arithmetic (exact cross-engine parity)
  * except Jaccard/cosine ratios, which are ratios of exact quantities and
  * only rounded cosmetically.
  *
  * Performance notes (these carry to 100 TB):
  *  - per-word hashes are computed once per document and shingle hashes are
  *    an arithmetic combine of word hashes — never a re-fold of the
  *    concatenated string per shingle;
  *  - signature relations that feed self-joins are `localCheckpoint`ed:
  *    Spark duplicates the plan on both sides of a self-join, which would
  *    re-run the whole hashing stage twice (at scale: persist / write the
  *    signature table once, join against it);
  *  - SimHash bit-sums run as ONE hash-aggregation pass over exploded word
  *    rows (SimBits conditional SUM aggregates, map-side partial, all
  *    whole-stage codegen) instead of a per-row interpreted lambda over
  *    bits x words;
  *  - the expensive pair verifications (Jaccard, cosine) run only inside
  *    blocking keys (source / label / LSH band bucket), so group size — not
  *    corpus size — bounds the quadratic term.
  */
object DedupQueries {
  private val P = DetHash.P
  private[contract] val NumPerms = 8 // MinHash signature length
  private val BandRows = 2 // LSH: 4 bands x 2 rows

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  /** Spark: per-word polyHash list straight off `text` — the native
    * codegen expression ([[graft.functions.WordHashes]]); value-identical
    * to `transform(split(text, ' '), w -> polyHash(w))` but one compiled
    * pass instead of an interpreted lambda per character. Callers must
    * have run [[GraftFunctions.register]].
    */
  private[contract] val wordHashesSpark = "graft_wordhashes(text)"

  /** Word 3-gram shingle hashes, combined ARITHMETICALLY from the per-word
    * hash list `wh`: sh = ((h1*131 + h2)*131 + h3) % P. All intermediates
    * < 2^46, so the arithmetic is exact in both engines.
    */
  // Guard: Spark's sequence(0, n) DESCENDS when n < 0 (docs with < 3
  // tokens would evaluate element_at(wh, 0) and throw); short docs get an
  // empty shingle set, matching DuckDB's empty range().
  private[contract] val shingleFromWhSpark =
    s"CASE WHEN size(wh) >= 3 THEN transform(sequence(0, size(wh) - 3), i -> " +
      s"((element_at(wh, i + 1) * 131 + element_at(wh, i + 2)) * 131 + element_at(wh, i + 3)) % $P) " +
      s"ELSE CAST(array() AS ARRAY<BIGINT>) END"

  /** DuckDB oracle: word-hash CTE over documents + the same combine. */
  private[contract] val whDuckCte =
    s"dw AS (SELECT doc_id, source, " +
      s"list_transform(string_split(text, ' '), w -> ${DetHash.polyHashSql("w")}) AS wh FROM documents)"

  private[contract] val shingleFromWhDuck =
    s"list_transform(range(len(wh) - 2), i -> " +
      s"((wh[i + 1] * 131 + wh[i + 2]) * 131 + wh[i + 3]) % $P)"

  /** Parameterized word-hash CTE (no source column) for pipelines that
    * shingle a FILTERED doc relation instead of raw `documents`.
    */
  private[contract] def whDuckCteFrom(src: String): String =
    s"dw AS (SELECT doc_id, " +
      s"list_transform(string_split(text, ' '), w -> ${DetHash.polyHashSql("w")}) AS wh FROM $src)"

  /** MinHash signature column list (SQL), shared by every banding oracle. */
  private[contract] val sigColsSql: String =
    (0 until NumPerms)
      .map(k => s"list_min(list_transform(shh, h -> ${DetHash.minhashPermSql("h", k)})) AS mh$k")
      .mkString(",\n  ")

  /** LSH band long-format SELECT over a `sig` CTE (SQL). */
  private[contract] def bandSelectSql: String =
    bandKeyExprs
      .map { case (b, e) => s"SELECT doc_id, $b AS band, $e AS band_key FROM sig" }
      .mkString("\n  UNION ALL\n  ")

  /** (doc_id, source, shh: array<long>) with wh materialized once per doc. */
  private[contract] def shingled(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    docs(s, dir)
      .select(col("doc_id"), col("source"), expr(wordHashesSpark).as("wh"))
      .select(col("doc_id"), col("source"), expr(shingleFromWhSpark).as("shh"))
  }

  // -------------------------------------------------------------------
  // dedup_exact — exact duplicate groups by content hash (hash-groupBy;
  // at scale: group by (hash, length) then verify within group).
  // -------------------------------------------------------------------
  private def dedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(DetHash.polyHashCol(col("text")).as("text_hash"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc")
      )
      .transform(Norm.ordered(_, col("text_hash")))

  private val dedupExactSql: String =
    s"""SELECT ${DetHash.polyHashSql("text")} AS text_hash,
       |  CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin

  // -------------------------------------------------------------------
  // dedup_minhash — MinHash signatures: k affine permutations of the
  // shingle-hash set, min per permutation. Wide (mh0..mh7) output.
  // -------------------------------------------------------------------
  /** Unsorted signature relation — the building block for the banding /
    * clustering pipelines (a sort here would both cost a range-sampling
    * double execution AND be discarded by the downstream shuffles).
    */
  private def minhashSigRaw(s: SparkSession, dir: String): DataFrame =
    minhashSigFrom(docs(s, dir))

  /** MinHash signature (doc_id, mh0..mh7) from any (doc_id, text) relation
    * — the building block pipelines reuse on filtered doc sets.
    */
  private[contract] def minhashSigFrom(d: DataFrame): DataFrame = {
    GraftFunctions.register(d.sparkSession)
    // fused native expression: shingling + all permutations in one
    // compiled pass; element_at of its NULL result (docs with < 3 words)
    // reproduces the per-column NULLs of the array_min(transform(...))
    // formulation, so the oracle SQL is untouched
    d.select(col("doc_id"), expr(wordHashesSpark).as("wh"))
      .select(col("doc_id"), expr(s"graft_minhashsig(wh, $NumPerms)").as("sig"))
      .select(
        col("doc_id") +:
          (0 until NumPerms).map(k => element_at(col("sig"), k + 1).as(s"mh$k")): _*
      )
  }

  /** LSH band long format (doc_id, band, band_key) from a signature. */
  private[contract] def bandsFrom(sig: DataFrame): DataFrame = {
    val bandExprs = bandKeyExprs.map { case (b, e) => expr(s"named_struct('band', $b, 'band_key', $e)") }
    sig
      .select(col("doc_id"), explode(array(bandExprs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** Distinct LSH candidate pairs (doc_a < doc_b) from a CHECKPOINTED
    * signature — the one definition of candidate generation the
    * estimator/ensemble layers share (lshPairsRaw additionally counts
    * shared bands, which those layers don't need).
    */
  private def candPairsFrom(sig: DataFrame): DataFrame = {
    val long = bandsFrom(sig)
    long
      .as("a")
      .join(
        long.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id")
      )
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Σ of per-slot signature matches between aliases sa/sb. */
  private def minhashMatchCol: Column =
    (0 until NumPerms)
      .map(k => when(col(s"sa.mh$k") === col(s"sb.mh$k"), 1L).otherwise(0L))
      .reduce(_ + _)

  /** (doc_id, sh: distinct shingle set, sz), checkpointed. */
  private def distinctSets(s: SparkSession, dir: String): DataFrame =
    shingled(s, dir)
      .select(col("doc_id"), expr("array_distinct(shh)").as("sh"))
      .withColumn("sz", size(col("sh")).cast("long"))
      .localCheckpoint() // both sides of the pair join

  // SQL twins, appended after bandsCteSql in the consumers
  private val candCteSql: String =
    s"""cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |)""".stripMargin
  private val setsCteSql: String = "sets AS (SELECT doc_id, list_distinct(shh) AS sh FROM ds)"
  private val matchSumSql: String =
    (0 until NumPerms).map(k => s"CASE WHEN sa.mh$k = sb.mh$k THEN 1 ELSE 0 END").mkString(" + ")

  private def minhashSig(s: SparkSession, dir: String): DataFrame =
    minhashSigRaw(s, dir).transform(Norm.ordered(_, col("doc_id")))

  private val minhashSigSql: String =
    s"""WITH $whDuckCte,
       |ds AS (SELECT doc_id, $shingleFromWhDuck AS shh FROM dw)
       |SELECT doc_id,
       |  $sigColsSql
       |FROM ds ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // dedup_lsh_pairs — LSH banding over the MinHash signature: band key =
  // fold of the band's rows; candidate pairs = docs sharing any band key.
  // The join is keyed on (band, band_key) so bucket size — not corpus
  // size — bounds the pair blowup.
  // -------------------------------------------------------------------
  private def bandKeyExprs: Seq[(Int, String)] =
    (0 until NumPerms / BandRows).map { b =>
      val ks = (BandRows * b) until (BandRows * (b + 1))
      val e = ks.map(k => s"mh$k").reduce((a, c) => s"(($a) * 31 + $c) % $P")
      (b, e)
    }

  /** Unsorted candidate pairs (doc_a, doc_b, n_shared_bands) — feeds both
    * the contract query and the clustering operator.
    */
  private[contract] def lshPairsRaw(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSigRaw(s, dir).localCheckpoint()
    val long = bandsFrom(sig)
    long
      .as("a")
      .join(
        long.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id")
      )
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  private def lshPairs(s: SparkSession, dir: String): DataFrame =
    lshPairsRaw(s, dir).transform(Norm.ordered(_, col("doc_a"), col("doc_b")))

  /** Shared CTE chain dw → ds → sig → bands over raw `documents` (SQL). */
  private[contract] def bandsCteSql: String =
    s"""$whDuckCte,
       |ds AS (SELECT doc_id, $shingleFromWhDuck AS shh FROM dw),
       |sig AS (SELECT doc_id,
       |  $sigColsSql
       |  FROM ds),
       |bands AS (
       |  $bandSelectSql
       |)""".stripMargin

  private val lshPairsSql: String =
    s"""WITH $bandsCteSql
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared_bands
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin

  // -------------------------------------------------------------------
  // dedup_simhash — 24-bit SimHash over word hashes, computed as
  // one hash-agg pass of SimBits conditional sums over word rows, plus
  // near-dup pairs within the same source at Hamming distance <= 6.
  // -------------------------------------------------------------------
  private val SimBits = 24

  /** Unsorted (doc_id, source, simhash) — shared by the contract query and
    * the ensemble verdict.
    */
  private def simhashRaw(s: SparkSession, dir: String): DataFrame = {
    // one word row carries all SimBits bit-signs as SimBits conditional SUM
    // aggregates (ONE map-side-partial hash-agg pass over |words| rows) —
    // the previous explode-per-bit formulation pushed SimBits x |words|
    // rows through two aggregation levels for identical arithmetic
    val bitSums = (0 until SimBits).map { j =>
      sum(expr(s"((h div ${1L << j}) % 2) * 2 - 1")).as(s"b$j")
    }
    val fold = (0 until SimBits)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    GraftFunctions.register(s)
    docs(s, dir)
      .select(col("doc_id"), col("source"), explode(expr(wordHashesSpark)).as("h"))
      .groupBy("doc_id", "source")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), col("source"), fold.as("simhash"))
  }

  private def simhash(s: SparkSession, dir: String): DataFrame =
    simhashRaw(s, dir).transform(Norm.ordered(_, col("doc_id")))

  private val simhashDuck: String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(0, ${SimBits - 1}), j ->
       |  CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(wh,
       |         h -> ((h // CAST(pow(2, j) AS BIGINT)) % 2) * 2 - 1)), (a, b) -> a + b) > 0
       |       THEN CAST(pow(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
       |  (a, b) -> a + b)""".stripMargin

  private val simhashSql: String =
    s"""WITH $whDuckCte
       |SELECT doc_id, source, $simhashDuck AS simhash
       |FROM dw ORDER BY doc_id""".stripMargin

  private def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = simhash(s, dir).localCheckpoint()
    sig
      .as("a")
      .join(sig.as("b"), col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming")
      )
      .filter(col("hamming") <= 6)
      .transform(Norm.ordered(_, col("doc_a"), col("doc_b")))
  }

  private val simhashPairsSql: String =
    s"""WITH $whDuckCte,
       |sig AS (SELECT doc_id, source, $simhashDuck AS simhash FROM dw)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.source = b.source AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
       |ORDER BY doc_a, doc_b""".stripMargin

  // -------------------------------------------------------------------
  // dedup_minhash_est — MinHash ESTIMATOR calibration on the LSH
  // candidate pairs: the slot-match fraction (matches/8 — the unbiased
  // MinHash Jaccard estimate) against the EXACT distinct-shingle
  // Jaccard, with the signed error per pair. With k = 8 permutations
  // the estimate is k-quantized (std ≈ sqrt(j(1−j)/8) ≈ 0.17 at
  // j = 0.5) — the measured error column is the evidence for how many
  // permutations a production near-dup bar needs, the same
  // estimator-vs-truth methodology as sketch_cms_error/ann_recall_eval.
  // The candidate set is LSH-bounded (never all-pairs); the exact
  // intersection runs once per candidate in a single projection (no
  // downstream filter exists to duplicate it through pushdown).
  // -------------------------------------------------------------------
  // The estimator family's published ratios, as ONE SQL text per column
  // parsed by BOTH engines through GridRound.grid6 (VERDICT r15 item 4:
  // these were the last dedup-side shared-string `round(x, 6)` sites —
  // decimal ties are not binary-representable, so the two engines'
  // round() classes could split on them; the floor/ceil grid cannot).
  private val estJSql = s"CAST(matches AS DOUBLE) / ${NumPerms.toDouble}"
  private val exactJSql = "CAST(n_common AS DOUBLE) / CAST(n_union AS DOUBLE)"
  private val ensJaccardSql = "CAST(n_common AS DOUBLE) / CAST(sz_a + sz_b - n_common AS DOUBLE)"
  private val ensContainSql = "CAST(n_common AS DOUBLE) / CAST(least(sz_a, sz_b) AS DOUBLE)"

  private def minhashEst(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSigRaw(s, dir).localCheckpoint() // feeds the band join AND both estimate sides
    val pairs = candPairsFrom(sig)
    val matches = minhashMatchCol
    val sets = distinctSets(s, dir)
    val withEst = pairs
      .join(sig.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sig.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), matches.as("matches"))
    withEst
      .join(sets.select(col("doc_id"), col("sh").as("sh_a"), col("sz").as("sz_a")), col("doc_a") === col("doc_id"))
      .drop("doc_id")
      .join(sets.select(col("doc_id"), col("sh").as("sh_b"), col("sz").as("sz_b")), col("doc_b") === col("doc_id"))
      .drop("doc_id")
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("n_union", col("sz_a") + col("sz_b") - col("n_common"))
      .select(
        col("doc_a"),
        col("doc_b"),
        col("matches"),
        col("n_common"),
        col("n_union"),
        expr(GridRound.grid6(estJSql)).as("est_j"),
        expr(GridRound.grid6(exactJSql)).as("exact_j"),
        expr(GridRound.grid6(s"$estJSql - $exactJSql")).as("err")
      )
      .transform(Norm.ordered(_, col("doc_a"), col("doc_b")))
  }

  private val minhashEstSql: String = {
    val matchSum = matchSumSql
    s"""WITH $bandsCteSql,
       |$candCteSql,
       |$setsCteSql,
       |est AS (
       |  SELECT c.doc_a, c.doc_b, CAST($matchSum AS BIGINT) AS matches
       |  FROM cand c JOIN sig sa ON c.doc_a = sa.doc_id JOIN sig sb ON c.doc_b = sb.doc_id
       |),
       |ex AS (
       |  SELECT e.doc_a, e.doc_b, e.matches,
       |         CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
       |         CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_union
       |  FROM est e JOIN sets a ON e.doc_a = a.doc_id JOIN sets b ON e.doc_b = b.doc_id
       |)
       |SELECT doc_a, doc_b, matches, n_common, n_union,
       |       ${GridRound.grid6(estJSql)} AS est_j,
       |       ${GridRound.grid6(exactJSql)} AS exact_j,
       |       ${GridRound.grid6(s"$estJSql - $exactJSql")} AS err
       |FROM ex
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // -------------------------------------------------------------------
  // dedup_ensemble — the multi-signal VERDICT a production pipeline
  // actually ships: every LSH candidate pair scored by all four
  // independent near-dup signals at once — MinHash slot estimate,
  // SimHash Hamming distance, exact distinct-shingle Jaccard, and
  // asymmetric containment — with a per-signal vote and a >= 2-of-4
  // majority verdict. Single-signal cutoffs each have a failure mode
  // (MinHash is 1/8-quantized, SimHash misses short docs, Jaccard
  // misses quote/boilerplate containment); the ensemble is the standard
  // mitigation and here it is one query over the SAME candidate set, so
  // the signals' disagreement is itself visible in the output. All
  // votes compare 6-dp-ROUNDED values (engine-identical doubles);
  // candidates stay LSH-bounded, each signal adds one keyed join.
  // -------------------------------------------------------------------
  private val EnsEstBar = 0.5
  private val EnsHammingBar = 6L
  private val EnsJaccardBar = 0.8
  private val EnsContainBar = 0.9

  private def dedupEnsemble(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSigRaw(s, dir).localCheckpoint() // band join AND both est sides
    val pairs = candPairsFrom(sig)
    val matches = minhashMatchCol
    val sets = distinctSets(s, dir)
    val sim = simhashRaw(s, dir).select(col("doc_id"), col("simhash")).localCheckpoint()
    pairs
      .join(sig.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sig.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), matches.as("matches"))
      .join(sets.select(col("doc_id"), col("sh").as("sh_a"), col("sz").as("sz_a")), col("doc_a") === col("doc_id"))
      .drop("doc_id")
      .join(sets.select(col("doc_id"), col("sh").as("sh_b"), col("sz").as("sz_b")), col("doc_b") === col("doc_id"))
      .drop("doc_id")
      .join(sim.select(col("doc_id"), col("simhash").as("sim_a")), col("doc_a") === col("doc_id"))
      .drop("doc_id")
      .join(sim.select(col("doc_id"), col("simhash").as("sim_b")), col("doc_b") === col("doc_id"))
      .drop("doc_id")
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("hamming", expr("CAST(bit_count(sim_a ^ sim_b) AS BIGINT)"))
      .withColumn("est_j", expr(GridRound.grid6(estJSql)))
      .withColumn("jaccard", expr(GridRound.grid6(ensJaccardSql)))
      .withColumn("containment", expr(GridRound.grid6(ensContainSql)))
      .withColumn(
        "n_votes",
        when(col("est_j") >= EnsEstBar, 1L).otherwise(0L) +
          when(col("hamming") <= EnsHammingBar, 1L).otherwise(0L) +
          when(col("jaccard") >= EnsJaccardBar, 1L).otherwise(0L) +
          when(col("containment") >= EnsContainBar, 1L).otherwise(0L)
      )
      .select(
        col("doc_a"),
        col("doc_b"),
        col("matches"),
        col("hamming"),
        col("est_j"),
        col("jaccard"),
        col("containment"),
        col("n_votes"),
        (col("n_votes") >= 2L).as("is_dup")
      )
      .transform(Norm.ordered(_, col("doc_a"), col("doc_b")))
  }

  private val dedupEnsembleSql: String = {
    val matchSum = matchSumSql
    s"""WITH $bandsCteSql,
       |$candCteSql,
       |$setsCteSql,
       |simsig AS (SELECT doc_id, $simhashDuck AS simhash FROM dw),
       |scored AS (
       |  SELECT c.doc_a, c.doc_b,
       |         CAST($matchSum AS BIGINT) AS matches,
       |         CAST(bit_count(xor(ha.simhash, hb.simhash)) AS BIGINT) AS hamming,
       |         CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
       |         CAST(len(a.sh) AS BIGINT) AS sz_a, CAST(len(b.sh) AS BIGINT) AS sz_b
       |  FROM cand c
       |  JOIN sig sa ON c.doc_a = sa.doc_id JOIN sig sb ON c.doc_b = sb.doc_id
       |  JOIN sets a ON c.doc_a = a.doc_id JOIN sets b ON c.doc_b = b.doc_id
       |  JOIN simsig ha ON c.doc_a = ha.doc_id JOIN simsig hb ON c.doc_b = hb.doc_id
       |),
       |voted AS (
       |  SELECT doc_a, doc_b, matches, hamming,
       |         ${GridRound.grid6(estJSql)} AS est_j,
       |         ${GridRound.grid6(ensJaccardSql)} AS jaccard,
       |         ${GridRound.grid6(ensContainSql)} AS containment
       |  FROM scored
       |)
       |SELECT doc_a, doc_b, matches, hamming, est_j, jaccard, containment,
       |       n_votes, n_votes >= 2 AS is_dup
       |FROM (
       |  SELECT *,
       |       CAST((CASE WHEN est_j >= $EnsEstBar THEN 1 ELSE 0 END)
       |          + (CASE WHEN hamming <= $EnsHammingBar THEN 1 ELSE 0 END)
       |          + (CASE WHEN jaccard >= $EnsJaccardBar THEN 1 ELSE 0 END)
       |          + (CASE WHEN containment >= $EnsContainBar THEN 1 ELSE 0 END) AS BIGINT) AS n_votes
       |  FROM voted
       |)
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // -------------------------------------------------------------------
  // dedup_ngram_jaccard — n-gram Jaccard similarity verification within a
  // blocking key (source): |A ∩ B| / |A ∪ B| over distinct shingle hashes,
  // reporting pairs with jaccard >= MinJaccard.
  //
  // Size-ratio prune (sound, classic set-similarity join):
  // jaccard(A,B) <= min(|A|,|B|) / max(|A|,|B|), so pairs whose set sizes
  // differ by more than the threshold ratio are skipped INSIDE the join
  // condition — the expensive intersection never runs for them, and the
  // result set is provably unchanged. The oracle filters on jaccard alone
  // (no prune) and must produce identical rows — a built-in soundness
  // check of the prune itself.
  // -------------------------------------------------------------------
  private val MinJaccard = 0.02

  private def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    // Textbook distributed set-similarity plan: explode the distinct
    // shingle hashes, equi-join on (blocking key, hash) — so only docs
    // SHARING a shingle ever pair up — and count shared shingles with a
    // hash aggregation. Everything is whole-stage codegen; no per-pair
    // array intersection exists to be duplicated by predicate pushdown
    // (an earlier array_intersect formulation paid the intersect 2-3x
    // once the jaccard filter was pushed through its projection).
    val withSets = shingled(s, dir)
      .select(col("doc_id"), col("source"), expr("array_distinct(shh)").as("sh"))
      .withColumn("sz", size(col("sh")).cast("long"))
      .localCheckpoint()
    val tokens = withSets.select(col("doc_id"), col("source"), col("sz"), explode(col("sh")).as("h"))
    val common = tokens
      .as("a")
      .join(
        tokens.as("b"),
        col("a.source") === col("b.source") && col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          // size-ratio prune: jaccard <= min(sz)/max(sz). The final filter
          // compares the ROUNDED jaccard, which can lift a value just
          // below the threshold back onto it — prune against a slightly
          // slackened ratio so no pair the rounded filter would keep is
          // ever dropped.
          least(col("a.sz"), col("b.sz")).cast("double") >= greatest(col("a.sz"), col("b.sz")) * (MinJaccard - 1e-6)
      )
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"), first(col("a.sz")).as("size_a"), first(col("b.sz")).as("size_b"))
    common
      .withColumn("n_union", col("size_a") + col("size_b") - col("n_common"))
      .withColumn("jaccard", Norm.rnd(col("n_common") / col("n_union").cast("double"), 6))
      .filter(col("jaccard") >= MinJaccard)
      .select("doc_a", "doc_b", "n_common", "n_union", "jaccard")
      .transform(Norm.ordered(_, col("doc_a"), col("doc_b")))
  }

  private val ngramJaccardSql: String =
    s"""WITH $whDuckCte,
       |ds AS (SELECT doc_id, source, list_distinct($shingleFromWhDuck) AS sh FROM dw)
       |SELECT * FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
       |    CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_union,
       |    round(len(list_intersect(a.sh, b.sh)) / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 6) + 0.0 AS jaccard
       |  FROM ds a JOIN ds b ON a.source = b.source AND a.doc_id < b.doc_id
       |) WHERE jaccard >= $MinJaccard
       |ORDER BY doc_a, doc_b""".stripMargin

  // -------------------------------------------------------------------
  // dedup_containment — asymmetric set CONTAINMENT |A∩B| / min(|A|,|B|)
  // over the same word-3-gram shingles and blocking keys as
  // dedup_ngram_jaccard. Jaccard misses the quote/boilerplate case a
  // training pipeline cares about — a small document wholly embedded in
  // a much larger one scores near-zero Jaccard but containment ~1. Same
  // textbook plan: explode distinct shingles, equi-join on (block,
  // hash) so only docs sharing a shingle pair up, hash-aggregate the
  // overlap; no size-ratio prune (a tiny doc inside a huge one is
  // exactly the target — block size, not corpus size, bounds the pairs).
  // -------------------------------------------------------------------
  private val MinContainment = 0.6

  private def containment(s: SparkSession, dir: String): DataFrame = {
    val withSets = shingled(s, dir)
      .select(col("doc_id"), col("source"), expr("array_distinct(shh)").as("sh"))
      .withColumn("sz", size(col("sh")).cast("long"))
      .localCheckpoint()
    val tokens = withSets.select(col("doc_id"), col("source"), col("sz"), explode(col("sh")).as("h"))
    tokens
      .as("a")
      .join(
        tokens.as("b"),
        col("a.source") === col("b.source") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"), first(col("a.sz")).as("size_a"), first(col("b.sz")).as("size_b"))
      .withColumn(
        "containment",
        Norm.rnd(col("n_common") / least(col("size_a"), col("size_b")).cast("double"), 6)
      )
      .filter(col("containment") >= MinContainment)
      .select("doc_a", "doc_b", "n_common", "size_a", "size_b", "containment")
      .transform(Norm.ordered(_, col("doc_a"), col("doc_b")))
  }

  private val containmentSql: String =
    s"""WITH $whDuckCte,
       |ds AS (SELECT doc_id, source, list_distinct($shingleFromWhDuck) AS sh FROM dw)
       |SELECT * FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
       |    CAST(len(a.sh) AS BIGINT) AS size_a, CAST(len(b.sh) AS BIGINT) AS size_b,
       |    round(len(list_intersect(a.sh, b.sh)) / CAST(least(len(a.sh), len(b.sh)) AS DOUBLE), 6) + 0.0 AS containment
       |  FROM ds a JOIN ds b ON a.source = b.source AND a.doc_id < b.doc_id
       |    AND len(list_intersect(a.sh, b.sh)) > 0
       |) WHERE containment >= $MinContainment
       |ORDER BY doc_a, doc_b""".stripMargin

  // -------------------------------------------------------------------
  // dedup_embed_cos — embedding-cosine near-dup within a label block.
  // Dot/norm are left-fold double arithmetic in identical order in both
  // engines, so the cosine is bit-identical before rounding.
  // -------------------------------------------------------------------
  private val CosThreshold = 0.2

  // shared vector plumbing (native graft_dot + per-vector norms): VecOps
  private val dotSpark = VecOps.dotSpark
  private def dotDuck(a: String, b: String) = VecOps.dotDuck(a, b)
  private def embDocs(s: SparkSession, dir: String): DataFrame = VecOps.vecs(s, dir)

  private def embedCos(s: SparkSession, dir: String): DataFrame = {
    val e = embDocs(s, dir).localCheckpoint()
    val dotAB = expr(dotSpark.format("a.v", "b.v"))
    e.as("a")
      .join(e.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        Norm.rnd(dotAB / (col("a.nrm") * col("b.nrm")), 6).as("cos_sim")
      )
      .filter(col("cos_sim") >= CosThreshold)
      .transform(Norm.ordered(_, col("vec_a"), col("vec_b")))
  }

  private val embedCosSql: String = {
    val cos = s"(round(${dotDuck("a.v", "b.v")} / (sqrt(${dotDuck("a.v", "a.v")}) * sqrt(${dotDuck("b.v", "b.v")})), 6) + 0.0)"
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $cos AS cos_sim
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE $cos >= $CosThreshold
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  // -------------------------------------------------------------------
  // dedup_cluster — the dedup ENDGAME: connected components over the LSH
  // candidate-pair graph, labeling every involved doc with its cluster
  // representative (min doc_id in the component) + component size; a
  // pipeline then keeps one doc per cluster.
  //
  // Spark side: [[graft.operators.ConnectedComponents.minLabelPropagation]]
  // over the candidate-pair edge list (see that operator's scaladoc for the
  // per-round shuffle shape, convergence guard, and the
  // large-star/small-star scale refinement). Oracle: DuckDB recursive CTE
  // computing min reachable id — an independent transitive-closure
  // formulation that must agree exactly.
  // -------------------------------------------------------------------
  private val ClusterMaxIter = 25

  private def clusterWith(
      s: SparkSession,
      dir: String,
      cc: DataFrame => DataFrame
  ): DataFrame = {
    val labels = cc(lshPairsRaw(s, dir).select(col("doc_a"), col("doc_b")))
      .select(col("vertex").as("doc_id"), col("component").as("cluster_id"))
    val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    labels
      .join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private def dedupCluster(s: SparkSession, dir: String): DataFrame =
    clusterWith(s, dir,
      graft.operators.ConnectedComponents.minLabelPropagation(_, ClusterMaxIter))

  // dedup_cluster_star — the SAME clustering through the large-star/
  // small-star contraction operator (O(log n) rounds on ANY diameter —
  // the adversarial-diameter scale path that label propagation lacks),
  // sharing dedup_cluster's recursive-CTE oracle VERBATIM: two different
  // distributed CC algorithms and an independent transitive-closure
  // formulation must all agree bit-for-bit.
  private def dedupClusterStar(s: SparkSession, dir: String): DataFrame =
    clusterWith(s, dir,
      graft.operators.StarContraction.connectedComponents(_, ClusterMaxIter))

  // -------------------------------------------------------------------
  // dedup_lsh_quality — the EVALUATION a pipeline runs before trusting
  // its LSH parameters: exact corpus-wide shingle-Jaccard ground truth
  // vs the band-bucket candidate set, as a precision/recall row per
  // threshold. Truth pairs come from the shingle-postings equi-join
  // (pairs sharing >= 1 shingle — the standard exact set-similarity
  // plan; cost = sum over shingles of df², which this corpus bounds
  // because no shingle is stopword-frequent; at web scale the standard
  // prefix/df filter caps the hot postings) plus the size-ratio prune
  // keyed to the lowest evaluated threshold (provably lossless there,
  // and the oracle runs WITHOUT the prune as the soundness check).
  // Candidate pairs below a threshold count against precision whether
  // or not they share a shingle (missing truth rows coalesce to 0).
  // -------------------------------------------------------------------
  // Thresholds sit in the high-similarity regime the band parameters
  // target. They also set the prefix length (below): at t = 0.3 the
  // prefix keeps 70% of every doc's shingles and — on a tiny-vocab
  // corpus where almost every doc pair shares SOME shingle — candidate
  // generation degenerates to all-pairs no matter the filter (measured:
  // 60x for 10x data). At t >= 0.8 the prefix is the ~15 RAREST
  // shingles per doc and candidates are bounded by rare-shingle df².
  private val EvalThresholds = Seq(0.8, 0.9)

  private def dedupLshQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tMin = EvalThresholds.min
    val withSets = shingled(s, dir)
      .select(col("doc_id"), expr("array_distinct(shh)").as("sh"))
      .withColumn("sz", size(col("sh")).cast("long"))
      .localCheckpoint()
    val tokens = withSets.select(col("doc_id"), col("sz"), explode(col("sh")).as("h"))
    // PREFIX FILTER (ppjoin): a naive postings equi-join costs
    // sum over shingles of df² — measured 60x for 10x data on the sf1
    // replica, whose cipher folds every copy back into one 31-word
    // vocabulary (the stopword-shingle blowup in miniature). With a
    // consistent global order (df asc, hash asc), any pair with
    // J >= tMin shares its order-minimal common shingle inside BOTH
    // docs' prefixes of length |d| - ceil(tMin*|d|) + 1 (if all shared
    // shingles sat in a suffix of size ceil(tMin*|d|) - 1, the overlap
    // bound |A∩B| >= ceil(tMin*|A|) is violated) — so joining prefix
    // postings only is LOSSLESS for every evaluated threshold, and the
    // df-hot shingles live in the suffixes, exactly the postings the
    // join must not expand. The oracle computes truth WITHOUT the
    // prefix filter: the hash match is the completeness proof.
    val dfTbl = tokens.groupBy("h").agg(count(lit(1)).as("df"))
    val prefix = tokens
      .join(dfTbl, "h")
      .withColumn(
        "rk",
        row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df").asc, col("h").asc)
        )
      )
      // prefix length carries the SAME 1e-6 slack as the size prune below:
      // truth/tp compare the 6-dp-ROUNDED j, so a pair with raw j in
      // [tMin - 5e-7, tMin) rounds INTO the oracle's truth set and must
      // not be prefix-pruned here (ADVICE r8) — the slackened overlap
      // bound ceil((tMin-1e-6)*|d|) keeps every such pair's minimal
      // common shingle inside both prefixes
      .filter(col("rk") <= col("sz") - ceil(lit(tMin - 1e-6) * col("sz")).cast("long") + 1)
      .select("doc_id", "sz", "h")
    val candPairs = prefix
      .as("a")
      .join(
        prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.sz"), col("b.sz")).cast("double") >=
            greatest(col("a.sz"), col("b.sz")) * (tMin - 1e-6)
      )
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact verification only on the prefix-surviving candidates
    val jp = candPairs
      .join(withSets.select(col("doc_id").as("doc_a"), col("sh").as("sha"), col("sz").as("sza")), "doc_a")
      .join(withSets.select(col("doc_id").as("doc_b"), col("sh").as("shb"), col("sz").as("szb")), "doc_b")
      .withColumn("n_common", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .select(
        col("doc_a"),
        col("doc_b"),
        Norm.rnd(col("n_common") / (col("sza") + col("szb") - col("n_common")).cast("double"), 6)
          .as("j")
      )
      .localCheckpoint() // consumed per threshold AND by the candidate join
    val th = EvalThresholds.toDF("threshold")
    val truth = jp
      .crossJoin(broadcast(th))
      .filter(col("j") >= col("threshold"))
      .groupBy("threshold")
      .agg(count(lit(1)).as("n_truth"))
    val candj = lshPairsRaw(s, dir)
      .select("doc_a", "doc_b")
      .join(jp, Seq("doc_a", "doc_b"), "left")
      .select(coalesce(col("j"), lit(0.0)).as("j0"))
    val cand = candj
      .crossJoin(broadcast(th))
      .groupBy("threshold")
      .agg(
        count(lit(1)).as("n_cand"),
        sum(when(col("j0") >= col("threshold"), 1L).otherwise(0L)).as("tp")
      )
    th.join(cand, Seq("threshold"), "left")
      .join(truth, Seq("threshold"), "left")
      .select(
        col("threshold"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_cand"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("n_truth"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"),
        when(coalesce(col("n_cand"), lit(0L)) === 0, 0.0)
          .otherwise(Norm.rnd(col("tp") / col("n_cand").cast("double"), 6))
          .as("prec"),
        when(coalesce(col("n_truth"), lit(0L)) === 0, 0.0)
          .otherwise(Norm.rnd(col("tp") / col("n_truth").cast("double"), 6))
          .as("rec")
      )
      .transform(Norm.ordered(_, col("threshold")))
  }

  private val dedupLshQualitySql: String = {
    val thValues = EvalThresholds.map(t => s"(CAST($t AS DOUBLE))").mkString(", ")
    s"""WITH $bandsCteSql,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |),
       |dsq AS (SELECT doc_id, list_distinct($shingleFromWhDuck) AS sh FROM dw),
       |jp AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    round(len(list_intersect(a.sh, b.sh))
       |          / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 6) + 0.0 AS j
       |  FROM dsq a JOIN dsq b ON a.doc_id < b.doc_id
       |),
       |th(threshold) AS (VALUES $thValues),
       |tr AS (
       |  SELECT threshold, CAST(count(*) AS BIGINT) AS n_truth
       |  FROM jp CROSS JOIN th WHERE j >= threshold GROUP BY threshold
       |),
       |cj AS (
       |  SELECT c.doc_a, c.doc_b, coalesce(jp.j, 0.0) AS j0
       |  FROM cand c LEFT JOIN jp ON c.doc_a = jp.doc_a AND c.doc_b = jp.doc_b
       |),
       |cd AS (
       |  SELECT threshold, CAST(count(*) AS BIGINT) AS n_cand,
       |         CAST(sum(CASE WHEN j0 >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS tp
       |  FROM cj CROSS JOIN th GROUP BY threshold
       |)
       |SELECT th.threshold,
       |  CAST(coalesce(tr.n_truth, 0) AS BIGINT) AS n_truth,
       |  CAST(coalesce(cd.n_cand, 0) AS BIGINT) AS n_cand,
       |  CAST(coalesce(cd.tp, 0) AS BIGINT) AS tp,
       |  CAST(coalesce(cd.n_cand, 0) - coalesce(cd.tp, 0) AS BIGINT) AS fp,
       |  CAST(coalesce(tr.n_truth, 0) - coalesce(cd.tp, 0) AS BIGINT) AS fn,
       |  CASE WHEN coalesce(cd.n_cand, 0) = 0 THEN 0.0
       |       ELSE round(cd.tp / CAST(cd.n_cand AS DOUBLE), 6) + 0.0 END AS prec,
       |  CASE WHEN coalesce(tr.n_truth, 0) = 0 THEN 0.0
       |       ELSE round(cd.tp / CAST(tr.n_truth AS DOUBLE), 6) + 0.0 END AS rec
       |FROM th LEFT JOIN cd ON th.threshold = cd.threshold
       |        LEFT JOIN tr ON th.threshold = tr.threshold
       |ORDER BY th.threshold""".stripMargin
  }

  // -------------------------------------------------------------------
  // dedup_lsh_quality_sampled — the 100-TB form of the LSH quality eval
  // (SCALE.md round-9: the full eval's exact-truth term is the set-
  // similarity join whose Σ df² cost was measured to the WALL on the
  // degenerate pinned-vocab corpus — 80 GB of spill at 100×, no lossless
  // filter exists against it). Production evaluates on a SAMPLE: exact
  // truth only for pairs touching a deterministic doc panel (doc_id %
  // SampleStride), generated as sampled-postings × all-postings — cost
  // Σ df_sample·df, the |sample|/|corpus| fraction of the full term and
  // immune to the stopword degeneracy (the hot shingle contributes
  // df_sample·df, not df²). Precision/recall keep the full eval's exact
  // semantics restricted to sampled pairs: a candidate pair outside jp
  // shares no shingle with any sampled doc, so its true j is 0 and the
  // coalesce is exact, not an approximation. The serving path (banding +
  // verify) is untouched — only the eval's truth generation is sampled.
  // -------------------------------------------------------------------
  private val SampleStride = 4L
  // The panel must be FIXED-SIZE as the corpus grows — a constant-FRACTION
  // sample only divides the Σ df² wall by the stride, it doesn't remove
  // it. The id cap bounds the panel to the base id range (inert at every
  // gate SF, where all doc_ids sit below it; on the 100× replica it pins
  // the panel to the copy-0 docs), making the truth term Σ df_panel·df —
  // linear in corpus size even on the pinned-vocab degenerate corpus.
  private val SamplePanelCap = 1000000L

  private def dedupLshQualitySampled(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val withSets = shingled(s, dir)
      .select(col("doc_id"), expr("array_distinct(shh)").as("sh"))
      .withColumn("sz", size(col("sh")).cast("long"))
      .localCheckpoint()
    val tokens = withSets.select(col("doc_id"), explode(col("sh")).as("h"))
    val qtokens =
      tokens.filter(col("doc_id") % SampleStride === 0 && col("doc_id") < SamplePanelCap)
    val candPairs = qtokens
      .as("a")
      .join(tokens.as("b"), col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b")
      )
      .distinct()
    val jp = candPairs
      .join(withSets.select(col("doc_id").as("doc_a"), col("sh").as("sha"), col("sz").as("sza")), "doc_a")
      .join(withSets.select(col("doc_id").as("doc_b"), col("sh").as("shb"), col("sz").as("szb")), "doc_b")
      .withColumn("n_common", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .select(
        col("doc_a"),
        col("doc_b"),
        Norm.rnd(col("n_common") / (col("sza") + col("szb") - col("n_common")).cast("double"), 6)
          .as("j")
      )
      .localCheckpoint() // consumed per threshold AND by the candidate join
    val th = EvalThresholds.toDF("threshold")
    val truth = jp
      .crossJoin(broadcast(th))
      .filter(col("j") >= col("threshold"))
      .groupBy("threshold")
      .agg(count(lit(1)).as("n_truth"))
    val candj = lshPairsRaw(s, dir)
      .select("doc_a", "doc_b")
      .filter(
        (col("doc_a") % SampleStride === 0 && col("doc_a") < SamplePanelCap) ||
          (col("doc_b") % SampleStride === 0 && col("doc_b") < SamplePanelCap)
      )
      .join(jp, Seq("doc_a", "doc_b"), "left")
      .select(coalesce(col("j"), lit(0.0)).as("j0"))
    val cand = candj
      .crossJoin(broadcast(th))
      .groupBy("threshold")
      .agg(
        count(lit(1)).as("n_cand"),
        sum(when(col("j0") >= col("threshold"), 1L).otherwise(0L)).as("tp")
      )
    th.join(cand, Seq("threshold"), "left")
      .join(truth, Seq("threshold"), "left")
      .select(
        col("threshold"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_cand"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("n_truth"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"),
        when(coalesce(col("n_cand"), lit(0L)) === 0, 0.0)
          .otherwise(Norm.rnd(col("tp") / col("n_cand").cast("double"), 6))
          .as("prec"),
        when(coalesce(col("n_truth"), lit(0L)) === 0, 0.0)
          .otherwise(Norm.rnd(col("tp") / col("n_truth").cast("double"), 6))
          .as("rec")
      )
      .transform(Norm.ordered(_, col("threshold")))
  }

  private val dedupLshQualitySampledSql: String = {
    val thValues = EvalThresholds.map(t => s"(CAST($t AS DOUBLE))").mkString(", ")
    s"""WITH $bandsCteSql,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |  WHERE (a.doc_id % $SampleStride = 0 AND a.doc_id < $SamplePanelCap)
       |     OR (b.doc_id % $SampleStride = 0 AND b.doc_id < $SamplePanelCap)
       |),
       |dsq AS (SELECT doc_id, list_distinct($shingleFromWhDuck) AS sh FROM dw),
       |jp AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    round(len(list_intersect(a.sh, b.sh))
       |          / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 6) + 0.0 AS j
       |  FROM dsq a JOIN dsq b ON a.doc_id < b.doc_id
       |    AND ((a.doc_id % $SampleStride = 0 AND a.doc_id < $SamplePanelCap)
       |      OR (b.doc_id % $SampleStride = 0 AND b.doc_id < $SamplePanelCap))
       |  WHERE len(list_intersect(a.sh, b.sh)) > 0
       |),
       |th(threshold) AS (VALUES $thValues),
       |tr AS (
       |  SELECT threshold, CAST(count(*) AS BIGINT) AS n_truth
       |  FROM jp CROSS JOIN th WHERE j >= threshold GROUP BY threshold
       |),
       |cj AS (
       |  SELECT c.doc_a, c.doc_b, coalesce(jp.j, 0.0) AS j0
       |  FROM cand c LEFT JOIN jp ON c.doc_a = jp.doc_a AND c.doc_b = jp.doc_b
       |),
       |cd AS (
       |  SELECT threshold, CAST(count(*) AS BIGINT) AS n_cand,
       |         CAST(sum(CASE WHEN j0 >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS tp
       |  FROM cj CROSS JOIN th GROUP BY threshold
       |)
       |SELECT th.threshold,
       |  CAST(coalesce(tr.n_truth, 0) AS BIGINT) AS n_truth,
       |  CAST(coalesce(cd.n_cand, 0) AS BIGINT) AS n_cand,
       |  CAST(coalesce(cd.tp, 0) AS BIGINT) AS tp,
       |  CAST(coalesce(cd.n_cand, 0) - coalesce(cd.tp, 0) AS BIGINT) AS fp,
       |  CAST(coalesce(tr.n_truth, 0) - coalesce(cd.tp, 0) AS BIGINT) AS fn,
       |  CASE WHEN coalesce(cd.n_cand, 0) = 0 THEN 0.0
       |       ELSE round(cd.tp / CAST(cd.n_cand AS DOUBLE), 6) + 0.0 END AS prec,
       |  CASE WHEN coalesce(tr.n_truth, 0) = 0 THEN 0.0
       |       ELSE round(cd.tp / CAST(tr.n_truth AS DOUBLE), 6) + 0.0 END AS rec
       |FROM th LEFT JOIN cd ON th.threshold = cd.threshold
       |        LEFT JOIN tr ON th.threshold = tr.threshold
       |ORDER BY th.threshold""".stripMargin
  }

  // -------------------------------------------------------------------
  // dedup_keep_best — canonical-document selection, the step after
  // clustering: within each near-dup cluster keep the LONGEST member
  // (n_chars desc, doc_id asc tie-break — the "keep the most complete
  // copy" rule production dedup uses; keep-first-id is corpus_prep's
  // greedy). The per-cluster window is scale-safe: clusters are LSH
  // candidate components, whose size is bounded by near-dup group size,
  // not corpus size — millions of small partitions, never one big one.
  // Clustering runs through STAR CONTRACTION, not label propagation:
  // the 10× replica (SCALE.md) produces a candidate component of
  // diameter > 25, where propagation hits its round cap and fails
  // loudly while contraction's O(log n) rounds finish — the pipeline
  // step gets the algorithm that survives adversarial diameters.
  // -------------------------------------------------------------------
  private def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val labels = graft.operators.StarContraction
      .connectedComponents(lshPairsRaw(s, dir).select(col("doc_a"), col("doc_b")), ClusterMaxIter)
      .select(col("vertex").as("doc_id"), col("component").as("cluster_id"))
    val sized = labels
      .join(Tables.documents(s, dir).select(col("doc_id"), col("n_chars")), "doc_id")
    val w = Window.partitionBy("cluster_id").orderBy(col("n_chars").desc, col("doc_id").asc)
    sized
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("n_chars"), col("keep"))
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val dedupKeepBestSql: String =
    s"""WITH RECURSIVE $bandsCteSql,
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
       |lbl AS (SELECT s AS doc_id, min(d) AS cluster_id FROM reach GROUP BY 1)
       |SELECT l.doc_id, l.cluster_id, dd.n_chars,
       |       (row_number() OVER (PARTITION BY l.cluster_id
       |                           ORDER BY dd.n_chars DESC, l.doc_id) = 1) AS keep
       |FROM lbl l JOIN documents dd ON dd.doc_id = l.doc_id
       |ORDER BY l.doc_id""".stripMargin

  private val dedupClusterSql: String = {
    s"""WITH RECURSIVE $bandsCteSql,
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
       |lbl AS (SELECT s AS doc_id, min(d) AS cluster_id FROM reach GROUP BY 1),
       |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size FROM lbl GROUP BY 1)
       |SELECT l.doc_id, l.cluster_id, z.cluster_size
       |FROM lbl l JOIN sz z ON l.cluster_id = z.cluster_id
       |ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // dedup_incremental — new-batch-vs-existing-corpus dedup, the shape a
  // production pipeline actually runs: the corpus's MinHash signature /
  // band relation is PERSISTED (here: the docs with doc_id % 10 != 0
  // stand in for the stored signature table; at scale it is a parquet
  // table bucketed by (band, band_key) — see SCALE.md), and each new
  // batch (doc_id % 10 == 0) computes signatures for ITS docs only and
  // probes the band buckets. Cost per batch ∝ batch size + matched
  // buckets — the corpus is never rescanned, never self-joined. Output:
  // per batch doc, how many corpus near-dup candidates it hit and the
  // strongest one (most shared bands, ties to the smallest doc id).
  // -------------------------------------------------------------------
  private def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val bands = bandsFrom(minhashSigRaw(s, dir).localCheckpoint())
    val batchBands = bands.filter(col("doc_id") % 10 === 0)
    val corpusBands = bands.filter(col("doc_id") % 10 =!= 0)
    val cand = batchBands
      .as("a")
      .join(
        corpusBands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key")
      )
      .groupBy(col("a.doc_id").as("batch_doc"), col("b.doc_id").as("corpus_doc"))
      .agg(count(lit(1)).as("n_shared"))
    val w = Window.partitionBy("batch_doc").orderBy(col("n_shared").desc, col("corpus_doc").asc)
    val best = cand
      .withColumn("n_candidates", count(lit(1)).over(Window.partitionBy("batch_doc")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    docs(s, dir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("batch_doc"))
      .join(best, Seq("batch_doc"), "left")
      .select(
        col("batch_doc"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("corpus_doc").as("best_match"),
        col("n_shared").as("best_bands")
      )
      .transform(Norm.ordered(_, col("batch_doc")))
  }

  private val dedupIncrementalSql: String =
    s"""WITH $bandsCteSql,
       |cand AS (
       |  SELECT a.doc_id AS batch_doc, b.doc_id AS corpus_doc, CAST(count(*) AS BIGINT) AS n_shared
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
       |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
       |  GROUP BY 1, 2
       |), best AS (
       |  SELECT batch_doc, corpus_doc, n_shared,
       |         row_number() OVER (PARTITION BY batch_doc ORDER BY n_shared DESC, corpus_doc) AS rn,
       |         CAST(count(*) OVER (PARTITION BY batch_doc) AS BIGINT) AS n_candidates
       |  FROM cand
       |)
       |SELECT d.doc_id AS batch_doc,
       |  coalesce(b.n_candidates, 0) AS n_candidates,
       |  b.corpus_doc AS best_match, b.n_shared AS best_bands
       |FROM documents d LEFT JOIN best b ON b.batch_doc = d.doc_id AND b.rn = 1
       |WHERE d.doc_id % 10 = 0
       |ORDER BY batch_doc""".stripMargin

  // -------------------------------------------------------------------
  // dedup_substring — exact-substring duplication (Lee et al. 2022,
  // "Deduplicating Training Data Makes Language Models Better": verbatim
  // cross-document substrings are the highest-precision dup signal, and
  // MinHash misses them when the surrounding documents differ). The
  // suffix-array formulation doesn't distribute; the equivalent
  // shuffle-native decomposition:
  //   1. shingle: every SubK-char window hash with its position — ONE
  //      compiled pass per doc (graft_winhashes), posexplode to rows;
  //   2. guard: drop window hashes occurring > SubMaxBucket times
  //      corpus-wide (boilerplate guard — at 100 TB a ubiquitous header
  //      would otherwise square one bucket; a no-op at contract SFs,
  //      hottest window count is 5 at sf0.01);
  //   3. candidate pairs from the bucket equi-join on the window HASH
  //      (group size, not corpus size, bounds the quadratic term — same
  //      law as every other pair generator in this file);
  //   4. maximal runs by gaps-and-islands on each (doc_a, doc_b,
  //      pa - pb) diagonal: consecutive matching windows are one run of
  //      length (#windows + SubK - 1) chars;
  //   5. report pairs with a run >= SubMinRun chars: (max_run, n_runs).
  // All arithmetic is integer DetHash window hashes — both engines join
  // on the same 61-bit hashes, so collision behavior is identical and
  // the result hash-matches exactly.
  // -------------------------------------------------------------------
  private val SubK = 24 // window width (chars)
  private val SubMinRun = 50 // report runs at least this long
  private val SubMaxBucket = 64 // corpus-wide window-frequency guard
  // 2x the largest measured-good regime (137M windows -> 824M pairs,
  // 332 s; ~10x that hit the r12 spill wall) — see the guard below
  private val MaxSubstringWindows = 275000000L

  private def dedupSubstring(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    // localCheckpoint: the shingle relation feeds both sides of the pair
    // self-join (same rationale as the MinHash signature relation above).
    // spark.graft.lowMemoryMode recomputes instead — see the banded
    // twin's scaladoc for the measured small-executor OOM this avoids.
    val sh0 = docs(s, dir)
      .select(col("doc_id"), posexplode(expr(s"graft_winhashes(text, $SubK, 1)")).as(Seq("pos", "h")))
    val sh =
      if (s.conf.getOption("spark.graft.lowMemoryMode").contains("true")) sh0
      else sh0.localCheckpoint()
    // Loud scale guard (round 14, the evt_discord MaxSpineHours
    // precedent): the stride-1 pair relation grows superlinearly in
    // window count (measured 824M pairs at 137M windows; the r12 run at
    // ~10x that spilled to a wall sorting ~8B pairs). Past 2x the
    // measured-good regime this exact form is the wrong tool — fail
    // loudly and point at the banded twin instead of melting the
    // cluster.
    //
    // Guard + frequent-set in ONE aggregation job (ADVICE r14: the r14
    // sh.count() added a full extra pass over the checkpointed shingle
    // relation to every execution). The window total is folded into the
    // same per-hash frequency aggregate that builds the boilerplate set:
    // sum(c) over the frequency relation IS the window count. The
    // frequent set is tiny by construction inside the guarded regime
    // (hottest window count is 5 at sf0.01; boilerplate-only at scale),
    // so it collects to the driver and applies as a broadcast-literal
    // NOT-isin — map-side, value-identical to the anti-join the r13 form
    // used and to the ok-join the oracle spells out.
    //
    // The DRIVER-side collect is CAPPED (ADVICE r15): in the adversarial
    // over-bound regime the set can reach ~nWindows/SubMaxBucket (~4.3M
    // boxed entries near the bound), and an uncapped collect_list would
    // OOM the driver BEFORE the loud MaxSubstringWindows guard below can
    // fire. slice() trims the list executor-side, so THIS aggregate hands
    // the driver at most MaxIsinLiterals + 1 hashes and the normal-regime
    // path never builds a giant boxed list or a multi-million-literal
    // Catalyst In tree; n_bad carries the true size, and when it exceeds
    // the cap the set is re-derived as a DataFrame and applied as a
    // broadcast anti-join (the r13 form). Note the over-cap regime still
    // moves the full bad set through the driver once — building the
    // broadcast relation collects it — but as compact unsafe rows inside
    // Spark's broadcast machinery (with its own size guards), not as a
    // boxed collect_list row plus a literal expression tree; the cap
    // bounds the EXPRESSION path, not driver traffic entirely (ADVICE
    // r16).
    val MaxIsinLiterals = 4096
    val freqRow = sh
      .groupBy("h")
      .agg(count(lit(1)).as("c"))
      .agg(
        sum(col("c")).as("total"),
        count(when(col("c") > SubMaxBucket, lit(1))).as("n_bad"),
        slice(
          collect_list(when(col("c") > SubMaxBucket, col("h"))),
          1,
          MaxIsinLiterals + 1
        ).as("bad")
      )
      .first()
    val nWindows = if (freqRow.isNullAt(0)) 0L else freqRow.getLong(0)
    if (nWindows > MaxSubstringWindows)
      throw new IllegalStateException(
        s"dedup_substring: $nWindows shingle windows exceed MaxSubstringWindows=$MaxSubstringWindows " +
          s"and the stride-1 pair relation is superlinear (~6 pairs/window measured, sorted whole) — " +
          s"use dedup_substring_banded (identical results, seed-banded aggregate) or shard the corpus"
      )
    val nBad = freqRow.getLong(1)
    val badHashes = freqRow.getSeq[Long](2)
    val shf =
      if (nBad == 0L) sh
      else if (nBad <= MaxIsinLiterals) sh.filter(!col("h").isin(badHashes: _*))
      else {
        // over-cap boilerplate set: re-derive it distributed and apply
        // map-side — one extra aggregation pass, only in this regime
        val bad = sh.groupBy("h").agg(count(lit(1)).as("c")).filter(col("c") > SubMaxBucket).select("h")
        sh.join(broadcast(bad), Seq("h"), "left_anti")
      }
    val pr = shf
      .as("a")
      .join(shf.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        col("a.pos").as("pa"),
        col("b.pos").as("pb")
      )
    val wr = Window.partitionBy(col("doc_a"), col("doc_b"), col("pa") - col("pb")).orderBy("pa")
    val runs = pr
      .withColumn("grp", col("pa") - row_number().over(wr))
      .groupBy(col("doc_a"), col("doc_b"), (col("pa") - col("pb")).as("diag"), col("grp"))
      .agg((count(lit(1)) + SubK - 1).as("run_len"))
    runs
      .filter(col("run_len") >= SubMinRun)
      .groupBy("doc_a", "doc_b")
      .agg(max("run_len").as("max_run"), count(lit(1)).as("n_runs"))
      .transform(Norm.ordered(_, col("doc_a"), col("doc_b")))
  }

  // -------------------------------------------------------------------
  // dedup_substring_banded — the scale-safe twin of dedup_substring
  // (VERDICT r12 item 3: the stride-1 formulation was the suite's one
  // superlinear residual, 147x at 100x data). The pair relation is the
  // superlinear term (measured 31M at 10x -> 824M at 100x, 2.6x above
  // data growth, SubstrPhases): every window of every shared fragment
  // pairs up. The band splits detection from measurement:
  //   SEED PASS — only a-side windows at pos % 13 == 0 join (one
  //   thirteenth of the pair term). A reported run needs
  //   SubMinRun - SubK + 1 = 27 consecutive shared windows on one
  //   (doc_a, doc_b, diagonal), and any 27 consecutive positions
  //   contain >= 2 multiples of 13 — so "diagonal with >= 2 seed
  //   matches" is a NECESSARY condition, computed by a hash aggregate
  //   (no sort). Guarding ONE join side bounds the bucket product
  //   (the b-match shares the a-window's hash, so its guard status is
  //   identical).
  //   ISLAND PASS — the exact gaps-and-islands run measurement runs
  //   only over SURVIVOR DOCS (truth-scale: 2.6k true pairs at 10x),
  //   restricted to survivor diagonals; dropped diagonals have < 27
  //   consecutive windows and can contribute nothing, so the twin
  //   shares dedup_substring's oracle VERBATIM (the evt_discord_banded
  //   precedent).
  //
  // Measured negatives (round 13, kept as findings):
  //  - doc-level banding via winnowing-minimizer candidates
  //    (graft_minimizers) does NOT pay here: 97% of replica docs share
  //    a single >= 39-char fragment, 87% still pair under a
  //    two-same-diagonal-minimizers test (283k candidates vs 2.6k true
  //    pairs) — fragment sharing is pervasive, only the diagonal count
  //    separates true >= 50-char runs. The kernel stays registered
  //    (MinimizersSpec) for fingerprint consumers.
  //  - an UNSEEDED diagonal-count band (aggregate over the full 824M
  //    pair relation) measured 645 s at 100x vs the exact twin's 332 s:
  //    a hash aggregate over mostly-unique (pair, diag) keys spills
  //    worse than the window sort it replaces. Banding must shrink the
  //    relation BEFORE the aggregate; the 13-stride seed does.
  // -------------------------------------------------------------------
  private val SubSeedStride = 13 // 27 consecutive positions hold >= 2 multiples

  private def dedupSubstringBanded(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    // LOW-MEMORY MODE (round 16, measured on the 10x replica against
    // 2-executor clusters — SCALE.md "Multi-executor execution"): this
    // query's two throughput choices trade executor MEMORY for wall
    // time, and both fail hard (not slow) when per-executor heap is
    // small relative to the corpus slice:
    //  - the SHUFFLE_HASH joins are worth 2.8x wall (6.77 s hinted vs
    //    18.91 s unhinted, fresh JVM min-of-3) by skipping the window
    //    relation sorts — but a hash build cannot spill;
    //  - the shingle localCheckpoint trades one graft_winhashes pass
    //    per consumer (3 consumers) for holding the full window
    //    relation in executor storage — at 10x that is GBs per
    //    executor, a heap OOM on 8 GB executors before any join runs.
    // Default keeps both (the 100-TB deployment sizes executors at
    // >= 2 GB/slot and storage-headroom for its corpus slice);
    // spark.graft.lowMemoryMode=true flips both to the O(1)-memory
    // forms — spillable SMJ joins + recompute-per-consumer.
    //
    // THIRD lever under lowMemoryMode (VERDICT r16 item 4): the r16
    // memory table showed 2×4thr×8 GB + lowMemoryMode still failing at
    // 10x — but in the window-relation SMJ, minutes past the checkpoint
    // OOM it had fixed. The remaining term is per-TASK slice size: at
    // the session's 32 shuffle partitions a 137M-window relation sorts
    // ~4M rows per task per side, and four concurrent tasks' sort+join
    // buffers exceed a 2 GB slot. Memory per task is windows/partitions,
    // so the fixed-heap fix is more partitions, not more heap: in lowMem
    // both sides of both window-hash joins are explicitly repartitioned
    // by h into lowMemParts (default 8× spark.sql.shuffle.partitions,
    // override spark.graft.lowMemoryMode.substringPartitions). Both
    // sides share one partitioning, so the SMJ adds no extra exchange,
    // and an explicit numPartitions is exempt from AQE coalescing —
    // the slices stay small by construction. Value-identical (hash
    // partitioning only relocates groups); measured passing on
    // 2×4thr×8 GB at 10x — SCALE.md "Memory pressure".
    val lowMem = s.conf.getOption("spark.graft.lowMemoryMode").contains("true")
    val lowMemParts =
      if (!lowMem) 0
      else s.conf
        .getOption("spark.graft.lowMemoryMode.substringPartitions")
        .map(_.toInt)
        .getOrElse(8 * s.conf.get("spark.sql.shuffle.partitions").toInt)
    def hashHint(df: DataFrame): DataFrame = if (lowMem) df else df.hint("SHUFFLE_HASH")
    def slicePart(df: DataFrame): DataFrame =
      if (lowMem) df.repartition(lowMemParts, col("h")) else df
    val sh0 = docs(s, dir)
      .select(col("doc_id"), posexplode(expr(s"graft_winhashes(text, $SubK, 1)")).as(Seq("pos", "h")))
    // feeds the guard, the seed join, and the island pass
    val sh = if (lowMem) sh0 else sh0.localCheckpoint()
    val bad = sh.groupBy("h").agg(count(lit(1)).as("c")).filter(col("c") > SubMaxBucket).select("h")
    val shf = sh.join(broadcast(bad), Seq("h"), "left_anti") // map-side guard
    val seeds = shf.filter(col("pos") % SubSeedStride === 0)
    val survivors = seeds
      .transform(slicePart)
      .as("a")
      // build side = the 1/13 seed relation; no 213M-row sort
      .transform(hashHint)
      .join(shf.transform(slicePart).as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        (col("a.pos") - col("b.pos")).as("diag")
      )
      .agg(count(lit(1)).as("nseed"))
      .filter(col("nseed") >= 2)
      .select("doc_a", "doc_b", "diag")
      .localCheckpoint() // truth-scale: feeds the doc filter AND the diag restriction
    val sdocs = survivors
      .select(col("doc_a").as("doc_id"))
      .union(survivors.select(col("doc_b").as("doc_id")))
      .distinct()
    val shfS = shf.join(broadcast(sdocs), "doc_id")
    val prS = shfS
      .transform(slicePart)
      .as("a")
      // skip the SMJ sort of both survivor-doc sides
      .transform(hashHint)
      .join(shfS.transform(slicePart).as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        col("a.pos").as("pa"),
        col("b.pos").as("pb")
      )
      .withColumn("diag", col("pa") - col("pb"))
      .join(broadcast(survivors), Seq("doc_a", "doc_b", "diag"))
    val wr = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag")).orderBy("pa")
    val runs = prS
      .withColumn("grp", col("pa") - row_number().over(wr))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg((count(lit(1)) + SubK - 1).as("run_len"))
    runs
      .filter(col("run_len") >= SubMinRun)
      .groupBy("doc_a", "doc_b")
      .agg(max("run_len").as("max_run"), count(lit(1)).as("n_runs"))
      .transform(Norm.ordered(_, col("doc_a"), col("doc_b")))
  }

  private val dedupSubstringSql: String =
    s"""WITH pos AS (
       |  SELECT doc_id, text, unnest(generate_series(1, length(text) - ${SubK - 1})) AS p
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, CAST(p AS BIGINT) AS p,
       |         ${DetHash.polyHashSql(s"substr(text, CAST(p AS INTEGER), $SubK)")} AS h
       |  FROM pos
       |), ok AS (SELECT h FROM sh GROUP BY h HAVING count(*) <= $SubMaxBucket),
       |shf AS (SELECT sh.* FROM sh JOIN ok ON sh.h = ok.h),
       |pr AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.p AS pa, b.p AS pb
       |  FROM shf a JOIN shf b ON a.h = b.h AND a.doc_id < b.doc_id
       |), d AS (
       |  SELECT *, pa - pb AS diag,
       |         pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS grp
       |  FROM pr
       |), runs AS (
       |  SELECT doc_a, doc_b, diag, grp, CAST(count(*) + ${SubK - 1} AS BIGINT) AS run_len
       |  FROM d GROUP BY 1, 2, 3, 4
       |)
       |SELECT doc_a, doc_b, max(run_len) AS max_run, CAST(count(*) AS BIGINT) AS n_runs
       |FROM runs WHERE run_len >= $SubMinRun GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // dedup_substring_incremental — the production shape of exact-substring
  // dedup: the corpus shingle index (window-hash -> (doc, pos), the
  // bucket-guard applied on the CORPUS side where the boilerplate lives)
  // is built once and persisted; each incoming batch (doc_id % 10 == 0)
  // shingles ITS documents only and probes the index with a bucket
  // equi-join. Cost per batch ∝ batch size + matched buckets — the
  // corpus is never rescanned and never self-joined (same law as
  // dedup_incremental). Output: per batch doc, how many corpus docs
  // share a >= SubIncMinRun-char verbatim run, and the strongest match
  // (longest run, ties to the smallest corpus doc id).
  // -------------------------------------------------------------------
  private val SubIncMinRun = 40

  private def dedupSubstringIncremental(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val sh = docs(s, dir)
      .select(col("doc_id"), posexplode(expr(s"graft_winhashes(text, $SubK, 1)")).as(Seq("pos", "h")))
      .localCheckpoint() // the persisted-index stand-in (corpus + batch split below)
    val corpus = sh.filter(col("doc_id") % 10 =!= 0)
    val batch = sh.filter(col("doc_id") % 10 === 0)
    val ok = corpus.groupBy("h").agg(count(lit(1)).as("c")).filter(col("c") <= SubMaxBucket).select("h")
    val pr = batch
      .as("a")
      .join(corpus.join(ok, "h").as("b"), col("a.h") === col("b.h"))
      .select(
        col("a.doc_id").as("batch_doc"),
        col("b.doc_id").as("corpus_doc"),
        col("a.pos").as("pa"),
        col("b.pos").as("pb")
      )
    val wr = Window.partitionBy(col("batch_doc"), col("corpus_doc"), col("pa") - col("pb")).orderBy("pa")
    val runs = pr
      .withColumn("grp", col("pa") - row_number().over(wr))
      .groupBy(col("batch_doc"), col("corpus_doc"), (col("pa") - col("pb")).as("diag"), col("grp"))
      .agg((count(lit(1)) + SubK - 1).as("run_len"))
      .filter(col("run_len") >= SubIncMinRun)
    val perPair = runs
      .groupBy("batch_doc", "corpus_doc")
      .agg(max("run_len").as("pair_run"))
    val w = Window.partitionBy("batch_doc").orderBy(col("pair_run").desc, col("corpus_doc").asc)
    val best = perPair
      .withColumn("n_matches", count(lit(1)).over(Window.partitionBy("batch_doc")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    docs(s, dir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("batch_doc"))
      .join(best, Seq("batch_doc"), "left")
      .select(
        col("batch_doc"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("corpus_doc").as("best_match"),
        col("pair_run").as("best_run")
      )
      .transform(Norm.ordered(_, col("batch_doc")))
  }

  private val dedupSubstringIncrementalSql: String =
    s"""WITH pos AS (
       |  SELECT doc_id, text, unnest(generate_series(1, length(text) - ${SubK - 1})) AS p
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, CAST(p AS BIGINT) AS p,
       |         ${DetHash.polyHashSql(s"substr(text, CAST(p AS INTEGER), $SubK)")} AS h
       |  FROM pos
       |), corpus AS (SELECT * FROM sh WHERE doc_id % 10 <> 0),
       |batch AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
       |ok AS (SELECT h FROM corpus GROUP BY h HAVING count(*) <= $SubMaxBucket),
       |pr AS (
       |  SELECT a.doc_id AS batch_doc, b.doc_id AS corpus_doc, a.p AS pa, b.p AS pb
       |  FROM batch a JOIN corpus b ON a.h = b.h JOIN ok ON b.h = ok.h
       |), d AS (
       |  SELECT *, pa - pb AS diag,
       |         pa - row_number() OVER (PARTITION BY batch_doc, corpus_doc, pa - pb ORDER BY pa) AS grp
       |  FROM pr
       |), runs AS (
       |  SELECT batch_doc, corpus_doc, diag, grp, CAST(count(*) + ${SubK - 1} AS BIGINT) AS run_len
       |  FROM d GROUP BY 1, 2, 3, 4
       |), pair AS (
       |  SELECT batch_doc, corpus_doc, max(run_len) AS pair_run
       |  FROM runs WHERE run_len >= $SubIncMinRun GROUP BY 1, 2
       |), best AS (
       |  SELECT batch_doc, corpus_doc, pair_run,
       |         row_number() OVER (PARTITION BY batch_doc ORDER BY pair_run DESC, corpus_doc) AS rn,
       |         CAST(count(*) OVER (PARTITION BY batch_doc) AS BIGINT) AS n_matches
       |  FROM pair
       |)
       |SELECT d.doc_id AS batch_doc,
       |  coalesce(b.n_matches, 0) AS n_matches,
       |  b.corpus_doc AS best_match, b.pair_run AS best_run
       |FROM documents d LEFT JOIN best b ON b.batch_doc = d.doc_id AND b.rn = 1
       |WHERE d.doc_id % 10 = 0
       |ORDER BY batch_doc""".stripMargin

  // -------------------------------------------------------------------
  // dedup_cdc — CONTENT-DEFINED CHUNKING dedup (the rsync/LBFS/FastCDC
  // family, and the storage-level dedup every large corpus store runs):
  // chunk boundaries are cut where the rolling 8-char window hash
  // satisfies `h % 16 == 0`, so an insertion early in a document shifts
  // only the chunks it touches — the property fixed-block dedup
  // (text_para_dedup) fundamentally lacks. Expected chunk ≈ divisor
  // chars (measured mean 13.2); duplicate chunks across docs are
  // reported by (chunk_hash, length) group. Scale shape: the boundary
  // set and every chunk hash are computed INSIDE one projection per doc
  // (native graft_winhashes scan → HOF boundary filter → per-chunk
  // polyHash fold), so document text NEVER crosses a shuffle — only
  // (hash, len, doc_id) chunk rows reach the dedup exchange, exactly
  // like dedup_substring's shingle relation.
  // -------------------------------------------------------------------
  private val CdcW = 8
  private val CdcDiv = 16L

  private def dedupCdc(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val bnds =
      s"""concat(
         |  array(CAST(0 AS BIGINT)),
         |  filter(
         |    transform(graft_winhashes(text, $CdcW, 1),
         |              (h, i) -> IF(i > 0 AND h % $CdcDiv = 0, CAST(i AS BIGINT), CAST(-1 AS BIGINT))),
         |    v -> v >= 0),
         |  array(CAST(length(text) AS BIGINT)))""".stripMargin
    val chunkHash = DetHash.polyHashSparkSql(
      s"substring(text, CAST(cstart + 1 AS INT), CAST(cend - cstart AS INT))"
    )
    Tables
      .documents(s, dir)
      .select(col("doc_id"), col("text"), expr(bnds).as("bnds"))
      .select(
        col("doc_id"),
        col("text"),
        expr(
          "explode(transform(sequence(2, size(bnds)), i -> struct(element_at(bnds, CAST(i AS INT) - 1) AS cstart, element_at(bnds, CAST(i AS INT)) AS cend)))"
        ).as("span")
      )
      .select(
        col("doc_id"),
        (col("span.cend") - col("span.cstart")).as("clen"),
        col("span.cstart").as("cstart"),
        col("span.cend").as("cend"),
        col("text")
      )
      .select(col("doc_id"), col("clen"), expr(chunkHash).as("chash"))
      .groupBy("chash", "clen")
      .agg(
        count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("rep_doc")
      )
      .filter(col("n_occ") >= 2)
      .transform(Norm.ordered(_, col("chash"), col("clen")))
  }

  private val dedupCdcSql: String = {
    val wh = DetHash.polyHashSql(s"substr(text, CAST(p + 1 AS INTEGER), $CdcW)")
    val ch = DetHash.polyHashSql("substr(text, CAST(cstart + 1 AS INTEGER), CAST(clen AS INTEGER))")
    s"""WITH wh AS (
       |  SELECT doc_id, p, $wh AS h
       |  FROM (SELECT doc_id, text, unnest(generate_series(0, length(text) - $CdcW)) AS p FROM documents)
       |), cuts AS (
       |  SELECT doc_id, p FROM wh WHERE p > 0 AND h % $CdcDiv = 0
       |), interior AS (
       |  SELECT doc_id, COALESCE(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0) AS cstart, p AS cend
       |  FROM cuts
       |), lastc AS (
       |  SELECT d.doc_id, COALESCE(max(c.p), 0) AS cstart, CAST(length(d.text) AS BIGINT) AS cend
       |  FROM documents d LEFT JOIN cuts c ON d.doc_id = c.doc_id
       |  GROUP BY d.doc_id, length(d.text)
       |), spans AS (
       |  SELECT doc_id, cstart, cend - cstart AS clen FROM interior
       |  UNION ALL SELECT doc_id, cstart, cend - cstart FROM lastc
       |), chunks AS (
       |  SELECT s.doc_id, s.clen, $ch AS chash
       |  FROM spans s JOIN documents d ON s.doc_id = d.doc_id
       |)
       |SELECT chash, clen, CAST(count(*) AS BIGINT) AS n_occ,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, min(doc_id) AS rep_doc
       |FROM chunks GROUP BY 1, 2 HAVING count(*) >= 2
       |ORDER BY chash, clen""".stripMargin
  }

  // -------------------------------------------------------------------
  // dedup_lsh_curve — the BANDING S-CURVE calibration, the third leg of
  // the LSH evaluation stack (dedup_minhash_est calibrates signatures,
  // dedup_lsh_quality measures end-to-end precision/recall; this one
  // checks the (b, r) DESIGN): per true-Jaccard decile over the sampled
  // panel pairs, the empirical candidate-detection rate beside the
  // textbook analytic curve P(s) = 1 − (1 − s^r)^b at the bucket
  // midpoint — b = 4 bands, r = 2 rows, so the powers are INTEGER and
  // the curve is plain repeated multiplication (no libm pow — the known
  // cross-engine trap). The analytic curve assumes random permutations;
  // the shipped DetHash permutations are 8 fixed ones, and how far the
  // empirical rate strays from the curve at each decile IS the finding
  // (more perms → tighter concentration — the dedup_minhash_est story
  // at the banding level). Truth pairs come from the SAMPLED panel
  // machinery (Σ df_panel·df, the 100-TB-safe term).
  // -------------------------------------------------------------------
  private def dedupLshCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val withSets = shingled(s, dir)
      .select(col("doc_id"), expr("array_distinct(shh)").as("sh"))
      .withColumn("sz", size(col("sh")).cast("long"))
      .localCheckpoint()
    val tokens = withSets.select(col("doc_id"), explode(col("sh")).as("h"))
    val qtokens =
      tokens.filter(col("doc_id") % SampleStride === 0 && col("doc_id") < SamplePanelCap)
    val jp = qtokens
      .as("a")
      .join(tokens.as("b"), col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b")
      )
      .distinct()
      .join(withSets.select(col("doc_id").as("doc_a"), col("sh").as("sha"), col("sz").as("sza")), "doc_a")
      .join(withSets.select(col("doc_id").as("doc_b"), col("sh").as("shb"), col("sz").as("szb")), "doc_b")
      .withColumn("n_common", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .select(
        col("doc_a"),
        col("doc_b"),
        Norm.rnd(col("n_common") / (col("sza") + col("szb") - col("n_common")).cast("double"), 6)
          .as("j")
      )
    val cands = lshPairsRaw(s, dir)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("is_cand"))
    val b = NumPerms / BandRows
    val mid = "(CAST(bucket AS DOUBLE) * 0.1 + 0.05)"
    val sr = (1 to BandRows).map(_ => mid).mkString(" * ")
    val q = s"(1.0 - $sr)"
    val analytic = s"round(1.0 - ${(1 to b).map(_ => q).mkString(" * ")}, 6) + 0.0"
    jp.join(cands, Seq("doc_a", "doc_b"), "left")
      .select(expr("least(CAST(9 AS BIGINT), CAST(floor(j * 10.0) AS BIGINT))").as("bucket"), coalesce(col("is_cand"), lit(0L)).as("det"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"), sum(col("det")).as("n_detected"))
      .select(
        col("bucket"),
        col("n_pairs"),
        col("n_detected"),
        Norm.rnd(col("n_detected") / col("n_pairs").cast("double"), 6).as("emp_rate"),
        expr(analytic).as("analytic_rate")
      )
      .transform(Norm.ordered(_, col("bucket")))
  }

  private val dedupLshCurveSql: String = {
    val b = NumPerms / BandRows
    val mid = "(CAST(bucket AS DOUBLE) * 0.1 + 0.05)"
    val sr = (1 to BandRows).map(_ => mid).mkString(" * ")
    val q = s"(1.0 - $sr)"
    val analytic = s"round(1.0 - ${(1 to b).map(_ => q).mkString(" * ")}, 6) + 0.0"
    s"""WITH $bandsCteSql,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |),
       |dsq AS (SELECT doc_id, list_distinct($shingleFromWhDuck) AS sh FROM dw),
       |jp AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    round(len(list_intersect(a.sh, b.sh))
       |          / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 6) + 0.0 AS j
       |  FROM dsq a JOIN dsq b ON a.doc_id < b.doc_id
       |    AND ((a.doc_id % $SampleStride = 0 AND a.doc_id < $SamplePanelCap)
       |      OR (b.doc_id % $SampleStride = 0 AND b.doc_id < $SamplePanelCap))
       |  WHERE len(list_intersect(a.sh, b.sh)) > 0
       |),
       |flagged AS (
       |  SELECT least(CAST(9 AS BIGINT), CAST(floor(j.j * 10.0) AS BIGINT)) AS bucket,
       |         CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END AS det
       |  FROM jp j LEFT JOIN cand c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
       |)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(sum(det) AS BIGINT) AS n_detected,
       |       round(sum(det) / CAST(count(*) AS DOUBLE), 6) + 0.0 AS emp_rate,
       |       $analytic AS analytic_rate
       |FROM flagged GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_lsh_curve" -> dedupLshCurve,
    "dedup_cdc" -> dedupCdc,
    "dedup_substring_incremental" -> dedupSubstringIncremental,
    "dedup_substring" -> dedupSubstring,
    "dedup_substring_banded" -> dedupSubstringBanded,
    "dedup_incremental" -> dedupIncremental,
    "dedup_cluster" -> dedupCluster,
    "dedup_cluster_star" -> dedupClusterStar,
    "dedup_keep_best" -> dedupKeepBest,
    "dedup_lsh_quality" -> dedupLshQuality,
    "dedup_lsh_quality_sampled" -> dedupLshQualitySampled,
    "dedup_exact" -> dedupExact,
    "dedup_minhash" -> minhashSig,
    "dedup_minhash_est" -> minhashEst,
    "dedup_ensemble" -> dedupEnsemble,
    "dedup_lsh_pairs" -> lshPairs,
    "dedup_simhash" -> simhash,
    "dedup_simhash_pairs" -> simhashPairs,
    "dedup_ngram_jaccard" -> ngramJaccard,
    "dedup_containment" -> containment,
    "dedup_embed_cos" -> embedCos
  )

  val oracle: Map[String, String] = Map(
    "dedup_lsh_curve" -> dedupLshCurveSql,
    "dedup_cdc" -> dedupCdcSql,
    "dedup_substring_incremental" -> dedupSubstringIncrementalSql,
    "dedup_substring" -> dedupSubstringSql,
    "dedup_substring_banded" -> dedupSubstringSql, // twin shares the exact oracle VERBATIM
    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_cluster" -> dedupClusterSql,
    "dedup_cluster_star" -> dedupClusterSql,
    "dedup_keep_best" -> dedupKeepBestSql,
    "dedup_lsh_quality" -> dedupLshQualitySql,
    "dedup_lsh_quality_sampled" -> dedupLshQualitySampledSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_minhash" -> minhashSigSql,
    "dedup_minhash_est" -> minhashEstSql,
    "dedup_ensemble" -> dedupEnsembleSql,
    "dedup_lsh_pairs" -> lshPairsSql,
    "dedup_simhash" -> simhashSql,
    "dedup_simhash_pairs" -> simhashPairsSql,
    "dedup_ngram_jaccard" -> ngramJaccardSql,
    "dedup_containment" -> containmentSql,
    "dedup_embed_cos" -> embedCosSql
  )
}
