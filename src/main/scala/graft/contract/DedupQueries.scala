package graft.contract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ccm.DetHash

/** Deduplication operators over `documents.parquet` / `embeddings.parquet`:
  * exact (hash-groupBy), MinHash signatures + LSH banding (candidate pairs
  * from bucket joins only — never all-pairs), SimHash, n-gram Jaccard within
  * blocking keys, and embedding-cosine near-dup.
  *
  * Everything is integer [[DetHash]] arithmetic (exact cross-engine parity)
  * except Jaccard/cosine ratios, which are ratios of exact quantities and
  * only rounded cosmetically.
  *
  * Scale notes (100 TB): the expensive step everywhere is a shuffle keyed on
  * a hash (band key, blocking key, label) whose group sizes are bounded by
  * design — band width controls bucket size for MinHash-LSH, the blocking
  * key bounds the quadratic Jaccard/cosine verification. No operator here
  * compares all pairs.
  */
object DedupQueries {
  private val P = DetHash.P
  private val NumPerms = 8 // MinHash signature length
  private val BandRows = 2 // LSH: 4 bands x 2 rows

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  /** Spark SQL text: list of polyHashes of word 3-gram shingles. */
  private val shingleHashesSpark: String = {
    val sh = "concat_ws(' ', element_at(split(text, ' '), i + 1), " +
      "element_at(split(text, ' '), i + 2), element_at(split(text, ' '), i + 3))"
    s"transform(transform(sequence(0, size(split(text, ' ')) - 3), i -> $sh), " +
      s"sh -> ${DetHash.polyHashSparkSql("sh")})"
  }

  /** DuckDB text: same shingle hash list. */
  private val shingleHashesDuck: String = {
    val sh = "string_split(text, ' ')[i + 1] || ' ' || string_split(text, ' ')[i + 2] || ' ' || string_split(text, ' ')[i + 3]"
    s"list_transform([$sh for i in range(len(string_split(text, ' ')) - 2)], " +
      s"sh -> ${DetHash.polyHashSql("sh")})"
  }

  private def permSpark(h: String, k: Int): String =
    s"(($h) * ${2L * k + 1L} + ${k.toLong * DetHash.A_SAMPLE + 7L}) % $P"

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
      .orderBy("text_hash")

  private val dedupExactSql: String =
    s"""SELECT ${DetHash.polyHashSql("text")} AS text_hash,
       |  CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin

  // -------------------------------------------------------------------
  // dedup_minhash — MinHash signatures: k affine permutations of the
  // shingle-hash set, min per permutation. Wide (mh0..mh7) output.
  // -------------------------------------------------------------------
  private def minhashSig(s: SparkSession, dir: String): DataFrame = {
    val cols = (0 until NumPerms).map { k =>
      expr(s"array_min(transform($shingleHashesSpark, h -> ${permSpark("h", k)}))").as(s"mh$k")
    }
    docs(s, dir).select(col("doc_id") +: cols: _*).orderBy("doc_id")
  }

  private val minhashSigSql: String = {
    val cols = (0 until NumPerms)
      .map(k => s"list_min(list_transform($shingleHashesDuck, h -> ${DetHash.minhashPermSql("h", k)})) AS mh$k")
      .mkString(",\n  ")
    s"SELECT doc_id,\n  $cols\nFROM documents ORDER BY doc_id"
  }

  // -------------------------------------------------------------------
  // dedup_lsh_pairs — LSH banding over the MinHash signature: band key =
  // fold of the band's rows; candidate pairs = docs sharing any band key.
  // The join is keyed on (band, band_key) so bucket size — not corpus
  // size — bounds the pair blowup.
  // -------------------------------------------------------------------
  private def bandKeys(numBands: Int): Seq[(Int, String, String)] =
    (0 until numBands).map { b =>
      val ks = (BandRows * b) until (BandRows * (b + 1))
      val spark = ks.map(k => s"mh$k").reduce((a, c) => s"(($a) * 31 + $c) % $P")
      (b, spark, spark) // identical arithmetic text works in both dialects
    }

  private def lshPairs(s: SparkSession, dir: String): DataFrame = {
    val numBands = NumPerms / BandRows
    val sig = minhashSig(s, dir)
    val bands = bandKeys(numBands)
    val bandExprs = bands.map { case (b, e, _) => expr(s"named_struct('band', $b, 'band_key', $e)") }
    val long = sig
      .select(col("doc_id"), explode(array(bandExprs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    val a = long.as("a")
    val b = long.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .orderBy("doc_a", "doc_b")
  }

  private val lshPairsSql: String = {
    val numBands = NumPerms / BandRows
    val bands = bandKeys(numBands)
    val bandSelect = bands
      .map { case (b, _, e) => s"SELECT doc_id, $b AS band, $e AS band_key FROM sig" }
      .mkString("\n  UNION ALL\n  ")
    s"""WITH sig AS (${minhashSigSql.replace("ORDER BY doc_id", "")}),
       |bands AS (
       |  $bandSelect
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared_bands
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin
  }

  // -------------------------------------------------------------------
  // dedup_simhash — 24-bit SimHash over word hashes + near-dup pairs
  // within the same source at Hamming distance <= 6.
  // -------------------------------------------------------------------
  private val SimBits = 24

  private val wordHashesSpark = s"transform(split(text, ' '), w -> ${DetHash.polyHashSparkSql("w")})"
  private val wordHashesDuck = s"list_transform(string_split(text, ' '), w -> ${DetHash.polyHashSql("w")})"

  private val simhashSpark: String =
    s"""aggregate(transform(sequence(0, ${SimBits - 1}), j ->
       |  CASE WHEN aggregate($wordHashesSpark, CAST(0 AS BIGINT),
       |         (a, h) -> a + ((h div CAST(pow(2, j) AS BIGINT)) % 2) * 2 - 1) > 0
       |       THEN CAST(pow(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END),
       |  CAST(0 AS BIGINT), (a, b) -> a + b)""".stripMargin

  private val simhashDuck: String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(0, ${SimBits - 1}), j ->
       |  CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($wordHashesDuck,
       |         h -> ((h // CAST(pow(2, j) AS BIGINT)) % 2) * 2 - 1)), (a, b) -> a + b) > 0
       |       THEN CAST(pow(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
       |  (a, b) -> a + b)""".stripMargin

  private def simhash(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("source"), expr(simhashSpark).as("simhash"))
      .orderBy("doc_id")

  private val simhashSql: String =
    s"SELECT doc_id, source, $simhashDuck AS simhash\nFROM documents ORDER BY doc_id"

  private def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = simhash(s, dir)
    sig.as("a")
      .join(
        sig.as("b"),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id")
      )
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming")
      )
      .filter(col("hamming") <= 6)
      .orderBy("doc_a", "doc_b")
  }

  private val simhashPairsSql: String =
    s"""WITH sig AS (SELECT doc_id, source, $simhashDuck AS simhash FROM documents)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.source = b.source AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
       |ORDER BY doc_a, doc_b""".stripMargin

  // -------------------------------------------------------------------
  // dedup_ngram_jaccard — n-gram Jaccard similarity verification within a
  // blocking key (source): |A ∩ B| / |A ∪ B| over distinct shingle hashes.
  // -------------------------------------------------------------------
  private def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val withSets = docs(s, dir)
      .select(col("doc_id"), col("source"), expr(s"array_distinct($shingleHashesSpark)").as("sh"))
    withSets
      .as("a")
      .join(withSets.as("b"), col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("long").as("n_common"),
        (size(col("a.sh")) + size(col("b.sh")) - size(array_intersect(col("a.sh"), col("b.sh"))))
          .cast("long")
          .as("n_union")
      )
      .withColumn("jaccard", round(col("n_common") / col("n_union").cast("double"), 6))
      .filter(col("n_common") > 0)
      .orderBy("doc_a", "doc_b")
  }

  private val ngramJaccardSql: String =
    s"""WITH ds AS (
       |  SELECT doc_id, source, list_distinct($shingleHashesDuck) AS sh FROM documents
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
       |  CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_union,
       |  round(len(list_intersect(a.sh, b.sh)) / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 6) AS jaccard
       |FROM ds a JOIN ds b ON a.source = b.source AND a.doc_id < b.doc_id
       |WHERE len(list_intersect(a.sh, b.sh)) > 0
       |ORDER BY doc_a, doc_b""".stripMargin

  // -------------------------------------------------------------------
  // dedup_embed_cos — embedding-cosine near-dup within a label block.
  // Dot/norm are left-fold double arithmetic in identical order in both
  // engines, so the cosine is bit-identical before rounding.
  // -------------------------------------------------------------------
  private val CosThreshold = 0.2

  private val dotSpark = "aggregate(zip_with(%s, %s, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
  private def dotDuck(a: String, b: String) =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(generate_series(1, 64), i -> $a[CAST(i AS INTEGER)] * $b[CAST(i AS INTEGER)])), (acc, v) -> acc + v)"

  private def embDocs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))

  private def embedCos(s: SparkSession, dir: String): DataFrame = {
    val e = embDocs(s, dir)
    val dotAB = expr(dotSpark.format("a.v", "b.v"))
    val normA = sqrt(expr(dotSpark.format("a.v", "a.v")))
    val normB = sqrt(expr(dotSpark.format("b.v", "b.v")))
    e.as("a")
      .join(e.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        round(dotAB / (normA * normB), 6).as("cos_sim")
      )
      .filter(col("cos_sim") >= CosThreshold)
      .orderBy("vec_a", "vec_b")
  }

  private val embedCosSql: String = {
    val cos = s"round(${dotDuck("a.v", "b.v")} / (sqrt(${dotDuck("a.v", "a.v")}) * sqrt(${dotDuck("b.v", "b.v")})), 6)"
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $cos AS cos_sim
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE $cos >= $CosThreshold
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_minhash" -> minhashSig,
    "dedup_lsh_pairs" -> lshPairs,
    "dedup_simhash" -> simhash,
    "dedup_simhash_pairs" -> simhashPairs,
    "dedup_ngram_jaccard" -> ngramJaccard,
    "dedup_embed_cos" -> embedCos
  )

  val oracle: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_minhash" -> minhashSigSql,
    "dedup_lsh_pairs" -> lshPairsSql,
    "dedup_simhash" -> simhashSql,
    "dedup_simhash_pairs" -> simhashPairsSql,
    "dedup_ngram_jaccard" -> ngramJaccardSql,
    "dedup_embed_cos" -> embedCosSql
  )
}
