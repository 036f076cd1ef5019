package graft.contract

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ccm.DetHash
import graft.functions.GraftFunctions

/** Probabilistic-sketch operators — the approximate-query layer a 100 TB
  * engine leans on when exact answers are too expensive to shuffle:
  *
  *  - `sketch_hll`     HyperLogLog distinct-count estimate (m=64 registers)
  *                     next to the exact count it approximates;
  *  - `sketch_cms_topk` Count-Min-Sketch heavy hitters (depth 4, width 8192)
  *                     over document word bigrams, estimate vs exact;
  *  - `sketch_bloom_join` Bloom-filter semi-join pre-filter (k=3 hashes,
  *                     m=8192 bits) with its false-positive census.
  *
  * Every sketch here is built from [[DetHash]] arithmetic — pure int64
  * expressions both engines evaluate identically — so unlike engine-native
  * sketches (`approx_count_distinct` HLL++ implementations differ between
  * Spark and DuckDB) each one is DuckDB-oracle-checkable bit-exactly.
  *
  * Scale notes (what changes at 100 TB, and what does not):
  *  - HLL registers: the per-group state is m integers regardless of input
  *    size; `groupBy(group, register).max(rho)` partially aggregates
  *    map-side, so the shuffle carries at most |groups|·m rows — this is
  *    THE pattern for distinct-counting a firehose (the exact
  *    `countDistinct` half of the query is the part that stops scaling).
  *    Real deployments raise m (2^14 registers = 16 KiB/group for ~0.8%
  *    error) — the plan shape is unchanged.
  *  - CMS: the sketch is depth·width counters built by one map-side-
  *    combined aggregation; estimates need only the candidate set, never
  *    a global sort. Width grows to 2^20+ at scale; depth stays 3-5.
  *  - Bloom: the bit set (m bits = 1 KiB here) ships as a broadcast and
  *    rows are filtered map-side BEFORE the expensive join shuffle —
  *    expressed relationally below (the broadcast hash join against the
  *    distinct-position set IS the bitmap probe), which is what makes it
  *    oracle-expressible. Spark's own `bloom_filter_agg`-based join
  *    pruning does the same thing with an opaque binary sketch.
  */
object SketchQueries {
  private val P = DetHash.P

  // ---- shared per-depth hash family: [[DetHash.rankHash]] with the depth
  // as its sampleId — i.e. a per-depth multiplier followed by a SQUARING
  // step mod P. The nonlinearity is load-bearing for power-of-two
  // bucketing: an AFFINE family (h*(2d+1)+c_d, the MinHash permutation)
  // is a bijection mod 2^k for every odd multiplier, so two keys that
  // collide in one sketch row collide in EVERY row (measured: CMS min-of-
  // depths repaired nothing, bloom k=3 behaved like k~1). Squaring mod a
  // prime breaks the shared linear structure, making rows independent.
  private def hashD(key: Column, d: Column, seed: Long): Column =
    DetHash.rankHashCol(key, d, lit(0L), seed)

  private def hashDSql(key: String, d: String, seed: Long): String =
    DetHash.rankHashSql(key, d, "0", seed)

  // =====================================================================
  // sketch_hll — HLL distinct l_orderkey per l_returnflag.
  // =====================================================================
  // Register math, fully integral: h = rankHash(orderkey) in [0, 2^31);
  // register = h % 64; w = h div 64 (< 2^25); rho = index of w's lowest
  // set bit + 1 (1..25), or 26 when w = 0. The harmonic mean is computed
  // in SCALED INTEGERS: each register contributes 2^(26 - max_rho) —
  // a BIGINT — so the cross-register sum is exact and order-independent;
  // the sole floating-point step is the final one-division estimate
  // alpha_64 * m^2 * 2^26 / S. (No small-range linear-counting branch:
  // it needs ln(), whose last ulp is libm-dependent — the raw estimator
  // is biased low at small cardinalities but ENGINE-EXACT, which is what
  // the oracle gate needs; the bias is visible next to n_exact.)
  private val HllM = 64
  private val HllWBits = 26 // w < 2^25, so rho in [1, 26]
  private val HllScale = 1L << HllWBits
  private val HllSeed = 77L
  // alpha_64 = 0.709 (Flajolet et al. 2007); Scala double literal
  // interpolation round-trips exactly, keeping both engines IEEE-identical
  private val HllNumerator: Double = 0.709 * HllM.toDouble * HllM.toDouble * HllScale.toDouble

  private def rhoCol(w: Column): Column =
    (1 to HllWBits - 1).foldRight(lit(HllWBits)) { (k, acc) =>
      when(w % (1L << k) === (1L << (k - 1)), lit(k)).otherwise(acc)
    }

  private def rhoSql(w: String): String = {
    val cases = (1 to HllWBits - 1)
      .map(k => s"WHEN ($w) % ${1L << k} = ${1L << (k - 1)} THEN $k")
      .mkString(" ")
    s"(CASE $cases ELSE $HllWBits END)"
  }

  private def sketchHll(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_orderkey"))
    val h = DetHash.rankHashCol(col("l_orderkey"), lit(0L), lit(0L), HllSeed)
    val regs = li
      .select(col("l_returnflag"), (h % HllM).as("reg"), rhoCol(shiftright(h, 6)).as("rho"))
      .groupBy(col("l_returnflag"), col("reg"))
      .agg(max(col("rho")).as("mj"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllWBits - mj)")).as("s_used"),
        count(lit(1)).as("n_used")
      )
      .select(
        col("l_returnflag"),
        Norm.rnd(
          lit(HllNumerator) / (col("s_used") + (lit(HllM.toLong) - col("n_used")) * HllScale).cast("double"),
          4
        ).as("hll_est")
      )
    val exact = li.groupBy("l_returnflag").agg(countDistinct(col("l_orderkey")).as("n_exact"))
    exact
      .join(regs, "l_returnflag")
      .select(col("l_returnflag"), col("n_exact"), col("hll_est"))
      .transform(Norm.ordered(_, col("l_returnflag")))
  }

  private val sketchHllSql: String = {
    val h = DetHash.rankHashSql("l_orderkey", "0", "0", HllSeed)
    s"""WITH r AS (
       |  SELECT l_returnflag, ($h) % $HllM AS reg, ${rhoSql(s"($h) // $HllM")} AS rho
       |  FROM lineitem
       |), m AS (
       |  SELECT l_returnflag, reg, max(rho) AS mj FROM r GROUP BY 1, 2
       |), z AS (
       |  SELECT l_returnflag,
       |         sum(CAST(1 AS BIGINT) << ($HllWBits - mj)) AS s_used,
       |         CAST(count(*) AS BIGINT) AS n_used
       |  FROM m GROUP BY 1
       |)
       |SELECT l.l_returnflag AS l_returnflag,
       |       CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_exact,
       |       round($HllNumerator / CAST(z.s_used + ($HllM - z.n_used) * $HllScale AS DOUBLE), 4) + 0.0 AS hll_est
       |FROM lineitem l JOIN z ON z.l_returnflag = l.l_returnflag
       |GROUP BY l.l_returnflag, z.s_used, z.n_used
       |ORDER BY l.l_returnflag""".stripMargin
  }

  // =====================================================================
  // sketch_cms_topk — Count-Min heavy hitters over word bigrams.
  // =====================================================================
  // Bigram hash combines the per-word [[DetHash.polyHash]]es
  // arithmetically — hb = (h1*131 + h2) % P — exactly like the dedup
  // shingles, so Spark rides the native graft_wordhashes scan. The
  // sketch: 4 rows of 8192 counters; cell(d, b) = count of bigram
  // occurrences with perm_d(hb) % 8192 = b; estimate(bigram) = min_d of
  // its 4 cells (>= exact by construction; collisions inflate it, the
  // min over independent rows repairs most of them — visible in the
  // output next to the exact count). Top 20 by (estimate desc, bigram).
  // WIDTH SIZING (load-bearing for a flat distribution like this corpus's
  // <= 961 bigrams over a 31-word vocabulary): top-k-by-ESTIMATE surfaces
  // whichever keys collided in ALL depths, so width must make that event
  // rare — P(all-d collision) = (1-e^(-keys/width))^depth, ~1e-4 at
  // 961/8192 x depth 4 (at width 2048 it was ~2%, i.e. ~19 of 961 keys —
  // exactly a fake top-20). Same rule at 100 TB: width a few x distinct
  // keys, 2^20+ counters is still KBs per executor.
  private val CmsDepth = 4
  private val CmsWidth = 8192
  private val CmsTopK = 20
  private val CmsSeed = 19L

  /** (bg: String, hb: Long, exact: Long) distinct bigrams with counts. */
  private def bigrams(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        posexplode(expr("arrays_zip(split(text, ' '), graft_wordhashes(text))"))
      )
      .select(
        col("doc_id"),
        col("pos"),
        col("col").getField("0").as("w"),
        col("col").getField("1").as("h")
      )
      .withColumn("w2", lead(col("w"), 1).over(Window.partitionBy("doc_id").orderBy("pos")))
      .withColumn("h2", lead(col("h"), 1).over(Window.partitionBy("doc_id").orderBy("pos")))
      .filter(col("w2").isNotNull)
      .select(
        concat(col("w"), lit(" "), col("w2")).as("bg"),
        ((col("h") * 131L + col("h2")) % P).as("hb")
      )
  }

  private def sketchCmsTopk(s: SparkSession, dir: String): DataFrame = {
    // one pass builds both the sketch and the candidate counts; checkpoint
    // so the two consumers don't re-run the window stage
    val bg = bigrams(s, dir).localCheckpoint()
    val cells = bg
      .select(explode(sequence(lit(0L), lit(CmsDepth - 1L))).as("d"), col("hb"))
      .select(col("d"), (hashD(col("hb"), col("d"), CmsSeed) % CmsWidth).as("bucket"))
      .groupBy("d", "bucket")
      .agg(count(lit(1)).as("c"))
    val cand = bg.groupBy("bg", "hb").agg(count(lit(1)).as("exact_count"))
    cand
      .select(col("bg"), col("hb"), col("exact_count"),
        explode(sequence(lit(0L), lit(CmsDepth - 1L))).as("d"))
      .select(col("bg"), col("exact_count"), col("d"),
        (hashD(col("hb"), col("d"), CmsSeed) % CmsWidth).as("bucket"))
      .join(cells, Seq("d", "bucket"))
      .groupBy("bg", "exact_count")
      .agg(min(col("c")).as("est_count"))
      .select(col("bg").as("bigram"), col("est_count"), col("exact_count"))
      .orderBy(col("est_count").desc, col("bigram"))
      .limit(CmsTopK)
  }

  private val sketchCmsTopkSql: String = {
    val bucket = s"(${hashDSql("hb", "d", CmsSeed)} % $CmsWidth)"
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws,
       |         list_transform(string_split(text, ' '), t -> ${DetHash.polyHashSql("t")}) AS wh
       |  FROM documents
       |), b0 AS (
       |  SELECT doc_id, unnest(list_transform(range(len(ws) - 1), i ->
       |           struct_pack(bg := ws[i + 1] || ' ' || ws[i + 2],
       |                       hb := (wh[i + 1] * 131 + wh[i + 2]) % $P))) AS u
       |  FROM w
       |), b AS (
       |  SELECT u.bg AS bg, u.hb AS hb FROM b0
       |), cells AS (
       |  SELECT d, $bucket AS bucket, CAST(count(*) AS BIGINT) AS c
       |  FROM b, (SELECT unnest(range($CmsDepth)) AS d)
       |  GROUP BY 1, 2
       |), cand AS (
       |  SELECT bg, hb, CAST(count(*) AS BIGINT) AS exact_count FROM b GROUP BY 1, 2
       |), cexp AS (
       |  SELECT cand.bg, cand.exact_count, dd.d, ${hashDSql("cand.hb", "dd.d", CmsSeed)} % $CmsWidth AS bucket
       |  FROM cand, (SELECT unnest(range($CmsDepth)) AS d) dd
       |)
       |SELECT cexp.bg AS bigram, min(cells.c) AS est_count, cexp.exact_count
       |FROM cexp JOIN cells ON cells.d = cexp.d AND cells.bucket = cexp.bucket
       |GROUP BY cexp.bg, cexp.exact_count
       |ORDER BY est_count DESC, bigram LIMIT $CmsTopK""".stripMargin
  }

  // =====================================================================
  // sketch_bloom_join — Bloom semi-join pre-filter + false-positive census.
  // =====================================================================
  // Build side: custkeys with an URGENT order over 400k (495 keys at
  // sf0.01) -> k=3 positions each in an m=8192-bit filter (~17% fill,
  // ~0.5% fpr). Probe side: every customer tests its 3 positions; it
  // passes iff all 3 are set. Per nation: customers, bloom passes, true
  // members, false positives — the filter's effectiveness report.
  private val BloomM = 8192
  private val BloomK = 3
  private val BloomSeed = 31L
  private val BloomPriceMin = 400000.0

  private def bloomPos(key: Column, d: Column): Column =
    hashD(key, d, BloomSeed) % BloomM

  private def sketchBloomJoin(s: SparkSession, dir: String): DataFrame = {
    val build = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > BloomPriceMin)
      .select(col("o_custkey")).distinct()
    // the bit set: ~1.5k distinct positions = the 1 KiB bitmap, relationally
    val bits = build
      .select(explode(sequence(lit(0L), lit(BloomK - 1L))).as("d"), col("o_custkey"))
      .select(bloomPos(col("o_custkey"), col("d")).as("pos"))
      .distinct()
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val probed = cust
      .select(col("c_custkey"), col("c_nationkey"),
        explode(sequence(lit(0L), lit(BloomK - 1L))).as("d"))
      .select(col("c_custkey"), col("c_nationkey"), bloomPos(col("c_custkey"), col("d")).as("pos"))
      .join(broadcast(bits), Seq("pos")) // map-side: the bitmap probe
      .groupBy("c_custkey", "c_nationkey")
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === BloomK)
      .select(col("c_custkey"), col("c_nationkey"))
    val trueMembers = cust.join(build, cust("c_custkey") === build("o_custkey"), "left_semi")
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    val passAgg = probed.groupBy("c_nationkey").agg(count(lit(1)).as("n_bloom_pass"))
    val trueAgg = trueMembers.groupBy("c_nationkey").agg(count(lit(1)).as("n_true_match"))
    cust
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
      .join(passAgg, Seq("c_nationkey"), "left")
      .join(trueAgg, Seq("c_nationkey"), "left")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("n_name"),
        col("n_customers"),
        coalesce(col("n_bloom_pass"), lit(0L)).as("n_bloom_pass"),
        coalesce(col("n_true_match"), lit(0L)).as("n_true_match"),
        (coalesce(col("n_bloom_pass"), lit(0L)) - coalesce(col("n_true_match"), lit(0L))).as("n_false_pos")
      )
      .transform(Norm.ordered(_, col("n_name")))
  }

  private val sketchBloomJoinSql: String = {
    val buildPos = s"(${hashDSql("o_custkey", "d", BloomSeed)} % $BloomM)"
    s"""WITH build AS (
       |  SELECT DISTINCT o_custkey FROM orders
       |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > $BloomPriceMin
       |), bits AS (
       |  SELECT DISTINCT $buildPos AS pos
       |  FROM build, (SELECT unnest(range($BloomK)) AS d)
       |), cpos AS (
       |  SELECT c.c_custkey, c.c_nationkey,
       |         ${s"(${hashDSql("c.c_custkey", "dd.d", BloomSeed)} % $BloomM)"} AS pos
       |  FROM customer c, (SELECT unnest(range($BloomK)) AS d) dd
       |), probed AS (
       |  SELECT cpos.c_custkey, cpos.c_nationkey
       |  FROM cpos JOIN bits ON bits.pos = cpos.pos
       |  GROUP BY 1, 2 HAVING count(*) = $BloomK
       |), truem AS (
       |  SELECT c.c_custkey, c.c_nationkey FROM customer c
       |  WHERE c.c_custkey IN (SELECT o_custkey FROM build)
       |)
       |SELECT n.n_name,
       |       CAST(count(*) AS BIGINT) AS n_customers,
       |       CAST(count(p.c_custkey) AS BIGINT) AS n_bloom_pass,
       |       CAST(count(t.c_custkey) AS BIGINT) AS n_true_match,
       |       CAST(count(p.c_custkey) - count(t.c_custkey) AS BIGINT) AS n_false_pos
       |FROM customer c
       |JOIN nation n ON n.n_nationkey = c.c_nationkey
       |LEFT JOIN probed p ON p.c_custkey = c.c_custkey
       |LEFT JOIN truem t ON t.c_custkey = c.c_custkey
       |GROUP BY n.n_name
       |ORDER BY n_name""".stripMargin
  }

  // =====================================================================
  // sketch_cms_error — the evaluation layer for the Count-Min sketch:
  // the FULL overestimation profile (not just the top-k surface) at two
  // widths side by side — 256 (deliberately undersized: keys/width ~3.7,
  // collisions everywhere) and the production 8192. Per width and bigram
  // the q-error est/exact is an exact integer ratio; the profile reports
  // exactly-right fraction, p50/p95 (EXACT order statistics via the rank
  // technique — no approximate percentile), and max. This is the
  // measurement that justifies sketch_cms_topk's width-sizing rule: the
  // same corpus that is ~fully exact at 8192 shows its true collision
  // inflation at 256.
  // =====================================================================
  private val CmsErrWidths = Seq(256, 8192)

  private def sketchCmsError(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bg = bigrams(s, dir).localCheckpoint()
    val wdf = broadcast(CmsErrWidths.toDF("width"))
    val cells = bg
      .select(explode(sequence(lit(0L), lit(CmsDepth - 1L))).as("d"), col("hb"))
      .crossJoin(wdf)
      .select(col("width"), col("d"), (hashD(col("hb"), col("d"), CmsSeed) % col("width")).as("bucket"))
      .groupBy("width", "d", "bucket")
      .agg(count(lit(1)).as("c"))
    val cand = bg.groupBy("bg", "hb").agg(count(lit(1)).as("exact_count"))
    val est = cand
      .crossJoin(wdf)
      .select(col("width"), col("bg"), col("exact_count"),
        explode(sequence(lit(0L), lit(CmsDepth - 1L))).as("d"),
        col("hb"))
      .withColumn("bucket", hashD(col("hb"), col("d"), CmsSeed) % col("width"))
      .join(cells, Seq("width", "d", "bucket"))
      .groupBy("width", "bg", "exact_count")
      .agg(min(col("c")).as("est_count"))
      .withColumn("q", col("est_count").cast("double") / col("exact_count"))
    val wRank = Window.partitionBy("width").orderBy(col("q").asc, col("bg").asc)
    val wAll = Window.partitionBy("width")
    est
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy("width")
      .agg(
        max(col("n")).as("n_keys"),
        sum(when(col("est_count") === col("exact_count"), 1L).otherwise(0L)).as("n_exact"),
        (round(max(when(col("rn") === expr("(n + 1) div 2"), col("q"))), 6) + lit(0.0)).as("p50_q"),
        (round(max(when(col("rn") === expr("(19 * n + 19) div 20"), col("q"))), 6) + lit(0.0)).as("p95_q"),
        (round(max(col("q")), 6) + lit(0.0)).as("max_q")
      )
      .transform(Norm.ordered(_, col("width")))
  }

  private val sketchCmsErrorSql: String = {
    val widths = CmsErrWidths.mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws,
       |         list_transform(string_split(text, ' '), t -> ${DetHash.polyHashSql("t")}) AS wh
       |  FROM documents
       |), b0 AS (
       |  SELECT doc_id, unnest(list_transform(range(len(ws) - 1), i ->
       |           struct_pack(bg := ws[i + 1] || ' ' || ws[i + 2],
       |                       hb := (wh[i + 1] * 131 + wh[i + 2]) % $P))) AS u
       |  FROM w
       |), b AS (
       |  SELECT u.bg AS bg, u.hb AS hb FROM b0
       |), wid AS (SELECT unnest([$widths]) AS width
       |), cells AS (
       |  SELECT width, d, ${hashDSql("hb", "d", CmsSeed)} % width AS bucket,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM b, (SELECT unnest(range($CmsDepth)) AS d), wid
       |  GROUP BY 1, 2, 3
       |), cand AS (
       |  SELECT bg, hb, CAST(count(*) AS BIGINT) AS exact_count FROM b GROUP BY 1, 2
       |), est AS (
       |  SELECT x.width, x.bg, x.exact_count, CAST(min(cells.c) AS BIGINT) AS est_count
       |  FROM (
       |    SELECT wid.width, cand.bg, cand.exact_count, dd.d, cand.hb,
       |           ${hashDSql("cand.hb", "dd.d", CmsSeed)} % wid.width AS bucket
       |    FROM cand, (SELECT unnest(range($CmsDepth)) AS d) dd, wid
       |  ) x
       |  JOIN cells ON cells.width = x.width AND cells.d = x.d AND cells.bucket = x.bucket
       |  GROUP BY 1, 2, 3
       |), q AS (
       |  SELECT *, CAST(est_count AS DOUBLE) / exact_count AS q FROM est
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY width ORDER BY q, bg) AS BIGINT) AS rn,
       |         CAST(count(*) OVER (PARTITION BY width) AS BIGINT) AS n
       |  FROM q
       |)
       |SELECT width, max(n) AS n_keys,
       |  CAST(sum(CASE WHEN est_count = exact_count THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       |  round(max(CASE WHEN rn = (n + 1) // 2 THEN q END), 6) + 0.0 AS p50_q,
       |  round(max(CASE WHEN rn = (19 * n + 19) // 20 THEN q END), 6) + 0.0 AS p95_q,
       |  round(max(q), 6) + 0.0 AS max_q
       |FROM ranked GROUP BY width ORDER BY width""".stripMargin
  }

  // =====================================================================
  // sketch_kmv_setops — KMV (k-minimum-values) distinct sketches with SET
  // ALGEBRA (Beyer et al. 2007): per set keep the k smallest item hashes;
  // N̂ = (k-1)·P / h_(k). Unlike HLL, KMV sketches support set
  // INTERSECTION: merge the two sketches, keep the k smallest of the
  // union (→ union estimate), and scale by the fraction of merged-top-k
  // items present in BOTH input sketches. Demonstrated on the distinct
  // l_orderkey sets of returnflags R and A, estimates next to exact.
  //
  // Scale: the per-set state is k (hash, key) pairs built by a LITERAL-
  // limit row_number window — map-side TopK heap before the exchange, so
  // a trillion-row set still ships only k rows per partition. Every
  // relation after the sketches is constant-size (≤ 2k rows; the merge
  // window's single partition is bounded by construction). Mergeability
  // is the point: set algebra runs on sketches alone, never re-scanning
  // the raw data. When a sketch holds the whole set (n < k) the estimate
  // degrades gracefully to the exact count — the standard KMV guard.
  // All hashes are DetHash int64; the only floats are the final
  // single-division estimates, written as ONE expression text shared
  // verbatim with the oracle (IEEE-identical), rounded 6 dp.
  // =====================================================================
  private val KmvK = 1024
  private val KmvSeed = 83L
  private val KmvFlagA = "R"
  private val KmvFlagB = "A"

  // the estimator texts, spliced into BOTH engines' expressions
  private def kmvEstExpr(hk: String, nsk: String): String =
    s"CASE WHEN $nsk < $KmvK THEN CAST($nsk AS DOUBLE) ELSE ${KmvK - 1}e0 * ${P}e0 / $hk END"
  private val kmvInterExpr: String =
    s"CASE WHEN n_u < $KmvK THEN CAST(inter_cnt AS DOUBLE) " +
      s"ELSE CAST(inter_cnt AS DOUBLE) / ${KmvK}e0 * union_est_raw END"

  private def sketchKmvSetops(s: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(s, dir)
      .filter(col("l_returnflag").isin(KmvFlagA, KmvFlagB))
      .select(col("l_returnflag").as("flag"), col("l_orderkey").as("key"))
      .distinct()
      // feeds the hash ranking AND both exact counts — one shuffle, reused
      .localCheckpoint()
    val h = DetHash.rankHashCol(col("key"), lit(0L), lit(0L), KmvSeed)
    val wF = Window.partitionBy("flag").orderBy(col("h").asc, col("key").asc)
    val sk = li
      .withColumn("h", h)
      .withColumn("rn", row_number().over(wF))
      .filter(col("rn") <= KmvK)
      // ≤ 2k rows; feeds per-flag stats, the merge, and two membership joins
      .localCheckpoint()
    val perFlag = sk
      .groupBy()
      .agg(
        max(when(col("flag") === KmvFlagA, col("h"))).as("hk_a"),
        sum(when(col("flag") === KmvFlagA, 1L).otherwise(0L)).as("nsk_a"),
        max(when(col("flag") === KmvFlagB, col("h"))).as("hk_b"),
        sum(when(col("flag") === KmvFlagB, 1L).otherwise(0L)).as("nsk_b")
      )
    val exact = li
      .groupBy()
      .agg(
        sum(when(col("flag") === KmvFlagA, 1L).otherwise(0L)).as("a_exact"),
        sum(when(col("flag") === KmvFlagB, 1L).otherwise(0L)).as("b_exact")
      )
    val mtop = sk
      .select("key", "h")
      .distinct()
      .withColumn("rn", row_number().over(Window.orderBy(col("h").asc, col("key").asc)))
      .filter(col("rn") <= KmvK)
      .localCheckpoint()
    val uagg = mtop.agg(max(col("h")).as("hk_u"), count(lit(1)).as("n_u"))
    val interCnt = mtop
      .join(sk.filter(col("flag") === KmvFlagA).select("key"), "key")
      .join(sk.filter(col("flag") === KmvFlagB).select("key"), "key")
      .agg(count(lit(1)).as("inter_cnt"))
    val exactU = li.select("key").distinct().agg(count(lit(1)).as("union_exact"))
    val exactI = li
      .groupBy("key")
      .agg(count(lit(1)).as("nf"))
      .filter(col("nf") === 2)
      .agg(count(lit(1)).as("inter_exact"))
    perFlag
      .crossJoin(exact)
      .crossJoin(uagg)
      .crossJoin(interCnt)
      .crossJoin(exactU)
      .crossJoin(exactI)
      .withColumn("union_est_raw", expr(kmvEstExpr("hk_u", "n_u")))
      .select(
        lit(KmvK).as("k"),
        col("a_exact"),
        Norm.rnd(expr(kmvEstExpr("hk_a", "nsk_a")), 6).as("a_est"),
        col("b_exact"),
        Norm.rnd(expr(kmvEstExpr("hk_b", "nsk_b")), 6).as("b_est"),
        col("union_exact"),
        Norm.rnd(col("union_est_raw"), 6).as("union_est"),
        col("inter_exact"),
        Norm.rnd(expr(kmvInterExpr), 6).as("inter_est")
      )
  }

  private val sketchKmvSetopsSql: String = {
    val h = DetHash.rankHashSql("key", "0", "0", KmvSeed)
    s"""WITH li AS (
       |  SELECT DISTINCT l_returnflag AS flag, l_orderkey AS key
       |  FROM lineitem WHERE l_returnflag IN ('$KmvFlagA', '$KmvFlagB')
       |), sk AS (
       |  SELECT * FROM (
       |    SELECT flag, key, h, row_number() OVER (PARTITION BY flag ORDER BY h, key) AS rn
       |    FROM (SELECT flag, key, $h AS h FROM li)
       |  ) WHERE rn <= $KmvK
       |), pf AS (
       |  SELECT max(CASE WHEN flag = '$KmvFlagA' THEN h END) AS hk_a,
       |         CAST(sum(CASE WHEN flag = '$KmvFlagA' THEN 1 ELSE 0 END) AS BIGINT) AS nsk_a,
       |         max(CASE WHEN flag = '$KmvFlagB' THEN h END) AS hk_b,
       |         CAST(sum(CASE WHEN flag = '$KmvFlagB' THEN 1 ELSE 0 END) AS BIGINT) AS nsk_b
       |  FROM sk
       |), ex AS (
       |  SELECT CAST(sum(CASE WHEN flag = '$KmvFlagA' THEN 1 ELSE 0 END) AS BIGINT) AS a_exact,
       |         CAST(sum(CASE WHEN flag = '$KmvFlagB' THEN 1 ELSE 0 END) AS BIGINT) AS b_exact
       |  FROM li
       |), mtop AS (
       |  SELECT * FROM (
       |    SELECT key, h, row_number() OVER (ORDER BY h, key) AS rn
       |    FROM (SELECT DISTINCT key, h FROM sk)
       |  ) WHERE rn <= $KmvK
       |), uagg AS (
       |  SELECT max(h) AS hk_u, CAST(count(*) AS BIGINT) AS n_u FROM mtop
       |), inter AS (
       |  SELECT CAST(count(*) AS BIGINT) AS inter_cnt
       |  FROM mtop m
       |  JOIN (SELECT key FROM sk WHERE flag = '$KmvFlagA') a ON m.key = a.key
       |  JOIN (SELECT key FROM sk WHERE flag = '$KmvFlagB') b ON m.key = b.key
       |), exu AS (
       |  SELECT CAST(count(DISTINCT key) AS BIGINT) AS union_exact FROM li
       |), exi AS (
       |  SELECT CAST(count(*) AS BIGINT) AS inter_exact
       |  FROM (SELECT key FROM li GROUP BY key HAVING count(*) = 2)
       |), base AS (
       |  SELECT *, ${kmvEstExpr("hk_u", "n_u")} AS union_est_raw
       |  FROM pf, ex, uagg, inter, exu, exi
       |)
       |SELECT $KmvK AS k,
       |  a_exact, round(${kmvEstExpr("hk_a", "nsk_a")}, 6) + 0.0 AS a_est,
       |  b_exact, round(${kmvEstExpr("hk_b", "nsk_b")}, 6) + 0.0 AS b_est,
       |  union_exact, round(union_est_raw, 6) + 0.0 AS union_est,
       |  inter_exact, round($kmvInterExpr, 6) + 0.0 AS inter_est
       |FROM base""".stripMargin
  }

  // =====================================================================
  // sketch_hll_error — HLL register-count sizing profile (the
  // sketch_cms_error methodology applied to the distinct sketch): the
  // SAME estimator at m = 16 / 64 / 256 registers side by side with the
  // exact count and the signed relative error — the measured basis for
  // the 1.04/√m error rule a production HLL is sized with (measured at
  // sf0.1: mean |rel_err| 0.258 / 0.054 / 0.015 at m = 16/64/256 vs the
  // rule's 0.26/0.13/0.065 — m=16 on the line, larger m beating it on
  // this 3-set panel). Each m block
  // reuses the integral register math (scaled-integer harmonic sum,
  // empty registers contributing 2^wBits, alpha_m as a round-trip Scala
  // literal); rel_err derives from the 4-dp-ROUNDED estimate so both
  // engines compare identical doubles.
  // =====================================================================
  private val HllErrMs = Seq(16, 64, 256)
  private def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  private def rhoColN(w: Column, wBits: Int): Column =
    (1 to wBits - 1).foldRight(lit(wBits)) { (k, acc) =>
      when(w % (1L << k) === (1L << (k - 1)), lit(k)).otherwise(acc)
    }

  private def rhoSqlN(w: String, wBits: Int): String = {
    val cases = (1 to wBits - 1)
      .map(k => s"WHEN ($w) % ${1L << k} = ${1L << (k - 1)} THEN $k")
      .mkString(" ")
    s"(CASE $cases ELSE $wBits END)"
  }

  private def sketchHllError(s: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(s, dir)
      .select(col("l_returnflag"), col("l_orderkey"))
      .localCheckpoint() // feeds one register pass per m + the exact count
    val h = DetHash.rankHashCol(col("l_orderkey"), lit(0L), lit(0L), HllSeed)
    def estOf(m: Int): DataFrame = {
      val regBits = Integer.numberOfTrailingZeros(m)
      val wBits = 32 - regBits
      val scale = 1L << wBits
      val numerator = hllAlpha(m) * m.toDouble * m.toDouble * scale.toDouble
      li.select(col("l_returnflag"), (h % m).as("reg"), rhoColN(shiftright(h, regBits), wBits).as("rho"))
        .groupBy(col("l_returnflag"), col("reg"))
        .agg(max(col("rho")).as("mj"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(expr(s"shiftleft(CAST(1 AS BIGINT), $wBits - mj)")).as("s_used"),
          count(lit(1)).as("n_used")
        )
        .select(
          col("l_returnflag"),
          lit(m.toLong).as("m"),
          Norm.rnd(
            lit(numerator) / (col("s_used") + (lit(m.toLong) - col("n_used")) * scale).cast("double"),
            4
          ).as("hll_est")
        )
    }
    val ests = HllErrMs.map(estOf).reduce(_.unionByName(_))
    val exact = li.groupBy("l_returnflag").agg(countDistinct(col("l_orderkey")).as("n_exact"))
    ests
      .join(exact, "l_returnflag")
      .select(
        col("l_returnflag"),
        col("m"),
        col("n_exact"),
        col("hll_est"),
        (round((col("hll_est") - col("n_exact").cast("double")) / col("n_exact").cast("double"), 6) + 0.0)
          .as("rel_err")
      )
      .transform(Norm.ordered(_, col("l_returnflag"), col("m")))
  }

  private val sketchHllErrorSql: String = {
    val h = DetHash.rankHashSql("l_orderkey", "0", "0", HllSeed)
    val blocks = HllErrMs
      .map { m =>
        val regBits = Integer.numberOfTrailingZeros(m)
        val wBits = 32 - regBits
        val scale = 1L << wBits
        val numerator = hllAlpha(m) * m.toDouble * m.toDouble * scale.toDouble
        s"""SELECT l_returnflag, CAST($m AS BIGINT) AS m,
           |       round($numerator / CAST(s_used + ($m - n_used) * $scale AS DOUBLE), 4) + 0.0 AS hll_est
           |FROM (
           |  SELECT l_returnflag,
           |         sum(CAST(1 AS BIGINT) << ($wBits - mj)) AS s_used,
           |         CAST(count(*) AS BIGINT) AS n_used
           |  FROM (
           |    SELECT l_returnflag, reg, max(rho) AS mj FROM (
           |      SELECT l_returnflag, ($h) % $m AS reg, ${rhoSqlN(s"($h) // $m", wBits)} AS rho
           |      FROM lineitem) GROUP BY 1, 2
           |  ) GROUP BY 1
           |)""".stripMargin
      }
      .mkString("\nUNION ALL\n")
    s"""WITH ests AS (
       |$blocks
       |), ex AS (
       |  SELECT l_returnflag, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact
       |  FROM lineitem GROUP BY 1
       |)
       |SELECT e.l_returnflag, e.m, x.n_exact, e.hll_est,
       |       round((e.hll_est - CAST(x.n_exact AS DOUBLE)) / CAST(x.n_exact AS DOUBLE), 6) + 0.0 AS rel_err
       |FROM ests e JOIN ex x ON e.l_returnflag = x.l_returnflag
       |ORDER BY e.l_returnflag, e.m""".stripMargin
  }

  // -------------------------------------------------------------------
  // sketch_quantile_kmv — mergeable bottom-m quantile sketch vs exact
  // rank selection, per event_type. The sample is the m=256 events with
  // the SMALLEST DetHash(event_id) per group — the KMV bottom-m set,
  // whose defining property is associative mergeability:
  // bottom-m(A ∪ B) = bottom-m(bottom-m(A) ∪ bottom-m(B)), so at 100 TB
  // every partition/day/shard keeps its own 256-row sketch and merges
  // are union + re-truncate (the same property the rank≤m plan exploits:
  // Spark rewrites the filtered window to WindowGroupLimit, truncating
  // to m rows per group ON THE MAP SIDE before the shuffle — shuffle
  // volume is groups·m rows, independent of input size).
  //
  // Quantiles use DETERMINISTIC ELEMENT SELECTION (the value at rank
  // ceil(q·k) ordered by (value, event_id)) — an existing data value,
  // never an interpolation, so cross-engine parity is exact element
  // identity with zero float arithmetic. The exact arm applies the same
  // rule to the full group (a per-group sort — the eval's truth side,
  // same role as ann_recall_eval's brute force); the sketch arm is the
  // scale path. Output reports both plus absolute errors.
  // -------------------------------------------------------------------
  private val QkM = 256
  private val QkSeed = 77L
  private def qkRank(q: String): String =
    s"CAST(ceil(k * CAST($q AS DOUBLE)) AS BIGINT)"

  private def sketchQuantileKmv(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"), col("event_id"), col("value"))
    val wS = Window.partitionBy("event_type").orderBy(col("h").asc, col("event_id").asc)
    val sample = ev
      .withColumn("h", DetHash.rankHashCol(col("event_id"), lit(0L), lit(0L), QkSeed))
      .withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= QkM) // -> WindowGroupLimit: map-side truncation
    def quantiles(rows: DataFrame, kName: String, p50: String, p90: String): DataFrame = {
      val wV = Window.partitionBy("event_type").orderBy(col("value").asc, col("event_id").asc)
      rows
        .withColumn("vrank", row_number().over(wV).cast("long"))
        .withColumn("k", count(lit(1)).over(Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(
          max(col("k")).as(kName),
          min(when(col("vrank") === expr(qkRank("0.5")), col("value"))).as(p50),
          min(when(col("vrank") === expr(qkRank("0.9")), col("value"))).as(p90)
        )
    }
    val est = quantiles(sample, "sample_k", "est_p50", "est_p90")
    val truth = quantiles(ev, "n_events", "true_p50", "true_p90")
    est
      .join(truth, Seq("event_type"))
      .select(
        col("event_type"), col("n_events"), col("sample_k"),
        Norm.rnd(col("est_p50"), 6).as("est_p50"),
        Norm.rnd(col("true_p50"), 6).as("true_p50"),
        Norm.rnd(abs(col("est_p50") - col("true_p50")), 6).as("err_p50"),
        Norm.rnd(col("est_p90"), 6).as("est_p90"),
        Norm.rnd(col("true_p90"), 6).as("true_p90"),
        Norm.rnd(abs(col("est_p90") - col("true_p90")), 6).as("err_p90")
      )
      .transform(Norm.ordered(_, col("event_type")))
  }

  private val sketchQuantileKmvSql: String = {
    def quantileCte(src: String, kName: String, p50: String, p90: String): String =
      s"""SELECT event_type, max(k) AS $kName,
         |       min(CASE WHEN vrank = ${qkRank("0.5")} THEN value END) AS $p50,
         |       min(CASE WHEN vrank = ${qkRank("0.9")} THEN value END) AS $p90
         |FROM (SELECT event_type, value,
         |             CAST(row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS vrank,
         |             count(*) OVER (PARTITION BY event_type) AS k
         |      FROM $src)
         |GROUP BY event_type""".stripMargin
    s"""WITH ev AS (SELECT event_type, event_id, value FROM events),
       |smp AS (
       |  SELECT event_type, event_id, value FROM (
       |    SELECT ev.*, row_number() OVER (
       |      PARTITION BY event_type
       |      ORDER BY ${DetHash.rankHashSql("event_id", "0", "0", QkSeed)}, event_id) AS srank
       |    FROM ev)
       |  WHERE srank <= $QkM
       |),
       |est AS (${quantileCte("smp", "sample_k", "est_p50", "est_p90")}),
       |tru AS (${quantileCte("ev", "n_events", "true_p50", "true_p90")})
       |SELECT e.event_type, t.n_events, e.sample_k,
       |       round(e.est_p50, 6) + 0.0 AS est_p50,
       |       round(t.true_p50, 6) + 0.0 AS true_p50,
       |       round(abs(e.est_p50 - t.true_p50), 6) + 0.0 AS err_p50,
       |       round(e.est_p90, 6) + 0.0 AS est_p90,
       |       round(t.true_p90, 6) + 0.0 AS true_p90,
       |       round(abs(e.est_p90 - t.true_p90), 6) + 0.0 AS err_p90
       |FROM est e JOIN tru t ON e.event_type = t.event_type
       |ORDER BY e.event_type""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_quantile_kmv" -> sketchQuantileKmv,
    "sketch_hll" -> sketchHll,
    "sketch_hll_error" -> sketchHllError,
    "sketch_cms_topk" -> sketchCmsTopk,
    "sketch_bloom_join" -> sketchBloomJoin,
    "sketch_cms_error" -> sketchCmsError,
    "sketch_kmv_setops" -> sketchKmvSetops
  )

  val oracle: Map[String, String] = Map(
    "sketch_quantile_kmv" -> sketchQuantileKmvSql,
    "sketch_hll" -> sketchHllSql,
    "sketch_hll_error" -> sketchHllErrorSql,
    "sketch_cms_topk" -> sketchCmsTopkSql,
    "sketch_bloom_join" -> sketchBloomJoinSql,
    "sketch_cms_error" -> sketchCmsErrorSql,
    "sketch_kmv_setops" -> sketchKmvSetopsSql
  )
}
