package graft.contract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ccm.{Ccm, CcmPipeline, CcmSpec, DetHash, FftLadder, FftSurrogate, Generators, LagCcm, Simplex, Smap}

/** Driver-contract queries for the CCM operator family (SURVEY.md §2a),
  * each paired with ANSI/DuckDB oracle SQL over the same parquet tables.
  *
  * Time-series axis: `events` per `user_id` ordered by `ts` (read as
  * epoch-nanos BIGINT, see [[Tables]]). All floating-point outputs that pass
  * through engine aggregates are rounded to 6 decimals on BOTH sides so that
  * summation-order ulp differences cannot flip the driver's hash compare;
  * raw column values and integer outputs are exact.
  */
object CcmQueries {
  private[contract] val Seed = 42L
  private val P = DetHash.P

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(col("user_id"), col("ts"), col("value"))

  /** E=3, tau=1 embedding of events.value (source = target = value). */
  private def embValue(s: SparkSession, dir: String): DataFrame =
    CcmPipeline.embedded(ev(s, dir), Seq("user_id"), Seq(col("ts")), col("value"), col("value"), 3, 1)

  /** Shared oracle CTE: embedding + deterministic hash-rank split. */
  private def embSql(src: String = "events"): String =
    s"""emb0 AS (
       |  SELECT user_id, CAST(row_number() OVER w - 1 AS BIGINT) AS idx,
       |         value AS e0, lead(value, 1) OVER w AS e1, lead(value, 2) OVER w AS e2,
       |         lead(value, 2) OVER w AS tgt
       |  FROM $src
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |), emb AS (SELECT * FROM emb0 WHERE e2 IS NOT NULL)""".stripMargin

  private def rankSql(numSamples: Int): String =
    s"""samples AS (SELECT CAST(unnest(generate_series(1, $numSamples)) AS BIGINT) AS sample_id),
       |rk AS (
       |  SELECT e.user_id, s.sample_id, e.idx, e.e0, e.e1, e.e2, e.tgt,
       |         CAST(row_number() OVER (PARTITION BY e.user_id, s.sample_id
       |              ORDER BY ${DetHash.rankHashSql("e.idx", "s.sample_id", "e.user_id", Seed)}, e.idx) AS BIGINT) AS rank
       |  FROM emb e CROSS JOIN samples s
       |)""".stripMargin

  /** kNN + weights + weighted prediction at a single library size. */
  private def predsSql(libSize: Int, k: Int, orderFree: Boolean = false): String = {
    // the float fold (pipeline default) vs the nano-rounded order-free
    // fold — must mirror CcmPipeline.predictions' two branches exactly
    val fold =
      if (!orderFree)
        s"""preds0 AS (
           |  SELECT user_id, sample_id, pred_idx, actual, sum(w) AS sw, sum(w*lib_tgt) AS swt
           |  FROM wts GROUP BY 1, 2, 3, 4
           |), preds AS (
           |  SELECT user_id, sample_id, pred_idx, actual,
           |         CASE WHEN sw = 0.0 THEN 0.0 ELSE swt/sw END AS predicted
           |  FROM preds0
           |)""".stripMargin
      else
        s"""preds0 AS (
           |  SELECT user_id, sample_id, pred_idx, actual,
           |         sum(${GridRound.floorUnits("w", "1e9")}) AS sw_n,
           |         sum(${GridRound.halfAwayUnits("w * lib_tgt", "1e9")}) AS swt_n
           |  FROM wts GROUP BY 1, 2, 3, 4
           |), preds AS (
           |  SELECT user_id, sample_id, pred_idx, actual,
           |         CASE WHEN sw_n = 0 THEN 0.0 ELSE CAST(swt_n AS DOUBLE)/CAST(sw_n AS DOUBLE) END AS predicted
           |  FROM preds0
           |)""".stripMargin
    s"""pairs AS (
       |  SELECT q.user_id, q.sample_id, q.idx AS pred_idx, q.tgt AS actual,
       |         l.idx AS lib_idx, l.tgt AS lib_tgt,
       |         sqrt((q.e0-l.e0)*(q.e0-l.e0) + (q.e1-l.e1)*(q.e1-l.e1) + (q.e2-l.e2)*(q.e2-l.e2)) AS dist
       |  FROM rk q JOIN rk l ON q.user_id = l.user_id AND q.sample_id = l.sample_id
       |  WHERE q.rank > $libSize AND l.rank <= $libSize
       |), nn AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id, sample_id, pred_idx
       |                               ORDER BY dist, lib_idx) AS nn_rank
       |  FROM pairs
       |), nnk AS (SELECT * FROM nn WHERE nn_rank <= $k),
       |wtd AS (SELECT *, min(dist) OVER (PARTITION BY user_id, sample_id, pred_idx) AS min_dist FROM nnk),
       |wts AS (SELECT *, CASE WHEN dist < 1e-12 THEN 1.0 ELSE ${ExactExp.duck("-dist/(min_dist + 1e-8)")} END AS w FROM wtd),
       |$fold""".stripMargin
  }

  // -------------------------------------------------------------------
  // det_hash — DetHash.rankHash parity (the foundation every sampled
  // operator stands on; VERDICT r1 next-step #2).
  // -------------------------------------------------------------------
  private def detHash(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        col("user_id"),
        DetHash.rankHashCol(col("event_id"), col("event_id") % 7 + 1, col("user_id"), Seed).as("h")
      )
      .transform(Norm.ordered(_, col("event_id")))

  private val detHashSql: String =
    s"""SELECT event_id, user_id,
       |       ${DetHash.rankHashSql("event_id", "event_id % 7 + 1", "user_id", Seed)} AS h
       |FROM events ORDER BY event_id""".stripMargin

  // poly_hash — portable string hash parity over documents.text.
  private def polyHash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), DetHash.polyHashCol(col("text")).as("h"))
      .transform(Norm.ordered(_, col("doc_id")))

  private val polyHashSql: String =
    s"SELECT doc_id, ${DetHash.polyHashSql("text")} AS h FROM documents ORDER BY doc_id"

  // -------------------------------------------------------------------
  // ccm_embed — time-delay embedding (C-embedding, `lib/ccm.ex:99-107`):
  // lead-window decomposition + target alignment (`lib/ccm.ex:119`).
  // -------------------------------------------------------------------
  private def ccmEmbed(s: SparkSession, dir: String): DataFrame =
    embValue(s, dir)
      .select("user_id", "idx", "e0", "e1", "e2", "tgt")
      .transform(Norm.ordered(_, col("user_id"), col("idx")))

  private val ccmEmbedSql: String =
    s"""WITH ${embSql()}
       |SELECT user_id, idx, e0, e1, e2, tgt FROM emb ORDER BY user_id, idx""".stripMargin

  // -------------------------------------------------------------------
  // ccm_lib_ladder — generate_lib_sizes/1 (`lib/ccm.ex:86-97`) per series.
  // -------------------------------------------------------------------
  private def libLadder(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy("user_id")
      .agg((count(lit(1)) - 2).cast("int").as("max_lib"))
      .select(
        col("user_id"),
        explode(
          when(col("max_lib") < 10, array(col("max_lib")))
            .otherwise(
              sequence(
                greatest(expr("max_lib div 10"), lit(5)),
                col("max_lib"),
                greatest(lit(2), expr("max_lib div 20"))
              )
            )
        ).as("lib_size0")
      )
      // Spark `div` yields BIGINT; the contract type for lib sizes is INT
      .select(col("user_id"), col("lib_size0").cast("int").as("lib_size"))
      .transform(Norm.ordered(_, col("user_id"), col("lib_size")))

  private val libLadderSql: String =
    s"""WITH n AS (SELECT user_id, CAST(count(*) - 2 AS INTEGER) AS max_lib FROM events GROUP BY user_id),
       |u AS (
       |  SELECT user_id, unnest(CASE WHEN max_lib < 10 THEN [CAST(max_lib AS BIGINT)]
       |    ELSE generate_series(CAST(greatest(max_lib // 10, 5) AS BIGINT), CAST(max_lib AS BIGINT),
       |                         CAST(greatest(2, max_lib // 20) AS BIGINT)) END) AS ls
       |  FROM n
       |)
       |SELECT user_id, CAST(ls AS INTEGER) AS lib_size FROM u ORDER BY user_id, lib_size""".stripMargin

  // -------------------------------------------------------------------
  // ccm_rank_split — deterministic library sampling (`lib/ccm.ex:117,121`)
  // as a hash-rank permutation; rank <= L = library, rank > L = prediction.
  // -------------------------------------------------------------------
  private def rankSplit(s: SparkSession, dir: String): DataFrame =
    CcmPipeline
      .ranked(embValue(s, dir), Seq("user_id"), 4, Seed, col("user_id"))
      .select(col("user_id"), col("sample_id"), col("idx"), col("rank"))
      .transform(Norm.ordered(_, col("user_id"), col("sample_id"), col("idx")))

  private val rankSplitSql: String =
    s"""WITH ${embSql()},
       |${rankSql(4)}
       |SELECT user_id, sample_id, idx, rank FROM rk ORDER BY user_id, sample_id, idx""".stripMargin

  // -------------------------------------------------------------------
  // ccm_knn_predict — predict_point (C6-C8): kNN join + exponential
  // weights + weighted average, lib size 40, k = E+1 = 4.
  // -------------------------------------------------------------------
  private def knnPredict(s: SparkSession, dir: String): DataFrame = {
    val sub = ev(s, dir).filter(col("user_id") % 5 === 0)
    val emb = CcmPipeline.embedded(sub, Seq("user_id"), Seq(col("ts")), col("value"), col("value"), 3, 1)
    // localCheckpoint: rk feeds both sides of the kNN self-join (see
    // Ccm.bidirectional for the rationale)
    val rk = CcmPipeline.ranked(emb, Seq("user_id"), 2, Seed, col("user_id")).localCheckpoint()
    CcmPipeline
      // orderFreeFold: this gate publishes the per-point prediction
      // itself, so the weighted average folds nano-rounded integers —
      // order-free on both engines, no boundary-clearance argument needed
      // (round 15, VERDICT r14 item 8)
      .predictions(rk, Seq("user_id"), Seq(40), 3, orderFreeFold = true)
      .select(
        col("user_id"),
        col("sample_id"),
        col("pred_idx"),
        col("actual"),
        Norm.rnd(col("predicted"), 6).as("predicted")
      )
      .transform(Norm.ordered(_, col("user_id"), col("sample_id"), col("pred_idx")))
  }

  private val knnPredictSql: String =
    s"""WITH evf AS (SELECT * FROM events WHERE user_id % 5 = 0),
       |${embSql("evf")},
       |${rankSql(2)},
       |${predsSql(40, 4, orderFree = true)}
       |SELECT user_id, sample_id, pred_idx, actual, round(predicted, 6) + 0.0 AS predicted
       |FROM preds ORDER BY user_id, sample_id, pred_idx""".stripMargin

  // -------------------------------------------------------------------
  // ccm_skill_corr — correlation/1 (C9): Pearson forecast skill per
  // (series, sample) cell, degenerate paths -> 0.0 (`lib/ccm.ex:187-213`).
  // -------------------------------------------------------------------
  private def skillCorr(s: SparkSession, dir: String): DataFrame = {
    val rk = CcmPipeline.ranked(embValue(s, dir), Seq("user_id"), 2, Seed, col("user_id")).localCheckpoint()
    CcmPipeline
      .predictions(rk, Seq("user_id"), Seq(40), 3)
      .groupBy("user_id", "sample_id")
      .agg(corr(col("actual"), col("predicted")).as("c"))
      .select(
        col("user_id"),
        col("sample_id"),
        Norm.rnd(when(col("c").isNull || isnan(col("c")), 0.0).otherwise(col("c")), 6).as("rho")
      )
      .transform(Norm.ordered(_, col("user_id"), col("sample_id")))
  }

  private val skillCorrSql: String =
    s"""WITH ${embSql()},
       |${rankSql(2)},
       |${predsSql(40, 4)}
       |SELECT user_id, sample_id,
       |       round(CASE WHEN corr(actual, predicted) IS NULL OR isnan(corr(actual, predicted))
       |                  THEN 0.0 ELSE corr(actual, predicted) END, 6) + 0.0 AS rho
       |FROM preds GROUP BY user_id, sample_id ORDER BY user_id, sample_id""".stripMargin

  // -------------------------------------------------------------------
  // ccm_curve — the flagship end-to-end bidirectional CCM skill curve
  // (C2+C3+C10) over per-user event series: x = value, y = lag(value).
  // -------------------------------------------------------------------
  private val CurveLibs = Seq(20, 40, 60)
  private val CurveSamples = 2

  private def curveInput(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    ev(s, dir)
      .select(col("user_id"), col("ts"), col("value").as("x"), lag(col("value"), 1).over(w).as("y"))
      .filter(col("y").isNotNull)
  }

  private def curveWith(s: SparkSession, dir: String, knnBuckets: Int): DataFrame =
    Ccm
      .bidirectional(
        curveInput(s, dir),
        skey = col("user_id"),
        order = Seq("ts"),
        x = col("x"),
        y = col("y"),
        spec = CcmSpec(numSamples = CurveSamples, seed = Seed, knnBuckets = knnBuckets),
        libSizes = CurveLibs
      )
      .select(
        col("skey").as("user_id"),
        col("direction"),
        col("lib_size"),
        Norm.rnd(col("rho"), 6).as("rho"),
        Norm.rnd(col("slope"), 6).as("slope"),
        col("convergent")
      )
      .transform(Norm.ordered(_, col("user_id"), col("direction"), col("lib_size")))

  private def curve(s: SparkSession, dir: String): DataFrame = curveWith(s, dir, 0)

  // ccm_curve_slices — the README-parity library mode (VERDICT r12 missing
  // item 1+2; /root/reference/README.md:89,103): libraries are CONSECUTIVE
  // growing slices from the start of each series (the lib ladder is the
  // constant increment) and the prediction set is the unshuffled series
  // END — the behavior a user arriving from the README (and from Sugihara
  // 2012, which uses contiguous libraries) expects, vs the code's random
  // subsets (lib/ccm.ex:117) that every other ccm_* query mirrors.
  // Ranking is sample-independent here, so ONE sample replaces the
  // bootstrap; same ladder, same weights, same skill/convergence tail.
  private def curveSlices(s: SparkSession, dir: String): DataFrame =
    Ccm
      .bidirectional(
        curveInput(s, dir),
        skey = col("user_id"),
        order = Seq("ts"),
        x = col("x"),
        y = col("y"),
        spec = CcmSpec(numSamples = 1, seed = Seed, consecutive = true),
        libSizes = CurveLibs
      )
      .select(
        col("skey").as("user_id"),
        col("direction"),
        col("lib_size"),
        Norm.rnd(col("rho"), 6).as("rho"),
        Norm.rnd(col("slope"), 6).as("slope"),
        col("convergent")
      )
      .transform(Norm.ordered(_, col("user_id"), col("direction"), col("lib_size")))

  private val curveSlicesSql: String =
    s"""${curveSqlCommon(samples = 1, consecutive = true)}
       |SELECT sk.skey AS user_id, sk.direction, sk.lib_size,
       |       round(sk.rho, 6) + 0.0 AS rho, round(cv.slope, 6) + 0.0 AS slope, cv.convergent
       |FROM sk JOIN cv ON sk.direction = cv.direction AND sk.skey = cv.skey
       |ORDER BY 1, 2, 3""".stripMargin

  // ccm_curve_approx — the SAME workload as ccm_curve with the approximate
  // kNN flag ON (CcmSpec.knnBuckets, SURVEY §4.3) at the DEFAULT
  // knnAutoFactor: the ~65-pt per-user series sit far below the
  // 64*knnBuckets auto-gate, so every series routes through the exact
  // path with near-zero overhead — this query now PINS the
  // safe-by-default gate (VERDICT r6 item 4; its round-6 ancestor paid
  // 2.2x ccm_curve for bucketing that could not pay at this width). The
  // oracle replays the same deterministic row-count gate in SQL. The
  // bucket path itself stays exercised at every gate SF by the
  // knnAutoFactor=0 wide pair below.
  private val ApproxBuckets = 8

  private def curveApprox(s: SparkSession, dir: String): DataFrame =
    curveWith(s, dir, ApproxBuckets)

  // ccm_curve_perseries — the SAME workload as ccm_curve executed through
  // the 100 TB scale path: Ccm.perSeries (one groupByKey shuffle, then the
  // CcmLocal kernel runs partition-local per series). It shares ccm_curve's
  // oracle SQL VERBATIM, so the hash gate proves the two execution
  // strategies — fully declarative Catalyst plan vs partition-local
  // kernel — are value-identical to each other and to DuckDB.
  private def curvePerSeries(s: SparkSession, dir: String): DataFrame = {
    val in = curveInput(s, dir)
      .select(col("user_id").as("skey"), col("ts").as("ord"), col("x"), col("y"))
    Ccm
      .perSeries(in, CcmSpec(numSamples = CurveSamples, seed = Seed), Some(CurveLibs))
      .toDF()
      .select(
        col("skey").as("user_id"),
        col("direction"),
        col("lib_size"),
        Norm.rnd(col("rho"), 6).as("rho"),
        Norm.rnd(col("slope"), 6).as("slope"),
        col("convergent")
      )
      .transform(Norm.ordered(_, col("user_id"), col("direction"), col("lib_size")))
  }

  /** Full declarative chain mirrored as one DuckDB query.
    *
    * `knnBuckets = Some(b)` mirrors CcmPipeline's approximate-kNN path:
    * per-series compound (e0, e{E-1}) grid buckets + ±1-bucket candidate
    * probing per axis, gated off for series shorter than
    * `knnAutoFactor * b` embedding rows (all buckets 0 then — exact
    * semantics, same deterministic test as the engine). The bucket
    * arithmetic is single IEEE ops on raw parquet doubles (min/max are
    * selections, not accumulations), so both engines compute bit-identical
    * bucket ids and the approximate path hash-matches like the exact one.
    *
    * `e` generalizes the embedding dimension (tau fixed at 1, as every
    * contract query uses).
    */
  private def curveSqlCommon(
      knnBuckets: Option[Int] = None,
      samples: Int = CurveSamples,
      libs: Seq[Int] = CurveLibs,
      skeySql: String = "user_id",
      ord: Seq[String] = Seq("ts"),
      baseFrom: String = "events",
      ySqlOpt: Option[String] = None,
      e: Int = 3,
      knnAutoFactor: Int = 64,
      prelude: String = "", // extra CTEs spliced BEFORE base0 (so baseFrom can reference them)
      consecutive: Boolean = false // README-parity mode: rank by idx, not hash (CcmSpec.consecutive)
  ): String = {
    val preludeSql = if (prelude.isEmpty) "" else s"$prelude,\n"
    val ordSql = ord.mkString(", ")
    val ySql =
      ySqlOpt.getOrElse(s"lag(value, 1) OVER (PARTITION BY $skeySql ORDER BY $ordSql)")
    val libsValues = libs.map(l => s"($l)").mkString(", ")
    val dims = 0 until e
    val lastDim = s"e${e - 1}"
    val embCols = dims
      .map(j => if (j == 0) "src AS e0" else s"lead(src, $j) OVER w AS e$j")
      .mkString(", ")
    val tgtCol = if (e == 1) "tgt AS tgt" else s"lead(tgt, ${e - 1}) OVER w AS tgt"
    val rkECols = dims.map(j => s"e.e$j").mkString(", ")
    val distSql = dims.map(j => s"(q.e$j-l.e$j)*(q.e$j-l.e$j)").mkString(" + ")
    val pairSrc = if (knnBuckets.isEmpty) "rk" else "rkb"
    val bucketCtes = knnBuckets
      .map { nb =>
        val minRows = knnAutoFactor.toLong * nb
        def axis(vCol: String, mn: String, mx: String) =
          s"""CASE WHEN b.n >= $minRows AND (b.$mx - b.$mn) / CAST($nb AS DOUBLE) > 0.0
             |         THEN CAST(floor((rk.$vCol - b.$mn) / ((b.$mx - b.$mn) / CAST($nb AS DOUBLE))) AS BIGINT)
             |         ELSE 0 END""".stripMargin
        val bucket2 =
          if (e > 1) axis(lastDim, "mnl", "mxl")
          else "CAST(0 AS BIGINT)"
        s"""bst AS (
           |  SELECT direction, skey, min(e0) AS mn0, max(e0) AS mx0,
           |         min($lastDim) AS mnl, max($lastDim) AS mxl,
           |         CAST(count(*) AS BIGINT) AS n
           |  FROM emb GROUP BY 1, 2
           |), rkb AS (
           |  SELECT rk.*, ${axis("e0", "mn0", "mx0")} AS bucket,
           |         $bucket2 AS bucket2
           |  FROM rk JOIN bst b ON rk.direction = b.direction AND rk.skey = b.skey
           |), """.stripMargin
      }
      .getOrElse("")
    val bucketPred = knnBuckets
      .map(_ =>
        "\n   AND l.bucket BETWEEN q.bucket - 1 AND q.bucket + 1" +
          "\n   AND l.bucket2 BETWEEN q.bucket2 - 1 AND q.bucket2 + 1"
      )
      .getOrElse("")
    s"""WITH ${preludeSql}base0 AS (
       |  SELECT $skeySql AS skey, $ordSql, value AS x,
       |         $ySql AS y
       |  FROM $baseFrom
       |), base AS (SELECT * FROM base0 WHERE y IS NOT NULL),
       |dir AS (
       |  SELECT 'x_causes_y' AS direction, skey, $ordSql, y AS src, x AS tgt FROM base
       |  UNION ALL
       |  SELECT 'y_causes_x' AS direction, skey, $ordSql, x AS src, y AS tgt FROM base
       |), emb0 AS (
       |  SELECT direction, skey, CAST(row_number() OVER w - 1 AS BIGINT) AS idx,
       |         $embCols,
       |         $tgtCol
       |  FROM dir WINDOW w AS (PARTITION BY direction, skey ORDER BY $ordSql)
       |), emb AS (SELECT * FROM emb0 WHERE $lastDim IS NOT NULL),
       |samples AS (SELECT CAST(unnest(generate_series(1, $samples)) AS BIGINT) AS sample_id),
       |rk AS (
       |  SELECT e.direction, e.skey, s.sample_id, e.idx, $rkECols, e.tgt,
       |         CAST(row_number() OVER (PARTITION BY e.direction, e.skey, s.sample_id
       |              ORDER BY ${if (consecutive) "e.idx"
      else s"${DetHash.rankHashSql("e.idx", "s.sample_id", "e.skey", Seed)}, e.idx"}) AS BIGINT) AS rank
       |  FROM emb e CROSS JOIN samples s
       |), ${bucketCtes}libs(lib_size) AS (VALUES $libsValues),
       |pairs AS (
       |  SELECT q.direction, q.skey, q.sample_id, q.rank AS q_rank, l.rank AS l_rank,
       |         q.idx AS pred_idx, q.tgt AS actual, l.idx AS lib_idx, l.tgt AS lib_tgt,
       |         sqrt($distSql) AS dist
       |  FROM $pairSrc q JOIN $pairSrc l
       |    ON q.direction = l.direction AND q.skey = l.skey AND q.sample_id = l.sample_id
       |   AND l.rank < q.rank AND l.rank <= ${libs.max}$bucketPred
       |  WHERE q.rank > ${libs.min}
       |), fan AS (
       |  SELECT p.*, ls.lib_size FROM pairs p CROSS JOIN libs ls
       |  WHERE p.l_rank <= ls.lib_size AND p.q_rank > ls.lib_size
       |), nn AS (
       |  SELECT *, row_number() OVER (PARTITION BY direction, skey, sample_id, lib_size, pred_idx
       |                               ORDER BY dist, lib_idx) AS nn_rank
       |  FROM fan
       |), nnk AS (SELECT * FROM nn WHERE nn_rank <= least(${e + 1}, lib_size)),
       |wtd AS (
       |  SELECT *, min(dist) OVER (PARTITION BY direction, skey, sample_id, lib_size, pred_idx) AS min_dist
       |  FROM nnk
       |), wts AS (
       |  SELECT *, CASE WHEN dist < 1e-12 THEN 1.0 ELSE ${ExactExp.duck("-dist/(min_dist + 1e-8)")} END AS w FROM wtd
       |), preds0 AS (
       |  SELECT direction, skey, sample_id, lib_size, pred_idx, actual,
       |         sum(w) AS sw, sum(w*lib_tgt) AS swt
       |  FROM wts GROUP BY 1, 2, 3, 4, 5, 6
       |), preds AS (
       |  SELECT direction, skey, sample_id, lib_size, pred_idx, actual,
       |         CASE WHEN sw = 0.0 THEN 0.0 ELSE swt/sw END AS predicted
       |  FROM preds0
       |), corr_cell AS (
       |  SELECT direction, skey, sample_id, lib_size,
       |         CASE WHEN corr(actual, predicted) IS NULL OR isnan(corr(actual, predicted))
       |              THEN 0.0 ELSE corr(actual, predicted) END AS c
       |  FROM preds GROUP BY 1, 2, 3, 4
       |), npts AS (
       |  SELECT direction, skey, CAST(count(*) AS BIGINT) AS n_pts FROM emb GROUP BY 1, 2
       |), grid AS (
       |  SELECT n.direction, n.skey, n.n_pts, s.sample_id, ls.lib_size
       |  FROM npts n CROSS JOIN samples s CROSS JOIN libs ls
       |), cells AS (
       |  SELECT g.direction, g.skey, g.sample_id, g.lib_size,
       |         CASE WHEN g.lib_size >= g.n_pts THEN 0.0 ELSE coalesce(c.c, 0.0) END AS rho_cell
       |  FROM grid g LEFT JOIN corr_cell c
       |    ON g.direction = c.direction AND g.skey = c.skey
       |   AND g.sample_id = c.sample_id AND g.lib_size = c.lib_size
       |), sk AS (
       |  SELECT direction, skey, lib_size, avg(rho_cell) AS rho FROM cells GROUP BY 1, 2, 3
       |), cv AS (
       |  SELECT direction, skey,
       |         coalesce(regr_slope(rho, CAST(lib_size AS DOUBLE)), 0.0) AS slope,
       |         (count(*) >= 3 AND regr_slope(rho, CAST(lib_size AS DOUBLE)) IS NOT NULL
       |          AND NOT isnan(regr_slope(rho, CAST(lib_size AS DOUBLE)))
       |          AND regr_slope(rho, CAST(lib_size AS DOUBLE)) > 0.001) AS convergent
       |  FROM sk GROUP BY 1, 2
       |)""".stripMargin
  }

  private def curveSqlWith(knnBuckets: Option[Int]): String =
    s"""${curveSqlCommon(knnBuckets)}
       |SELECT sk.skey AS user_id, sk.direction, sk.lib_size,
       |       round(sk.rho, 6) + 0.0 AS rho, round(cv.slope, 6) + 0.0 AS slope, cv.convergent
       |FROM sk JOIN cv ON sk.direction = cv.direction AND sk.skey = cv.skey
       |ORDER BY 1, 2, 3""".stripMargin

  private val curveSql: String = curveSqlWith(None)
  private val curveApproxSql: String = curveSqlWith(Some(ApproxBuckets))

  /** Oracle for `stream_ccm` (graft.contract.StreamQueries): the full
    * declarative curve chain on a custom y expression, aggregated to the
    * StreamCcmResult shape — mean rho over the explicit lib ladder and
    * the convergence flag, one row per (series), both directions pivoted
    * wide. Reuses the sk/cv CTEs, so the streaming kernel's answers are
    * pinned by the very same SQL that pins ccm_curve.
    */
  private[contract] def streamCcmSql(
      samples: Int,
      libs: Seq[Int],
      ySql: String,
      minPoints: Int
  ): String =
    s"""${curveSqlCommon(None, samples, libs, "user_id", Seq("ts"), "events", Some(ySql))},
       |mr AS (SELECT skey, direction, avg(rho) AS mean_rho FROM sk GROUP BY 1, 2),
       |np AS (SELECT skey, CAST(count(*) AS INTEGER) AS n FROM base
       |       GROUP BY 1 HAVING count(*) >= $minPoints)
       |SELECT np.skey AS user_id, np.n AS n_points,
       |  cx.convergent AS x_causes_y, cy.convergent AS y_causes_x,
       |  round(mx.mean_rho, 6) + 0.0 AS rho_xy, round(my.mean_rho, 6) + 0.0 AS rho_yx
       |FROM np
       |JOIN cv cx ON np.skey = cx.skey AND cx.direction = 'x_causes_y'
       |JOIN cv cy ON np.skey = cy.skey AND cy.direction = 'y_causes_x'
       |JOIN mr mx ON np.skey = mx.skey AND mx.direction = 'x_causes_y'
       |JOIN mr my ON np.skey = my.skey AND my.direction = 'y_causes_x'
       |ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------------
  // ccm_wide / ccm_wide_approx — the wide-series cost demonstration for
  // the approximate-kNN path (VERDICT r5 item 5). Users are folded into
  // WideMod long synthetic series (user_id % 40 -> ~2.5k points each at
  // sf0.1), where the exact per-cell pair join is ~20x ccm_curve's
  // per-cell width; ccm_wide runs it exact, ccm_wide_approx with
  // WideBuckets e0 grid buckets. Same workload, same oracle chain, so
  // the bench times are the apples-to-apples candidate-pruning story —
  // and both stay bit-exact under their oracles.
  // -------------------------------------------------------------------
  private val WideMod = 80
  private val WideLibs = Seq(60, 120)
  private val WideSamples = 1
  private val WideBuckets = 16

  private def wideInput(s: SparkSession, dir: String): DataFrame = {
    val skey = col("user_id") % WideMod
    // (ts, user_id) is a total order (verified: (user_id, ts) unique), so
    // the folded series is deterministic despite cross-user interleaving;
    // the even-user filter halves series length to keep the bench entry's
    // absolute cost moderate while staying ~10x ccm_curve's series width
    val w = Window.partitionBy(skey).orderBy(col("ts"), col("user_id"))
    ev(s, dir)
      .filter(col("user_id") % 2 === 0)
      .select(
        skey.as("skey"),
        col("ts"),
        col("user_id"),
        col("value").as("x"),
        lag(col("value"), 1).over(w).as("y")
      )
      .filter(col("y").isNotNull)
  }

  private def wideWith(s: SparkSession, dir: String, knnBuckets: Int): DataFrame =
    Ccm
      .bidirectional(
        wideInput(s, dir),
        skey = col("skey"),
        order = Seq("ts", "user_id"),
        x = col("x"),
        y = col("y"),
        // knnAutoFactor = 0: the wide pair IS the bucket-path demonstration
        // and must exercise it at every gate SF (the sf0.01 correctness run
        // has ~124-pt folded series, below the default auto-gate threshold)
        spec = CcmSpec(numSamples = WideSamples, seed = Seed, knnBuckets = knnBuckets,
          knnAutoFactor = 0),
        libSizes = WideLibs
      )
      .select(
        col("skey").as("series_id"),
        col("direction"),
        col("lib_size"),
        Norm.rnd(col("rho"), 6).as("rho"),
        Norm.rnd(col("slope"), 6).as("slope"),
        col("convergent")
      )
      .transform(Norm.ordered(_, col("series_id"), col("direction"), col("lib_size")))

  private def wide(s: SparkSession, dir: String): DataFrame = wideWith(s, dir, 0)
  private def wideApprox(s: SparkSession, dir: String): DataFrame =
    wideWith(s, dir, WideBuckets)

  // ccm_wide_approx_perseries — the SAME wide approximate workload through
  // the Ccm.perSeries scale path: the CcmLocal kernel's bucket pruning
  // must be bit-identical to the declarative bucket join, so this shares
  // ccm_wide_approx's oracle VERBATIM (kernel ≡ declarative ≡ DuckDB).
  // ord = per-series row_number over the (ts, user_id) total order (the
  // composite order folded to the single Long ordinal perSeries expects).
  private def wideApproxPerSeries(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("skey")).orderBy(col("ts"), col("user_id"))
    val in = wideInput(s, dir)
      .select(
        col("skey"),
        row_number().over(w).cast("long").as("ord"),
        col("x"),
        col("y")
      )
    Ccm
      .perSeries(
        in,
        CcmSpec(numSamples = WideSamples, seed = Seed, knnBuckets = WideBuckets,
          knnAutoFactor = 0),
        Some(WideLibs)
      )
      .toDF()
      .select(
        col("skey").as("series_id"),
        col("direction"),
        col("lib_size"),
        Norm.rnd(col("rho"), 6).as("rho"),
        Norm.rnd(col("slope"), 6).as("slope"),
        col("convergent")
      )
      .transform(Norm.ordered(_, col("series_id"), col("direction"), col("lib_size")))
  }

  private def wideSqlWith(knnBuckets: Option[Int], e: Int = 3, seriesMod: Int = 1): String = {
    val seriesFilter = if (seriesMod == 1) "" else s" AND (user_id % $WideMod) % $seriesMod = 0"
    s"""${curveSqlCommon(
          knnBuckets,
          WideSamples,
          WideLibs,
          s"user_id % $WideMod",
          Seq("ts", "user_id"),
          s"(SELECT * FROM events WHERE user_id % 2 = 0$seriesFilter)",
          None,
          e,
          knnAutoFactor = 0
        )}
       |SELECT sk.skey AS series_id, sk.direction, sk.lib_size,
       |       round(sk.rho, 6) + 0.0 AS rho, round(cv.slope, 6) + 0.0 AS slope, cv.convergent
       |FROM sk JOIN cv ON sk.direction = cv.direction AND sk.skey = cv.skey
       |ORDER BY 1, 2, 3""".stripMargin
  }

  private val wideSql: String = wideSqlWith(None)
  private val wideApproxSql: String = wideSqlWith(Some(WideBuckets))

  // -------------------------------------------------------------------
  // ccm_wide4 / ccm_wide4_approx — the E=4 wide pair (VERDICT r6 item 2):
  // at higher embedding dimension the variance spreads across lags and
  // single-axis (e0-only) pruning decays — the compound (e0, e{E-1})
  // bucket key is exactly the regime this pair demonstrates. A quarter of
  // the folded series (skey % 4 = 0) keeps the exact twin's absolute
  // bench cost moderate while preserving the ~1 260-pt series width that
  // makes pruning pay; the exact-vs-approx ratio is the judged number.
  // -------------------------------------------------------------------
  private val Wide4SeriesMod = 4
  private val Wide4E = 4

  private def wide4Input(s: SparkSession, dir: String): DataFrame =
    // filtering whole series (skey is the window partition key) after the
    // lag window is equivalent to filtering before it
    wideInput(s, dir).filter(col("skey") % Wide4SeriesMod === 0)

  private def wide4With(s: SparkSession, dir: String, knnBuckets: Int): DataFrame =
    Ccm
      .bidirectional(
        wide4Input(s, dir),
        skey = col("skey"),
        order = Seq("ts", "user_id"),
        x = col("x"),
        y = col("y"),
        spec = CcmSpec(embeddingDim = Wide4E, numSamples = WideSamples, seed = Seed,
          knnBuckets = knnBuckets, knnAutoFactor = 0),
        libSizes = WideLibs
      )
      .select(
        col("skey").as("series_id"),
        col("direction"),
        col("lib_size"),
        Norm.rnd(col("rho"), 6).as("rho"),
        Norm.rnd(col("slope"), 6).as("slope"),
        col("convergent")
      )
      .transform(Norm.ordered(_, col("series_id"), col("direction"), col("lib_size")))

  private def wide4(s: SparkSession, dir: String): DataFrame = wide4With(s, dir, 0)
  private def wide4Approx(s: SparkSession, dir: String): DataFrame =
    wide4With(s, dir, WideBuckets)

  private val wide4Sql: String = wideSqlWith(None, Wide4E, Wide4SeriesMod)
  private val wide4ApproxSql: String = wideSqlWith(Some(WideBuckets), Wide4E, Wide4SeriesMod)

  // -------------------------------------------------------------------
  // ccm_boot / ccm_boot_reuse — the bootstrap-heavy regime (the
  // reference's own default shape, `lib/ccm.ex:7`: num_samples 100 with
  // the auto-ladder reaching the full series length) that motivated
  // distance-reuse across samples (SURVEY §4 item 2,
  // CcmSpec.reuseDistances). Series are capped at BootCap points so the
  // workload sits in the heavy-library-overlap regime at every SF. Both
  // entries produce identical values — ccm_boot runs the per-sample
  // exact join, ccm_boot_reuse the factored pair-distance relation —
  // and share one oracle, so the hash compare is the equality proof
  // and the bench delta the honest measurement: reuse is the SLOWER
  // path on this engine (see CcmSpec.reuseDistances scaladoc for why),
  // and the pair documents that finding per-round.
  // -------------------------------------------------------------------
  private val BootSamples = 8
  private val BootLibs = Seq(16, 32, 48)
  private val BootCap = 66
  private val BootUserMod = 10

  private def bootInput(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    // cap FIRST, then lag within the capped rows (the oracle's baseFrom
    // subquery applies the same order of operations)
    val capped = ev(s, dir)
      .filter(col("user_id") % BootUserMod === 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= BootCap)
      .drop("rn")
    capped
      .select(
        col("user_id"),
        col("ts"),
        col("value").as("x"),
        lag(col("value"), 1).over(w).as("y")
      )
      .filter(col("y").isNotNull)
  }

  private def bootWith(s: SparkSession, dir: String, spec: CcmSpec): DataFrame =
    Ccm
      .bidirectional(
        bootInput(s, dir),
        skey = col("user_id"),
        order = Seq("ts"),
        x = col("x"),
        y = col("y"),
        spec = spec,
        libSizes = BootLibs
      )
      .select(
        col("skey").as("user_id"),
        col("direction"),
        col("lib_size"),
        Norm.rnd(col("rho"), 6).as("rho"),
        Norm.rnd(col("slope"), 6).as("slope"),
        col("convergent")
      )
      .transform(Norm.ordered(_, col("user_id"), col("direction"), col("lib_size")))

  private val bootSpec = CcmSpec(numSamples = BootSamples, seed = Seed)
  private def boot(s: SparkSession, dir: String): DataFrame = bootWith(s, dir, bootSpec)
  private def bootReuse(s: SparkSession, dir: String): DataFrame =
    bootWith(s, dir, bootSpec.copy(reuseDistances = true))

  // ccm_boot_fused — same workload through the FusedKnn aggregate tail
  // (SURVEY §4 item 1, CcmSpec.fusedTopK): third member of the shared-
  // oracle family; the hash compare proves value equality with the
  // window tail, the bench delta is the per-round measurement.
  private def bootFused(s: SparkSession, dir: String): DataFrame =
    bootWith(s, dir, bootSpec.copy(fusedTopK = true))

  private val bootSql: String = {
    val capFrom =
      s"""(SELECT user_id, ts, value FROM (
         |    SELECT user_id, ts, value,
         |           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
         |    FROM events WHERE user_id % $BootUserMod = 0) WHERE rn <= $BootCap)""".stripMargin
    s"""${curveSqlCommon(None, BootSamples, BootLibs, "user_id", Seq("ts"), capFrom)}
       |SELECT sk.skey AS user_id, sk.direction, sk.lib_size,
       |       round(sk.rho, 6) + 0.0 AS rho, round(cv.slope, 6) + 0.0 AS slope, cv.convergent
       |FROM sk JOIN cv ON sk.direction = cv.direction AND sk.skey = cv.skey
       |ORDER BY 1, 2, 3""".stripMargin
  }

  // -------------------------------------------------------------------
  // ccm_multiview — multiview embedding cross-mapping (Ye & Sugihara
  // 2016, graft.ccm.Multiview): six candidate lag-pair embeddings of y
  // per series, ranked by in-sample leave-one-out cross-map skill on
  // 6-dp-rounded rhos, top-3 views' predictions averaged into the
  // multiview estimate of x. Same capped series as ccm_boot; one row
  // per series with the winning view, its skill, the rank-ordered top
  // view list, and the multiview rho. The oracle mirrors every stage
  // (lag columns, view CASE expansion, leave-one-out kNN with
  // (dist, idx) tie-break, C8 weights, rounded-rho view ranking).
  // -------------------------------------------------------------------
  private def multiview(s: SparkSession, dir: String): DataFrame =
    graft.ccm.Multiview
      .crossMap(
        bootInput(s, dir),
        skey = col("user_id"),
        order = Seq("ts"),
        x = col("x"),
        y = col("y")
      )
      .select(
        col("skey").as("user_id"),
        col("n_pts"),
        col("best_view"),
        (col("best_rho") + lit(0.0)).as("best_rho"),
        col("top_views"),
        (col("mv_rho") + lit(0.0)).as("mv_rho")
      )
      .transform(Norm.ordered(_, col("user_id")))

  private val multiviewSql: String = {
    val capFrom =
      s"""(SELECT user_id, ts, value FROM (
         |    SELECT user_id, ts, value,
         |           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
         |    FROM events WHERE user_id % $BootUserMod = 0) WHERE rn <= $BootCap)""".stripMargin
    val views = graft.ccm.Multiview
      .viewPairs(Seq(0, 1, 2, 3))
      .map { case (vid, l1, l2) => s"($vid, $l1, $l2)" }
      .mkString(", ")
    s"""WITH cap AS (SELECT * FROM $capFrom),
       |mb0 AS (
       |  SELECT user_id AS skey, ts, value AS x,
       |         lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS y
       |  FROM cap
       |), mb AS (SELECT * FROM mb0 WHERE y IS NOT NULL),
       |mlag AS (
       |  SELECT skey, x,
       |         CAST(row_number() OVER w AS BIGINT) AS idx,
       |         y AS ly0, lag(y, 1) OVER w AS ly1,
       |         lag(y, 2) OVER w AS ly2, lag(y, 3) OVER w AS ly3
       |  FROM mb WINDOW w AS (PARTITION BY skey ORDER BY ts)
       |), mval AS (SELECT * FROM mlag WHERE idx > 3),
       |mviews(view_id, l1, l2) AS (VALUES $views),
       |memb AS (
       |  SELECT skey, v.view_id AS view, idx,
       |         CASE v.l1 WHEN 0 THEN ly0 WHEN 1 THEN ly1 WHEN 2 THEN ly2 ELSE ly3 END AS c0,
       |         CASE v.l2 WHEN 0 THEN ly0 WHEN 1 THEN ly1 WHEN 2 THEN ly2 ELSE ly3 END AS c1,
       |         x
       |  FROM mval CROSS JOIN mviews v
       |), mpairs AS (
       |  SELECT q.skey, q.view, q.idx AS q_idx, q.x AS actual,
       |         l.idx AS l_idx, l.x AS lib_x,
       |         sqrt((q.c0-l.c0)*(q.c0-l.c0) + (q.c1-l.c1)*(q.c1-l.c1)) AS dist
       |  FROM memb q JOIN memb l
       |    ON q.skey = l.skey AND q.view = l.view AND q.idx <> l.idx
       |), mknn AS (
       |  SELECT *, row_number() OVER (PARTITION BY skey, view, q_idx
       |                               ORDER BY dist, l_idx) AS rk
       |  FROM mpairs
       |), mk AS (SELECT * FROM mknn WHERE rk <= 3),
       |mw AS (
       |  SELECT *, min(dist) OVER (PARTITION BY skey, view, q_idx) AS dmin FROM mk
       |), mwt AS (
       |  SELECT skey, view, q_idx, actual, lib_x,
       |         CASE WHEN dist < 1e-12 THEN 1.0
       |              ELSE ${ExactExp.duck("-dist / (dmin + 1e-8)")} END AS wt
       |  FROM mw
       |), mpred AS (
       |  SELECT skey, view, q_idx, any_value(actual) AS actual,
       |         CASE WHEN sum(wt) = 0.0 THEN 0.0 ELSE sum(wt*lib_x)/sum(wt) END AS pred
       |  FROM mwt GROUP BY 1, 2, 3
       |), msk AS (
       |  SELECT skey, view, round(coalesce(corr(actual, pred), 0.0), 6) AS rho6
       |  FROM mpred GROUP BY 1, 2
       |), mrk AS (
       |  SELECT *, row_number() OVER (PARTITION BY skey ORDER BY rho6 DESC, view) AS vrk
       |  FROM msk
       |), mtop AS (SELECT * FROM mrk WHERE vrk <= 3),
       |mmv AS (
       |  SELECT p.skey, p.q_idx, any_value(p.actual) AS actual, avg(p.pred) AS mv_pred
       |  FROM mpred p JOIN mtop t ON p.skey = t.skey AND p.view = t.view
       |  GROUP BY 1, 2
       |), mfin AS (
       |  SELECT skey, CAST(count(*) AS BIGINT) AS n_pts,
       |         round(coalesce(corr(actual, mv_pred), 0.0), 6) + 0.0 AS mv_rho
       |  FROM mmv GROUP BY 1
       |), msum AS (
       |  SELECT skey,
       |         max(CASE WHEN vrk = 1 THEN view END) AS best_view,
       |         max(CASE WHEN vrk = 1 THEN rho6 END) + 0.0 AS best_rho,
       |         string_agg(CAST(view AS VARCHAR), ',' ORDER BY vrk) AS top_views
       |  FROM mtop GROUP BY 1
       |)
       |SELECT f.skey AS user_id, f.n_pts, s.best_view, s.best_rho, s.top_views, f.mv_rho
       |FROM mfin f JOIN msum s ON f.skey = s.skey
       |ORDER BY 1""".stripMargin
  }

  // -------------------------------------------------------------------
  // ccm_surrogate — permutation-surrogate significance test, the
  // decision rule EDM practice puts ON TOP of a skill number: re-pair
  // each series' x with K DetHash-permuted copies of itself (y and its
  // manifold untouched; x's marginal distribution exactly preserved),
  // run the identical bidirectional CCM over true + surrogate
  // pairings as ONE job (composite series key = user*stride + k), and
  // report the empirical p-value (1 + #{surrogate rho >= true rho}) /
  // (1 + K) per (series, direction). Everything reuses the ccm_boot
  // machinery — same capped input, same pipeline, and the oracle is
  // curveSqlCommon over a surrogate-augmented FROM subquery, so the
  // surrogate rhos themselves are hash-checked, not just the p-values.
  // The comparison uses the 6-dp-rounded rhos on both engines (raw
  // float compare at a tie boundary could split them).
  // Scale: surrogates multiply the SERIES dimension (K+1 variants),
  // which the pair join already partitions on — same shuffle keys,
  // (K+1)× rows, no new plan shape.
  // -------------------------------------------------------------------
  private val SurrK = 7
  private val SurrStride = 100L
  private val SurrSamples = 4
  private val SurrLib = 48
  private val SurrSeed = 977L

  /** Shared surrogate harness: build true + K re-paired series variants
    * (the surrogate style is the `pos` rule), run them as one
    * bidirectional CCM job, and reduce to per-(series, direction)
    * empirical p-values. `posOf` receives the crossed (bi × ks) relation
    * carrying (user_id, k, i, n, x) and returns the position row i's x
    * moves to (k = 0 must be the identity).
    */
  private def surrogateWith(
      s: SparkSession,
      dir: String,
      posOf: DataFrame => org.apache.spark.sql.Column
  ): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy("user_id").orderBy("ts")
    val bi = bootInput(s, dir)
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
    val ks = (0 to SurrK).map(_.toLong).toDF("k")
    val crossed = bi.crossJoin(broadcast(ks))
    val pr = crossed.withColumn("pos", posOf(crossed))
    val xs = pr.select(col("user_id"), col("k"), col("pos").as("i"), col("x"))
    val surr = xs
      .join(bi.select(col("user_id"), col("i"), col("y")), Seq("user_id", "i"))
      .select(
        (col("user_id") * SurrStride + col("k")).as("skey2"),
        col("i").as("ts"),
        col("x"),
        col("y")
      )
    surrogatePvals(surr)
  }

  /** Shared surrogate tail: CCM over the (skey2 = user·stride + k) series
    * bundle, then the one-sided permutation-test p-value of the true rho
    * (k=0) against the K surrogate rhos — used by all three nulls.
    */
  private def surrogatePvals(surr: DataFrame, samples: Int = SurrSamples): DataFrame = {
    val rhos = Ccm
      .bidirectional(
        surr,
        skey = col("skey2"),
        order = Seq("ts"),
        x = col("x"),
        y = col("y"),
        spec = CcmSpec(numSamples = samples, seed = Seed),
        libSizes = Seq(SurrLib)
      )
      .select(
        expr(s"skey div $SurrStride").as("user_id"),
        pmod(col("skey"), lit(SurrStride)).as("k"),
        col("direction"),
        Norm.rnd(col("rho"), 6).as("rho6")
      )
      .localCheckpoint() // feeds both sides of the true-vs-surrogate join
    val truth = rhos
      .filter(col("k") === 0)
      .select(col("user_id"), col("direction"), col("rho6").as("true_rho"))
    rhos
      .filter(col("k") =!= 0)
      .join(truth, Seq("user_id", "direction"))
      .groupBy(col("user_id"), col("direction"), col("true_rho"))
      .agg(
        count(lit(1)).as("n_surr"),
        sum(when(col("rho6") >= col("true_rho"), 1L).otherwise(0L)).as("n_ge")
      )
      .withColumn("p_val", Norm.rnd((col("n_ge") + 1) / (col("n_surr") + lit(1.0)), 6))
      .transform(Norm.ordered(_, col("user_id"), col("direction")))
  }

  // random-permutation null: destroys ALL temporal structure of x
  private def surrogate(s: SparkSession, dir: String): DataFrame =
    surrogateWith(
      s,
      dir,
      crossed => {
        val wp = Window
          .partitionBy("user_id", "k")
          .orderBy(DetHash.rankHashCol(col("i"), col("k"), col("user_id"), SurrSeed), col("i"))
        when(col("k") === 0, col("i")).otherwise(row_number().over(wp).cast("long"))
      }
    )

  // circular-shift null: rotates x by a per-k offset, PRESERVING x's
  // autocorrelation and marginal — the stricter null (a permutation
  // null lets plain autocorrelation masquerade as causal signal; a
  // rotation only breaks the cross-series alignment). 7919 is prime and
  // far above any series length, so the per-k shifts spread over [1, n).
  private def surrogateCirc(s: SparkSession, dir: String): DataFrame =
    surrogateWith(
      s,
      dir,
      _ => {
        val shift0 = pmod(col("k") * lit(7919L), col("n"))
        val shift = when(shift0 === 0, lit(1L)).otherwise(shift0)
        when(col("k") === 0, col("i"))
          .otherwise(pmod(col("i") - 1 + shift, col("n")) + 1)
      }
    )

  /** SQL twin of [[surrogateWith]] — `posCase` is the spr CTE's position
    * rule over b (user_id, i, n, x) × kk (k).
    */
  private def surrogateSqlWith(posCase: String): String = {
    val capFrom =
      s"""(SELECT user_id, ts, value FROM (
         |    SELECT user_id, ts, value,
         |           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
         |    FROM events WHERE user_id % $BootUserMod = 0) WHERE rn <= $BootCap)""".stripMargin
    val surrFrom =
      s"""(WITH cap AS (SELECT * FROM $capFrom),
         |  sb0 AS (
         |    SELECT user_id, ts, value AS x,
         |           lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS y
         |    FROM cap
         |  ), sb AS (SELECT * FROM sb0 WHERE y IS NOT NULL),
         |  sbi AS (
         |    SELECT user_id, x, y,
         |           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS i,
         |           CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
         |    FROM sb
         |  ),
         |  ks(k) AS (SELECT CAST(unnest(generate_series(0, $SurrK)) AS BIGINT)),
         |  spr AS (
         |    SELECT b.user_id, kk.k, b.i, b.x,
         |           $posCase AS pos
         |    FROM sbi b CROSS JOIN ks kk
         |  )
         |  SELECT p.user_id * $SurrStride + p.k AS skey2, p.pos AS ts,
         |         p.x AS value, yy.y AS y0
         |  FROM spr p JOIN sbi yy ON yy.user_id = p.user_id AND yy.i = p.pos)""".stripMargin
    surrogateSqlTail(surrFrom)
  }

  /** Shared SQL twin of [[surrogatePvals]]: CCM over the surrogate-bundle
    * relation (skey2, ts, value, y0) and the permutation-test p-value.
    */
  private def surrogateSqlTail(surrFrom: String, samples: Int = SurrSamples): String = {
    s"""${curveSqlCommon(None, samples, Seq(SurrLib), "skey2", Seq("ts"), surrFrom, Some("y0"))},
       |rh AS (
       |  SELECT skey // $SurrStride AS user_id, skey % $SurrStride AS k,
       |         direction, round(rho, 6) + 0.0 AS rho6
       |  FROM sk
       |), tr AS (
       |  SELECT user_id, direction, rho6 AS true_rho FROM rh WHERE k = 0
       |)
       |SELECT r.user_id, r.direction, t.true_rho,
       |       CAST(count(*) AS BIGINT) AS n_surr,
       |       CAST(sum(CASE WHEN r.rho6 >= t.true_rho THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
       |       round((CAST(sum(CASE WHEN r.rho6 >= t.true_rho THEN 1 ELSE 0 END) AS BIGINT) + 1)
       |             / (CAST(count(*) AS BIGINT) + 1.0), 6) + 0.0 AS p_val
       |FROM rh r JOIN tr t ON r.user_id = t.user_id AND r.direction = t.direction
       |WHERE r.k <> 0
       |GROUP BY r.user_id, r.direction, t.true_rho
       |ORDER BY r.user_id, r.direction""".stripMargin
  }

  private val surrogateSql: String = {
    val h = DetHash.rankHashSql("b.i", "kk.k", "b.user_id", SurrSeed)
    surrogateSqlWith(
      s"""CASE WHEN kk.k = 0 THEN b.i
         |                ELSE CAST(row_number() OVER (PARTITION BY b.user_id, kk.k
         |                     ORDER BY $h, b.i) AS BIGINT) END""".stripMargin
    )
  }

  private val surrogateCircSql: String =
    surrogateSqlWith(
      """CASE WHEN kk.k = 0 THEN b.i
        |                ELSE ((b.i - 1 + (CASE WHEN (kk.k * 7919) % b.n = 0 THEN 1
        |                                       ELSE (kk.k * 7919) % b.n END)) % b.n) + 1 END""".stripMargin
    )

  // -------------------------------------------------------------------
  // ccm_surrogate_fft — phase-randomized (Ebisuzaki/FFT) null, the one
  // the EDM significance-testing literature actually recommends for
  // autocorrelated series (VERDICT r8 item 7): each surrogate preserves
  // x's FULL power spectrum (hence its autocorrelation at every lag and
  // spectral shape — strictly more than the circular shift keeps) while
  // drawing the phases of all non-fixed bins uniformly from [0, 2π) via
  // DetHash. The DFT of each capped series is a deterministic O(n²)
  // join-aggregate of cos/sin sums, and the surrogate is the direct real
  // cosine-sum reconstruction — fully declarative, one shuffle per
  // stage, replayable verbatim in the DuckDB oracle (cross-engine
  // libm-ulp deltas are absorbed by the 6-dp rho round like exp() in the
  // smap family). DC and Nyquist bins keep phase 0 (randomizing the
  // Nyquist bin of a real cosine-sum would rescale, not rotate, it);
  // k = 0 bypasses reconstruction entirely so the truth rho is computed
  // on the bit-exact original series.
  // -------------------------------------------------------------------
  private val FftSeed = 1187L
  private val TwoPi = 6.283185307179586

  private def surrogateFft(s: SparkSession, dir: String): DataFrame =
    surrogatePvals(
      FftSurrogate.bundle(
        bootInput(s, dir),
        skey = col("user_id"),
        order = Seq("ts"),
        x = col("x"),
        y = col("y"),
        numK = SurrK,
        stride = SurrStride,
        seed = FftSeed
      )
    )

  private val surrogateFftSql: String = {
    val h = DetHash.rankHashSql("c.f", "kk.k", "c.user_id", FftSeed)
    val surrFrom =
      s"""(WITH cap AS (SELECT user_id, ts, value FROM (
         |    SELECT user_id, ts, value,
         |           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
         |    FROM events WHERE user_id % $BootUserMod = 0) WHERE rn <= $BootCap),
         |  sb0 AS (
         |    SELECT user_id, ts, value AS x,
         |           lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS y
         |    FROM cap
         |  ), sb AS (SELECT * FROM sb0 WHERE y IS NOT NULL),
         |  sbi AS (
         |    SELECT user_id, x, y,
         |           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS i,
         |           CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
         |    FROM sb
         |  ),
         |  pts AS (SELECT user_id, i, i - 1 AS t, n, x, y FROM sbi),
         |  fq AS (SELECT user_id, t AS f, n FROM pts WHERE t * 2 <= n),
         |  cf0 AS (
         |    SELECT f.user_id, f.f, f.n,
         |           sum(p.x * cos(($TwoPi * (f.f * p.t)) / f.n)) AS re,
         |           sum(-p.x * sin(($TwoPi * (f.f * p.t)) / f.n)) AS im
         |    FROM fq f JOIN pts p ON p.user_id = f.user_id GROUP BY 1, 2, 3
         |  ),
         |  cf AS (SELECT user_id, f, n, sqrt(re * re + im * im) AS amp, atan2(im, re) AS ph FROM cf0),
         |  ks(k) AS (SELECT CAST(unnest(generate_series(0, $SurrK)) AS BIGINT)),
         |  rc AS (
         |    SELECT c.user_id, kk.k, p.i, p.x, p.y,
         |           sum(CASE WHEN c.f = 0 OR c.f * 2 = c.n THEN 1.0 ELSE 2.0 END / c.n * c.amp *
         |               cos(($TwoPi * (c.f * p.t)) / c.n + c.ph +
         |                   CASE WHEN kk.k = 0 OR c.f = 0 OR c.f * 2 = c.n THEN 0.0
         |                        ELSE $TwoPi * (CAST($h AS DOUBLE) / ${DetHash.P}.0) END)) AS rx
         |    FROM cf c JOIN pts p ON p.user_id = c.user_id CROSS JOIN ks kk
         |    GROUP BY 1, 2, 3, 4, 5
         |  )
         |  SELECT user_id * $SurrStride + k AS skey2, i AS ts,
         |         CASE WHEN k = 0 THEN x ELSE rx END AS value, y AS y0
         |  FROM rc)""".stripMargin
    surrogateSqlTail(surrFrom)
  }

  // -------------------------------------------------------------------
  // ccm_surrogate_fft_wide — the FFT null COMPOSED WITH THE WIDE-SERIES
  // REGIME (VERDICT r9 item 3): FftSurrogate's exact-arbitrary-n DFT is
  // O(n²) in series LENGTH, so on ccm_wide's ~10× longer series it does
  // ~100× the work (measured: see SCALE.md). This gate runs the same
  // null through graft.ccm.FftLadder — a radix-2 butterfly ladder as
  // 2·MaxPow declarative self-join rounds, O(n log n) per series — on
  // power-of-two-truncated wide series (every WideFftSeriesMod-th folded
  // series keeps the bench entry's absolute cost moderate). The oracle
  // replays the identical ladder as generated MATERIALIZED CTEs, so the
  // whole scale path — truncation, bit-reversal, 18 butterfly rounds,
  // conjugate-symmetric phase rotation, inverse scaling — meets the
  // DuckDB hash like every other gate.
  // -------------------------------------------------------------------
  private val WideFftSeriesMod = 16
  // 2 samples (vs the boot regime's 4): the wide gate's job is the ladder
  // scale path; rho averaged over 2 library draws keeps the CCM tail at
  // half the pair volume without touching the p-value's 7-surrogate rank
  private val WideFftSamples = 2

  private def surrogateFftWide(s: SparkSession, dir: String): DataFrame =
    surrogatePvals(
      FftLadder.bundle(
        wideInput(s, dir).filter(col("skey") % WideFftSeriesMod === 0),
        skey = col("skey"),
        order = Seq("ts", "user_id"),
        x = col("x"),
        y = col("y"),
        numK = SurrK,
        stride = SurrStride,
        seed = FftSeed
      ),
      samples = WideFftSamples
    )

  private val surrogateFftWideSql: String = {
    val baseSql =
      s"""SELECT * FROM (
         |  SELECT user_id % $WideMod AS skey, ts, user_id, value AS x,
         |         lag(value) OVER (PARTITION BY user_id % $WideMod ORDER BY ts, user_id) AS y
         |  FROM events WHERE user_id % 2 = 0 AND (user_id % $WideMod) % $WideFftSeriesMod = 0
         |) WHERE y IS NOT NULL""".stripMargin
    surrogateSqlTail(
      FftLadder.bundleSql(baseSql, "ts, user_id", SurrK, SurrStride, FftSeed),
      samples = WideFftSamples
    )
  }

  // -------------------------------------------------------------------
  // ccm_smap — S-map θ-sweep (graft.ccm.Smap): locally weighted linear
  // maps over the bootstrap-regime series (same capped input as
  // ccm_boot), the EDM nonlinearity diagnostic the simplex/CCM family
  // feeds on. E=1 closed-form weighted regression per (target, θ) — the
  // oracle replays the five weighted sums, the Cramer slope, the d̄=0
  // and singular-matrix guards, and derives `nonlinear` from the SAME
  // 6-dp-rounded rhos both engines output (so the flag cannot be
  // flipped by cross-engine ulp noise).
  // -------------------------------------------------------------------
  // single source of truth: the gate sweeps exactly the ladder the specs
  // exercise (re-listing the literals here let the two drift apart)
  private val SmapThetas = Smap.DefaultThetas
  private val SmapEps = Smap.DefaultNonlinearEps

  private def smap(s: SparkSession, dir: String): DataFrame =
    Smap
      .bidirectional(
        bootInput(s, dir),
        skey = col("user_id"),
        order = Seq("ts"),
        x = col("x"),
        y = col("y"),
        thetas = SmapThetas,
        nonlinearEps = SmapEps
      )
      .select(
        col("skey").as("user_id"),
        col("direction"),
        col("theta"),
        col("rho"),
        col("nonlinear")
      )
      .transform(Norm.ordered(_, col("user_id"), col("direction"), col("theta")))

  private val smapSql: String = {
    def dirSql(srcCol: String, tgtCol: String, dirName: String, n: Int): String =
      s"""pairs$n AS (
         |  SELECT t.skey, t.idx AS t_idx, t.$srcCol AS ts_, t.$tgtCol AS tg,
         |         i.$srcCol AS is_, i.$tgtCol AS ig, abs(i.$srcCol - t.$srcCol) AS d
         |  FROM sb t JOIN sb i ON t.skey = i.skey AND t.idx <> i.idx
         |), db$n AS (
         |  SELECT *, avg(d) OVER (PARTITION BY skey, t_idx) AS dbar FROM pairs$n
         |), wt$n AS (
         |  SELECT p.*, th.theta,
         |         CASE WHEN p.dbar > 0 THEN ${ExactExp.duck("-th.theta * p.d / p.dbar")} ELSE 1.0 END AS w
         |  FROM db$n p CROSS JOIN thetas th
         |), ag$n AS (
         |  SELECT skey, theta, t_idx, ts_, tg,
         |         sum(w) AS sw, sum(w * is_) AS swx, sum(w * ig) AS swy,
         |         sum(w * is_ * is_) AS swxx, sum(w * is_ * ig) AS swxy
         |  FROM wt$n GROUP BY 1, 2, 3, 4, 5
         |), co$n AS (
         |  SELECT skey, theta, ts_, tg, sw, swx, swy,
         |         CASE WHEN abs(sw * swxx - swx * swx) > 1e-12
         |              THEN (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
         |              ELSE 0.0 END AS bc
         |  FROM ag$n
         |), pr$n AS (
         |  SELECT skey, theta, tg, (swy - bc * swx) / sw + bc * ts_ AS pred FROM co$n
         |), rh$n AS (
         |  SELECT skey, '$dirName' AS direction, theta,
         |         round(coalesce(corr(tg, pred), 0.0), 6) + 0.0 AS rho
         |  FROM pr$n GROUP BY 1, 2, 3
         |)""".stripMargin
    s"""WITH cap AS (
       |  SELECT user_id, ts, value FROM (
       |    SELECT user_id, ts, value,
       |           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
       |    FROM events WHERE user_id % $BootUserMod = 0) WHERE rn <= $BootCap
       |), b0 AS (
       |  SELECT user_id AS skey, ts, value AS x,
       |         lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS y
       |  FROM cap
       |), sb AS (
       |  SELECT skey, row_number() OVER (PARTITION BY skey ORDER BY ts) AS idx, x, y
       |  FROM b0 WHERE y IS NOT NULL
       |), thetas AS (SELECT CAST(unnest([${SmapThetas.mkString(", ")}]) AS DOUBLE) AS theta),
       |${dirSql("y", "x", "x_causes_y", 1)},
       |${dirSql("x", "y", "y_causes_x", 2)},
       |u AS (SELECT * FROM rh1 UNION ALL SELECT * FROM rh2),
       |fl AS (
       |  SELECT *,
       |         max(CASE WHEN theta = ${SmapThetas.min} THEN rho END)
       |           OVER (PARTITION BY skey, direction) AS rho0,
       |         max(rho) OVER (PARTITION BY skey, direction) AS rho_max
       |  FROM u
       |)
       |SELECT skey AS user_id, direction, theta, rho,
       |       (rho_max - rho0 > CAST($SmapEps AS DOUBLE)) AS nonlinear
       |FROM fl ORDER BY 1, 2, 3""".stripMargin
  }

  // -------------------------------------------------------------------
  // ccm_boot_ci — bootstrap UNCERTAINTY for the CCM skill: the
  // per-sample rho cells ccm_boot averages away, summarized as exact
  // order statistics per (series, direction, lib_size) — min / median /
  // max over the 8 resamples plus the mean. The reference reports the
  // bare mean (`lib/ccm.ex:131-137`); anyone acting on a causality
  // claim needs the spread (a rho of 0.6 whose resamples span
  // [-0.1, 0.9] is a different fact from one spanning [0.55, 0.65]).
  // Cross-engine determinism: cells are 6-dp-ROUNDED before ranking
  // (ulp noise cannot reorder near-ties; sample_id breaks exact ties),
  // the median of the middle two is one addition + division of
  // engine-identical doubles and ships UNROUNDED (the evt_mad_outliers
  // convention — a second rounding is where engines diverge), and the
  // mean is accumulated in integer micro-units.
  // -------------------------------------------------------------------
  private def bootCi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = bootInput(s, dir)
      .select(col("user_id").cast("long").as("skey"), col("ts"), col("x"), col("y"))
    val emb = CcmPipeline
      .embeddedBoth(base, Seq("skey"), Seq(col("ts")), $"x", $"y", bootSpec.embeddingDim, bootSpec.tau)
    val keys = Seq("skey", "direction")
    val rk = CcmPipeline
      .ranked(emb, keys, bootSpec.numSamples, bootSpec.seed, col("skey"))
      .localCheckpoint()
    val cells = CcmPipeline
      .skillCells(rk, keys, BootLibs, bootSpec.numSamples, bootSpec.embeddingDim)
      .select(
        col("skey"),
        col("direction"),
        col("lib_size"),
        col("sample_id"),
        (round(col("rho_cell"), 6) + 0.0).as("rho6")
      )
      .localCheckpoint() // feeds the rank window, the median filter, and the aggregate
    val grp = Seq(col("skey"), col("direction"), col("lib_size"))
    val wR = Window.partitionBy(grp: _*).orderBy(col("rho6").asc, col("sample_id").asc)
    val wG = Window.partitionBy(grp: _*)
    val ranked = cells
      .withColumn("rn", row_number().over(wR).cast("long"))
      .withColumn("n", count(lit(1)).over(wG))
    val med = ranked
      .filter(col("rn") >= expr("(n + 1) div 2") && col("rn") <= expr("(n + 2) div 2"))
      .groupBy(grp: _*)
      .agg((avg(col("rho6")) + 0.0).as("rho_med"))
    ranked
      .groupBy(grp: _*)
      .agg(
        count(lit(1)).as("n_samples"),
        min(col("rho6")).as("rho_lo"),
        max(col("rho6")).as("rho_hi"),
        sum(expr("CAST(round(rho6 * 1000000.0) AS BIGINT)")).as("sm")
      )
      .join(med, Seq("skey", "direction", "lib_size"))
      .select(
        col("skey").as("user_id"),
        col("direction"),
        col("lib_size"),
        col("n_samples"),
        col("rho_lo"),
        col("rho_med"),
        col("rho_hi"),
        // mean via micro-integers WITHOUT a final 6-dp round call:
        // sm/n is exact in binary (n = 8 divides a < 2^53 integer), so
        // round() sees a true x.5 where both engines agree; a round-6 of
        // sm/(n·1e6) instead hits the decimal-vs-binary HALF_UP split
        // (measured: -0.031545 vs -0.031546 at sf0.1)
        (expr("CAST(round(CAST(sm AS DOUBLE) / CAST(n_samples AS DOUBLE)) AS BIGINT)")
          .cast("double") / 1000000.0 + 0.0).as("rho_mean")
      )
      .transform(Norm.ordered(_, col("user_id"), col("direction"), col("lib_size")))
  }

  private val bootCiSql: String = {
    val capFrom =
      s"""(SELECT user_id, ts, value FROM (
         |    SELECT user_id, ts, value,
         |           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
         |    FROM events WHERE user_id % $BootUserMod = 0) WHERE rn <= $BootCap)""".stripMargin
    s"""${curveSqlCommon(None, BootSamples, BootLibs, "user_id", Seq("ts"), capFrom)},
       |r6 AS (
       |  SELECT skey, direction, lib_size, sample_id, round(rho_cell, 6) + 0.0 AS rho6
       |  FROM cells
       |), rk6 AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY skey, direction, lib_size
       |                                    ORDER BY rho6, sample_id) AS BIGINT) AS rn,
       |         CAST(count(*) OVER (PARTITION BY skey, direction, lib_size) AS BIGINT) AS n
       |  FROM r6
       |), med6 AS (
       |  SELECT skey, direction, lib_size, avg(rho6) + 0.0 AS rho_med
       |  FROM rk6 WHERE rn >= (n + 1) // 2 AND rn <= (n + 2) // 2
       |  GROUP BY 1, 2, 3
       |), agg6 AS (
       |  SELECT skey, direction, lib_size, CAST(count(*) AS BIGINT) AS n_samples,
       |         min(rho6) AS rho_lo, max(rho6) AS rho_hi,
       |         CAST(sum(CAST(round(rho6 * 1000000.0) AS BIGINT)) AS BIGINT) AS sm
       |  FROM rk6 GROUP BY 1, 2, 3
       |)
       |SELECT a.skey AS user_id, a.direction, a.lib_size, a.n_samples,
       |       a.rho_lo, m.rho_med, a.rho_hi,
       |       CAST(CAST(round(CAST(a.sm AS DOUBLE) / CAST(a.n_samples AS DOUBLE)) AS BIGINT) AS DOUBLE) / 1000000.0 + 0.0 AS rho_mean
       |FROM agg6 a JOIN med6 m
       |  ON a.skey = m.skey AND a.direction = m.direction AND a.lib_size = m.lib_size
       |ORDER BY 1, 2, 3""".stripMargin
  }

  // -------------------------------------------------------------------
  // ccm_smap_coeffs — the S-map's TIME-VARYING interaction strength
  // (Deyle et al. 2016, "Tracking and forecasting ecosystem interactions
  // in real time"): at one fixed θ the per-target regression slope
  // bc_t = ∂tgt/∂src is the quantity EDM practice reads off S-maps once
  // ccm_smap's sweep establishes nonlinearity — a TIME SERIES of how
  // strongly the source forces the target, not a single summary rho.
  // Same pair-join / weighted-sums chain as ccm_smap restricted to one
  // θ; the oracle replays the five sums, the Cramer slope and both
  // degenerate guards, and emits the slope and prediction per library
  // point.
  // -------------------------------------------------------------------
  private val SmapCoeffTheta = 2.0

  private def smapCoeffs(s: SparkSession, dir: String): DataFrame =
    Smap
      .coeffs(
        bootInput(s, dir),
        skey = col("user_id"),
        order = Seq("ts"),
        x = col("x"),
        y = col("y"),
        theta = SmapCoeffTheta
      )
      .select(
        col("skey").as("user_id"),
        col("direction"),
        col("t_idx"),
        col("tg"),
        col("slope"),
        col("pred")
      )
      .transform(Norm.ordered(_, col("user_id"), col("direction"), col("t_idx")))

  private val smapCoeffsSql: String = {
    def dirSql(srcCol: String, tgtCol: String, dirName: String, n: Int): String =
      s"""cpairs$n AS (
         |  SELECT t.skey, t.idx AS t_idx, t.$srcCol AS ts_, t.$tgtCol AS tg,
         |         i.$srcCol AS is_, i.$tgtCol AS ig, abs(i.$srcCol - t.$srcCol) AS d
         |  FROM sb t JOIN sb i ON t.skey = i.skey AND t.idx <> i.idx
         |), cdb$n AS (
         |  SELECT *, avg(d) OVER (PARTITION BY skey, t_idx) AS dbar FROM cpairs$n
         |), cag$n AS (
         |  SELECT skey, t_idx, ts_, tg,
         |         sum(w) AS sw, sum(w * is_) AS swx, sum(w * ig) AS swy,
         |         sum(w * is_ * is_) AS swxx, sum(w * is_ * ig) AS swxy
         |  FROM (SELECT p.*,
         |          CASE WHEN p.dbar > 0 THEN ${ExactExp.duck(s"-$SmapCoeffTheta * p.d / p.dbar")} ELSE 1.0 END AS w
         |        FROM cdb$n p)
         |  GROUP BY 1, 2, 3, 4
         |), cco$n AS (
         |  SELECT skey, '$dirName' AS direction, t_idx, tg, sw, swx, swy, ts_,
         |         CASE WHEN abs(sw * swxx - swx * swx) > 1e-12
         |              THEN (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
         |              ELSE 0.0 END AS bc
         |  FROM cag$n
         |)""".stripMargin
    s"""WITH cap AS (
       |  SELECT user_id, ts, value FROM (
       |    SELECT user_id, ts, value,
       |           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
       |    FROM events WHERE user_id % $BootUserMod = 0) WHERE rn <= $BootCap
       |), b0 AS (
       |  SELECT user_id AS skey, ts, value AS x,
       |         lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS y
       |  FROM cap
       |), sb AS (
       |  SELECT skey, row_number() OVER (PARTITION BY skey ORDER BY ts) AS idx, x, y
       |  FROM b0 WHERE y IS NOT NULL
       |),
       |${dirSql("y", "x", "x_causes_y", 1)},
       |${dirSql("x", "y", "y_causes_x", 2)},
       |cu AS (SELECT * FROM cco1 UNION ALL SELECT * FROM cco2)
       |SELECT skey AS user_id, direction, t_idx, tg,
       |       round(bc, 6) + 0.0 AS slope,
       |       round((swy - bc * swx) / sw + bc * ts_, 6) + 0.0 AS pred
       |FROM cu ORDER BY 1, 2, 3""".stripMargin
  }

  // -------------------------------------------------------------------
  // ccm_smap_e3 — general-E S-map (VERDICT r8 item 3): the same θ-sweep
  // at the embedding dimension real EDM practice uses (E=3 here, the FNN
  // regime; reference embeddings are E-dimensional, lib/ccm.ex:99-107).
  // Per (target, θ) the (E+1)-dim weighted normal equations are solved by
  // Cramer's rule GENERATED ONCE as an arithmetic string over weighted
  // co-moment columns (Smap.cramerPredExpr) and handed verbatim to both
  // engines — Spark expr() and this oracle parse the identical tree, so
  // parity is by construction and only aggregation-order ulps remain
  // (absorbed by the 6-dp round).
  // -------------------------------------------------------------------
  private val SmapE = 3

  private def smapE3(s: SparkSession, dir: String): DataFrame =
    Smap
      .bidirectionalE(
        bootInput(s, dir),
        skey = col("user_id"),
        order = Seq("ts"),
        x = col("x"),
        y = col("y"),
        e = SmapE,
        thetas = SmapThetas,
        nonlinearEps = SmapEps
      )
      .select(
        col("skey").as("user_id"),
        col("direction"),
        col("theta"),
        col("rho"),
        col("nonlinear")
      )
      .transform(Norm.ordered(_, col("user_id"), col("direction"), col("theta")))

  private val smapE3Sql: String = {
    val e = SmapE
    val tvList = (1 to e).map(j => s"tv$j").mkString(", ")
    def dirSql(srcCol: String, tgtCol: String, dirName: String, n: Int): String = {
      val lags = (1 to e)
        .map(j => s"lag($srcCol, ${j - 1}) OVER (PARTITION BY skey ORDER BY idx) AS v$j")
        .mkString(", ")
      val tCols = (1 to e).map(j => s"t.v$j AS tv$j").mkString(", ")
      val iCols = (1 to e).map(j => s"i.v$j AS iv$j").mkString(", ")
      val dist = (1 to e).map(j => s"(i.v$j - t.v$j) * (i.v$j - t.v$j)").mkString(" + ")
      s"""emb$n AS (
         |  SELECT * FROM (SELECT skey, idx, $tgtCol AS g, $lags FROM sb)
         |  WHERE v$e IS NOT NULL
         |), pairs$n AS (
         |  SELECT t.skey, t.idx AS t_idx, t.g AS tg, i.g AS ig, $tCols, $iCols,
         |         sqrt($dist) AS d
         |  FROM emb$n t JOIN emb$n i ON t.skey = i.skey AND t.idx <> i.idx
         |), db$n AS (
         |  SELECT *, avg(d) OVER (PARTITION BY skey, t_idx) AS dbar FROM pairs$n
         |), wt$n AS (
         |  SELECT p.*, th.theta,
         |         CASE WHEN p.dbar > 0 THEN ${ExactExp.duck("-th.theta * p.d / p.dbar")} ELSE 1.0 END AS w
         |  FROM db$n p CROSS JOIN thetas th
         |), ag$n AS (
         |  SELECT skey, theta, t_idx, tg, $tvList,
         |         ${Smap.momentAggsSql(e).mkString(",\n         ")}
         |  FROM wt$n GROUP BY skey, theta, t_idx, tg, $tvList
         |), pr$n AS (
         |  SELECT skey, theta, tg, ${Smap.cramerPredExpr(e)} AS pred FROM ag$n
         |), rh$n AS (
         |  SELECT skey, '$dirName' AS direction, theta,
         |         round(coalesce(corr(tg, pred), 0.0), 6) + 0.0 AS rho
         |  FROM pr$n GROUP BY 1, 2, 3
         |)""".stripMargin
    }
    s"""WITH cap AS (
       |  SELECT user_id, ts, value FROM (
       |    SELECT user_id, ts, value,
       |           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
       |    FROM events WHERE user_id % $BootUserMod = 0) WHERE rn <= $BootCap
       |), b0 AS (
       |  SELECT user_id AS skey, ts, value AS x,
       |         lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS y
       |  FROM cap
       |), sb AS (
       |  SELECT skey, row_number() OVER (PARTITION BY skey ORDER BY ts) AS idx, x, y
       |  FROM b0 WHERE y IS NOT NULL
       |), thetas AS (SELECT CAST(unnest([${SmapThetas.mkString(", ")}]) AS DOUBLE) AS theta),
       |${dirSql("y", "x", "x_causes_y", 1)},
       |${dirSql("x", "y", "y_causes_x", 2)},
       |u AS (SELECT * FROM rh1 UNION ALL SELECT * FROM rh2),
       |fl AS (
       |  SELECT *,
       |         max(CASE WHEN theta = ${SmapThetas.min} THEN rho END)
       |           OVER (PARTITION BY skey, direction) AS rho0,
       |         max(rho) OVER (PARTITION BY skey, direction) AS rho_max
       |  FROM u
       |)
       |SELECT skey AS user_id, direction, theta, rho,
       |       (rho_max - rho0 > CAST($SmapEps AS DOUBLE)) AS nonlinear
       |FROM fl ORDER BY 1, 2, 3""".stripMargin
  }

  // -------------------------------------------------------------------
  // ccm_lag_sweep — time-delayed CCM (graft.ccm.LagCcm, Ye et al. 2015):
  // cross-map skill over a lag ladder, kNN computed ONCE per direction
  // and reused by every lag; best_lag derived from the SAME 6-dp-rounded
  // rhos both engines output. E=2, leave-one-out library, k=3.
  // -------------------------------------------------------------------
  private val LagE = 2

  private def lagSweep(s: SparkSession, dir: String): DataFrame =
    LagCcm
      .bidirectional(
        bootInput(s, dir),
        skey = col("user_id"),
        order = Seq("ts"),
        x = col("x"),
        y = col("y"),
        e = LagE
      )
      .select(
        col("skey").as("user_id"),
        col("direction"),
        col("lag"),
        col("rho"),
        col("best_lag")
      )
      .transform(Norm.ordered(_, col("user_id"), col("direction"), col("lag")))

  private val lagSweepSql: String = {
    val k = LagE + 1
    def dirSql(srcCol: String, tgtCol: String, dirName: String, n: Int): String =
      s"""em$n AS (
         |  SELECT skey, CAST(row_number() OVER w - 1 AS BIGINT) AS idx,
         |         $srcCol AS e0, lead($srcCol, 1) OVER w AS e1,
         |         lead($tgtCol, 1) OVER w AS tgt
         |  FROM sb WINDOW w AS (PARTITION BY skey ORDER BY ts)
         |  QUALIFY e1 IS NOT NULL
         |), nn$n AS (
         |  SELECT skey, t_idx, l_idx,
         |         CASE WHEN dist < 1e-12 THEN 1.0
         |              ELSE ${ExactExp.duck("-dist / (min(dist) OVER (PARTITION BY skey, t_idx) + 1e-8)")}
         |         END AS w
         |  FROM (
         |    SELECT t.skey, t.idx AS t_idx, l.idx AS l_idx,
         |           sqrt((t.e0 - l.e0) * (t.e0 - l.e0) + (t.e1 - l.e1) * (t.e1 - l.e1)) AS dist,
         |           row_number() OVER (PARTITION BY t.skey, t.idx
         |             ORDER BY sqrt((t.e0 - l.e0) * (t.e0 - l.e0) + (t.e1 - l.e1) * (t.e1 - l.e1)), l.idx) AS rn
         |    FROM em$n t JOIN em$n l ON t.skey = l.skey AND t.idx <> l.idx)
         |  WHERE rn <= $k
         |), pd$n AS (
         |  SELECT g.skey, g.lag, g.t_idx,
         |         CASE WHEN g.sw = 0.0 THEN 0.0 ELSE g.swt / g.sw END AS pred, a.tgt AS act
         |  FROM (
         |    SELECT nn.skey, lg.lag, nn.t_idx, sum(nn.w) AS sw, sum(nn.w * lt.tgt) AS swt
         |    FROM nn$n nn CROSS JOIN lags lg
         |    JOIN em$n lt ON nn.skey = lt.skey AND nn.l_idx + lg.lag = lt.idx
         |    GROUP BY 1, 2, 3) g
         |  JOIN em$n a ON g.skey = a.skey AND g.t_idx + g.lag = a.idx
         |), rh$n AS (
         |  SELECT skey, '$dirName' AS direction, lag,
         |         round(coalesce(corr(act, pred), 0.0), 6) + 0.0 AS rho
         |  FROM pd$n GROUP BY 1, 2, 3
         |)""".stripMargin
    s"""WITH cap AS (
       |  SELECT user_id, ts, value FROM (
       |    SELECT user_id, ts, value,
       |           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
       |    FROM events WHERE user_id % $BootUserMod = 0) WHERE rn <= $BootCap
       |), b0 AS (
       |  SELECT user_id AS skey, ts, value AS x,
       |         lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS y
       |  FROM cap
       |), sb AS (SELECT skey, ts, x, y FROM b0 WHERE y IS NOT NULL),
       |lags AS (SELECT CAST(unnest(generate_series(-3, 3)) AS BIGINT) AS lag),
       |${dirSql("y", "x", "x_causes_y", 1)},
       |${dirSql("x", "y", "y_causes_x", 2)},
       |u AS (SELECT * FROM rh1 UNION ALL SELECT * FROM rh2),
       |fl AS (
       |  SELECT *, max(rho) OVER (PARTITION BY skey, direction) AS rho_max
       |  FROM u
       |), fb AS (
       |  SELECT *, min(CASE WHEN rho = rho_max THEN lag END)
       |              OVER (PARTITION BY skey, direction) AS best_lag
       |  FROM fl
       |)
       |SELECT skey AS user_id, direction, lag, rho, best_lag
       |FROM fb ORDER BY 1, 2, 3""".stripMargin
  }

  // ccm_convergence — convergent?/1 (C10) as its own surface: OLS slope of
  // the skill curve, strict > 0.001, <3 sizes -> false (`lib/ccm.ex:215-244`).
  // Routed through the perSeries scale path (the strategy a convergence-only
  // call should use: it reduces each series to two rows, so recomputing the
  // declarative pair-join DAG for it is pure waste). The declarative
  // regr_slope surface stays verified by ccm_curve's slope column and the
  // flagship entry(); curve vs curve_perseries pins the two strategies
  // value-identical on this very workload.
  private def convergenceQ(s: SparkSession, dir: String): DataFrame = {
    val in = curveInput(s, dir)
      .select(col("user_id").as("skey"), col("ts").as("ord"), col("x"), col("y"))
    Ccm
      .perSeries(in, CcmSpec(numSamples = CurveSamples, seed = Seed), Some(CurveLibs))
      .toDF()
      .select(col("skey").as("user_id"), col("direction"), Norm.rnd(col("slope"), 6).as("slope"), col("convergent"))
      .distinct()
      .transform(Norm.ordered(_, col("user_id"), col("direction")))
  }

  private val convergenceSql: String =
    s"""${curveSqlCommon()}
       |SELECT skey AS user_id, direction, round(slope, 6) + 0.0 AS slope, convergent
       |FROM cv ORDER BY user_id, direction""".stripMargin

  // -------------------------------------------------------------------
  // ccm_gen_logistic — G1 generator parity: the coupled-logistic-map
  // recurrence is driver-side Scala; the oracle replays it as a recursive
  // CTE. Chaotic map -> values match only if the arithmetic is
  // bit-identical (same IEEE op order in both engines).
  // -------------------------------------------------------------------
  private val GenN = 120
  private val GenC = 0.15

  private def genLogistic(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (xs, ys) = Generators.coupledLogisticMaps(GenN, GenC)
    xs.indices.map(i => (i.toLong, xs(i), ys(i))).toDF("t", "x", "y").orderBy("t")
  }

  private val genLogisticSql: String =
    s"""WITH RECURSIVE gen(t, x, y) AS (
       |  SELECT CAST(0 AS BIGINT), CAST(0.1 AS DOUBLE), CAST(0.2 AS DOUBLE)
       |  UNION ALL
       |  SELECT t + 1,
       |         greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE), 3.7*x*(1-x) + $GenC*(y-x))),
       |         greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE), 3.6*y*(1-y)))
       |  FROM gen WHERE t < ${GenN - 1}
       |)
       |SELECT t, x, y FROM gen ORDER BY t""".stripMargin

  // -------------------------------------------------------------------
  // ccm_mi_tau — MI-based tau estimation (SURVEY §2c.1: documented in the
  // reference README but never implemented there; built here for real).
  // MI(tau) over an 8-bin 2-D histogram for tau=1..6 + first-local-min
  // selection. Local-min comparisons run on the ROUNDED mi so both engines
  // compare identical values.
  // -------------------------------------------------------------------
  private val MiMaxTau = 6
  private val MiBins = 8

  private def miTauRaw(s: SparkSession, dir: String): DataFrame = {
    import graft.ccm.MiTau
    val mi = MiTau
      .miCurve(ev(s, dir), Seq("user_id"), Seq(col("ts")), col("value"), MiMaxTau, MiBins)
      .withColumn("mi", Norm.rnd(col("mi"), 6))
    // first-local-min selection as WINDOW aggregates (identical values to
    // MiTau.bestTau) — a join against a bestTau subquery would execute the
    // whole MI pipeline twice
    val w = Window.partitionBy("user_id").orderBy("tau")
    val wAll = Window.partitionBy("user_id")
    mi.withColumn("prev", lag(col("mi"), 1).over(w))
      .withColumn("next", lead(col("mi"), 1).over(w))
      .withColumn(
        "best_tau",
        coalesce(
          min(
            when(
              col("prev").isNotNull && col("next").isNotNull &&
                col("mi") < col("prev") && col("mi") < col("next"),
              col("tau")
            )
          ).over(wAll),
          lit(1)
        ).cast("int")
      )
      .select(col("user_id"), col("tau"), col("mi"), col("best_tau"))
  }

  private def miTau(s: SparkSession, dir: String): DataFrame =
    miTauRaw(s, dir).transform(Norm.ordered(_, col("user_id"), col("tau")))

  private val miTauSql: String = {
    val leadCols = (1 to MiMaxTau).map(t => s"lead(value, $t) OVER w AS y$t").mkString(", ")
    val unions = (1 to MiMaxTau)
      .map(t => s"SELECT user_id, x, mn, mx, $t AS tau, y$t AS y FROM base WHERE y$t IS NOT NULL")
      .mkString("\n  UNION ALL\n  ")
    def binOf(c: String) =
      s"CASE WHEN mx = mn THEN 0 ELSE least(${MiBins - 1}, CAST(floor(($c - mn) / ((mx - mn) / $MiBins)) AS INTEGER)) END"
    s"""WITH base AS (
       |  SELECT user_id, value AS x,
       |         min(value) OVER (PARTITION BY user_id) AS mn,
       |         max(value) OVER (PARTITION BY user_id) AS mx,
       |         $leadCols
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |), pairs AS (
       |  $unions
       |), binned AS (
       |  SELECT user_id, tau, ${binOf("x")} AS bx, ${binOf("y")} AS by FROM pairs
       |), joint AS (
       |  SELECT user_id, tau, bx, by, count(*) AS c FROM binned GROUP BY 1, 2, 3, 4
       |), terms AS (
       |  SELECT *, sum(c) OVER (PARTITION BY user_id, tau, bx) AS cx,
       |         sum(c) OVER (PARTITION BY user_id, tau, by) AS cy,
       |         sum(c) OVER (PARTITION BY user_id, tau) AS n
       |  FROM joint
       |), mi AS MATERIALIZED (
       |  -- MATERIALIZED: flag references mi THREE times (mi, lag, lead);
       |  -- DuckDB inlines non-materialized CTEs per reference, and three
       |  -- copies of the ExactLn series expression overflow the planner
       |  -- stack (measured segfault) — the evt_acf chain-inlining lesson
       |  SELECT user_id, tau, round(sum((c / n) * ${ExactLn.duck("(c * n) / (cx * cy)")}), 6) + 0.0 AS mi
       |  FROM terms GROUP BY 1, 2
       |), flag AS (
       |  SELECT user_id, tau, mi,
       |         lag(mi, 1) OVER wt AS prev, lead(mi, 1) OVER wt AS next
       |  FROM mi WINDOW wt AS (PARTITION BY user_id ORDER BY tau)
       |), best AS (
       |  SELECT user_id, CAST(coalesce(min(CASE WHEN prev IS NOT NULL AND next IS NOT NULL
       |                        AND mi < prev AND mi < next THEN tau END), 1) AS INTEGER) AS best_tau
       |  FROM flag GROUP BY 1
       |)
       |SELECT m.user_id, CAST(m.tau AS INTEGER) AS tau, m.mi, b.best_tau
       |FROM mi m JOIN best b ON m.user_id = b.user_id
       |ORDER BY 1, 2""".stripMargin
  }

  // -------------------------------------------------------------------
  // ccm_fnn_dim — FNN-based embedding-dimension estimation (SURVEY §2c.2:
  // mentioned in the reference README, never implemented there). Kennel
  // criterion at rTol=15 for E=1..4; best E = first with fnn_frac < 1%.
  // -------------------------------------------------------------------
  private val FnnMaxE = 4
  private val FnnRTol = 15.0
  private val FnnFrac = 0.01

  private def fnnDimRaw(s: SparkSession, dir: String): DataFrame = {
    import graft.ccm.FnnDim
    val curve = FnnDim.fnnCurve(ev(s, dir), Seq("user_id"), Seq(col("ts")), col("value"), FnnMaxE, 1, FnnRTol)
    // best-E selection as a WINDOW aggregate (identical values to
    // FnnDim.bestE) — a join against a bestE subquery would execute the
    // whole FNN pair-join pipeline twice (measured ~2x on the wall clock)
    val wAll = Window.partitionBy("user_id")
    curve
      .withColumn(
        "best_e",
        coalesce(
          min(when(col("fnn_frac") < FnnFrac, col("e"))).over(wAll),
          min(struct(col("fnn_frac"), col("e"))).over(wAll).getField("e")
        ).cast("int")
      )
      .select(
        col("user_id"),
        col("e"),
        col("n_neighbors"),
        col("n_false"),
        Norm.rnd(col("fnn_frac"), 6).as("fnn_frac"),
        col("best_e")
      )
  }

  private def fnnDim(s: SparkSession, dir: String): DataFrame =
    fnnDimRaw(s, dir).transform(Norm.ordered(_, col("user_id"), col("e")))

  private val fnnDimSql: String = {
    val leadCols = (1 to FnnMaxE).map(t => s"lead(value, $t) OVER w AS e$t").mkString(", ")
    val perE = (1 to FnnMaxE)
      .map { e =>
        val dist2 = (0 until e).map(j => s"(a.e$j - b.e$j) * (a.e$j - b.e$j)").mkString(" + ")
        s"""SELECT user_id, $e AS e,
           |    CASE WHEN dist < 1e-12 THEN false ELSE extra_gap / dist > $FnnRTol END AS is_false
           |  FROM (
           |    SELECT a.user_id AS user_id, a.idx,
           |      sqrt($dist2) AS dist,
           |      abs(a.e$e - b.e$e) AS extra_gap,
           |      row_number() OVER (PARTITION BY a.user_id, a.idx
           |                         ORDER BY sqrt($dist2), b.idx) AS rn
           |    FROM (SELECT * FROM emb WHERE e$e IS NOT NULL) a
           |    JOIN (SELECT * FROM emb WHERE e$e IS NOT NULL) b
           |      ON a.user_id = b.user_id AND a.idx <> b.idx
           |  ) WHERE rn = 1""".stripMargin
      }
      .mkString("\n  UNION ALL\n  ")
    s"""WITH emb AS (
       |  SELECT user_id, CAST(row_number() OVER w - 1 AS BIGINT) AS idx,
       |         value AS e0, $leadCols
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |), flags AS (
       |  $perE
       |), agg AS (
       |  SELECT user_id, e, CAST(count(*) AS BIGINT) AS n_neighbors,
       |         CAST(sum(CASE WHEN is_false THEN 1 ELSE 0 END) AS BIGINT) AS n_false,
       |         sum(CASE WHEN is_false THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE) AS fnn_frac
       |  FROM flags GROUP BY 1, 2
       |), rankedE AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY fnn_frac, e) AS rno FROM agg
       |), best AS (
       |  SELECT user_id, CAST(coalesce(min(CASE WHEN fnn_frac < $FnnFrac THEN e END),
       |                                min(CASE WHEN rno = 1 THEN e END)) AS INTEGER) AS best_e
       |  FROM rankedE GROUP BY 1
       |)
       |SELECT a.user_id, a.e, a.n_neighbors, a.n_false, round(a.fnn_frac, 6) + 0.0 AS fnn_frac, b.best_e
       |FROM agg a JOIN best b ON a.user_id = b.user_id
       |ORDER BY 1, 2""".stripMargin
  }

  // -------------------------------------------------------------------
  // ccm_auto_params — the AUTO-EDM parameter panel: one row per series
  // with the data-driven (tau, E) recommendation an EDM practitioner
  // derives before running CCM — tau* from the first local minimum of
  // the mutual-information curve (ccm_mi_tau's selection) and E* from
  // the first Kennel false-nearest-neighbor fraction under 1%
  // (ccm_fnn_dim's selection), each carried with its diagnostic value at
  // the pick. The reference hardcodes tau=1/E=2 defaults
  // (`lib/ccm.ex:20-30`) and its README points at MI/FNN as the way to
  // choose them; this panel is that workflow as one query — the output
  // feeds CcmSpec directly. Spark side composes the two existing
  // pipelines and keeps only each curve's selected row; the oracle
  // nests the two generated SQL bodies as CTEs (locally-scoped WITH,
  // so their internal names cannot collide).
  // -------------------------------------------------------------------
  private def autoParams(s: SparkSession, dir: String): DataFrame = {
    // the RAW (unordered) diagnostic forms: composing the public queries
    // would drag each one's repartition(1) final-ordering shuffle into
    // the middle of the joined plan (measured 4.2 s vs 2.6 s at sf0.1)
    val mi = miTauRaw(s, dir)
      .filter(col("tau") === col("best_tau"))
      .select(col("user_id"), col("best_tau"), col("mi").as("mi_at_best"))
    val fnn = fnnDimRaw(s, dir)
      .filter(col("e") === col("best_e"))
      .select(col("user_id"), col("best_e"), col("fnn_frac").as("fnn_at_best"))
    mi.join(fnn, Seq("user_id"))
      .transform(Norm.ordered(_, col("user_id")))
  }

  private val autoParamsSql: String =
    s"""WITH mi_full AS (
       |$miTauSql
       |), fnn_full AS (
       |$fnnDimSql
       |)
       |SELECT m.user_id, m.best_tau, m.mi AS mi_at_best, f.best_e, f.fnn_frac AS fnn_at_best
       |FROM mi_full m JOIN fnn_full f ON m.user_id = f.user_id
       |WHERE m.tau = m.best_tau AND f.e = f.best_e
       |ORDER BY m.user_id""".stripMargin

  // ccm_gen_coupled — G2/G4: all four canned coupled-series cases. The
  // observation noise is the DetHash uniform (streams 1/2 scaled to [0,1)),
  // so the oracle replays BOTH the clean recurrence (recursive CTE, the
  // bit-parity technique proven by ccm_gen_logistic) and the noise as
  // integer arithmetic — the full generator is exact-hash checked.
  private def genCoupled(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Generators.testCases
      .flatMap { case (name, params) =>
        val (xs, ys) = Generators.coupledSeries(50, params)
        xs.indices.map(i => (name, i.toLong, xs(i), ys(i)))
      }
      .toDF("case_name", "t", "x", "y")
      .transform(Norm.ordered(_, col("case_name"), col("t")))
  }

  private val genCoupledSql: String = {
    val ctes = Generators.testCases.map { case (name, p) =>
      s"""g_$name(t, x, y) AS (
         |  SELECT CAST(0 AS BIGINT), CAST(${p.x0} AS DOUBLE), CAST(${p.y0} AS DOUBLE)
         |  UNION ALL
         |  SELECT t + 1,
         |    greatest(CAST(0.001 AS DOUBLE), least(CAST(0.999 AS DOUBLE), ${p.rX}*x*(1-x))),
         |    greatest(CAST(0.001 AS DOUBLE), least(CAST(0.999 AS DOUBLE), ${p.rY}*y*(1-y) + ${p.coupling}*(x-y)))
         |  FROM g_$name WHERE t < 49
         |)""".stripMargin
    }
    val selects = Generators.testCases.map { case (name, p) =>
      val u1 = s"(CAST(${DetHash.rankHashSql("t", "1", "0", p.seed)} AS DOUBLE) / ${DetHash.P})"
      val u2 = s"(CAST(${DetHash.rankHashSql("t", "2", "0", p.seed)} AS DOUBLE) / ${DetHash.P})"
      s"""SELECT '$name' AS case_name, t,
         |  x + ${p.noiseLevel} * ($u1 - 0.5) * 2 AS x,
         |  y + ${p.noiseLevel} * ($u2 - 0.5) * 2 AS y
         |FROM g_$name""".stripMargin
    }
    s"""WITH RECURSIVE
       |${ctes.mkString(",\n")}
       |${selects.mkString("\nUNION ALL\n")}
       |ORDER BY case_name, t""".stripMargin
  }

  // -------------------------------------------------------------------
  // ingest_series — the reference's custom-data ingestion path (I1,
  // examples.livemd: comma-separated series text -> parsed double series)
  // as a DISTRIBUTED query: per user, the events table is rendered to one
  // CSV line (integer cents — BIGINT-to-string formatting is engine-
  // portable where double-to-string is not), then PARSED back with the
  // same split/trim/cast semantics as `Ccm.parseSeriesText`
  // (ParseSeriesSpec pins column-path ≡ driver-path equality) and
  // summarized. The parse is the operator under test; the render is just
  // a deterministic fixture. Scales as one groupBy + per-row array ops —
  // a line never leaves its user's partition.
  // -------------------------------------------------------------------
  private def ingestSeries(s: SparkSession, dir: String): DataFrame = {
    val lines = Tables.events(s, dir)
      .select(
        col("user_id"),
        struct(col("ts"), col("event_id"), round(col("value") * 100).cast("long").as("cents")).as("p")
      )
      .groupBy("user_id")
      .agg(
        expr("concat_ws(', ', transform(array_sort(collect_list(p)), x -> CAST(x.cents AS STRING)))")
          .as("line")
      )
    lines
      .select(col("user_id"), Ccm.parseCsvLine(col("line")).as("vals"))
      .select(
        col("user_id"),
        size(col("vals")).cast("long").as("n_points"),
        (element_at(col("vals"), 1) / 100.0 + lit(0.0)).as("first_v"),
        (element_at(col("vals"), -1) / 100.0 + lit(0.0)).as("last_v"),
        Norm.rnd(
          expr("aggregate(vals, 0L, (acc, x) -> acc + CAST(round(x) AS BIGINT))") / 100.0,
          2
        ).as("sum_v")
      )
      .transform(Norm.ordered(_, col("user_id")))
  }

  private val ingestSeriesSql: String =
    """WITH lines AS (
      |  SELECT user_id,
      |    string_agg(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR), ', '
      |               ORDER BY epoch_ns(ts), event_id) AS line
      |  FROM events GROUP BY 1
      |), parsed AS (
      |  SELECT user_id,
      |    list_transform(string_split(line, ','), x -> CAST(trim(x) AS DOUBLE)) AS vals
      |  FROM lines
      |)
      |SELECT user_id,
      |  CAST(len(vals) AS BIGINT) AS n_points,
      |  vals[1] / 100.0 + 0.0 AS first_v,
      |  vals[-1] / 100.0 + 0.0 AS last_v,
      |  round(CAST(list_sum(list_transform(vals, x -> CAST(round(x) AS BIGINT))) AS BIGINT) / 100.0, 2) + 0.0 AS sum_v
      |FROM parsed ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------------
  // ccm_simplex — univariate simplex projection (Sugihara & May 1990),
  // the E-selection forecaster the reference's README workflow presumes
  // (README:77 "E estimation"; the reference's kNN core `lib/ccm.ex:139-
  // 177` IS this forecaster pointed across series). E = 1..4 at horizon
  // tp = 1; best_e = argmax rho (smallest E on ties), replicated per
  // series like the convergent flag. See graft.ccm.Simplex.
  // -------------------------------------------------------------------
  private val SimplexMaxE = 4
  private val SimplexTpE = 2
  private val SimplexMaxTp = 6

  private def simplexCurve(s: SparkSession, dir: String): DataFrame = {
    val curve =
      Simplex.curve(ev(s, dir), Seq("user_id"), Seq(col("ts")), col("value"), SimplexMaxE)
    // best-E as WINDOW aggregates over the tiny per-series curve (the
    // fnnDim lesson: a join against a best-E subquery re-executes the
    // whole kNN pipeline twice). rho is already 6-dp rounded, so the
    // equality against the windowed max compares engine-identical doubles.
    val wAll = Window.partitionBy("user_id")
    curve
      .withColumn("rho_max", max(col("rho")).over(wAll))
      .withColumn(
        "best_e",
        min(when(col("rho") === col("rho_max"), col("e"))).over(wAll).cast("int")
      )
      .drop("rho_max")
      .transform(Norm.ordered(_, col("user_id"), col("e")))
  }

  private val simplexSql: String = {
    val maxE = SimplexMaxE
    val leadCols = ((1 until maxE).map(j => s"lead(value, $j) OVER w AS e$j") ++
      (1 to maxE).map(e => s"lead(value, $e) OVER w AS f$e")).mkString(", ")
    val perE = (1 to maxE)
      .map { e =>
        val dist2 = (0 until e).map(j => s"(t.e$j - i.e$j) * (t.e$j - i.e$j)").mkString(" + ")
        s"""SELECT user_id, $e AS e, actual,
           |    CASE WHEN sw = 0.0 THEN 0.0 ELSE swt / sw END AS pred
           |  FROM (
           |    SELECT user_id, t_idx, actual, sum(wgt) AS sw, sum(wgt * i_f) AS swt
           |    FROM (
           |      SELECT user_id, t_idx, actual, i_f,
           |        CASE WHEN dist < 1e-12 THEN 1.0
           |             ELSE ${ExactExp.duck("-dist / (min(dist) OVER (PARTITION BY user_id, t_idx) + 1e-8)")} END AS wgt
           |      FROM (
           |        SELECT t.user_id AS user_id, t.idx AS t_idx, t.f$e AS actual,
           |          i.f$e AS i_f, sqrt($dist2) AS dist,
           |          row_number() OVER (PARTITION BY t.user_id, t.idx
           |                             ORDER BY sqrt($dist2), i.idx) AS rn
           |        FROM (SELECT * FROM emb WHERE e${e - 1} IS NOT NULL AND f$e IS NOT NULL) t
           |        JOIN (SELECT * FROM emb WHERE e${e - 1} IS NOT NULL AND f$e IS NOT NULL) i
           |          ON t.user_id = i.user_id AND t.idx <> i.idx
           |      ) WHERE rn <= ${e + 1}
           |    ) GROUP BY 1, 2, 3
           |  )""".stripMargin
      }
      .mkString("\n  UNION ALL\n  ")
    s"""WITH emb AS (
       |  SELECT user_id, CAST(row_number() OVER w - 1 AS BIGINT) AS idx, value AS e0, $leadCols
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |), preds AS (
       |  $perE
       |), agg AS (
       |  SELECT user_id, e, CAST(count(*) AS BIGINT) AS n_pred,
       |         covar_samp(actual, pred) AS cv, stddev_samp(actual) AS s1, stddev_samp(pred) AS s2
       |  FROM preds GROUP BY 1, 2
       |), curve AS (
       |  SELECT user_id, e, n_pred,
       |    round(CASE WHEN cv IS NULL OR s1 IS NULL OR s2 IS NULL
       |                 OR isnan(cv) OR isnan(s1) OR isnan(s2)
       |                 OR s1 = 0.0 OR s2 = 0.0 THEN 0.0
       |               ELSE cv / (s1 * s2) END, 6) + 0.0 AS rho
       |  FROM agg
       |), best AS (
       |  SELECT user_id, CAST(min(CASE WHEN rho = rho_max THEN e END) AS INTEGER) AS best_e
       |  FROM (SELECT user_id, e, rho, max(rho) OVER (PARTITION BY user_id) AS rho_max FROM curve)
       |  GROUP BY 1
       |)
       |SELECT c.user_id, c.e, c.n_pred, c.rho, b.best_e
       |FROM curve c JOIN best b ON c.user_id = b.user_id
       |ORDER BY 1, 2""".stripMargin
  }

  // ccm_simplex_tp — prediction-decay sweep (the Sugihara–May chaos-vs-
  // noise diagnostic): simplex skill at horizons tp = 1..6 with E fixed
  // at 2. The library is pinned to full-horizon rows so the kNN runs ONCE
  // for all horizons (see Simplex.tpSweep's plan notes).
  private def simplexTp(s: SparkSession, dir: String): DataFrame =
    Simplex
      .tpSweep(ev(s, dir), Seq("user_id"), Seq(col("ts")), col("value"), SimplexTpE, SimplexMaxTp)
      .transform(Norm.ordered(_, col("user_id"), col("tp")))

  private val simplexTpSql: String = {
    val e = SimplexTpE
    val mt = SimplexMaxTp
    val leads = ((1 until e).map(j => s"lead(value, $j) OVER w AS e$j") ++
      (1 to mt).map(t => s"lead(value, ${e - 1 + t}) OVER w AS f$t")).mkString(", ")
    val dist2 = (0 until e).map(j => s"(t.e$j - i.e$j) * (t.e$j - i.e$j)").mkString(" + ")
    val tfCols = (1 to mt).map(t => s"t.f$t AS tf$t").mkString(", ")
    val ifCols = (1 to mt).map(t => s"i.f$t AS if$t").mkString(", ")
    val tfNames = (1 to mt).map(t => s"tf$t").mkString(", ")
    val swtAggs = (1 to mt).map(t => s"sum(wgt * if$t) AS swt$t").mkString(", ")
    val unpivot = (1 to mt)
      .map(t =>
        s"SELECT user_id, $t AS tp, tf$t AS actual, CASE WHEN sw = 0.0 THEN 0.0 ELSE swt$t / sw END AS pred FROM sums"
      )
      .mkString("\n  UNION ALL\n  ")
    s"""WITH emb AS (
       |  SELECT user_id, CAST(row_number() OVER w - 1 AS BIGINT) AS idx, value AS e0, $leads
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |), rows_ AS (
       |  SELECT * FROM emb WHERE f$mt IS NOT NULL
       |), nn AS (
       |  SELECT * FROM (
       |    SELECT t.user_id AS user_id, t.idx AS t_idx, i.idx AS i_idx, sqrt($dist2) AS dist,
       |      $tfCols, $ifCols,
       |      row_number() OVER (PARTITION BY t.user_id, t.idx
       |                         ORDER BY sqrt($dist2), i.idx) AS rn
       |    FROM rows_ t JOIN rows_ i ON t.user_id = i.user_id AND t.idx <> i.idx
       |  ) WHERE rn <= ${e + 1}
       |), weighted AS (
       |  SELECT *, CASE WHEN dist < 1e-12 THEN 1.0
       |                 ELSE ${ExactExp.duck("-dist / (min(dist) OVER (PARTITION BY user_id, t_idx) + 1e-8)")} END AS wgt
       |  FROM nn
       |), sums AS (
       |  SELECT user_id, t_idx, $tfNames, sum(wgt) AS sw, $swtAggs
       |  FROM weighted GROUP BY ${(1 to mt + 2).mkString(", ")}
       |), longf AS (
       |  $unpivot
       |), agg AS (
       |  SELECT user_id, tp, CAST(count(*) AS BIGINT) AS n_pred,
       |         covar_samp(actual, pred) AS cv, stddev_samp(actual) AS s1, stddev_samp(pred) AS s2
       |  FROM longf GROUP BY 1, 2
       |)
       |SELECT user_id, tp, n_pred,
       |  round(CASE WHEN cv IS NULL OR s1 IS NULL OR s2 IS NULL
       |               OR isnan(cv) OR isnan(s1) OR isnan(s2)
       |               OR s1 = 0.0 OR s2 = 0.0 THEN 0.0
       |             ELSE cv / (s1 * s2) END, 6) + 0.0 AS rho
       |FROM agg ORDER BY 1, 2""".stripMargin
  }

  // -------------------------------------------------------------------
  // ccm_pairwise_screen — PAIRWISE CAUSAL SCREENING at corpus scale
  // (VERDICT r11 missing-item 1): the reference's purpose (`lib/ccm.ex:
  // 48-84`, bidirectional causality between two series) applied to a
  // CORPUS of series is an all-pairs S² problem — ~10⁶ full CCM jobs at
  // S=1000 series. The production shape is a two-stage screen:
  //   1. CHEAP GATE: max-|lagged-CCF| over lags −3..+3 for EVERY pair —
  //      co-moments are exact int64 sums over cents-quantized values
  //      (one relational join per lag, no per-pair recursion), one
  //      Pearson formula per (pair, lag) on int64-born doubles (engine-
  //      identical), best lag by deterministic (|r| DESC, lag) rank.
  //   2. FULL CCM only on SURVIVORS (|ccf| >= 0.4): bidirectional
  //      cross-map through the exact ccm_curve machinery (same kernel,
  //      same oracle CTEs via curveSqlCommon), one lib size.
  // At the gate corpus: 12-series panel -> 66 pairs gated, 16 survive
  // (76% of the expensive work pruned); output = one 'gate' row per
  // pair (best lag, ccf, survived) + two direction rows per survivor
  // (rho). Scale: the panel is the knob (the graph_betweenness seed-
  // panel precedent) — gate cost is S²·n·lags via hash joins, CCM cost
  // is survivors only; the banded twin (ccm_pairwise_screen_banded)
  // IMPLEMENTS the 100-TB gate-pruning shape — only pairs sharing a
  // coarse deterministic signature band are gated at all, so even S²
  // never materializes. Probes in SCALE.md.
  // -------------------------------------------------------------------
  private val ScreenPanel = 12
  private val ScreenCap = 40
  private val ScreenLags = 3
  private val ScreenThreshold = "0.4"
  private val ScreenLib = 24
  private val ScreenSamples = 2
  private val ScreenPairBase = 100000L
  private val ScreenBandSize = 4L // banded twin: equal-size activity bands

  private def pairwiseScreen(s: SparkSession, dir: String): DataFrame =
    pairwiseScreenWith(s, dir, banded = false)

  private def pairwiseScreenBanded(s: SparkSession, dir: String): DataFrame =
    pairwiseScreenWith(s, dir, banded = true)

  // The banded twin is the 100-TB shape the flat screen's SCALE.md story
  // names: at S series even the CHEAP gate's S² pair relation must never
  // materialize, so series are first keyed by a coarse deterministic
  // SIGNATURE (here: total-activity rank bands of ScreenBandSize — the
  // dedup-LSH banding idea applied to series) and only WITHIN-BAND pairs
  // are gated at all. 66 pairs shrink to 3·C(4,2) = 18 before any
  // co-moment is computed; the gate+CCM stages are shared verbatim.
  /** Shared gate stage: (capped cents series `ps`, per-pair best-lag CCF
    * verdicts `pwin`) — used by the screen pair, its banded twin, and the
    * surrogate-significance audit.
    */
  private def screenGate(s: SparkSession, dir: String, banded: Boolean): (DataFrame, DataFrame) = {
    import s.implicits._
    val w = Window.partitionBy("user_id").orderBy("ts")
    val ps0 = ev(s, dir)
      .filter(col("user_id") < ScreenPanel)
      .withColumn("idx", row_number().over(w).cast("long"))
      .filter(col("idx") <= ScreenCap)
      .withColumn("c", round(col("value") * 100.0).cast("long"))
    val ps =
      (if (!banded) ps0.withColumn("band", lit(0L))
       else {
         // deterministic equal-size bands by (total activity, user_id) rank —
         // exact int64 signature, so both engines band identically
         val bands = ps0
           .groupBy("user_id")
           .agg(sum(col("c")).as("tot"))
           .withColumn(
             "band",
             expr(s"(row_number() OVER (ORDER BY tot, user_id) - 1) DIV $ScreenBandSize").cast("long")
           )
           .select(col("user_id"), col("band"))
         ps0.join(bands, "user_id")
       }).localCheckpoint() // feeds the gate twice (a/b sides) + the survivor CCM join twice
    val lags = broadcast((-ScreenLags to ScreenLags).map(_.toLong).toDF("lag"))
    val pg = ps
      .select(col("user_id").as("ua"), col("idx").as("ia"), col("c").as("ca"), col("band").as("banda"))
      .crossJoin(lags)
      .join(
        ps.select(col("user_id").as("ub"), col("idx").as("ib"), col("c").as("cb"), col("band").as("bandb")),
        col("ub") > col("ua") && col("bandb") === col("banda") && col("ib") === col("ia") + col("lag")
      )
      .groupBy("ua", "ub", "lag")
      .agg(
        count(lit(1)).as("n"),
        sum($"ca").as("sx"),
        sum($"cb").as("sy"),
        sum($"ca" * $"cb").as("sxy"),
        sum($"ca" * $"ca").as("sxx"),
        sum($"cb" * $"cb").as("syy")
      )
    val pwin = pg
      .withColumn(
        "r",
        expr(
          """CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0 THEN 0.0
            |     ELSE CAST(n * sxy - sx * sy AS DOUBLE)
            |          / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
            |END""".stripMargin
        )
      )
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy("ua", "ub").orderBy(abs(col("r")).desc, col("lag")))
      )
      .filter(col("rn") === 1)
      .withColumn("survived", expr(s"CASE WHEN abs(r) >= $ScreenThreshold THEN 1L ELSE 0L END"))
      .localCheckpoint() // feeds the gate output rows AND the survivor filter
    (ps, pwin)
  }

  private def pairwiseScreenWith(s: SparkSession, dir: String, banded: Boolean): DataFrame = {
    val (ps, pwin) = screenGate(s, dir, banded)
    val pairInput = pwin
      .filter(col("survived") === 1)
      .select("ua", "ub")
      .join(ps.select(col("user_id").as("ua"), col("idx"), col("value").as("x")), Seq("ua"))
      .join(ps.select(col("user_id").as("ub"), col("idx"), col("value").as("y")), Seq("ub", "idx"))
      .select((col("ua") * ScreenPairBase + col("ub")).as("pkey"), col("idx"), col("x"), col("y"))
    val ccm = Ccm.bidirectional(
      pairInput,
      skey = col("pkey"),
      order = Seq("idx"),
      x = col("x"),
      y = col("y"),
      spec = CcmSpec(numSamples = ScreenSamples, seed = Seed),
      libSizes = Seq(ScreenLib)
    )
    val gateRows = pwin.select(
      col("ua"),
      col("ub"),
      lit("gate").as("direction"),
      col("lag").as("best_lag"),
      Norm.rnd(col("r"), 6).as("ccf"),
      col("survived"),
      lit(null).cast("double").as("rho")
    )
    val ccmRows = ccm.select(
      expr(s"skey DIV $ScreenPairBase").as("ua"),
      expr(s"skey % $ScreenPairBase").as("ub"),
      col("direction"),
      lit(null).cast("long").as("best_lag"),
      lit(null).cast("double").as("ccf"),
      lit(1L).as("survived"),
      Norm.rnd(col("rho"), 6).as("rho")
    )
    gateRows
      .unionByName(ccmRows)
      .transform(Norm.ordered(_, col("ua"), col("ub"), col("direction")))
  }

  private val pairwiseScreenSql: String = pairwiseScreenSqlWith(banded = false)
  private val pairwiseScreenBandedSql: String = pairwiseScreenSqlWith(banded = true)

  /** Oracle CTE chain for the shared gate stage, ending at `pwin`. */
  private def screenGateCtes(banded: Boolean): String = {
    val bandCtes =
      if (!banded) "psb AS (SELECT *, CAST(0 AS BIGINT) AS band FROM ps),"
      else
        s"""bnd AS (
           |  SELECT user_id,
           |         CAST((row_number() OVER (ORDER BY tot, user_id) - 1) // $ScreenBandSize AS BIGINT) AS band
           |  FROM (SELECT user_id, CAST(sum(c) AS BIGINT) AS tot FROM ps GROUP BY 1)
           |), psb AS (SELECT ps.*, bnd.band FROM ps JOIN bnd ON bnd.user_id = ps.user_id),""".stripMargin
    val gateCtes =
      s"""ps0 AS (
         |  SELECT user_id, CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS idx,
         |         CAST(round(value * 100.0) AS BIGINT) AS c, value
         |  FROM events WHERE user_id < $ScreenPanel
         |), ps AS (SELECT * FROM ps0 WHERE idx <= $ScreenCap),
         |$bandCtes
         |pg AS (
         |  SELECT a.user_id AS ua, b.user_id AS ub, l.lag,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(a.c) AS BIGINT) AS sx, CAST(sum(b.c) AS BIGINT) AS sy,
         |         CAST(sum(a.c * b.c) AS BIGINT) AS sxy,
         |         CAST(sum(a.c * a.c) AS BIGINT) AS sxx,
         |         CAST(sum(b.c * b.c) AS BIGINT) AS syy
         |  FROM psb a
         |  CROSS JOIN (SELECT CAST(unnest(generate_series(-$ScreenLags, $ScreenLags)) AS BIGINT) AS lag) l
         |  JOIN psb b ON b.user_id > a.user_id AND b.band = a.band AND b.idx = a.idx + l.lag
         |  GROUP BY 1, 2, 3
         |), pr AS (
         |  SELECT ua, ub, lag,
         |    CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0 THEN 0.0
         |         ELSE CAST(n * sxy - sx * sy AS DOUBLE)
         |              / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
         |    END AS r
         |  FROM pg
         |), pbest AS (
         |  SELECT ua, ub, lag, r,
         |         row_number() OVER (PARTITION BY ua, ub ORDER BY abs(r) DESC, lag) AS rn
         |  FROM pr
         |), pwin AS (
         |  SELECT ua, ub, lag, r,
         |         CASE WHEN abs(r) >= $ScreenThreshold THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS survived
         |  FROM pbest WHERE rn = 1
         |)""".stripMargin
    gateCtes
  }

  private def pairwiseScreenSqlWith(banded: Boolean): String = {
    val gateCtes = screenGateCtes(banded)
    val baseFrom =
      s"""(SELECT a.user_id * $ScreenPairBase + b.user_id AS pkey, a.idx, a.value AS value, b.value AS yv
         |   FROM pwin w
         |   JOIN ps a ON a.user_id = w.ua
         |   JOIN ps b ON b.user_id = w.ub AND b.idx = a.idx
         |   WHERE w.survived = 1)""".stripMargin
    s"""${curveSqlCommon(
        None,
        ScreenSamples,
        Seq(ScreenLib),
        "pkey",
        Seq("idx"),
        baseFrom,
        Some("yv"),
        prelude = gateCtes
      )}
       |SELECT * FROM (
       |  SELECT ua, ub, 'gate' AS direction, lag AS best_lag, round(r, 6) + 0.0 AS ccf,
       |         survived, CAST(NULL AS DOUBLE) AS rho
       |  FROM pwin
       |  UNION ALL
       |  SELECT sk.skey // $ScreenPairBase AS ua, sk.skey % $ScreenPairBase AS ub, sk.direction,
       |         CAST(NULL AS BIGINT) AS best_lag, CAST(NULL AS DOUBLE) AS ccf,
       |         CAST(1 AS BIGINT) AS survived, round(sk.rho, 6) + 0.0 AS rho
       |  FROM sk
       |) ORDER BY ua, ub, direction""".stripMargin
  }

  // -------------------------------------------------------------------
  // ccm_convergence_plot — the reference's V1 convergence visualization
  // (`examples.livemd:80-99`) as a gated DATA contract: the exact
  // plot-ready records the livemd builds — %{library_size, correlation,
  // direction} with the "X → Y"/"Y → X" labels — for one analysis
  // (user 0's bidirectional curve, the ccm_curve machinery filtered at
  // the source). graft.ccm.CcmViz renders these rows as the livemd's
  // Vega-Lite line spec (convergenceSpecJson) or a terminal ASCII chart
  // (asciiChart, printed by CcmDemo) — the rows either renderer consumes
  // are oracle-verified here.
  // -------------------------------------------------------------------
  private def ccmConvergencePlot(s: SparkSession, dir: String): DataFrame = {
    val in = curveInput(s, dir).filter(col("user_id") === 0L)
    Ccm
      .bidirectional(
        in,
        skey = col("user_id"),
        order = Seq("ts"),
        x = col("x"),
        y = col("y"),
        spec = CcmSpec(numSamples = CurveSamples, seed = Seed),
        libSizes = CurveLibs
      )
      .select(
        col("lib_size").as("library_size"),
        Norm.rnd(col("rho"), 6).as("correlation"),
        expr("CASE WHEN direction = 'x_causes_y' THEN 'X → Y' ELSE 'Y → X' END").as("direction")
      )
      .transform(Norm.ordered(_, col("direction"), col("library_size")))
  }

  private val ccmConvergencePlotSql: String =
    s"""${curveSqlCommon(None, CurveSamples, CurveLibs, "user_id", Seq("ts"), "(SELECT * FROM events WHERE user_id = 0)")}
       |SELECT sk.lib_size AS library_size, round(sk.rho, 6) + 0.0 AS correlation,
       |       CASE WHEN sk.direction = 'x_causes_y' THEN 'X → Y' ELSE 'Y → X' END AS direction
       |FROM sk ORDER BY direction, library_size""".stripMargin

  // -------------------------------------------------------------------
  // ccm_screen_sig — SURROGATE SIGNIFICANCE for the screen's top hits:
  // a high cross-map rho alone is not evidence of coupling (a smooth
  // shared trend produces one), so the top-4 surviving pairs (by gate
  // |ccf|, deterministic rank) are re-run against CIRCULAR-SHIFT
  // surrogates of the target series (shifts 10/20/30 of the 40-point
  // series — destroys the cross-coupling, preserves each series'
  // autocorrelation; the ccm_surrogate_circ null applied at the screen
  // level). p = (1 + #{rho_surr >= rho_obs}) / (1 + 3) — an exact
  // DYADIC rational, published as one exact division; rho comparisons
  // run on UNROUNDED engine-identical doubles. This closes the
  // screening pipeline: gate -> CCM -> null-model audit, all in one
  // relational plan, survivors only.
  // MEASURED FINDING (gate corpus): EVERY top pair fails the null —
  // p >= 0.5 across all 8 direction rows — which is the CORRECT
  // answer: the synthetic users share seasonality but have no planted
  // cross-user coupling, so the gate's high |ccf| values are trend
  // artifacts and the audit rejects them. The screen without this
  // stage would ship 16 false positives; with it, zero. (The per-user
  // ccm_curve family, where x and y ARE mechanistically coupled by
  // construction, is the positive control.)
  // -------------------------------------------------------------------
  private val ScreenSigTop = 4
  private val ScreenSigShifts = Seq(10L, 20L, 30L)

  private def ccmScreenSig(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (ps, pwin) = screenGate(s, dir, banded = false)
    val top = pwin
      .filter(col("survived") === 1)
      .withColumn("trn", row_number().over(Window.orderBy(abs(col("r")).desc, col("ua"), col("ub"))))
      .filter(col("trn") <= ScreenSigTop)
      .select("ua", "ub")
    val variants = broadcast((0L +: ScreenSigShifts).toDF("v"))
    val pairInput = top
      .crossJoin(variants)
      .join(ps.select(col("user_id").as("ua"), col("idx"), col("value").as("x")), Seq("ua"))
      .join(
        ps.select(col("user_id").as("ubb"), col("idx").as("bidx"), col("value").as("y")),
        col("ub") === col("ubb") && expr(s"bidx = ((idx - 1 + v) % $ScreenCap) + 1")
      )
      .select(
        ((col("ua") * ScreenPairBase + col("ub")) * 100L + col("v")).as("pkey"),
        col("idx"),
        col("x"),
        col("y")
      )
    val ccm = Ccm.bidirectional(
      pairInput,
      skey = col("pkey"),
      order = Seq("idx"),
      x = col("x"),
      y = col("y"),
      spec = CcmSpec(numSamples = ScreenSamples, seed = Seed),
      libSizes = Seq(ScreenLib)
    )
    val obs = ccm
      .filter(expr("skey % 100 = 0"))
      .select(expr("skey DIV 100").as("pkey"), col("direction"), col("rho").as("rho_obs"))
    val sur = ccm
      .filter(expr("skey % 100 <> 0"))
      .select(expr("skey DIV 100").as("pkey"), col("direction"), col("rho").as("rho_sur"))
    obs
      .join(sur, Seq("pkey", "direction"))
      .groupBy("pkey", "direction", "rho_obs")
      .agg(
        count(lit(1)).as("n_surr"),
        sum(expr("CASE WHEN rho_sur >= rho_obs THEN 1L ELSE 0L END")).as("n_ge")
      )
      .select(
        expr(s"pkey DIV $ScreenPairBase").as("ua"),
        expr(s"pkey % $ScreenPairBase").as("ub"),
        col("direction"),
        Norm.rnd(col("rho_obs"), 6).as("rho"),
        col("n_surr"),
        col("n_ge"),
        expr(s"CAST(1 + n_ge AS DOUBLE) / ${1 + ScreenSigShifts.size}.0D").as("p_value")
      )
      .transform(Norm.ordered(_, col("ua"), col("ub"), col("direction")))
  }

  private val ccmScreenSigSql: String = {
    val nv = 1 + ScreenSigShifts.size
    val shifts = (0L +: ScreenSigShifts).map(v => s"($v)").mkString(", ")
    val baseFrom =
      s"""(SELECT (w.ua * $ScreenPairBase + w.ub) * 100 + v.v AS pkey, a.idx, a.value AS value, b.value AS yv
         |   FROM (SELECT ua, ub,
         |                row_number() OVER (ORDER BY abs(r) DESC, ua, ub) AS trn
         |         FROM pwin WHERE survived = 1) w
         |   CROSS JOIN (VALUES $shifts) v(v)
         |   JOIN ps a ON a.user_id = w.ua
         |   JOIN ps b ON b.user_id = w.ub AND b.idx = ((a.idx - 1 + v.v) % $ScreenCap) + 1
         |   WHERE w.trn <= $ScreenSigTop)""".stripMargin
    s"""${curveSqlCommon(
        None,
        ScreenSamples,
        Seq(ScreenLib),
        "pkey",
        Seq("idx"),
        baseFrom,
        Some("yv"),
        prelude = screenGateCtes(banded = false)
      )}
       |, sobs AS (SELECT skey // 100 AS pkey, direction, rho AS rho_obs FROM sk WHERE skey % 100 = 0),
       |ssur AS (SELECT skey // 100 AS pkey, direction, rho AS rho_sur FROM sk WHERE skey % 100 <> 0)
       |SELECT o.pkey // $ScreenPairBase AS ua, o.pkey % $ScreenPairBase AS ub, o.direction,
       |       round(o.rho_obs, 6) + 0.0 AS rho,
       |       CAST(count(*) AS BIGINT) AS n_surr,
       |       CAST(sum(CASE WHEN s.rho_sur >= o.rho_obs THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
       |       CAST(1 + sum(CASE WHEN s.rho_sur >= o.rho_obs THEN 1 ELSE 0 END) AS DOUBLE) / $nv.0e0 AS p_value
       |FROM sobs o JOIN ssur s ON s.pkey = o.pkey AND s.direction = o.direction
       |GROUP BY 1, 2, 3, 4
       |ORDER BY 1, 2, 3""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ccm_convergence_plot" -> ccmConvergencePlot,
    "ccm_screen_sig" -> ccmScreenSig,
    "ccm_pairwise_screen" -> pairwiseScreen,
    "ccm_pairwise_screen_banded" -> pairwiseScreenBanded,
    "ingest_series" -> ingestSeries,
    "det_hash" -> detHash,
    "poly_hash" -> polyHash,
    "ccm_embed" -> ccmEmbed,
    "ccm_lib_ladder" -> libLadder,
    "ccm_rank_split" -> rankSplit,
    "ccm_knn_predict" -> knnPredict,
    "ccm_skill_corr" -> skillCorr,
    "ccm_curve" -> curve,
    "ccm_curve_slices" -> curveSlices,
    "ccm_curve_approx" -> curveApprox,
    "ccm_curve_perseries" -> curvePerSeries,
    "ccm_wide" -> wide,
    "ccm_wide_approx" -> wideApprox,
    "ccm_wide_approx_perseries" -> wideApproxPerSeries,
    "ccm_wide4" -> wide4,
    "ccm_wide4_approx" -> wide4Approx,
    "ccm_boot" -> boot,
    "ccm_boot_ci" -> bootCi,
    "ccm_boot_reuse" -> bootReuse,
    "ccm_boot_fused" -> bootFused,
    "ccm_convergence" -> convergenceQ,
    "ccm_gen_logistic" -> genLogistic,
    "ccm_gen_coupled" -> genCoupled,
    "ccm_mi_tau" -> miTau,
    "ccm_auto_params" -> autoParams,
    "ccm_smap" -> smap,
    "ccm_smap_coeffs" -> smapCoeffs,
    "ccm_smap_e3" -> smapE3,
    "ccm_surrogate" -> surrogate,
    "ccm_surrogate_circ" -> surrogateCirc,
    "ccm_surrogate_fft" -> surrogateFft,
    "ccm_surrogate_fft_wide" -> surrogateFftWide,
    "ccm_multiview" -> multiview,
    "ccm_lag_sweep" -> lagSweep,
    "ccm_fnn_dim" -> fnnDim,
    "ccm_simplex" -> simplexCurve,
    "ccm_simplex_tp" -> simplexTp
  )

  val oracle: Map[String, String] = Map(
    "ccm_convergence_plot" -> ccmConvergencePlotSql,
    "ccm_screen_sig" -> ccmScreenSigSql,
    "ccm_pairwise_screen" -> pairwiseScreenSql,
    "ccm_pairwise_screen_banded" -> pairwiseScreenBandedSql,
    "ingest_series" -> ingestSeriesSql,
    "det_hash" -> detHashSql,
    "poly_hash" -> polyHashSql,
    "ccm_embed" -> ccmEmbedSql,
    "ccm_lib_ladder" -> libLadderSql,
    "ccm_rank_split" -> rankSplitSql,
    "ccm_knn_predict" -> knnPredictSql,
    "ccm_skill_corr" -> skillCorrSql,
    "ccm_curve" -> curveSql,
    "ccm_curve_slices" -> curveSlicesSql,
    "ccm_curve_approx" -> curveApproxSql,
    "ccm_curve_perseries" -> curveSql,
    "ccm_wide" -> wideSql,
    "ccm_wide_approx" -> wideApproxSql,
    "ccm_wide_approx_perseries" -> wideApproxSql,
    "ccm_wide4" -> wide4Sql,
    "ccm_wide4_approx" -> wide4ApproxSql,
    "ccm_boot" -> bootSql,
    "ccm_boot_ci" -> bootCiSql,
    "ccm_boot_reuse" -> bootSql,
    "ccm_boot_fused" -> bootSql,
    "ccm_convergence" -> convergenceSql,
    "ccm_gen_logistic" -> genLogisticSql,
    "ccm_gen_coupled" -> genCoupledSql,
    "ccm_mi_tau" -> miTauSql,
    "ccm_auto_params" -> autoParamsSql,
    "ccm_smap" -> smapSql,
    "ccm_smap_coeffs" -> smapCoeffsSql,
    "ccm_smap_e3" -> smapE3Sql,
    "ccm_surrogate" -> surrogateSql,
    "ccm_surrogate_circ" -> surrogateCircSql,
    "ccm_surrogate_fft" -> surrogateFftSql,
    "ccm_surrogate_fft_wide" -> surrogateFftWideSql,
    "ccm_multiview" -> multiviewSql,
    "ccm_lag_sweep" -> lagSweepSql,
    "ccm_fnn_dim" -> fnnDimSql,
    "ccm_simplex" -> simplexSql,
    "ccm_simplex_tp" -> simplexTpSql
  )
}
