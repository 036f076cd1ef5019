package graft.contract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ccm.DetHash
import graft.functions.GraftFunctions

/** Similarity search over `embeddings.parquet` (`Array[Float]`, 64-dim):
  * brute-force cosine top-k as the exact baseline, and a deterministic
  * random-hyperplane LSH-bucketed variant as the scale path (candidates
  * limited to the query's bucket, so the join is keyed on the bucket hash
  * instead of being all-pairs).
  *
  * All dot products / norms are left-fold double arithmetic in identical
  * order in both engines, so cosines are bit-identical: ordering (and
  * therefore top-k membership) agrees exactly; ties break on vec_id.
  */
object SimQueries {
  private val P = DetHash.P
  private val Dim = VecOps.Dim
  private val TopK = 5
  private val QueryStride = 50 // vec_id % stride == 0 -> query vector
  private val NumPlanes = 8

  // shared vector plumbing (native graft_dot + per-vector norms): VecOps
  private val dotSpark = VecOps.dotSpark
  private def dotDuck(a: String, b: String) = VecOps.dotDuck(a, b)
  private def vecs(s: SparkSession, dir: String): DataFrame = VecOps.vecs(s, dir)

  // -------------------------------------------------------------------
  // ann_topk — exact brute-force cosine top-k for a query subset.
  // -------------------------------------------------------------------
  private def annTopk(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val q = e.filter(col("vec_id") % QueryStride === 0)
    val dotQN = expr(dotSpark.format("q.v", "n.v"))
    val pairs = q
      .as("q")
      .join(e.as("n"), col("q.vec_id") =!= col("n.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("n.vec_id").as("neighbor_id"),
        (dotQN / (col("q.nrm") * col("n.nrm"))).as("cos_sim")
      )
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), Norm.rnd(col("cos_sim"), 6).as("cos_sim"))
      .transform(Norm.ordered(_, col("query_id"), col("rank")))
  }

  private val annTopkSql: String = {
    val cos = s"${dotDuck("q.v", "n.v")} / (sqrt(${dotDuck("q.v", "q.v")}) * sqrt(${dotDuck("n.v", "n.v")}))"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT * FROM e WHERE vec_id % $QueryStride = 0),
       |pairs AS (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, $cos AS cos_sim
       |  FROM q JOIN e n ON q.vec_id <> n.vec_id
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM pairs
       |)
       |SELECT query_id, rank, neighbor_id, round(cos_sim, 6) + 0.0 AS cos_sim
       |FROM ranked WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin
  }

  // -------------------------------------------------------------------
  // ann_lsh_topk — random-hyperplane LSH: deterministic integer-derived
  // hyperplanes; bucket = sign bits; search only within the bucket.
  // -------------------------------------------------------------------

  /** Hyperplane component (k, d): deterministic pseudo-random int in
    * [-P/2, P/2), identical arithmetic in both engines (all products
    * < 2^63).
    */
  private def planeVal(k: String, d: String): String =
    s"(((2 * ($k) + 3) * ${DetHash.A_IDX} * (($d) + 1) + 97 * ($k)) % $P - ${P / 2})"

  private val bucketSpark: String =
    s"""aggregate(transform(sequence(0, ${NumPlanes - 1}), k ->
       |  CASE WHEN aggregate(transform(sequence(0, ${Dim - 1}), d ->
       |         element_at(v, CAST(d + 1 AS INT)) * CAST(${planeVal("k", "d")} AS DOUBLE)),
       |         CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) >= 0.0
       |       THEN CAST(pow(2, k) AS BIGINT) ELSE CAST(0 AS BIGINT) END),
       |  CAST(0 AS BIGINT), (a, b) -> a + b)""".stripMargin

  private val bucketDuck: String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(0, ${NumPlanes - 1}), k ->
       |  CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(generate_series(0, ${Dim - 1}), d ->
       |         v[CAST(d + 1 AS INTEGER)] * CAST(${planeVal("k", "d")} AS DOUBLE))),
       |         (acc, x) -> acc + x) >= 0.0
       |       THEN CAST(pow(2, k) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
       |  (a, b) -> a + b)""".stripMargin

  private def annLshTopk(s: SparkSession, dir: String): DataFrame = {
    // bucket assignment computed once, then reused by both join sides
    val e = vecs(s, dir).withColumn("bucket", expr(bucketSpark)).localCheckpoint()
    val q = e.filter(col("vec_id") % QueryStride === 0)
    val dotQN = expr(dotSpark.format("q.v", "n.v"))
    val pairs = q
      .as("q")
      .join(e.as("n"), col("q.bucket") === col("n.bucket") && col("q.vec_id") =!= col("n.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("n.vec_id").as("neighbor_id"),
        (dotQN / (col("q.nrm") * col("n.nrm"))).as("cos_sim")
      )
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), Norm.rnd(col("cos_sim"), 6).as("cos_sim"))
      .transform(Norm.ordered(_, col("query_id"), col("rank")))
  }

  private val annLshTopkSql: String = {
    val cos = s"${dotDuck("q.v", "n.v")} / (sqrt(${dotDuck("q.v", "q.v")}) * sqrt(${dotDuck("n.v", "n.v")}))"
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), eb AS (
       |  SELECT vec_id, v, $bucketDuck AS bucket FROM e
       |), q AS (SELECT * FROM eb WHERE vec_id % $QueryStride = 0),
       |pairs AS (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, $cos AS cos_sim
       |  FROM q JOIN eb n ON q.bucket = n.bucket AND q.vec_id <> n.vec_id
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM pairs
       |)
       |SELECT query_id, rank, neighbor_id, round(cos_sim, 6) + 0.0 AS cos_sim
       |FROM ranked WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin
  }

  // -------------------------------------------------------------------
  // ann_ivf_topk — IVF (inverted-file) ANN: a deterministic subset of the
  // vectors acts as the coarse quantizer (every 31st vec_id); each vector
  // is assigned to its nearest centroid (broadcast join + per-vector
  // argmax — map-side at scale); a query probes its nProbe nearest lists
  // and searches ONLY those lists. Centroid count grows with the corpus,
  // so list size — not corpus size — bounds the search.
  // -------------------------------------------------------------------
  private val CentroidStride = 31
  private val NProbe = 2

  private def annIvfTopk(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val cents = e
      .filter(col("vec_id") % CentroidStride === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    val dotVC = expr(dotSpark.format("v", "cv"))
    val assignW = Window.partitionBy("vec_id").orderBy((dotVC / (col("nrm") * col("cnrm"))).desc, col("cid").asc)
    val assigned = e
      .crossJoin(broadcast(cents))
      .withColumn("crank", row_number().over(assignW))
      .filter(col("crank") <= NProbe) // rank 1 = home list; ranks 1..nProbe = query probes
      .select(col("vec_id"), col("label"), col("v"), col("nrm"), col("cid"), col("crank"))
      .localCheckpoint()
    val lists = assigned.filter(col("crank") === 1).select(col("vec_id"), col("v"), col("nrm"), col("cid"))
    val probes = assigned
      .filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"), col("cid").as("probe_cid"))
    val dotQN = expr(dotSpark.format("q.qv", "n.v"))
    val pairs = probes
      .as("q")
      .join(lists.as("n"), col("q.probe_cid") === col("n.cid") && col("q.qid") =!= col("n.vec_id"))
      .select(
        col("q.qid").as("query_id"),
        col("n.vec_id").as("neighbor_id"),
        (dotQN / (col("q.qnrm") * col("n.nrm"))).as("cos_sim")
      )
      .distinct() // a neighbor can appear via multiple probed lists only if ... (defensive)
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), Norm.rnd(col("cos_sim"), 6).as("cos_sim"))
      .transform(Norm.ordered(_, col("query_id"), col("rank")))
  }

  private val annIvfTopkSql: String = {
    val cosVC = s"${dotDuck("e.v", "c.cv")} / (e.nrm * c.cnrm)"
    val cosQN = s"${dotDuck("q.qv", "n.v")} / (q.qnrm * n.nrm)"
    s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |e AS (SELECT vec_id, v, sqrt(${dotDuck("e0.v", "e0.v")}) AS nrm FROM e0),
       |c AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM e WHERE vec_id % $CentroidStride = 0),
       |assigned AS (
       |  SELECT e.vec_id, e.v, e.nrm, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id ORDER BY $cosVC DESC, c.cid) AS crank
       |  FROM e CROSS JOIN c
       |), lists AS (SELECT vec_id, v, nrm, cid FROM assigned WHERE crank = 1),
       |probes AS (
       |  SELECT vec_id AS qid, v AS qv, nrm AS qnrm, cid AS probe_cid
       |  FROM assigned WHERE crank <= $NProbe AND vec_id % $QueryStride = 0
       |), pairs AS (
       |  SELECT DISTINCT q.qid AS query_id, n.vec_id AS neighbor_id, $cosQN AS cos_sim
       |  FROM probes q JOIN lists n ON q.probe_cid = n.cid AND q.qid <> n.vec_id
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM pairs
       |)
       |SELECT query_id, rank, neighbor_id, round(cos_sim, 6) + 0.0 AS cos_sim
       |FROM ranked WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin
  }

  // -------------------------------------------------------------------
  // vec_centroid — element-wise mean embedding per label (the vector
  // aggregate under k-means / IVF training). posexplode + hash-agg on
  // (label, pos): fully whole-stage-codegen with map-side partial
  // aggregation, shuffle volume = |labels| x dim partials — independent
  // of corpus size. Long (label, pos, centroid) output; assembling the
  // array is a cosmetic collect_list away.
  // -------------------------------------------------------------------
  private def vecCentroid(s: SparkSession, dir: String): DataFrame =
    vecs(s, dir)
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), (col("pos") + 1).as("pos"))
      .agg(count(lit(1)).as("n_vecs"), Norm.rnd(avg(col("x")), 6).as("centroid"))
      .transform(Norm.ordered(_, col("label"), col("pos")))

  private val vecCentroidSql: String =
    s"""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
       |SELECT label, CAST(t.i AS INTEGER) AS pos, CAST(count(*) AS BIGINT) AS n_vecs,
       |       round(avg(v[CAST(t.i AS INTEGER)]), 6) + 0.0 AS centroid
       |FROM e CROSS JOIN range(1, ${Dim + 1}) t(i)
       |GROUP BY 1, 2 ORDER BY label, pos""".stripMargin

  // -------------------------------------------------------------------
  // vec_normalize — L2 normalization of the query-subset embeddings (the
  // standard pre-processing step before cosine ANN: normalized vectors
  // turn cosine into a plain dot product). Map-side only — no shuffle
  // except the final output ordering.
  // -------------------------------------------------------------------
  private def vecNormalize(s: SparkSession, dir: String): DataFrame =
    vecs(s, dir)
      .filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id"), col("nrm"), posexplode(col("v")).as(Seq("pos0", "x")))
      .select(
        col("vec_id"),
        (col("pos0") + 1).as("pos"),
        Norm.rnd(col("x") / col("nrm"), 6).as("unit_val")
      )
      .transform(Norm.ordered(_, col("vec_id"), col("pos")))

  private val vecNormalizeSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |           WHERE vec_id % $QueryStride = 0),
       |n AS (SELECT vec_id, v, sqrt(${dotDuck("e.v", "e.v")}) AS nrm FROM e)
       |SELECT vec_id, CAST(t.i AS INTEGER) AS pos,
       |       round(v[CAST(t.i AS INTEGER)] / nrm, 6) + 0.0 AS unit_val
       |FROM n CROSS JOIN range(1, ${Dim + 1}) t(i)
       |ORDER BY vec_id, pos""".stripMargin

  // -------------------------------------------------------------------
  // vec_quantize — int8 scalar quantization per vector (the embedding-
  // compression step before shipping a 100 TB vector corpus to an ANN
  // index): codes q = clamp(floor((x - min) / scale), 255) with
  // scale = (max - min)/255, midpoint dequantization error, and an
  // order-dependent polynomial checksum of the codes (integer-exact, so
  // the oracle verifies every code, not just the error stats). Map-side
  // only; constant vectors (scale = 0) quantize to code 0 by convention.
  // -------------------------------------------------------------------
  private def vecQuantize(s: SparkSession, dir: String): DataFrame = {
    val P = graft.ccm.DetHash.P
    vecs(s, dir)
      .select(col("vec_id"), col("v"), array_min(col("v")).as("mn"), array_max(col("v")).as("mx"))
      .withColumn("scale", (col("mx") - col("mn")) / lit(255.0))
      .withColumn(
        "codes",
        expr("CASE WHEN scale = 0.0 THEN transform(v, x -> CAST(0 AS BIGINT)) " +
          "ELSE transform(v, x -> least(CAST(floor((x - mn) / scale) AS BIGINT), CAST(255 AS BIGINT))) END")
      )
      .select(
        col("vec_id"),
        Norm.rnd(col("mn"), 6).as("mn"),
        Norm.rnd(col("mx"), 6).as("mx"),
        expr(s"aggregate(codes, CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % $P)").as("code_hash"),
        Norm.rnd(
          expr("CASE WHEN scale = 0.0 THEN CAST(0.0 AS DOUBLE) ELSE " +
            "aggregate(zip_with(v, codes, (x, q) -> abs(x - (mn + (q + 0.5) * scale))), CAST(0.0 AS DOUBLE), (acc, d) -> acc + d) " +
            s"/ CAST($Dim AS DOUBLE) END"),
          6
        ).as("mean_abs_err")
      )
      .transform(Norm.ordered(_, col("vec_id")))
  }

  private val vecQuantizeSql: String = {
    val P = graft.ccm.DetHash.P
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx,
       |             (list_max(v) - list_min(v)) / 255.0 AS scale FROM e),
       |q AS (SELECT vec_id, v, mn, mx, scale,
       |        CASE WHEN scale = 0.0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
       |             ELSE list_transform(v, x -> least(CAST(floor((x - mn) / scale) AS BIGINT), CAST(255 AS BIGINT))) END AS codes
       |      FROM b)
       |SELECT vec_id, round(mn, 6) + 0.0 AS mn, round(mx, 6) + 0.0 AS mx,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), codes), (acc, c) -> (acc * 31 + c) % $P) AS code_hash,
       |  round(CASE WHEN scale = 0.0 THEN 0.0 ELSE
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(generate_series(1, $Dim), i ->
       |        abs(v[CAST(i AS INTEGER)] - (mn + (codes[CAST(i AS INTEGER)] + 0.5) * scale)))),
       |      (acc, d) -> acc + d) / CAST($Dim AS DOUBLE) END, 6) + 0.0 AS mean_abs_err
       |FROM q ORDER BY vec_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // vec_covariance — embedding covariance matrix (PCA / whitening prep):
  // upper-triangle (i <= j) sample covariance over all vectors via
  // explicit co-moment sums, so both engines share the identical final
  // arithmetic ((Σxy − ΣxΣy/n)/(n−1)) instead of trusting two covar
  // implementations to agree. The double posexplode fans each vector to
  // d(d+1)/2 component pairs MAP-SIDE, and the aggregate's partial
  // (map-side combine) reduces them to d(d+1)/2 groups before the only
  // shuffle — at 100 TB the shuffle carries 2080 rows per partition, not
  // n·d² rows.
  // -------------------------------------------------------------------
  private val CovDim = 64

  private def vecCovariance(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .embeddings(s, dir)
      .select(col("embedding").cast("array<double>").as("v"))
    e.select(col("v"), posexplode(col("v")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("v")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(
        count(lit(1)).as("n"),
        sum(col("xi")).as("sx"),
        sum(col("xj")).as("sy"),
        sum(col("xi") * col("xj")).as("sxy")
      )
      .select(
        col("i"),
        col("j"),
        Norm.rnd(
          (col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1),
          6
        ).as("cov")
      )
      .transform(Norm.ordered(_, col("i"), col("j")))
  }

  private val vecCovarianceSql: String =
    s"""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |d AS (SELECT CAST(unnest(generate_series(0, ${CovDim - 1})) AS INTEGER) AS i),
       |p AS (SELECT a.i AS i, b.i AS j FROM d a, d b WHERE b.i >= a.i),
       |s AS (
       |  SELECT p.i, p.j, CAST(count(*) AS BIGINT) AS n,
       |         sum(v[p.i + 1]) AS sx, sum(v[p.j + 1]) AS sy,
       |         sum(v[p.i + 1] * v[p.j + 1]) AS sxy
       |  FROM e CROSS JOIN p GROUP BY 1, 2
       |)
       |SELECT i, j, round((sxy - sx * sy / n) / (n - 1), 6) + 0.0 AS cov
       |FROM s ORDER BY i, j""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vec_quantize" -> vecQuantize,
    "vec_normalize" -> vecNormalize,
    "ann_topk" -> annTopk,
    "ann_lsh_topk" -> annLshTopk,
    "ann_ivf_topk" -> annIvfTopk,
    "vec_centroid" -> vecCentroid,
    "vec_covariance" -> vecCovariance
  )

  val oracle: Map[String, String] = Map(
    "vec_quantize" -> vecQuantizeSql,
    "vec_normalize" -> vecNormalizeSql,
    "ann_topk" -> annTopkSql,
    "ann_lsh_topk" -> annLshTopkSql,
    "ann_ivf_topk" -> annIvfTopkSql,
    "vec_centroid" -> vecCentroidSql,
    "vec_covariance" -> vecCovarianceSql
  )
}
