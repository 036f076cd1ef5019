package graft.contract

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding clustering operators: Lloyd's k-means (the training step
  * behind IVF / semantic-dedup indexes) and SemDeDup-style semantic
  * deduplication (within-cluster cosine pruning — the clustered form of
  * `dedup_embed_cos` that avoids the all-pairs blocked join entirely).
  *
  * Scale design:
  *  - centroids are a tiny relation (`vec_id % CentStride == 0` seeds, so
  *    k grows with the corpus like an IVF codebook). Assignment is a
  *    broadcast nested-loop join + a map-side-combined hash `min(struct)`
  *    argmin — per-row work is k·dim inside one codegen stage, shuffle
  *    volume is one row per vector. No window sort anywhere.
  *  - centroid recompute is posexplode + hash agg on (cid, pos): partial
  *    aggregation makes shuffle volume k·dim partials, independent of
  *    corpus size.
  *  - each iteration's centroids are rounded to 6 decimals ON BOTH ENGINES
  *    before the next assignment, so float summation-order differences
  *    cannot compound across iterations — the unrolled-CTE oracle sees
  *    bit-identical centroids at every step (same technique as the
  *    PageRank recurrence oracle, `GraphQueries.graphPagerankSql`).
  *  - semantic dedup joins pairs WITHIN a cluster only: candidate count is
  *    sum of squared cluster sizes, not corpus², and the join key (cid)
  *    shuffles both sides once.
  */
object ClusterQueries {
  private val Dim = VecOps.Dim
  private val CentStride = 71 // seed centroids: vec_id % 71 == 0 (k ~ n/71)
  private val Iters = 3
  private val SemThreshold = 0.2 // same bar as dedup_embed_cos

  /** Squared-L2 distance: native codegen on the Spark side
    * ([[graft.functions.L2Sq]] — bit-identical to the HOF fold), the same
    * left-fold in the DuckDB oracle.
    */
  private val d2Spark = "graft_l2sq(%s, %s)"
  private def d2Duck(v: String, c: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(generate_series(1, $Dim), i -> ($v[CAST(i AS INTEGER)] - $c[CAST(i AS INTEGER)]) * " +
      s"($v[CAST(i AS INTEGER)] - $c[CAST(i AS INTEGER)]))), (acc, d) -> acc + d)"

  /** One Lloyd assignment: nearest centroid by (d2, cid) — a broadcast
    * cross join folded back to one row per vector by a hash-agg argmin
    * (`min` over a (d2, cid) struct is the lexicographic argmin with the
    * deterministic cid tie-break).
    */
  private def assign(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("d2", expr(d2Spark.format("v", "cv")))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cid"))).as("m"), first(col("v")).as("v"), first(col("nrm")).as("nrm"))
      .select(col("vec_id"), col("v"), col("nrm"), col("m.cid").as("cid"))

  /** Long-form recompute: per-(cid, pos) mean rounded to 6 decimals (the
    * cross-engine determinism anchor) + exact member counts.
    */
  private def recomputeLong(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("pos0", "x")))
      .groupBy(col("cid"), (col("pos0") + 1).cast("int").as("pos"))
      .agg(count(lit(1)).as("n_vecs"), Norm.rnd(avg(col("x")), 6).as("c_val"))

  /** Reassemble (cid, cv: array<double>) from the long form. */
  private def toVectors(longForm: DataFrame): DataFrame =
    longForm
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("c_val")))).as("ps"))
      .select(col("cid"), expr("transform(ps, p -> p.c_val)").as("cv"))

  /** Runs the full loop; returns (finalLongForm, finalAssignment). */
  private def kmeans(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = VecOps.vecs(s, dir).select(col("vec_id"), col("v"), col("nrm")).localCheckpoint()
    var cents = e.filter(col("vec_id") % CentStride === 0).select(col("vec_id").as("cid"), col("v").as("cv"))
    var assigned: DataFrame = null
    var longForm: DataFrame = null
    for (_ <- 1 to Iters) {
      assigned = assign(e, cents)
      longForm = recomputeLong(assigned)
      // tiny relation (k x dim rows); checkpoint truncates the per-iteration
      // lineage so the final plan is one assignment deep, not Iters deep
      cents = toVectors(longForm).localCheckpoint()
    }
    (longForm, assigned)
  }

  // -------------------------------------------------------------------
  // vec_kmeans — final centroids in long form: (cid, pos, n_vecs, c_val).
  // -------------------------------------------------------------------
  private def vecKmeans(s: SparkSession, dir: String): DataFrame = {
    val (longForm, _) = kmeans(s, dir)
    longForm
      .select(col("cid"), col("pos"), col("n_vecs"), col("c_val"))
      .transform(Norm.ordered(_, col("cid"), col("pos")))
  }

  /** Unrolled Lloyd recurrence as chained CTEs (generated, not
    * hand-written): a{i} = assignment against c{i-1}, cl{i} = rounded
    * long-form centroids, c{i} = reassembled vectors.
    */
  private val kmeansCteSql: String = {
    val iters = (1 to Iters)
      .map { i =>
        s"""a$i AS (
           |  SELECT vec_id, v, nrm, cid FROM (
           |    SELECT e.vec_id, e.v, e.nrm, c.cid,
           |           row_number() OVER (PARTITION BY e.vec_id
           |                              ORDER BY ${d2Duck("e.v", "c.cv")}, c.cid) AS rn
           |    FROM e CROSS JOIN c${i - 1} c) WHERE rn = 1
           |),
           |cl$i AS (
           |  SELECT cid, CAST(t.i AS INTEGER) AS pos, CAST(count(*) AS BIGINT) AS n_vecs,
           |         round(avg(v[CAST(t.i AS INTEGER)]), 6) + 0.0 AS c_val
           |  FROM a$i CROSS JOIN range(1, ${Dim + 1}) t(i) GROUP BY 1, 2
           |),
           |c$i AS (SELECT cid, list(c_val ORDER BY pos) AS cv FROM cl$i GROUP BY cid)""".stripMargin
      }
      .mkString(",\n")
    s"""e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |e AS (SELECT vec_id, v, sqrt(${VecOps.dotDuck("e0.v", "e0.v")}) AS nrm FROM e0),
       |c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % $CentStride = 0),
       |$iters""".stripMargin
  }

  private val vecKmeansSql: String =
    s"""WITH $kmeansCteSql
       |SELECT cid, pos, n_vecs, c_val FROM cl$Iters ORDER BY cid, pos""".stripMargin

  // -------------------------------------------------------------------
  // dedup_semantic — SemDeDup: within each k-means cluster, a document is
  // pruned when an earlier (lower vec_id) cluster-mate is more similar
  // than the threshold; `dup_of` is the earliest such mate. The pair join
  // is keyed on cid, so candidate volume is bounded by cluster sizes.
  // -------------------------------------------------------------------
  private def dedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val (_, assigned) = kmeans(s, dir)
    val a = assigned.localCheckpoint() // feeds both sides of the self-join
    val cos = expr(VecOps.dotSpark.format("a.v", "b.v")) / (col("a.nrm") * col("b.nrm"))
    a.as("a")
      .join(a.as("b"), col("a.cid") === col("b.cid") && col("a.vec_id") > col("b.vec_id"))
      .withColumn("cos_sim", cos)
      .filter(col("cos_sim") >= SemThreshold)
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(
        first(col("a.cid")).as("cid"),
        min(struct(col("b.vec_id").as("dup_of"), col("cos_sim"))).as("m")
      )
      .select(col("vec_id"), col("cid"), col("m.dup_of").as("dup_of"), Norm.rnd(col("m.cos_sim"), 6).as("cos_sim"))
      .transform(Norm.ordered(_, col("vec_id")))
  }

  private val dedupSemanticSql: String = {
    val cos = s"${VecOps.dotDuck("a.v", "b.v")} / (a.nrm * b.nrm)"
    s"""WITH $kmeansCteSql,
       |pairs AS (
       |  SELECT a.vec_id, a.cid, b.vec_id AS dup_of, $cos AS cos_sim
       |  FROM a$Iters a JOIN a$Iters b ON a.cid = b.cid AND a.vec_id > b.vec_id
       |  WHERE $cos >= $SemThreshold
       |), ranked AS (
       |  SELECT vec_id, cid, dup_of, cos_sim,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY dup_of) AS rn
       |  FROM pairs
       |)
       |SELECT vec_id, cid, dup_of, round(cos_sim, 6) + 0.0 AS cos_sim
       |FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // ann_ivf_kmeans — IVF search over TRAINED centroids: the production
  // coarse quantizer the stride-seeded ann_ivf_topk stands in for
  // (SCALE.md: "a k-means table in production"). The Lloyd-refined
  // centroids become the inverted-file keys; assignment, probing and
  // candidate scoring all use the quantizer's own metric (squared L2 by
  // (d2, cid) — the training metric, so lists are Voronoi cells of the
  // actual codebook). Probing NProbe lists bounds the scan by list size;
  // the refined lists are tighter than stride-seeded ones, which is the
  // whole point of training the quantizer.
  // -------------------------------------------------------------------
  private val IvfKmNProbe = 2
  private val IvfKmQueryStride = 50 // the ANN family's query set
  private val IvfKmTopK = 5

  private def annIvfKmeans(s: SparkSession, dir: String): DataFrame = {
    val (longForm, _) = kmeans(s, dir)
    val e = VecOps.vecs(s, dir).select(col("vec_id"), col("v"))
    val cents = toVectors(longForm)
    val d2 = expr(d2Spark.format("v", "cv"))
    val assignW = Window.partitionBy("vec_id").orderBy(d2.asc, col("cid").asc)
    val assigned = e
      .crossJoin(broadcast(cents))
      .withColumn("crank", row_number().over(assignW))
      .filter(col("crank") <= IvfKmNProbe)
      .select(col("vec_id"), col("v"), col("cid"), col("crank"))
      .localCheckpoint() // feeds lists AND probes
    val lists = assigned.filter(col("crank") === 1).select(col("vec_id"), col("v"), col("cid"))
    val probes = assigned
      .filter(col("vec_id") % IvfKmQueryStride === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("cid").as("probe_cid"))
    val d2QN = expr(d2Spark.format("q.qv", "n.v"))
    val pairs = probes
      .as("q")
      .join(lists.as("n"), col("q.probe_cid") === col("n.cid") && col("q.qid") =!= col("n.vec_id"))
      .select(col("q.qid").as("query_id"), col("n.vec_id").as("neighbor_id"), d2QN.as("d2"))
      .distinct() // defensive: one row per (query, neighbor) even if lists overlap
    val w = Window.partitionBy("query_id").orderBy(col("d2").asc, col("neighbor_id").asc)
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= IvfKmTopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), Norm.rnd(col("d2"), 6).as("d2"))
      .transform(Norm.ordered(_, col("query_id"), col("rank")))
  }

  private val annIvfKmeansSql: String =
    s"""WITH $kmeansCteSql,
       |cfin AS (SELECT cid, cv FROM c$Iters),
       |asg AS (
       |  SELECT vec_id, v, cid, crank FROM (
       |    SELECT e.vec_id, e.v, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |                              ORDER BY ${d2Duck("e.v", "c.cv")}, c.cid) AS crank
       |    FROM e CROSS JOIN cfin c)
       |  WHERE crank <= $IvfKmNProbe
       |), lists AS (SELECT vec_id, v, cid FROM asg WHERE crank = 1),
       |probes AS (
       |  SELECT vec_id AS qid, v AS qv, cid AS probe_cid
       |  FROM asg WHERE vec_id % $IvfKmQueryStride = 0
       |), pairs AS (
       |  SELECT DISTINCT q.qid AS query_id, n.vec_id AS neighbor_id,
       |         ${d2Duck("q.qv", "n.v")} AS d2
       |  FROM probes q JOIN lists n ON q.probe_cid = n.cid AND q.qid <> n.vec_id
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY d2, neighbor_id) AS BIGINT) AS rank
       |  FROM pairs
       |)
       |SELECT query_id, rank, neighbor_id, round(d2, 6) + 0.0 AS d2
       |FROM ranked WHERE rank <= $IvfKmTopK ORDER BY query_id, rank""".stripMargin

  // -------------------------------------------------------------------
  // vec_silhouette — clustering quality per cluster by the SIMPLIFIED
  // (centroid-based) silhouette: a(i) = distance to own centroid,
  // b(i) = distance to the nearest OTHER centroid,
  // s(i) = (b − a) / max(a, b). The classic silhouette needs all
  // pairwise point distances (O(n²) — the reason sklearn ships
  // `silhouette_score(sample_size=…)`); the centroid form is the
  // standard O(n·k) scale substitute and is exact for the k-means
  // objective's purposes. Per-point work is one broadcast cross join
  // against the ROUNDED final centroids (the determinism anchor every
  // kmeans consumer shares); the per-cluster MEAN is accumulated in
  // exact integer micro-units of the 6-dp-rounded per-point scores
  // (trap: a double sum over ~1e3 signed values flips 6-dp boundaries
  // under aggregation-order noise; integer sums don't).
  // -------------------------------------------------------------------
  private def vecSilhouette(s: SparkSession, dir: String): DataFrame = {
    val (longForm, assigned) = kmeans(s, dir)
    val cents = toVectors(longForm)
    val d2 = expr(d2Spark.format("v", "cv"))
    val ab = assigned
      .crossJoin(broadcast(cents.withColumnRenamed("cid", "ccid")))
      .withColumn("d2", d2)
      .groupBy("vec_id", "cid")
      .agg(
        min(when(col("cid") === col("ccid"), col("d2"))).as("a2"),
        min(when(col("cid") =!= col("ccid"), col("d2"))).as("b2")
      )
    val sil = ab
      .withColumn("a", sqrt(col("a2")))
      .withColumn("b", sqrt(col("b2")))
      .withColumn(
        "sraw",
        when(greatest(col("a"), col("b")) === 0.0, 0.0)
          .otherwise((col("b") - col("a")) / greatest(col("a"), col("b")))
      )
      .withColumn("micro", round(col("sraw") * 1000000.0).cast("long"))
    sil
      .groupBy("cid")
      .agg(count(lit(1)).as("n_vecs"), sum(col("micro")).as("sm"))
      .select(
        col("cid"),
        col("n_vecs"),
        (round(col("sm").cast("double") / (col("n_vecs") * 1000000L).cast("double"), 6) + 0.0)
          .as("mean_sil")
      )
      .transform(Norm.ordered(_, col("cid")))
  }

  private val vecSilhouetteSql: String =
    s"""WITH $kmeansCteSql,
       |ab AS (
       |  SELECT a.vec_id, a.cid,
       |         min(CASE WHEN c.cid = a.cid THEN ${d2Duck("a.v", "c.cv")} END) AS a2,
       |         min(CASE WHEN c.cid <> a.cid THEN ${d2Duck("a.v", "c.cv")} END) AS b2
       |  FROM a$Iters a CROSS JOIN c$Iters c
       |  GROUP BY 1, 2
       |), sil AS (
       |  SELECT vec_id, cid,
       |         CAST(round(CASE WHEN greatest(sqrt(a2), sqrt(b2)) = 0.0 THEN 0.0
       |                         ELSE (sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2)) END
       |                    * 1000000.0) AS BIGINT) AS micro
       |  FROM ab
       |)
       |SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs,
       |       round(CAST(sum(micro) AS DOUBLE) / CAST(count(*) * 1000000 AS DOUBLE), 6) + 0.0 AS mean_sil
       |FROM sil GROUP BY cid ORDER BY cid""".stripMargin

  // -------------------------------------------------------------------
  // select_kcenter — Gonzalez farthest-point (k-center greedy) coreset
  // selection over the embedding corpus: the standard diversity-coverage
  // picker for training-data curation (choose K exemplars s.t. every
  // point is close to some exemplar; the selection radii ARE the
  // coverage-vs-K curve). Scale design: the textbook O(K²·n) "recompute
  // distance to the whole selected set each round" is replaced by the
  // dmin-carry form — each round touches every point ONCE against the
  // single new center (a broadcast 1-row cross join inside one codegen
  // stage), so total work is O(K·n·dim) and shuffle volume per round is
  // one argmax partial per partition. Superseded per-round checkpoints
  // are freed via [[graft.operators.Checkpoints]] pins, so storage is
  // O(n), not O(K·n). Selection compares RAW doubles: both engines
  // compute dmin with the identical left-fold ([[d2Spark]]/[[d2Duck]]),
  // so the argmax (dmin DESC, vec_id ASC) agrees bit-exactly without
  // rounding anywhere in the recursion; radii are rounded only on output.
  // -------------------------------------------------------------------
  private val KcK = 8 // centers selected (seed + 7 greedy picks)

  private def selectKcenter(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Checkpoints
    val e = VecOps.vecs(s, dir).select(col("vec_id"), col("v"))
    // seed: the minimum vec_id (deterministic; mirrors ORDER BY vec_id LIMIT 1)
    val seed = e
      .agg(min(struct(col("vec_id"), col("v"))).as("m"))
      .select(col("m.vec_id").as("cid"), col("m.v").as("cv"))
      .localCheckpoint()
    var (pts, pin) = Checkpoints.tracked(
      e.crossJoin(broadcast(seed))
        .withColumn("dmin", expr(d2Spark.format("v", "cv")))
        .select(col("vec_id"), col("v"), col("dmin"))
    )
    var rows = Seq(seed.select(lit(1L).as("rank"), col("cid").as("center_id"), lit(0.0).as("radius")))
    for (r <- 2 to KcK) {
      // argmax by (dmin DESC, vec_id ASC): min over (−dmin, vec_id, …) —
      // vec_id is unique, so the array field is never compared
      val pick = pts
        .agg(min(struct(negate(col("dmin")).as("nd"), col("vec_id").as("cid"),
          col("v").as("cv"), col("dmin").as("radius"))).as("m"))
        .select(col("m.cid").as("cid"), col("m.cv").as("cv"), col("m.radius").as("radius"))
        .localCheckpoint()
      rows :+= pick.select(lit(r.toLong).as("rank"), col("cid").as("center_id"),
        Norm.rnd(col("radius"), 6).as("radius"))
      if (r < KcK) {
        val (next, nextPin) = Checkpoints.tracked(
          pts.crossJoin(broadcast(pick.select(col("cv"))))
            .withColumn("dmin", least(col("dmin"), expr(d2Spark.format("v", "cv"))))
            .select(col("vec_id"), col("v"), col("dmin"))
        )
        Checkpoints.free(pin)
        pts = next
        pin = nextPin
      } else Checkpoints.free(pin)
    }
    rows.reduce(_ union _).transform(Norm.ordered(_, col("rank")))
  }

  private val selectKcenterSql: String = {
    val rounds = (1 until KcK)
      .map { r =>
        val pNext =
          if (r < KcK - 1)
            s""",
               |p$r AS MATERIALIZED (
               |  SELECT p.vec_id, p.v, least(p.dmin, ${d2Duck("p.v", "c.cv")}) AS dmin
               |  FROM p${r - 1} p CROSS JOIN pick$r c
               |)""".stripMargin
          else ""
        s"""pick$r AS MATERIALIZED (
           |  SELECT vec_id AS cid, v AS cv, dmin AS radius FROM p${r - 1}
           |  ORDER BY dmin DESC, vec_id LIMIT 1
           |)$pNext""".stripMargin
      }
      .mkString(",\n")
    val picks = (1 until KcK)
      .map(r => s"SELECT CAST(${r + 1} AS BIGINT) AS rank, cid AS center_id, round(radius, 6) + 0.0 AS radius FROM pick$r")
      .mkString("\nUNION ALL ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |seed AS MATERIALIZED (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 1),
       |p0 AS MATERIALIZED (
       |  SELECT e.vec_id, e.v, ${d2Duck("e.v", "c.cv")} AS dmin FROM e CROSS JOIN seed c
       |),
       |$rounds
       |SELECT CAST(1 AS BIGINT) AS rank, cid AS center_id, 0.0 AS radius FROM seed
       |UNION ALL $picks
       |ORDER BY rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vec_kmeans" -> vecKmeans,
    "dedup_semantic" -> dedupSemantic,
    "ann_ivf_kmeans" -> annIvfKmeans,
    "vec_silhouette" -> vecSilhouette,
    "select_kcenter" -> selectKcenter
  )

  val oracle: Map[String, String] = Map(
    "vec_kmeans" -> vecKmeansSql,
    "dedup_semantic" -> dedupSemanticSql,
    "ann_ivf_kmeans" -> annIvfKmeansSql,
    "vec_silhouette" -> vecSilhouetteSql,
    "select_kcenter" -> selectKcenterSql
  )
}
