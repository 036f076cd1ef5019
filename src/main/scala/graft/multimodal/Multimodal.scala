package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.contract.Norm

/** Multimodal (image/audio/video) column handling: media travels as an
  * opaque `binary` column with typed metadata; decode / feature-extract /
  * frame-sample run per-partition in batches.
  *
  * The container ships no media decoders, so [[decodeStub]] is a
  * clearly-marked deterministic fake (byte histogram + moments standing in
  * for pixel/sample statistics). Everything AROUND the stub — the schema,
  * the batched `mapPartitions` plumbing, the partitioning discipline — is
  * real: swap `decodeStub` for an actual codec binding and nothing else
  * changes.
  *
  * Scale notes (100 TB): blobs are the heavy column; the pipeline never
  * shuffles them. Features are extracted partition-local straight off the
  * scan, and only the small typed feature rows move. Batching inside
  * `mapPartitions` amortizes per-record codec setup exactly like an
  * `mapInPandas` batch would.
  */
object Multimodal {

  /** A media row: opaque payload + metadata. */
  final case class MediaRow(id: Long, kind: String, media: Array[Byte])

  /** Typed features out of the decode step. */
  final case class MediaFeatures(
      id: Long,
      kind: String,
      nBytes: Long,
      meanByte: Double,
      byteEntropy: Double,
      nFrames: Long
  )

  /** Frame/chunk size of the stub pipeline; the mm_features oracle SQL
    * (contract/MultimodalQueries) interpolates this same constant.
    */
  val FrameBytes = 64

  /** STUB decoder — deterministic fake. A real build binds an image/audio
    * codec here; the signature (bytes in, features out) is the contract.
    */
  def decodeStub(bytes: Array[Byte]): (Double, Double) = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { hist(bytes(i) & 0xff) += 1; i += 1 }
    val n = math.max(1, bytes.length).toDouble
    // mean as ONE division of an exact integer sum (Σ b·hist(b) ≤ 255·len,
    // no overflow below ~36 PB of payload), not a float fold of b·p terms:
    // the oracle's SQL computes the same sum in ARBITRARY aggregation
    // order, and the round-14 tie-proximity sweep measured a payload whose
    // float-folded mean sits EXACTLY on a round(…, 6) half boundary — one
    // reassociation ulp from a hash flake. Integer sum + single division
    // is bit-identical on both engines, tie or no tie.
    // entropy through the same order-free discipline: each byte's term
    // t_b = c_b·(ln c_b − ln n)/ln2 is a fixed expression over integers
    // (ExactLn on both engines), rounded to nano-units PER TERM — the
    // per-term round is bit-identical everywhere, the long sum is exact
    // in any aggregation order, and one final division scales back. The
    // float-fold form measured 5.5e-7 from a rounding boundary at sf0.1
    // (the closest surviving site after the round-14 conversions);
    // per-term nano-rounding makes the published value deterministic at
    // a value cost ≤ 256·0.5 nano per doc.
    val lnN = graft.functions.ExactMath.ln(n)
    var sumB = 0L
    var entNano = 0L
    var b = 0
    while (b < 256) {
      sumB += b * hist(b)
      val c = hist(b)
      if (c > 0L) {
        val t = c * (graft.functions.ExactMath.ln(c.toDouble) - lnN) / graft.functions.ExactMath.Ln2
        // half-away-from-zero, matching both engines' round()
        entNano += (if (t >= 0) math.floor(t * 1e9 + 0.5) else math.ceil(t * 1e9 - 0.5)).toLong
      }
      b += 1
    }
    (sumB / n, -(entNano.toDouble / 1e9) / n)
  }

  /** Batched per-partition decode: the `mapPartitions` body iterates the
    * partition in fixed-size batches (codec-setup amortization point).
    */
  def extractFeatures(rows: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real codec would init once per batch here
        batch.iterator.map { r =>
          val (mean, ent) = decodeStub(r.media)
          MediaFeatures(
            id = r.id,
            kind = r.kind,
            nBytes = r.media.length.toLong,
            meanByte = mean,
            byteEntropy = ent,
            nFrames = (r.media.length + FrameBytes - 1).toLong / FrameBytes
          )
        }
      }
    }
  }

  /** documents.text bytes as stand-in media payloads. */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), lit("text/plain").as("kind"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
  }

  /** Driver-contract query. ORACLE-CHECKED since round 3: the stand-in
    * payloads are pure printable-ASCII, so the stub's byte statistics are
    * reproducible as SQL character statistics (`mmFeaturesSql` in
    * [[graft.contract.MultimodalQueries]]); changing the stub's math means
    * changing that oracle in lockstep. A real codec binding would return
    * this query to a rows-only check.
    */
  private def mmFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaFromDocuments(spark, sfDir))
      .toDF()
      .select(
        col("id"),
        col("kind"),
        col("nBytes").as("n_bytes"),
        // TIE-FREE publication (round-15 sweep: docs whose byte count is a
        // power of two put the exact mean EXACTLY on a 6-dp half — round's
        // decimal-vs-binary tie semantics then differ by engine class).
        // floor(x*1e6 + 0.5)/1e6 is the literal micro-grid round: x is
        // bit-identical on both engines (integer sums, one division), so
        // every op here is too. The trailing + 0.0 normalizes -0.0 (a
        // constant-byte payload yields entropy -(1*log 1) = -0.0).
        expr("floor(meanByte * 1e6 + 0.5) / 1e6 + 0.0").as("mean_byte"),
        expr("floor(byteEntropy * 1e6 + 0.5) / 1e6 + 0.0").as("byte_entropy"),
        col("nFrames").as("n_frames")
      )
      .transform(Norm.ordered(_, col("id")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> mmFeatures
  )
}
