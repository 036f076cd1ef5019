package graft.contract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ccm.DetHash

/** Multimodal-column plumbing: media as opaque binary + typed metadata,
  * frame/chunk fan-out, per-chunk hashing. The oracle-checked query uses
  * `documents.text` bytes as a stand-in payload (the container has no media
  * decoders — see [[graft.multimodal.Multimodal]] for the decode-stub
  * pipeline); the *plumbing* — chunk schema, fan-out, per-chunk digest — is
  * the real thing and is what matters at 100 TB (a blob column never passes
  * through a shuffle here; only (id, chunk_id, digest) rows do).
  */
object MultimodalQueries {
  private val FrameBytes = 64

  private def mmMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        col("text"),
        length(col("text")).cast("long").as("n_bytes"),
        expr(s"CAST((length(text) + ${FrameBytes - 1}) div $FrameBytes AS BIGINT)").as("n_frames")
      )
      .select(
        col("doc_id"),
        col("text"),
        col("n_bytes"),
        col("n_frames"),
        // Spark's sequence(0, -1) DESCENDS (phantom frames for an empty
        // payload); guard to an empty list like DuckDB's generate_series
        explode(
          when(col("n_frames") > 0, sequence(lit(0L), col("n_frames") - 1))
            .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))
        ).as("frame_id")
      )
      .select(
        col("doc_id"),
        col("frame_id"),
        col("n_bytes"),
        col("n_frames"),
        expr(DetHash.polyHashSparkSql(s"substring(text, CAST(frame_id * $FrameBytes + 1 AS INT), $FrameBytes)"))
          .as("frame_hash")
      )
      .transform(Norm.ordered(_, col("doc_id"), col("frame_id")))

  private val mmMetaSql: String =
    s"""WITH meta AS (
       |  SELECT doc_id, text,
       |         CAST(length(text) AS BIGINT) AS n_bytes,
       |         CAST((length(text) + ${FrameBytes - 1}) // $FrameBytes AS BIGINT) AS n_frames
       |  FROM documents
       |), frames AS (
       |  SELECT doc_id, text, n_bytes, n_frames,
       |         unnest(generate_series(0, n_frames - 1)) AS frame_id
       |  FROM meta
       |)
       |SELECT doc_id, frame_id, n_bytes, n_frames,
       |       ${DetHash.polyHashSql(s"substr(text, CAST(frame_id * $FrameBytes + 1 AS INTEGER), $FrameBytes)")} AS frame_hash
       |FROM frames ORDER BY doc_id, frame_id""".stripMargin

  // -------------------------------------------------------------------
  // mm_resize — the "resize/downsample" step of a media pipeline as a
  // deterministic stride-k payload downsample (every k-th byte of the
  // stand-in payload survives; a real build swaps the stride projection
  // for a codec's scaler). Emits the resized length + content digest, so
  // the oracle pins the exact downsampled payload, not just its size.
  // -------------------------------------------------------------------
  private val ResizeStride = 4

  private def mmResize(s: SparkSession, dir: String): DataFrame = {
    // ceil(len/k) samples; sequence(0,-1) DESCENDS on empty payloads -> guard
    val resized =
      s"""array_join(transform(
         |  CASE WHEN length(text) > 0
         |       THEN sequence(CAST(0 AS BIGINT), CAST(ceil(length(text) / $ResizeStride.0) AS BIGINT) - 1)
         |       ELSE CAST(array() AS ARRAY<BIGINT>) END,
         |  i -> substring(text, CAST(i * $ResizeStride + 1 AS INT), 1)), '')""".stripMargin
    Tables.documents(s, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_bytes"), expr(resized).as("rz"))
      .select(
        col("doc_id"),
        col("n_bytes"),
        length(col("rz")).cast("long").as("resized_bytes"),
        expr(DetHash.polyHashSparkSql("rz")).as("resized_hash")
      )
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val mmResizeSql: String =
    s"""WITH rz AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
       |         array_to_string(list_transform(
       |           range(0, CAST(ceil(length(text) / $ResizeStride.0) AS BIGINT)),
       |           i -> substr(text, CAST(i * $ResizeStride + 1 AS INTEGER), 1)), '') AS rz
       |  FROM documents
       |)
       |SELECT doc_id, n_bytes, CAST(length(rz) AS BIGINT) AS resized_bytes,
       |       ${DetHash.polyHashSql("rz")} AS resized_hash
       |FROM rz ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // mm_phash — perceptual AVERAGE-HASH (aHash) over the stub decode:
  // per frame, the mean "pixel" (byte code) is compared against the
  // payload's global mean; the resulting bit string (MSB = frame 0,
  // acc·2+bit fold in frame order) is the media fingerprint, and docs
  // sharing (ahash, n_frames) link to their lowest-id representative —
  // the hash-keyed near-dup join of an image-dedup pipeline. The mean
  // comparison is an INTEGER cross-multiply (s_f·L > S·l_f — no
  // division ever happens), so the fingerprint is exact on both
  // engines. A real codec swaps byte codes for luma; every shape
  // around it — frame fan-out, integer fingerprint fold, hash-bucket
  // dedup join — is the production plumbing. Frames cap at 62 bits
  // (one BIGINT); longer payloads would hash 64-byte frames of a
  // RESIZED payload first (mm_resize), exactly like aHash's 8x8
  // downscale.
  // -------------------------------------------------------------------
  private def mmPhash(s: SparkSession, dir: String): DataFrame = {
    val frames = Tables.documents(s, dir)
      .select(
        col("doc_id"),
        col("text"),
        expr(s"CAST((length(text) + ${FrameBytes - 1}) div $FrameBytes AS BIGINT)").as("n_frames")
      )
      .filter(col("n_frames") > 0 && col("n_frames") <= 62)
      .select(
        col("doc_id"),
        col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_id"),
        col("text")
      )
      .select(
        col("doc_id"),
        col("n_frames"),
        col("frame_id"),
        expr(s"substring(text, CAST(frame_id * $FrameBytes + 1 AS INT), $FrameBytes)").as("fm")
      )
      .select(
        col("doc_id"),
        col("n_frames"),
        col("frame_id"),
        expr("aggregate(transform(sequence(1, length(fm)), i -> CAST(ascii(substring(fm, i, 1)) AS BIGINT)), CAST(0 AS BIGINT), (acc, c) -> acc + c)")
          .as("s_f"),
        length(col("fm")).cast("long").as("l_f")
      )
    val bits = frames
      .withColumn("s_tot", sum(col("s_f")).over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .withColumn("l_tot", sum(col("l_f")).over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .withColumn("bit", when(col("s_f") * col("l_tot") > col("s_tot") * col("l_f"), 1L).otherwise(0L))
    val hashed = bits
      .groupBy("doc_id", "n_frames")
      .agg(expr("aggregate(array_sort(collect_list(struct(frame_id, bit))), CAST(0 AS BIGINT), (acc, x) -> acc * 2 + x.bit)").as("ahash"))
      .localCheckpoint() // both sides of the dup join
    hashed
      .as("a")
      .join(
        hashed.as("b"),
        col("a.ahash") === col("b.ahash") && col("a.n_frames") === col("b.n_frames") &&
          col("a.doc_id") > col("b.doc_id"),
        "left"
      )
      .groupBy(col("a.doc_id").as("doc_id"), col("a.n_frames").as("n_frames"), col("a.ahash").as("ahash"))
      .agg(min(col("b.doc_id")).as("dup_of"))
      .transform(Norm.ordered(_, col("doc_id")))
  }

  private val mmPhashSql: String =
    s"""WITH meta AS (
       |  SELECT doc_id, text,
       |         CAST((length(text) + ${FrameBytes - 1}) // $FrameBytes AS BIGINT) AS n_frames
       |  FROM documents
       |  WHERE (length(text) + ${FrameBytes - 1}) // $FrameBytes BETWEEN 1 AND 62
       |), fr AS (
       |  SELECT doc_id, n_frames, unnest(generate_series(0, n_frames - 1)) AS frame_id, text
       |  FROM meta
       |), fs AS (
       |  SELECT doc_id, n_frames, frame_id,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(string_split(substr(text, CAST(frame_id * $FrameBytes + 1 AS INTEGER), $FrameBytes), ''),
       |                          c -> CAST(ascii(c) AS BIGINT))),
       |           (acc, c) -> acc + c) AS s_f,
       |         CAST(length(substr(text, CAST(frame_id * $FrameBytes + 1 AS INTEGER), $FrameBytes)) AS BIGINT) AS l_f
       |  FROM fr
       |), bits AS (
       |  SELECT doc_id, n_frames, frame_id,
       |         CASE WHEN s_f * sum(l_f) OVER (PARTITION BY doc_id)
       |                   > sum(s_f) OVER (PARTITION BY doc_id) * l_f THEN 1 ELSE 0 END AS bit
       |  FROM fs
       |), hashed AS (
       |  SELECT doc_id, n_frames,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT), list(bit ORDER BY frame_id)),
       |                     (acc, b) -> acc * 2 + b) AS ahash
       |  FROM bits GROUP BY 1, 2
       |)
       |SELECT a.doc_id, a.n_frames, a.ahash, min(b.doc_id) AS dup_of
       |FROM hashed a LEFT JOIN hashed b
       |  ON a.ahash = b.ahash AND a.n_frames = b.n_frames AND a.doc_id > b.doc_id
       |GROUP BY 1, 2, 3
       |ORDER BY a.doc_id""".stripMargin

  // -------------------------------------------------------------------
  // mm_scene_cuts — SHOT-BOUNDARY detection over the stub decode: per
  // frame, the byte-sum "luma" feature (a real codec swaps byte codes
  // for decoded luma); a CUT is a transition between consecutive FULL
  // frames whose absolute feature delta exceeds the threshold — the
  // frame-difference detector every video curation pipeline runs before
  // keyframe extraction. Threshold chosen at ~p88 of the delta
  // distribution on the driver corpus (median 99, p90 228), so cuts are
  // sparse but present. All arithmetic is exact int64 (byte sums,
  // absolute difference, integer compare); the ragged last frame is
  // excluded from detection (its sum isn't length-comparable — a codec
  // pads; the stub documents instead). Scale shape: frame fan-out is
  // bounded per doc, the lag window is doc-partitioned (never global),
  // and only (doc_id, frame sums) rows shuffle — blobs stay columnar at
  // the scan.
  // -------------------------------------------------------------------
  private val CutThreshold = 200L

  private def mmSceneCuts(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = Tables.documents(s, dir)
      .select(
        col("doc_id"),
        col("text"),
        expr(s"CAST((length(text) + ${FrameBytes - 1}) div $FrameBytes AS BIGINT)").as("n_frames")
      )
      .select(
        col("doc_id"),
        col("text"),
        explode(
          when(col("n_frames") > 0, sequence(lit(0L), col("n_frames") - 1))
            .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))
        ).as("frame_id")
      )
      .select(
        col("doc_id"),
        col("frame_id"),
        expr(s"substring(text, CAST(frame_id * $FrameBytes + 1 AS INT), $FrameBytes)").as("fr")
      )
      .select(
        col("doc_id"),
        col("frame_id"),
        length(col("fr")).cast("long").as("flen"),
        expr(
          "aggregate(sequence(1, length(fr)), CAST(0 AS BIGINT), (acc, i) -> acc + CAST(ascii(substring(fr, CAST(i AS INT), 1)) AS BIGINT))"
        ).as("fsum")
      )
    val w = Window.partitionBy("doc_id").orderBy("frame_id")
    frames
      .withColumn("prev_sum", lag(col("fsum"), 1).over(w))
      .withColumn("prev_len", lag(col("flen"), 1).over(w))
      .filter(
        col("prev_sum").isNotNull && col("flen") === FrameBytes && col("prev_len") === FrameBytes &&
          abs(col("fsum") - col("prev_sum")) > CutThreshold
      )
      .select(col("doc_id"), col("frame_id").as("cut_at_frame"), abs(col("fsum") - col("prev_sum")).as("delta"))
      .transform(Norm.ordered(_, col("doc_id"), col("cut_at_frame")))
  }

  private val mmSceneCutsSql: String =
    s"""WITH meta AS (
       |  SELECT doc_id, text,
       |         CAST((length(text) + ${FrameBytes - 1}) // $FrameBytes AS BIGINT) AS n_frames
       |  FROM documents
       |), frames AS (
       |  SELECT doc_id, unnest(generate_series(0, n_frames - 1)) AS frame_id, text FROM meta
       |), feat AS (
       |  SELECT doc_id, frame_id,
       |         substr(text, CAST(frame_id * $FrameBytes + 1 AS INTEGER), $FrameBytes) AS fr
       |  FROM frames
       |), sums AS (
       |  SELECT doc_id, frame_id, CAST(length(fr) AS BIGINT) AS flen,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(range(1, length(fr) + 1),
       |             i -> CAST(ord(substr(fr, CAST(i AS INTEGER), 1)) AS BIGINT))),
       |           (a, b) -> a + b) AS fsum
       |  FROM feat
       |), lagged AS (
       |  SELECT doc_id, frame_id, flen, fsum,
       |         lag(fsum, 1) OVER (PARTITION BY doc_id ORDER BY frame_id) AS prev_sum,
       |         lag(flen, 1) OVER (PARTITION BY doc_id ORDER BY frame_id) AS prev_len
       |  FROM sums
       |)
       |SELECT doc_id, frame_id AS cut_at_frame, abs(fsum - prev_sum) AS delta
       |FROM lagged
       |WHERE prev_sum IS NOT NULL AND flen = $FrameBytes AND prev_len = $FrameBytes
       |  AND abs(fsum - prev_sum) > $CutThreshold
       |ORDER BY doc_id, cut_at_frame""".stripMargin

  // -------------------------------------------------------------------
  // mm_audio_vad — VOICE-ACTIVITY-DETECTION segmentation over the stub
  // decode (the step before any ASR/transcription pass): per full
  // frame, the integer energy L·Σb² − (Σb)² (the variance numerator —
  // a real codec swaps byte codes for PCM samples), thresholded at
  // ~p75 of the measured distribution; ACTIVE runs merge into segments
  // by gaps-and-islands (frame_id − row_number over active frames, the
  // evt_sessionize shape) and each segment reports its span and energy
  // mass. All arithmetic is exact int64 (64 bytes of ≤127 codes keep
  // L·Σb² < 7e7); the ragged last frame is excluded as in
  // mm_scene_cuts. Scale shape: bounded frame fan-out, doc-partitioned
  // windows, blobs never shuffle — only (doc, frame, two int sums).
  // -------------------------------------------------------------------
  private val VadThreshold = 3800000L

  private def mmAudioVad(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = Tables.documents(s, dir)
      .select(
        col("doc_id"),
        col("text"),
        expr(s"CAST((length(text) + ${FrameBytes - 1}) div $FrameBytes AS BIGINT)").as("n_frames")
      )
      .select(
        col("doc_id"),
        col("text"),
        explode(
          when(col("n_frames") > 0, sequence(lit(0L), col("n_frames") - 1))
            .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))
        ).as("frame_id")
      )
      .select(
        col("doc_id"),
        col("frame_id"),
        expr(s"substring(text, CAST(frame_id * $FrameBytes + 1 AS INT), $FrameBytes)").as("fr")
      )
      .select(
        col("doc_id"),
        col("frame_id"),
        length(col("fr")).cast("long").as("flen"),
        expr(
          "aggregate(sequence(1, length(fr)), CAST(0 AS BIGINT), (acc, i) -> acc + CAST(ascii(substring(fr, CAST(i AS INT), 1)) AS BIGINT))"
        ).as("s1"),
        expr(
          "aggregate(sequence(1, length(fr)), CAST(0 AS BIGINT), (acc, i) -> acc + CAST(ascii(substring(fr, CAST(i AS INT), 1)) AS BIGINT) * CAST(ascii(substring(fr, CAST(i AS INT), 1)) AS BIGINT))"
        ).as("s2")
      )
      .filter(col("flen") === FrameBytes)
      // materialization barrier: without it CollapseProject inlines the
      // two per-char folds into the energy filter AND the segment
      // aggregate — the fold evaluated 3× per frame (measured 5.9 →
      // 1.3 s at sf0.1). The pinned relation is (doc, frame, 3 int64s),
      // frame-count-sized, never the blobs.
      .localCheckpoint()
      .withColumn("energy", col("flen") * col("s2") - col("s1") * col("s1"))
      .filter(col("energy") > VadThreshold)
    val w = Window.partitionBy("doc_id").orderBy("frame_id")
    frames
      .withColumn("isl", col("frame_id") - row_number().over(w))
      .groupBy(col("doc_id"), col("isl"))
      .agg(
        min(col("frame_id")).as("seg_start"),
        max(col("frame_id")).as("seg_end"),
        count(lit(1)).as("n_frames"),
        sum(col("energy")).as("energy_sum")
      )
      .select(col("doc_id"), col("seg_start"), col("seg_end"), col("n_frames"), col("energy_sum"))
      .transform(Norm.ordered(_, col("doc_id"), col("seg_start")))
  }

  private val mmAudioVadSql: String =
    s"""WITH meta AS (
       |  SELECT doc_id, text,
       |         CAST((length(text) + ${FrameBytes - 1}) // $FrameBytes AS BIGINT) AS n_frames
       |  FROM documents
       |), fr AS (
       |  SELECT doc_id, unnest(generate_series(0, n_frames - 1)) AS frame_id, text FROM meta
       |), feat AS (
       |  SELECT doc_id, frame_id,
       |         substr(text, CAST(frame_id * $FrameBytes + 1 AS INTEGER), $FrameBytes) AS f
       |  FROM fr
       |), en AS (
       |  SELECT doc_id, frame_id, CAST(length(f) AS BIGINT) AS flen,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length(f) + 1),
       |        i -> CAST(ord(substr(f, CAST(i AS INTEGER), 1)) AS BIGINT))), (a, b) -> a + b) AS s1,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length(f) + 1),
       |        i -> CAST(ord(substr(f, CAST(i AS INTEGER), 1)) AS BIGINT)
       |             * CAST(ord(substr(f, CAST(i AS INTEGER), 1)) AS BIGINT))), (a, b) -> a + b) AS s2
       |  FROM feat WHERE length(f) = $FrameBytes
       |), active AS (
       |  SELECT doc_id, frame_id, flen * s2 - s1 * s1 AS energy
       |  FROM en WHERE flen * s2 - s1 * s1 > $VadThreshold
       |), isl AS (
       |  SELECT doc_id, frame_id, energy,
       |         frame_id - row_number() OVER (PARTITION BY doc_id ORDER BY frame_id) AS g
       |  FROM active
       |)
       |SELECT doc_id, min(frame_id) AS seg_start, max(frame_id) AS seg_end,
       |       CAST(count(*) AS BIGINT) AS n_frames, CAST(sum(energy) AS BIGINT) AS energy_sum
       |FROM isl GROUP BY doc_id, g
       |ORDER BY doc_id, seg_start""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_frames" -> mmMeta,
    "mm_resize" -> mmResize,
    "mm_phash" -> mmPhash,
    "mm_scene_cuts" -> mmSceneCuts,
    "mm_audio_vad" -> mmAudioVad
  )

  // mm_features oracle — the decode STUB's byte statistics are exactly
  // reproducible in SQL because the stand-in payloads are pure
  // printable-ASCII text (verified over the driver tables): UTF-8 byte ==
  // code point, so the byte histogram is a character histogram. A real
  // codec binding would drop this oracle (back to rows-only) — the point
  // here is that the PLUMBING around the stub is exact-checked.
  // Totality: the LEFT JOIN + coalesce + greatest(1, n) replicate the
  // stub's empty-payload path (hist(…)/max(1, len) -> mean 0, entropy 0,
  // 0 frames) — an empty document must not divide by zero or drop out.
  private val mmFeaturesSql: String = {
    val fb = graft.multimodal.Multimodal.FrameBytes
    s"""WITH chars AS (
       |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
       |), nb AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes FROM documents
       |), hist AS (
       |  SELECT doc_id, ascii(ch) AS b, CAST(count(*) AS BIGINT) AS c FROM chars
       |  WHERE ch <> '' GROUP BY 1, 2
       |), terms AS (
       |  -- per-term t, the stub's EXACT op sequence: c * (ln c - ln n) / ln2
       |  SELECT h.doc_id, h.b, h.c, n.n_bytes,
       |    h.c * (${graft.contract.ExactLn.duck("CAST(h.c AS DOUBLE)")}
       |           - ${graft.contract.ExactLn.duck("CAST(greatest(1, n.n_bytes) AS DOUBLE)")})
       |      / ${graft.contract.ExactLn.Ln2}e0 AS t
       |  FROM hist h JOIN nb n ON h.doc_id = n.doc_id
       |), st AS (
       |  SELECT doc_id,
       |    -- exact integer sum / one division: matches the stub's
       |    -- integerized mean bit-for-bit in any aggregation order
       |    -- (tie-proximity fix, round 14 — see Multimodal.decodeStub)
       |    CAST(sum(b * c) AS DOUBLE) / CAST(greatest(1, max(n_bytes)) AS DOUBLE) AS mean_byte,
       |    -- per-term nano-rounded entropy (round 14): each term rounded
       |    -- to nano units BEFORE the sum — the long sum is order-free.
       |    -- ADVICE r14: the rounding is the stub's LITERAL floor/ceil
       |    -- half-away expression, not round() — round() is exact
       |    -- half-away on the binary double while floor(t*1e9 + 0.5) can
       |    -- cross a boundary when t*1e9 sits one ulp below a half; both
       |    -- engines must take the same branch on the same bits
       |    -(CAST(sum(CAST(CASE WHEN t >= 0e0 THEN floor(t * 1e9 + 0.5)
       |                         ELSE ceil(t * 1e9 - 0.5) END AS BIGINT)) AS DOUBLE) / 1e9)
       |      / CAST(greatest(1, max(n_bytes)) AS DOUBLE) AS ent
       |  FROM terms GROUP BY 1
       |)
       |SELECT n.doc_id AS id, 'text/plain' AS kind, n.n_bytes,
       |  -- tie-free micro-grid round (see Multimodal.mmFeatures): power-of-
       |  -- two byte counts put the exact mean EXACTLY on a 6-dp half
       |  floor(coalesce(st.mean_byte, 0.0) * 1e6 + 0.5) / 1e6 + 0.0 AS mean_byte,
       |  floor(coalesce(st.ent, 0.0) * 1e6 + 0.5) / 1e6 + 0.0 AS byte_entropy,
       |  (n.n_bytes + ${fb - 1}) // $fb AS n_frames
       |FROM nb n LEFT JOIN st ON n.doc_id = st.doc_id
       |ORDER BY id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "mm_frames" -> mmMetaSql,
    "mm_resize" -> mmResizeSql,
    "mm_phash" -> mmPhashSql,
    "mm_features" -> mmFeaturesSql,
    "mm_scene_cuts" -> mmSceneCutsSql,
    "mm_audio_vad" -> mmAudioVadSql
  )
}
