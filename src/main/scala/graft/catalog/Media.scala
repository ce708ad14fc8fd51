package graft.catalog

import org.apache.spark.sql.functions._

import graft.multimodal.{Media => MM}

/**
 * Multimodal-column queries: binary payload + typed-metadata extraction
 * (graft.multimodal.Media). The catalog entry runs the REAL typed
 * mapPartitions pipeline — Dataset[MediaRecord] -> decode ->
 * Dataset[MediaFeatures]. Image rows carry genuine PNG payloads decoded
 * with `javax.imageio`; audio rows carry genuine WAV (RIFF/PCM) payloads
 * parsed by Media.decodeWav; video rows carry genuine AVI containers
 * parsed by Media.decodeAvi (avih header + movi frame-chunk walk — only
 * frame PIXEL decode would need a codec this container doesn't ship). All
 * fixtures are closed-form in doc_id (Media.imgWidth/imgHeight/imgRgb,
 * Media.wavSampleRate/wavChannels/wavSamples/wavFill, Media.aviWidth/
 * aviHeight/aviFrames/aviFrameLen/aviFill), so the oracles below recompute
 * the md5 of the expected decoded raster / PCM buffer / frame payload with
 * repeat(chr(..)..) — the DECODE ITSELF is hash-checked, not just the
 * plumbing.
 */
object MediaCatalog extends Family {

  private val metaExtract = Q(
    "media_meta_extract",
    Some("""
      SELECT doc_id, media_type, n_bytes, content_key, width, height, n_frames
      FROM (
        SELECT doc_id, 'image' AS media_type,
          CAST(w * h * 3 AS INTEGER) AS n_bytes,
          substr(md5(repeat(
            chr(CAST(32 + (doc_id * 11) % 95 AS INTEGER)) ||
            chr(CAST(32 + (doc_id * 13) % 95 AS INTEGER)) ||
            chr(CAST(32 + (doc_id * 17) % 95 AS INTEGER)),
            CAST(w * h AS INTEGER))), 1, 16) AS content_key,
          CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
          1 AS n_frames
        FROM (SELECT doc_id, 8 + (doc_id * 7) % 24 AS w,
                     6 + (doc_id * 5) % 17 AS h
              FROM documents WHERE doc_id % 3 = 0)
        UNION ALL
        SELECT doc_id, 'audio' AS media_type,
          CAST(ns * ch AS INTEGER) AS n_bytes,
          substr(md5(repeat(chr(CAST(32 + (doc_id * 29) % 95 AS INTEGER)),
            CAST(ns * ch AS INTEGER))), 1, 16) AS content_key,
          0 AS width, 0 AS height,
          CAST(ns AS INTEGER) AS n_frames
        FROM (SELECT doc_id, 200 + (doc_id * 23) % 1800 AS ns,
                     1 + doc_id % 2 AS ch
              FROM documents WHERE doc_id % 3 = 1)
        UNION ALL
        SELECT doc_id, 'video' AS media_type,
          CAST(nf * fl AS INTEGER) AS n_bytes,
          substr(md5(repeat(chr(CAST(32 + (doc_id * 37) % 95 AS INTEGER)),
            CAST(nf * fl AS INTEGER))), 1, 16) AS content_key,
          CAST(320 + (doc_id * 31) % 1600 AS INTEGER) AS width,
          CAST(240 + (doc_id * 17) % 840 AS INTEGER) AS height,
          CAST(nf AS INTEGER) AS n_frames
        FROM (SELECT doc_id, 1 + doc_id % 24 AS nf, 50 + doc_id % 100 AS fl
              FROM documents WHERE doc_id % 3 = 2)
      ) ORDER BY doc_id
    """)) { (spark, dir) =>
    MM.extractFeatures(MM.mediaTable(spark, dir))
      .toDF()
      .orderBy(col("doc_id"))
  }

  // The audio modality's full typed header — a REAL WAV parse per row
  // (sample rate, channel count, bit depth, PCM frame count) plus the
  // exact-integer duration and the PCM payload digest. duration_ms is
  // integer floor division on both engines — no IEEE arithmetic anywhere
  // in this query.
  private val audioMeta = Q(
    "media_audio_meta",
    Some("""
      SELECT doc_id,
        CAST(8000 + 100 * ((doc_id * 19) % 81) AS INTEGER) AS sample_rate,
        CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        CAST(8 AS INTEGER) AS bits_per_sample,
        CAST(ns AS BIGINT) AS n_samples,
        CAST(ns * 1000 // (8000 + 100 * ((doc_id * 19) % 81)) AS BIGINT) AS duration_ms,
        substr(md5(repeat(chr(CAST(32 + (doc_id * 29) % 95 AS INTEGER)),
          CAST(ns * (1 + doc_id % 2) AS INTEGER))), 1, 16) AS pcm_key
      FROM (SELECT doc_id, 200 + (doc_id * 23) % 1800 AS ns
            FROM documents WHERE doc_id % 3 = 1)
      ORDER BY doc_id
    """)) { (spark, dir) =>
    MM.extractAudio(MM.mediaTable(spark, dir))
      .toDF()
      .orderBy(col("doc_id"))
  }

  // The video modality's full typed container header — a REAL RIFF/AVI
  // parse per row (dimensions, frame count, frame interval) plus the
  // exact-integer duration and the frame-payload digest. duration_ms is
  // integer floor division on both engines — no IEEE arithmetic anywhere
  // in this query.
  private val videoMeta = Q(
    "media_video_meta",
    Some("""
      SELECT doc_id,
        CAST(320 + (doc_id * 31) % 1600 AS INTEGER) AS width,
        CAST(240 + (doc_id * 17) % 840 AS INTEGER) AS height,
        CAST(nf AS INTEGER) AS n_frames,
        CAST(33333 AS INTEGER) AS us_per_frame,
        CAST(nf * 33333 // 1000 AS BIGINT) AS duration_ms,
        substr(md5(repeat(chr(CAST(32 + (doc_id * 37) % 95 AS INTEGER)),
          CAST(nf * (50 + doc_id % 100) AS INTEGER))), 1, 16) AS frames_key
      FROM (SELECT doc_id, 1 + doc_id % 24 AS nf
            FROM documents WHERE doc_id % 3 = 2)
      ORDER BY doc_id
    """)) { (spark, dir) =>
    MM.extractVideo(MM.mediaTable(spark, dir))
      .toDF()
      .orderBy(col("doc_id"))
  }

  // Fit-within-box resize plan over the decoded image dims (real ImageIO
  // decode feeding the planner): pure integer multiply-then-divide with a
  // fixed 16×12 box so the fixture population exercises all three branches
  // (fits / width-limited / height-limited). The oracle recomputes the
  // closed-form dims and the same exact-rational floor arithmetic.
  private val resizePlanQ = Q(
    "media_resize_plan",
    Some("""
      SELECT doc_id, media_type, src_width, src_height,
        CAST(CASE
          WHEN src_width <= 16 AND src_height <= 12 THEN src_width
          WHEN src_width * 12 >= src_height * 16 THEN 16
          ELSE greatest(1, (src_width * 12) // src_height) END AS INTEGER)
          AS out_width,
        CAST(CASE
          WHEN src_width <= 16 AND src_height <= 12 THEN src_height
          WHEN src_width * 12 >= src_height * 16
            THEN greatest(1, (src_height * 16) // src_width)
          ELSE 12 END AS INTEGER) AS out_height
      FROM (SELECT doc_id, 'image' AS media_type,
              CAST(8 + (doc_id * 7) % 24 AS INTEGER) AS src_width,
              CAST(6 + (doc_id * 5) % 17 AS INTEGER) AS src_height
            FROM documents WHERE doc_id % 3 = 0)
      ORDER BY doc_id
    """)) { (spark, dir) =>
    // modality filter BELOW the decode: Catalyst cannot push a filter
    // through the typed mapPartitions, so filtering afterwards would pay
    // WAV+AVI decodes for rows this query discards
    MM.resizePlan(
        MM.extractFeatures(
          MM.mediaTable(spark, dir).filter(col("media_type") === "image")),
        maxW = 16, maxH = 12)
      .orderBy(col("doc_id"))
  }

  // Frame sampling fan-out: every 4th frame index of each decoded video —
  // the one-row-per-frame shape a frame-level decode stage consumes. The
  // oracle regenerates the same index arithmetic from the closed-form
  // frame counts.
  private val frameSampleQ = Q(
    "media_frames_sample",
    Some("""
      SELECT doc_id, CAST(nf AS INTEGER) AS n_frames,
        CAST(unnest(generate_series(0, nf - 1, 4)) AS INTEGER) AS frame_idx
      FROM (SELECT doc_id, 1 + doc_id % 24 AS nf
            FROM documents WHERE doc_id % 3 = 2)
      ORDER BY doc_id, frame_idx
    """)) { (spark, dir) =>
    MM.sampleFrames(
        MM.extractFeatures(
          MM.mediaTable(spark, dir).filter(col("media_type") === "video")),
        everyNth = 4)
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // Shared CTE: the closed-form banded dHash of every document's gradient
  // PNG (graft.multimodal.ImageHash scaladoc pins the variant: 9x8
  // nearest-neighbor sample, horizontal comparisons, four 16-bit bands).
  // The Spark side computes the same hash from a REAL ImageIO decode of
  // the authored PNG — PNG is lossless, so a decode defect breaks the
  // hash gate.
  private val dhashCte = """
      p AS (
        SELECT doc_id,
          1 + (doc_id % 97) % 13 AS a,
          1 + (doc_id % 97) % 11 AS b,
          (doc_id % 97) % 7 AS d,
          doc_id % 4 AS c,
          16 + (doc_id % 97) % 17 AS w,
          12 + (doc_id % 97) % 13 AS h,
          doc_id % 2 AS var
        FROM documents),
      samp AS (
        SELECT p.doc_id, gx.g AS gx, gy.g AS gy,
          CAST((a * ((gx.g * w) // 9) * ((gx.g * w) // 9)
              + b * ((gy.g * h) // 8) * ((gy.g * h) // 8)
              + d * ((gx.g * w) // 9) * ((gy.g * h) // 8) + c +
            CASE WHEN var = 1 AND (gx.g * w) // 9 >= (8 * w) // 9
                             AND (gy.g * h) // 8 >= (7 * h) // 8
                 THEN 100 ELSE 0 END) % 256 AS INTEGER) AS s
        FROM p, generate_series(0, 8) gx(g), generate_series(0, 7) gy(g)),
      bits AS (
        SELECT s1.doc_id, s1.gx, s1.gy,
          CASE WHEN s2.s > s1.s THEN 1 ELSE 0 END AS bit
        FROM samp s1 JOIN samp s2
          ON s1.doc_id = s2.doc_id AND s1.gy = s2.gy AND s2.gx = s1.gx + 1
        WHERE s1.gx < 8),
      hashes AS (
        SELECT bits.doc_id,
          CAST(SUM(CASE WHEN gy IN (0,1) THEN bit << ((gy % 2) * 8 + gx) ELSE 0 END) AS INTEGER) AS b0,
          CAST(SUM(CASE WHEN gy IN (2,3) THEN bit << ((gy % 2) * 8 + gx) ELSE 0 END) AS INTEGER) AS b1,
          CAST(SUM(CASE WHEN gy IN (4,5) THEN bit << ((gy % 2) * 8 + gx) ELSE 0 END) AS INTEGER) AS b2,
          CAST(SUM(CASE WHEN gy IN (6,7) THEN bit << ((gy % 2) * 8 + gx) ELSE 0 END) AS INTEGER) AS b3
        FROM bits GROUP BY bits.doc_id)"""

  // Perceptual hash of every image in the corpus — width/height come from
  // the decoded raster, the bands from decoded pixels, so the whole decode
  // path sits under the driver's hash compare.
  /** The banded dHash of the whole image corpus — the decode-heavy spine
    * the image queries fan out from. Standalone runs (Verify, tests,
    * PlanAudit) rebuild it per query; [[warmShared]] materializes it once
    * for the bench's deployment shape (the PNG decode is by far the
    * costliest stage and is identical across consumers). */
  def dhashShared(spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.ops.Warmed.getOrBuild("media_dhash", dir)(
      graft.multimodal.ImageHash
        .dhash(graft.multimodal.ImageHash.corpus(spark, dir))
        .toDF())

  /** Materialize the shared dHash spine for `dir` (bench warm path). */
  def warmShared(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    graft.ops.Warmed.warm("media_dhash", dir)(
      graft.multimodal.ImageHash
        .dhash(graft.multimodal.ImageHash.corpus(spark, dir))
        .toDF())

  private val imageDhash = Q(
    "media_image_dhash",
    Some(s"""
      WITH $dhashCte
      SELECT hashes.doc_id,
        CAST(16 + (hashes.doc_id % 97) % 17 AS INTEGER) AS width,
        CAST(12 + (hashes.doc_id % 97) % 13 AS INTEGER) AS height,
        b0, b1, b2, b3
      FROM hashes ORDER BY doc_id
    """)) { (spark, dir) =>
    dhashShared(spark, dir).orderBy(col("doc_id"))
  }

  // Image near-dup pairs in the hamming-3 ball: Spark finds them via
  // banded candidates + exact confirm (never all-pairs); the oracle may be
  // quadratic because DuckDB only ever sees sf0.01. Semantics identical by
  // the 4-band pigeonhole.
  private val imageDedup = Q(
    "dedup_image_dhash_pairs",
    Some(s"""
      WITH $dhashCte
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
           + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
           AS INTEGER) AS hamming
      FROM hashes x JOIN hashes y ON x.doc_id < y.doc_id
      WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
          + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= 3
      ORDER BY doc_a, doc_b
    """)) { (spark, dir) =>
    graft.multimodal.ImageHash
      .nearDupPairsDf(dhashShared(spark, dir), maxHamming = 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // Linear-output production dial for the same near-dup semantics: a STAR
  // COVER — each doc is confirmed only against the min-doc_id canonical of
  // each of its four band buckets, so candidates (and output) are O(4n)
  // however wide the near-dup clusters grow. `dedup_image_dhash_pairs`
  // above enumerates the FULL pair set, whose size is quadratic in cluster
  // width (SCALE.md's 16x cell measures that honestly); at 100 TB a dedup
  // pipeline consumes (canonical, member) edges — this shape — and groups
  // them into survivor picks, exactly like the text family's
  // `dedup_cluster_canonical`. Same banding, same hamming confirm, same
  // pigeonhole guarantee per emitted edge.
  private val imageDedupStar = Q(
    "dedup_image_dhash_star",
    Some(s"""
      WITH $dhashCte,
      bands AS (
        SELECT doc_id, b0, b1, b2, b3, t.band,
          CASE t.band WHEN 0 THEN b0 WHEN 1 THEN b1
                      WHEN 2 THEN b2 ELSE b3 END AS v
        FROM hashes CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) t),
      cand AS (
        SELECT DISTINCT
          MIN(doc_id) OVER (PARTITION BY band, v) AS doc_a,
          doc_id AS doc_b, b0, b1, b2, b3
        FROM bands)
      SELECT c.doc_a, c.doc_b,
        CAST(bit_count(xor(x.b0, c.b0)) + bit_count(xor(x.b1, c.b1))
           + bit_count(xor(x.b2, c.b2)) + bit_count(xor(x.b3, c.b3))
           AS INTEGER) AS hamming
      FROM cand c JOIN hashes x ON x.doc_id = c.doc_a
      WHERE c.doc_a < c.doc_b
        AND bit_count(xor(x.b0, c.b0)) + bit_count(xor(x.b1, c.b1))
          + bit_count(xor(x.b2, c.b2)) + bit_count(xor(x.b3, c.b3)) <= 3
      ORDER BY doc_a, doc_b
    """)) { (spark, dir) =>
    graft.multimodal.ImageHash
      .nearDupStarDf(dhashShared(spark, dir), maxHamming = 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // Windowed audio energy + silence detection over REALLY-decoded varying
  // PCM (graft.multimodal.AudioEnergy) — the VAD/segmentation posture.
  // Every decoded sample feeds the int64 energy sum, so the WAV parse and
  // the sample walk both sit under the hash gate. The oracle regenerates
  // the closed-form samples with generate_series; the Spark side never
  // sees the closed form — only the RIFF bytes.
  private val audioEnergy = Q(
    "media_audio_energy",
    Some("""
      WITH a AS (
        SELECT doc_id, 200 + (doc_id * 23) % 1800 AS ns
        FROM documents WHERE doc_id % 3 = 1),
      idx AS (
        SELECT doc_id,
          unnest(generate_series(0, CAST(ns - 1 AS BIGINT))) AS i
        FROM a),
      s AS (
        SELECT doc_id, i // 160 AS win_id,
          CASE WHEN (i // 160) % 4 = 3 THEN CAST(0 AS BIGINT)
               ELSE CAST(32 + (doc_id * 29 + i * 7) % 95 - 79 AS BIGINT)
          END AS amp
        FROM idx)
      SELECT doc_id, CAST(win_id AS INTEGER) AS win_id,
        CAST(COUNT(*) AS INTEGER) AS n_samples,
        CAST(SUM(amp * amp) AS BIGINT) AS energy,
        SUM(amp * amp) = 0 AS is_silence
      FROM s GROUP BY doc_id, win_id
      ORDER BY doc_id, win_id
    """)) { (spark, dir) =>
    graft.multimodal.AudioEnergy
      .windows(graft.multimodal.AudioEnergy.corpus(spark, dir))
      .toDF()
      .orderBy(col("doc_id"), col("win_id"))
  }

  override val specs: Seq[Q] =
    Seq(metaExtract, audioMeta, videoMeta, resizePlanQ, frameSampleQ,
      imageDhash, imageDedup, imageDedupStar, audioEnergy)
}
