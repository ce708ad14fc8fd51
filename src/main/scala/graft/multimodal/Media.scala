package graft.multimodal

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.Tables

/** One media payload: an opaque binary column plus typed metadata — the
  * multimodal lake schema (image/audio/video bytes ride as `binary`,
  * everything queryable lives in typed columns next to them). */
final case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])

/** Decoded per-item features (dimensions/frames are what a real codec would
  * emit; see [[Media.decodeStub]]). */
final case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Int, content_key: String,
    width: Int, height: Int, n_frames: Int)

/**
 * Multimodal column plumbing over the lake: schema, partition-friendly
 * batch shape, and distributed feature extraction.
 *
 * The Scala analog of PySpark's `mapInPandas` decode pipeline is
 * `Dataset.mapPartitions` with case-class encoders: one iterator per
 * partition, so a real implementation amortizes codec/model initialization
 * per partition (exactly where the comment below marks the STUB). This
 * container ships no image/audio codecs, so [[decodeStub]] is a
 * deterministic fake — the Spark-side plumbing (binary schema, partitioning,
 * per-partition batching, typed output) is real and tested.
 */
object Media {

  /** Binary media table derived from `documents`: utf-8 bytes stand in for
    * media payloads; the modality cycles by doc_id so every type appears. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.spread(Tables.documents(spark, sfDir))
      .select(
        col("doc_id"),
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' " +
          "WHEN 1 THEN 'audio' ELSE 'video' END").as("media_type"),
        encode(col("text"), "utf-8").as("content"))

  /**
   * ======================== STUB — NOT A REAL DECODER ======================
   * A real pipeline would decode `bytes` with an image/audio/video codec
   * (e.g. via javax.imageio / ffmpeg bindings) and emit true dimensions.
   * None of those libraries exist in this container, so the "decode" is a
   * deterministic arithmetic fake over (doc_id, byte length) — stable across
   * engines, which lets the DuckDB oracle check the surrounding plumbing.
   * =========================================================================
   */
  def decodeStub(docId: Long, bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    val width = (320 + (docId * 31 + n) % 1600).toInt
    val height = (240 + (docId * 17 + n) % 840).toInt
    val nFrames = (1 + n % 24).toInt
    (width, height, nFrames)
  }

  /** Fit-within-box resize plan: pure integer multiply-then-divide (exact
    * rational floor — no double rounding drift), aspect preserved, never
    * upscaling, output clamped to >= 1px. A real pipeline would re-encode
    * bytes here (STUB: dimensions only). */
  def resizePlan(feats: Dataset[MediaFeatures], maxW: Int, maxH: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = col("width")
    val h = col("height")
    val fits = w <= maxW && h <= maxH
    // width-limited iff w/maxW >= h/maxH  <=>  w*maxH >= h*maxW (exact ints)
    val widthLimited = w * maxH >= h * maxW
    feats.toDF()
      .select(col("doc_id"), col("media_type"),
        w.as("src_width"), h.as("src_height"),
        // floor(intA / intB) here == the exact rational floor: operands are
        // exact small ints in double and quotient granularity (1/h, 1/w)
        // dwarfs double ulp, so no cross-integer rounding is possible
        when(fits, w).when(widthLimited, lit(maxW))
          .otherwise(greatest(lit(1), floor((w * maxH) / h))).cast("int").as("out_width"),
        when(fits, h).when(widthLimited, greatest(lit(1), floor((h * maxW) / w)))
          .otherwise(lit(maxH)).cast("int").as("out_height"))
  }

  /** Frame sampling: every `everyNth` frame index of each video — the
    * explode shape a frame-level training pipeline fans out on (one row per
    * sampled frame, ready for a per-frame decode stage). */
  def sampleFrames(feats: Dataset[MediaFeatures], everyNth: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    require(everyNth > 0)
    feats.toDF()
      .filter(col("media_type") === "video" && col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1,
          lit(everyNth))).as("frame_idx"))
  }

  /** Distributed decode + feature extraction: one codec "session" per
    * partition, streaming the partition's records through it. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      // per-partition init: a real codec/model handle would be created HERE
      val md = MessageDigest.getInstance("MD5")
      records.map { r =>
        md.reset()
        val key = md.digest(r.content).take(8)
          .map(b => f"${b & 0xff}%02x").mkString
        val (w, h, f) = decodeStub(r.doc_id, r.content)
        MediaFeatures(r.doc_id, r.media_type, r.content.length, key, w, h, f)
      }
    }
  }
}
