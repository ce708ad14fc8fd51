package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.security.MessageDigest

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.Tables

/** One media payload: an opaque binary column plus typed metadata — the
  * multimodal lake schema (image/audio/video bytes ride as `binary`,
  * everything queryable lives in typed columns next to them). */
final case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])

/** Decoded per-item features. For images these come from a REAL `ImageIO`
  * PNG decode: `width`/`height` are the decoded raster dims, `n_bytes` is
  * the decoded payload size (`w*h*3` RGB bytes), `content_key` is the md5
  * of the decoded pixel bytes. For audio/video (no codecs in this
  * container) they come from [[Media.decodeStub]] and `n_bytes`/
  * `content_key` describe the raw payload. */
final case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Int, content_key: String,
    width: Int, height: Int, n_frames: Int)

/**
 * Multimodal column plumbing over the lake: schema, partition-friendly
 * batch shape, and distributed feature extraction.
 *
 * The Scala analog of PySpark's `mapInPandas` decode pipeline is
 * `Dataset.mapPartitions` with case-class encoders: one iterator per
 * partition, so codec/digest initialization amortizes per partition.
 * The image modality is decoded FOR REAL with the JDK's `javax.imageio`
 * PNG codec; the payloads are deterministic solid-color PNG fixtures whose
 * dimensions and fill color are closed-form functions of `doc_id`, so the
 * DuckDB oracle can recompute the expected decoded-raster hash and the
 * decode itself sits under the hash gate. Audio/video stay stubbed (no
 * ffmpeg-style codecs ship in this container) — see [[decodeStub]].
 */
object Media {

  /** Closed-form image fixture parameters, shared verbatim with the DuckDB
    * oracle in `graft.catalog.MediaCatalog`. Kept small (≤31×22 px) so the
    * per-row encode/decode cost stays metadata-sized at any SF. */
  def imgWidth(docId: Long): Int = (8 + (docId * 7) % 24).toInt
  def imgHeight(docId: Long): Int = (6 + (docId * 5) % 17).toInt
  /** Solid-fill RGB, each channel in the printable-ASCII range [32,126] so
    * the raster bytes are identical to the UTF-8 of the equivalent string —
    * which is what lets DuckDB md5 the same buffer with repeat(chr(..)..). */
  def imgRgb(docId: Long): (Int, Int, Int) = (
    (32 + (docId * 11) % 95).toInt,
    (32 + (docId * 13) % 95).toInt,
    (32 + (docId * 17) % 95).toInt)

  /** Deterministic PNG fixture: a `imgWidth×imgHeight` solid-color image
    * encoded with the JDK PNG writer. PNG is lossless, so decoding it
    * recovers exactly these pixels. */
  def pngFixture(docId: Long): Array[Byte] = {
    val w = imgWidth(docId); val h = imgHeight(docId)
    val (r, g, b) = imgRgb(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Binary media table derived from `documents`: real PNG bytes for the
    * image modality, utf-8 text bytes standing in for audio/video payloads;
    * the modality cycles by doc_id so every type appears. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    val png = udf((docId: Long) => pngFixture(docId))
    Tables.spread(Tables.documents(spark, sfDir))
      .select(
        col("doc_id"),
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' " +
          "WHEN 1 THEN 'audio' ELSE 'video' END").as("media_type"),
        when(col("doc_id") % 3 === 0, png(col("doc_id")))
          .otherwise(encode(col("text"), "utf-8")).as("content"))
  }

  /**
   * ==================== STUB — AUDIO/VIDEO ONLY ===========================
   * Images are decoded for real above via `javax.imageio`. A real pipeline
   * would decode audio/video with an ffmpeg-style codec and emit true
   * durations/dimensions; no such library exists in this container, so for
   * those two modalities the "decode" is a deterministic arithmetic fake
   * over (doc_id, byte length) — stable across engines, which lets the
   * DuckDB oracle check the surrounding plumbing.
   * ========================================================================
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
    * bytes here (dimensions only). */
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

  private def hex16(digest: Array[Byte]): String =
    digest.take(8).map(b => f"${b & 0xff}%02x").mkString

  /** Distributed decode + feature extraction: one codec "session" per
    * partition, streaming the partition's records through it. Image rows go
    * through a REAL `ImageIO` PNG decode; the emitted `content_key` hashes
    * the decoded pixel buffer (row-major RGB bytes), so any decode defect
    * surfaces as a hash mismatch against the oracle. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      // per-partition init: digest (and any codec handles) created once HERE
      val md = MessageDigest.getInstance("MD5")
      records.map { r =>
        md.reset()
        if (r.media_type == "image") {
          val img = ImageIO.read(new ByteArrayInputStream(r.content))
          require(img != null, s"undecodable image payload for doc_id=${r.doc_id}")
          val w = img.getWidth; val h = img.getHeight
          val raster = new Array[Byte](w * h * 3)
          var i = 0; var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              raster(i) = ((p >> 16) & 0xff).toByte
              raster(i + 1) = ((p >> 8) & 0xff).toByte
              raster(i + 2) = (p & 0xff).toByte
              i += 3; x += 1
            }
            y += 1
          }
          MediaFeatures(r.doc_id, r.media_type, w * h * 3, hex16(md.digest(raster)), w, h, 1)
        } else {
          val key = hex16(md.digest(r.content))
          val (w, h, f) = decodeStub(r.doc_id, r.content)
          MediaFeatures(r.doc_id, r.media_type, r.content.length, key, w, h, f)
        }
      }
    }
  }
}
