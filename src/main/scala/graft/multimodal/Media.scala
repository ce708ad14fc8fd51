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
  * of the decoded pixel bytes. For audio they come from a REAL RIFF/PCM
  * parse ([[Media.decodeWav]]): `n_bytes` is the PCM data-chunk length,
  * `content_key` hashes the decoded PCM samples, `n_frames` is the PCM
  * frame count (samples per channel), and width/height are 0 (no raster).
  * Only video (no codec in this container) keeps [[Media.decodeStub]],
  * where `n_bytes`/`content_key` describe the raw payload. */
final case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Int, content_key: String,
    width: Int, height: Int, n_frames: Int)

/** Decoded audio header + payload digest from a real WAV (RIFF/PCM) parse. */
final case class AudioFeatures(
    doc_id: Long, sample_rate: Int, channels: Int, bits_per_sample: Int,
    n_samples: Long, duration_ms: Long, pcm_key: String)

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

  /** Closed-form WAV fixture parameters, shared verbatim with the DuckDB
    * oracle in `graft.catalog.MediaCatalog`. 8-bit PCM keeps the payload
    * bytes printable-ASCII (each in [32,126]), so DuckDB can md5 the exact
    * same buffer with `repeat(chr(fill), n)` — the decode sits under the
    * hash gate just like the image raster does. */
  def wavSampleRate(docId: Long): Int = (8000 + 100 * ((docId * 19) % 81)).toInt
  def wavChannels(docId: Long): Int = (1 + docId % 2).toInt
  def wavSamples(docId: Long): Long = 200 + (docId * 23) % 1800
  def wavFill(docId: Long): Int = (32 + (docId * 29) % 95).toInt

  /** Deterministic WAV fixture: canonical 44-byte RIFF/PCM header + an
    * 8-bit mono/stereo constant-fill data chunk. Hand-assembled — WAV is a
    * container, not a codec, so writing and parsing it is plain byte work. */
  def wavFixture(docId: Long): Array[Byte] = {
    val rate = wavSampleRate(docId)
    val ch = wavChannels(docId)
    val dataLen = (wavSamples(docId) * ch).toInt
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                   // PCM
      .putShort(ch.toShort)
      .putInt(rate)
      .putInt(rate * ch)                     // byte rate (8-bit samples)
      .putShort(ch.toShort)                  // block align
      .putShort(8.toShort)                   // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    val fill = wavFill(docId).toByte
    var i = 0
    while (i < dataLen) { buf.put(fill); i += 1 }
    buf.array()
  }

  /** REAL RIFF/WAVE parse: validates the RIFF/WAVE magic, walks the chunk
    * list (tolerating extra chunks like LIST/fact and odd-size padding),
    * reads the PCM format block, and returns the header fields plus the
    * data chunk's offset/length. Fails fast — a truncated or non-PCM
    * payload raises instead of fabricating metadata. */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Int, Int, Int) = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii4(): String = {
      val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
    }
    require(bytes.length >= 12 && ascii4() == "RIFF", "not a RIFF container")
    b.getInt // declared RIFF size (trust the actual buffer instead)
    require(ascii4() == "WAVE", "RIFF is not WAVE")
    var rate = -1; var ch = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (b.remaining() >= 8) {
      val id = ascii4()
      val len = b.getInt
      require(len >= 0 && b.remaining() >= len, s"truncated chunk $id")
      val next = b.position() + len + (len & 1) // chunks pad to even
      id match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          val fmt = b.getShort()
          require(fmt == 1, s"not PCM (format $fmt)")
          ch = b.getShort()
          rate = b.getInt()
          b.getInt(); b.getShort() // byte rate, block align (derived)
          bits = b.getShort()
          require(bits == 8 || bits == 16, s"unsupported bit depth $bits")
        case "data" =>
          dataOff = b.position(); dataLen = len
        case _ => // LIST, fact, cue … — skip
      }
      b.position(math.min(next, bytes.length))
    }
    require(rate > 0 && ch > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    (rate, ch, bits, dataOff, dataLen)
  }

  /** Binary media table derived from `documents`: real PNG bytes for the
    * image modality, real WAV bytes for audio, utf-8 text bytes standing in
    * for video payloads; the modality cycles by doc_id so every type
    * appears. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    val png = udf((docId: Long) => pngFixture(docId))
    val wav = udf((docId: Long) => wavFixture(docId))
    Tables.spread(Tables.documents(spark, sfDir))
      .select(
        col("doc_id"),
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' " +
          "WHEN 1 THEN 'audio' ELSE 'video' END").as("media_type"),
        when(col("doc_id") % 3 === 0, png(col("doc_id")))
          .when(col("doc_id") % 3 === 1, wav(col("doc_id")))
          .otherwise(encode(col("text"), "utf-8")).as("content"))
  }

  /**
   * ==================== STUB — VIDEO ONLY =================================
   * Images are decoded for real via `javax.imageio`; audio is decoded for
   * real via [[decodeWav]] (WAV is a container, no codec needed). A real
   * pipeline would decode video with an ffmpeg-style codec and emit true
   * dimensions/frame counts; no such library exists in this container, so
   * for video the "decode" is a deterministic arithmetic fake over
   * (doc_id, byte length) — stable across engines, which lets the DuckDB
   * oracle check the surrounding plumbing.
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
        } else if (r.media_type == "audio") {
          val (rate, ch, bits, dataOff, dataLen) = decodeWav(r.content)
          val pcm = java.util.Arrays.copyOfRange(r.content, dataOff, dataOff + dataLen)
          val nSamples = dataLen / (ch * (bits / 8))
          // width/height stay 0 (no raster); n_frames = PCM frames per
          // channel — rate itself is surfaced by extractAudio's typed row
          MediaFeatures(r.doc_id, r.media_type, dataLen, hex16(md.digest(pcm)),
            0, 0, nSamples)
        } else {
          val key = hex16(md.digest(r.content))
          val (w, h, f) = decodeStub(r.doc_id, r.content)
          MediaFeatures(r.doc_id, r.media_type, r.content.length, key, w, h, f)
        }
      }
    }
  }

  /** Audio-typed decode: the full WAV header surfaced as typed columns plus
    * the PCM digest. `duration_ms` is exact integer arithmetic
    * (`n_samples * 1000 div sample_rate`) — no IEEE division, so the DuckDB
    * oracle reproduces it bit-for-bit. */
  def extractAudio(media: DataFrame): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "audio").as[MediaRecord].mapPartitions { records =>
      val md = MessageDigest.getInstance("MD5")
      records.map { r =>
        md.reset()
        val (rate, ch, bits, dataOff, dataLen) = decodeWav(r.content)
        val pcm = java.util.Arrays.copyOfRange(r.content, dataOff, dataOff + dataLen)
        val nSamples = (dataLen / (ch * (bits / 8))).toLong
        AudioFeatures(r.doc_id, rate, ch, bits, nSamples,
          nSamples * 1000L / rate, hex16(md.digest(pcm)))
      }
    }
  }
}
