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
  * For video they come from a REAL RIFF/AVI container parse
  * ([[Media.decodeAvi]]): `width`/`height`/`n_frames` are the `avih` main
  * header fields (cross-checked against the frames actually present in
  * `movi`), and `n_bytes`/`content_key` cover the concatenated frame
  * payloads — the bytes a codec stage would consume. */
final case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Int, content_key: String,
    width: Int, height: Int, n_frames: Int)

/** Decoded audio header + payload digest from a real WAV (RIFF/PCM) parse. */
final case class AudioFeatures(
    doc_id: Long, sample_rate: Int, channels: Int, bits_per_sample: Int,
    n_samples: Long, duration_ms: Long, pcm_key: String)

/** Decoded video container header + frame-payload digest from a real
  * RIFF/AVI parse. `duration_ms` is exact integer arithmetic
  * (`n_frames * us_per_frame div 1000`) — no IEEE division. */
final case class VideoFeatures(
    doc_id: Long, width: Int, height: Int, n_frames: Int, us_per_frame: Int,
    duration_ms: Long, frames_key: String)

/**
 * Multimodal column plumbing over the lake: schema, partition-friendly
 * batch shape, and distributed feature extraction.
 *
 * The Scala analog of PySpark's `mapInPandas` decode pipeline is
 * `Dataset.mapPartitions` with case-class encoders: one iterator per
 * partition, so codec/digest initialization amortizes per partition.
 * The image modality is decoded FOR REAL with the JDK's `javax.imageio`
 * PNG codec; audio is a REAL RIFF/WAVE parse; video is a REAL RIFF/AVI
 * container parse (header fields + frame-chunk walk — only frame PIXEL
 * decode would need an ffmpeg-style codec, which this container doesn't
 * ship). All payloads are deterministic fixtures whose fields are
 * closed-form functions of `doc_id`, so the DuckDB oracle recomputes the
 * expected decoded buffers and every decode sits under the hash gate.
 */
object Media {

  // In-memory stream cache: ImageIO's default disk-backed cache turns every
  // per-row encode/decode into temp-file I/O (see graft.multimodal.ImageHash
  // for the measured effect). Runs at object init in every JVM that uses
  // these kernels.
  ImageIO.setUseCache(false)

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

  /** Closed-form AVI fixture parameters, shared verbatim with the DuckDB
    * oracle in `graft.catalog.MediaCatalog` (same discipline as the WAV
    * fixture: printable-ASCII constant-fill frame payloads so DuckDB can
    * md5 the identical buffer with `repeat(chr(fill), n)`). */
  def aviWidth(docId: Long): Int = (320 + (docId * 31) % 1600).toInt
  def aviHeight(docId: Long): Int = (240 + (docId * 17) % 840).toInt
  def aviFrames(docId: Long): Int = (1 + docId % 24).toInt
  def aviFrameLen(docId: Long): Int = (50 + docId % 100).toInt
  def aviFill(docId: Long): Int = (32 + (docId * 37) % 95).toInt

  /** Deterministic AVI fixture: RIFF 'AVI ' → LIST 'hdrl' holding the
    * canonical 56-byte `avih` main header (µs/frame, total frames, stream
    * count, width, height) → LIST 'movi' with `aviFrames` constant-fill
    * '00dc' frame chunks (odd lengths padded to even per RIFF). AVI is a
    * container — the header and frame walk are plain byte work; only the
    * frame CONTENT would need a codec, and the fixture's "frames" are
    * opaque fill the digest checks verbatim. */
  def aviFixture(docId: Long): Array[Byte] = {
    val w = aviWidth(docId); val h = aviHeight(docId)
    val nf = aviFrames(docId); val fl = aviFrameLen(docId)
    val pad = fl & 1
    val avihLen = 56
    val hdrlLen = 4 + 8 + avihLen                // 'hdrl' + avih chunk
    val moviLen = 4 + nf * (8 + fl + pad)        // 'movi' + frame chunks
    val riffLen = 4 + 8 + hdrlLen + 8 + moviLen  // 'AVI ' + both LISTs
    val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("AVI ".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII")).putInt(hdrlLen)
      .put("hdrl".getBytes("US-ASCII"))
    buf.put("avih".getBytes("US-ASCII")).putInt(avihLen)
      .putInt(33333)       // dwMicroSecPerFrame (~30 fps)
      .putInt(0)           // dwMaxBytesPerSec
      .putInt(0)           // dwPaddingGranularity
      .putInt(0)           // dwFlags
      .putInt(nf)          // dwTotalFrames
      .putInt(0)           // dwInitialFrames
      .putInt(1)           // dwStreams
      .putInt(0)           // dwSuggestedBufferSize
      .putInt(w)           // dwWidth
      .putInt(h)           // dwHeight
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved
    buf.put("LIST".getBytes("US-ASCII")).putInt(moviLen)
      .put("movi".getBytes("US-ASCII"))
    val fill = aviFill(docId).toByte
    var f = 0
    while (f < nf) {
      buf.put("00dc".getBytes("US-ASCII")).putInt(fl)
      var i = 0
      while (i < fl) { buf.put(fill); i += 1 }
      if (pad == 1) buf.put(0.toByte)
      f += 1
    }
    buf.array()
  }

  /** REAL RIFF/AVI container parse: validates the RIFF/'AVI ' magic, walks
    * the LIST tree to the `avih` main header (width, height, total frames),
    * then walks LIST 'movi' collecting every frame chunk's payload bytes
    * ('??dc'/'??db'/'??wb', skipping RIFF even-padding). The frame count
    * declared by `avih` must match the frames actually present — a
    * truncated or inconsistent container raises instead of fabricating
    * metadata (same fail-fast contract as [[decodeWav]]). Frame PIXEL
    * decode would need a codec this container doesn't ship; the payload
    * digest still pins the exact bytes end-to-end. */
  def decodeAvi(bytes: Array[Byte]): (Int, Int, Int, Int, Array[Byte]) = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii4(): String = {
      val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
    }
    require(bytes.length >= 12 && ascii4() == "RIFF", "not a RIFF container")
    b.getInt // declared RIFF size (trust the actual buffer instead)
    require(ascii4() == "AVI ", "RIFF is not AVI")
    var w = -1; var h = -1; var nf = -1; var usPerFrame = -1
    val frames = new ByteArrayOutputStream()
    var framesSeen = 0
    def walk(end: Int): Unit = {
      while (b.position() + 8 <= end) {
        val id = ascii4()
        val len = b.getInt
        // Long arithmetic: position+len can wrap negative in Int for a
        // crafted len near Int.MaxValue, bypassing the bound check
        require(len >= 0 && b.position().toLong + len <= end, s"truncated chunk $id")
        val next = b.position() + len + (len & 1) // chunks pad to even
        if (id == "LIST") {
          val listType = ascii4()
          if (listType == "hdrl" || listType == "movi")
            walk(b.position() + len - 4)
        } else if (id == "avih") {
          require(len >= 56, "avih header too short")
          usPerFrame = b.getInt()
          b.getInt(); b.getInt(); b.getInt() // bps, padding, flags
          nf = b.getInt()
          b.getInt(); b.getInt(); b.getInt() // initial, streams, bufsize
          w = b.getInt(); h = b.getInt()
        } else if (id.endsWith("dc") || id.endsWith("db")) {
          // VIDEO frame chunks only ('??dc' compressed / '??db' raw);
          // interleaved audio ('??wb') is skipped — counting it against
          // avih's dwTotalFrames (a video-frame count) would reject every
          // standards-conforming container with an audio stream
          val payload = new Array[Byte](len)
          b.get(payload)
          frames.write(payload)
          framesSeen += 1
        }
        b.position(math.min(next, bytes.length))
      }
    }
    walk(bytes.length)
    require(w > 0 && h > 0 && nf >= 0 && usPerFrame > 0, "missing avih header")
    require(framesSeen == nf,
      s"avih declares $nf frames but movi carries $framesSeen")
    (w, h, nf, usPerFrame, frames.toByteArray)
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
    * image modality, real WAV bytes for audio, real AVI container bytes for
    * video; the modality cycles by doc_id so every type appears. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    val png = udf((docId: Long) => pngFixture(docId))
    val wav = udf((docId: Long) => wavFixture(docId))
    val avi = udf((docId: Long) => aviFixture(docId))
    Tables.spread(Tables.documents(spark, sfDir))
      .select(
        col("doc_id"),
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' " +
          "WHEN 1 THEN 'audio' ELSE 'video' END").as("media_type"),
        when(col("doc_id") % 3 === 0, png(col("doc_id")))
          .when(col("doc_id") % 3 === 1, wav(col("doc_id")))
          .otherwise(avi(col("doc_id"))).as("content"))
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
          val (w, h, nf, _, framePayload) = decodeAvi(r.content)
          // n_bytes/content_key cover the FRAME payload (the bytes a codec
          // stage would consume), not the container framing
          MediaFeatures(r.doc_id, r.media_type, framePayload.length,
            hex16(md.digest(framePayload)), w, h, nf)
        }
      }
    }
  }

  /** Video-typed decode: the full AVI main header surfaced as typed columns
    * plus the frame-payload digest. `duration_ms` is exact integer
    * arithmetic (`n_frames * us_per_frame div 1000`) — no IEEE division, so
    * the DuckDB oracle reproduces it bit-for-bit. */
  def extractVideo(media: DataFrame): Dataset[VideoFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "video").as[MediaRecord].mapPartitions { records =>
      val md = MessageDigest.getInstance("MD5")
      records.map { r =>
        md.reset()
        val (w, h, nf, uspf, framePayload) = decodeAvi(r.content)
        VideoFeatures(r.doc_id, w, h, nf, uspf,
          nf.toLong * uspf / 1000L, hex16(md.digest(framePayload)))
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
