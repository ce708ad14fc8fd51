package graft.multimodal

import java.io.ByteArrayInputStream
import java.security.MessageDigest

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

import graft.SparkSpec

class MediaSpec extends SparkSpec {

  import spark.implicits._

  test("mediaTable carries an opaque binary payload with typed metadata") {
    val m = Media.mediaTable(spark, sf001)
    val sch = m.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(sch("content") == BinaryType)
    assert(sch("doc_id") == LongType && sch("media_type") == StringType)
    assert(m.select("media_type").distinct().as[String].collect().sorted
      .sameElements(Array("audio", "image", "video")))
  }

  test("image payloads are real PNGs; ImageIO decode recovers generated dims and pixels") {
    // direct fixture round-trip: encode -> decode recovers exactly the closed forms
    for (docId <- Seq(0L, 3L, 6L, 9L, 42L, 123L)) {
      val bytes = Media.pngFixture(docId)
      assert(bytes.take(4).sameElements(Array[Byte](0x89.toByte, 'P', 'N', 'G')),
        s"doc $docId payload is not a PNG")
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img.getWidth == Media.imgWidth(docId))
      assert(img.getHeight == Media.imgHeight(docId))
      val (r, g, b) = Media.imgRgb(docId)
      val p = img.getRGB(img.getWidth - 1, img.getHeight - 1)
      assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) == ((r, g, b)),
        s"doc $docId decoded fill color mismatch")
    }
    // through the distributed pipeline: decoded dims == generator closed forms
    val feats = Media.extractFeatures(Media.mediaTable(spark, sf001))
      .filter(_.media_type == "image")
    val badDims = feats.filter(f =>
      f.width != Media.imgWidth(f.doc_id) || f.height != Media.imgHeight(f.doc_id) ||
        f.n_frames != 1 || f.n_bytes != f.width * f.height * 3)
    assert(badDims.isEmpty, badDims.collect().take(3).mkString(", "))
    // content_key hashes the decoded raster: recompute expected md5 locally
    val md = MessageDigest.getInstance("MD5")
    val badKey = feats.collect().filter { f =>
      val (r, g, b) = Media.imgRgb(f.doc_id)
      val raster = Array.fill(Media.imgWidth(f.doc_id) * Media.imgHeight(f.doc_id))(
        Array(r.toByte, g.toByte, b.toByte)).flatten
      md.reset()
      val expect = md.digest(raster).take(8).map(x => f"${x & 0xff}%02x").mkString
      f.content_key != expect
    }
    assert(badKey.isEmpty, badKey.take(3).mkString(", "))
  }

  test("audio payloads are real WAVs; decodeWav recovers the closed-form header") {
    for (docId <- Seq(1L, 4L, 7L, 10L, 43L, 124L)) {
      val bytes = Media.wavFixture(docId)
      assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
      assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
      val (rate, ch, bits, dataOff, dataLen) = Media.decodeWav(bytes)
      assert(rate == Media.wavSampleRate(docId))
      assert(ch == Media.wavChannels(docId))
      assert(bits == 8)
      assert(dataLen == Media.wavSamples(docId) * ch)
      assert(dataOff + dataLen == bytes.length)
      assert(bytes(dataOff) == Media.wavFill(docId).toByte)
    }
    // through the distributed pipeline: typed audio rows match closed forms
    val rows = Media.extractAudio(Media.mediaTable(spark, sf001)).collect()
    assert(rows.nonEmpty)
    rows.foreach { a =>
      assert(a.sample_rate == Media.wavSampleRate(a.doc_id))
      assert(a.channels == Media.wavChannels(a.doc_id))
      assert(a.n_samples == Media.wavSamples(a.doc_id))
      assert(a.duration_ms == a.n_samples * 1000L / a.sample_rate)
    }
  }

  test("decodeWav walks unknown chunks and fails fast on junk") {
    // splice a LIST chunk (odd length -> exercises even padding) before data
    val canonical = Media.wavFixture(7L)
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = canonical.take(12) ++ junk ++ canonical.drop(12)
    val patched = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8).array()
    val (rate, ch, bits, _, dataLen) = Media.decodeWav(patched)
    assert((rate, ch, bits) ==
      ((Media.wavSampleRate(7L), Media.wavChannels(7L), 8)))
    assert(dataLen == Media.wavSamples(7L) * ch)
    // garbage and truncation raise instead of fabricating metadata
    intercept[IllegalArgumentException](Media.decodeWav("not a wav at all".getBytes))
    intercept[IllegalArgumentException](Media.decodeWav(canonical.take(30)))
  }

  test("video payloads are real AVI containers; decodeAvi recovers the header") {
    for (docId <- Seq(2L, 5L, 101L)) {
      val bytes = Media.aviFixture(docId)
      val (w, h, nf, uspf, payload) = Media.decodeAvi(bytes)
      assert(w == Media.aviWidth(docId) && h == Media.aviHeight(docId))
      assert(nf == Media.aviFrames(docId) && uspf == 33333)
      assert(payload.length == nf * Media.aviFrameLen(docId))
      assert(payload.forall(_ == Media.aviFill(docId).toByte))
    }
    // garbage, truncation, and header/frame inconsistency raise instead of
    // fabricating metadata
    intercept[IllegalArgumentException](Media.decodeAvi("not an avi".getBytes))
    intercept[IllegalArgumentException](Media.decodeAvi(Media.aviFixture(2L).take(40)))
    intercept[IllegalArgumentException](Media.decodeAvi(Media.wavFixture(1L)))
    // patch avih to declare one MORE frame than movi carries: the
    // cross-check must reject the inconsistent container
    val fx = Media.aviFixture(5L)
    val patched = java.nio.ByteBuffer.wrap(fx.clone())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(48, Media.aviFrames(5L) + 1).array() // offset 48 = dwTotalFrames
    val e = intercept[IllegalArgumentException](Media.decodeAvi(patched))
    assert(e.getMessage.contains("declares"))
  }

  test("interleaved audio ('01wb') chunks don't count against video frames") {
    // splice an audio chunk into movi: a standards-conforming AVI with an
    // audio stream must still decode, with the audio bytes excluded from
    // the frame count AND the frame-payload digest
    val fx = Media.aviFixture(2L)
    val audio = "01wb".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ Array[Byte](9, 9, 9, 9)
    // append inside movi (the LAST list): grow the movi LIST size and the
    // RIFF size so the spliced chunk is within both declared extents
    val out = java.nio.ByteBuffer
      .allocate(fx.length + audio.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(fx).put(audio).array()
    val moviSizeOff = 12 + 8 + (4 + 8 + 56) + 4 // RIFF hdr + hdrl LIST + 'LIST'
    java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, out.length - 8) // RIFF size
      .putInt(moviSizeOff,
        java.nio.ByteBuffer.wrap(fx).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .getInt(moviSizeOff) + audio.length)
    val (w, h, nf, uspf, payload) = Media.decodeAvi(out)
    assert(w == Media.aviWidth(2L) && h == Media.aviHeight(2L))
    assert(nf == Media.aviFrames(2L) && uspf == 33333)
    assert(payload.length == nf * Media.aviFrameLen(2L))
    assert(payload.forall(_ == Media.aviFill(2L).toByte), "audio leaked into digest input")
  }

  test("extractFeatures round-trips bytes and decodes deterministically") {
    val feats = Media.extractFeatures(Media.mediaTable(spark, sf001))
    val docs = graft.lake.Tables.documents(spark, sf001)
    assert(feats.count() == docs.count())
    // video: n_bytes == total movi frame payload (container framing excluded)
    val badVidBytes = feats.filter(f => f.media_type == "video" &&
      f.n_bytes != Media.aviFrames(f.doc_id) * Media.aviFrameLen(f.doc_id))
    assert(badVidBytes.isEmpty)
    // deterministic: same input -> same features (PNG/WAV encode+decode included)
    val twice = Media.extractFeatures(Media.mediaTable(spark, sf001))
    assert(feats.toDF().exceptAll(twice.toDF()).isEmpty)
    // ranges hold per modality
    val badVid = feats.filter(f => f.media_type == "video" && (
      f.width != Media.aviWidth(f.doc_id) ||
        f.height != Media.aviHeight(f.doc_id) ||
        f.n_frames != Media.aviFrames(f.doc_id) ||
        f.content_key.length != 16))
    assert(badVid.isEmpty)
    // audio: no raster; n_frames is the decoded PCM frame count
    val badAud = feats.filter(f => f.media_type == "audio" && (
      f.width != 0 || f.height != 0 ||
        f.n_frames != Media.wavSamples(f.doc_id) ||
        f.n_bytes != f.n_frames * Media.wavChannels(f.doc_id) ||
        f.content_key.length != 16))
    assert(badAud.isEmpty)
    val badImg = feats.filter(f => f.media_type == "image" && (
      f.width < 8 || f.width > 31 || f.height < 6 || f.height > 22 ||
        f.n_frames != 1 || f.content_key.length != 16))
    assert(badImg.isEmpty)
  }

  test("resizePlan fits within the box preserving aspect; never upscales") {
    // raster modalities only — audio rows carry no dimensions
    val feats = Media.extractFeatures(Media.mediaTable(spark, sf001))
      .filter(_.media_type != "audio")
    val plan = Media.resizePlan(feats, maxW = 512, maxH = 256)
    val bad = plan.filter(
      col("out_width") > 512 || col("out_height") > 256 ||
        col("out_width") > col("src_width") ||
        col("out_height") > col("src_height") ||
        // aspect preserved within floor rounding: w/h ratios agree to 1%
        abs(col("out_width") / col("out_height")
          - col("src_width") / col("src_height"))
          > lit(0.02) * (col("src_width") / col("src_height")))
    assert(bad.isEmpty, bad.collect().take(3).mkString(", "))
  }

  test("sampleFrames fans out every Nth frame of videos only") {
    val feats = Media.extractFeatures(Media.mediaTable(spark, sf001))
    val frames = Media.sampleFrames(feats, everyNth = 5)
    val videos = feats.filter(_.media_type == "video")
    val expected = videos.collect().map(v => (v.n_frames + 4) / 5).sum
    assert(frames.count() == expected)
    assert(frames.filter(col("frame_idx") % 5 =!= 0).isEmpty)
    assert(frames.select("doc_id").distinct().count() == videos.count())
  }
}
