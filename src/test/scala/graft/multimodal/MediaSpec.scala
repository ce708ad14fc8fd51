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

  test("extractFeatures round-trips bytes and decodes deterministically") {
    val feats = Media.extractFeatures(Media.mediaTable(spark, sf001))
    val docs = graft.lake.Tables.documents(spark, sf001)
    assert(feats.count() == docs.count())
    // audio/video: n_bytes == utf-8 length of the source text (payload intact)
    val joined = feats.toDF().filter(col("media_type") =!= "image").join(docs, "doc_id")
      .filter(col("n_bytes") =!= length(encode(col("text"), "utf-8")))
    assert(joined.isEmpty)
    // deterministic: same input -> same features (PNG encode+decode included)
    val twice = Media.extractFeatures(Media.mediaTable(spark, sf001))
    assert(feats.toDF().exceptAll(twice.toDF()).isEmpty)
    // ranges hold per modality
    val badAv = feats.filter(f => f.media_type != "image" && (
      f.width < 320 || f.width >= 1920 || f.height < 240 || f.height >= 1080 ||
        f.n_frames < 1 || f.n_frames > 24 || f.content_key.length != 16))
    assert(badAv.isEmpty)
    val badImg = feats.filter(f => f.media_type == "image" && (
      f.width < 8 || f.width > 31 || f.height < 6 || f.height > 22 ||
        f.n_frames != 1 || f.content_key.length != 16))
    assert(badImg.isEmpty)
  }

  test("resizePlan fits within the box preserving aspect; never upscales") {
    val feats = Media.extractFeatures(Media.mediaTable(spark, sf001))
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
