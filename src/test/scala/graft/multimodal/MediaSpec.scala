package graft.multimodal

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

  test("extractFeatures round-trips bytes and stub-decodes deterministically") {
    val feats = Media.extractFeatures(Media.mediaTable(spark, sf001))
    val docs = graft.lake.Tables.documents(spark, sf001)
    assert(feats.count() == docs.count())
    // n_bytes == utf-8 length of the source text (payload intact end-to-end)
    val joined = feats.toDF().join(docs, "doc_id")
      .filter(col("n_bytes") =!= length(encode(col("text"), "utf-8")))
    assert(joined.isEmpty)
    // deterministic: same input -> same features
    val twice = Media.extractFeatures(Media.mediaTable(spark, sf001))
    assert(feats.toDF().exceptAll(twice.toDF()).isEmpty)
    // stub ranges hold
    val bad = feats.filter(f =>
      f.width < 320 || f.width >= 1920 || f.height < 240 || f.height >= 1080 ||
        f.n_frames < 1 || f.n_frames > 24 || f.content_key.length != 16)
    assert(bad.isEmpty)
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
