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
}
