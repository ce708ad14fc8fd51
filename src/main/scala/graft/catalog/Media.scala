package graft.catalog

import org.apache.spark.sql.functions._

import graft.multimodal.{Media => MM}

/**
 * Multimodal-column queries: binary payload + typed-metadata extraction
 * (graft.multimodal.Media). The catalog entry runs the REAL typed
 * mapPartitions pipeline — Dataset[MediaRecord] -> decode(stub) ->
 * Dataset[MediaFeatures] — and the oracle recomputes the same metadata
 * arithmetic in SQL, so the whole binary-column plumbing is hash-checked.
 */
object MediaCatalog extends Family {

  private val metaExtract = Q(
    "media_meta_extract",
    Some("""
      SELECT doc_id,
        CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
             WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        substr(md5(text), 1, 16) AS content_key,
        CAST(320 + (doc_id * 31 + octet_length(encode(text))) % 1600 AS INTEGER) AS width,
        CAST(240 + (doc_id * 17 + octet_length(encode(text))) % 840 AS INTEGER) AS height,
        CAST(1 + octet_length(encode(text)) % 24 AS INTEGER) AS n_frames
      FROM documents ORDER BY doc_id
    """)) { (spark, dir) =>
    MM.extractFeatures(MM.mediaTable(spark, dir))
      .toDF()
      .orderBy(col("doc_id"))
  }

  override val specs: Seq[Q] = Seq(metaExtract)
}
