package graft.catalog

import org.apache.spark.sql.functions._

import graft.multimodal.{Media => MM}

/**
 * Multimodal-column queries: binary payload + typed-metadata extraction
 * (graft.multimodal.Media). The catalog entry runs the REAL typed
 * mapPartitions pipeline — Dataset[MediaRecord] -> decode ->
 * Dataset[MediaFeatures]. Image rows carry genuine PNG payloads decoded
 * with `javax.imageio`; their fixture dims/fill color are closed-form in
 * doc_id (Media.imgWidth/imgHeight/imgRgb), so the oracle below recomputes
 * the md5 of the expected decoded raster with repeat(chr(r)||chr(g)||chr(b))
 * — the DECODE ITSELF is hash-checked, not just the plumbing. Audio/video
 * rows keep the declared arithmetic stub (no codecs in this container).
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
        SELECT doc_id,
          CASE CAST(doc_id % 3 AS INTEGER) WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
          CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
          substr(md5(text), 1, 16) AS content_key,
          CAST(320 + (doc_id * 31 + octet_length(encode(text))) % 1600 AS INTEGER) AS width,
          CAST(240 + (doc_id * 17 + octet_length(encode(text))) % 840 AS INTEGER) AS height,
          CAST(1 + octet_length(encode(text)) % 24 AS INTEGER) AS n_frames
        FROM documents WHERE doc_id % 3 <> 0
      ) ORDER BY doc_id
    """)) { (spark, dir) =>
    MM.extractFeatures(MM.mediaTable(spark, dir))
      .toDF()
      .orderBy(col("doc_id"))
  }

  override val specs: Seq[Q] = Seq(metaExtract)
}
