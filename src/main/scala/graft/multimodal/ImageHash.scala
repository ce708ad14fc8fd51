package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.Tables

/** One 64-bit dHash split into four 16-bit bands — the banding IS the
  * storage layout: near-dup candidate pairs form on band equality
  * (pigeonhole: hamming <= 3 over 4 bands leaves one band intact), so the
  * pair search never goes all-pairs. Band k covers grid rows 2k..2k+1. */
final case class DhashRow(
    doc_id: Long, width: Int, height: Int, b0: Int, b1: Int, b2: Int, b3: Int)

/**
 * Image perceptual near-dup: difference hash (dHash) over really-decoded
 * PNG rasters, plus banded Hamming-ball pair detection.
 *
 * dHash variant pinned here: sample the decoded grayscale on a 9x8 grid by
 * nearest-neighbor (`sx = gx*w div 9`, `sy = gy*h div 8` — exact integer
 * downsample, no box-filter rounding to re-derive cross-engine), then
 * bit(gx,gy) = 1 iff sample(gx+1,gy) > sample(gx,gy) for gx in 0..7. 64
 * bits total, stored as four 16-bit bands (no sign-bit traps in either
 * engine's BIGINT).
 *
 * Fixtures are quadratic-gradient PNGs whose pixels are a closed form of
 * (doc_id, x, y) — docs sharing a motif (doc_id mod 97) differ only in a
 * small brightness offset and an optional corner spike, so the corpus has
 * genuine near-dup structure (hamming 0-3 within motif, far across motifs)
 * and the DuckDB oracle can recompute every sample, bit, and band exactly.
 * PNG is lossless: decoding recovers exactly the authored pixels, so the
 * hash sits on a REAL `javax.imageio` decode, not on the closed form.
 */
object ImageHash {

  // ImageIO defaults to a DISK-backed stream cache: every encode/decode
  // creates+deletes a temp file, which serializes across threads and makes
  // per-row codec work /tmp-latency-bound (observed: image sweep cells
  // varying 4x run-to-run purely on temp-dir pressure). All payloads here
  // are small in-memory byte arrays — cache in heap instead. Object-init
  // runs in every JVM that touches these kernels (driver and executors
  // alike, since the closures reference this object).
  ImageIO.setUseCache(false)

  /** Closed-form fixture parameters, shared verbatim with the DuckDB
    * oracle in `graft.catalog.MediaCatalog`. Dims come from the MOTIF
    * (same-motif docs share geometry); brightness offset `c` and the
    * variant corner spike come from the doc, creating hamming-0..3
    * neighbors within a motif. */
  final case class GradParams(
      m: Long, a: Int, b: Int, d: Int, c: Int, w: Int, h: Int, variant: Boolean)

  def gradParams(docId: Long): GradParams = {
    val m = docId % 97
    GradParams(
      m = m,
      a = (1 + m % 13).toInt,
      b = (1 + m % 11).toInt,
      d = (m % 7).toInt,
      c = (docId % 4).toInt,
      w = (16 + m % 17).toInt,
      h = (12 + m % 13).toInt,
      variant = docId % 2 == 1)
  }

  /** The authored luminance at pixel (x, y) — quadratic in both axes so
    * mod-256 wraps scatter the comparison bits across motifs (a plain
    * linear ramp saturates dHash to near-constant hashes). The corner
    * spike covers exactly the grid's (gx=8, gy=7) sample region, so a
    * variant doc differs from its base in at most the last bit per band
    * boundary — the controlled 1-bit perturbation. */
  def luminance(p: GradParams, x: Int, y: Int): Int = {
    val spike =
      if (p.variant && x >= (8 * p.w) / 9 && y >= (7 * p.h) / 8) 100 else 0
    (p.a * x * x + p.b * y * y + p.d * x * y + p.c + spike) % 256
  }

  /** Deterministic grayscale PNG fixture (r=g=b=luminance). */
  def gradPngFixture(docId: Long): Array[Byte] = {
    val p = gradParams(docId)
    val img = new BufferedImage(p.w, p.h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < p.h) {
      var x = 0
      while (x < p.w) {
        val l = luminance(p, x, y)
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The image corpus: every document gets a gradient PNG payload. */
  def corpus(spark: SparkSession, sfDir: String): DataFrame = {
    val png = udf((docId: Long) => gradPngFixture(docId))
    Tables.spread(Tables.documents(spark, sfDir))
      .select(col("doc_id"), png(col("doc_id")).as("content"))
  }

  /** Decode each PNG for real and compute its banded dHash. mapPartitions
    * typed kernel (justified: byte-level codec work), one decoder context
    * per partition. */
  def dhash(images: DataFrame): Dataset[DhashRow] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (docId, bytes) =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          require(img != null, s"undecodable image payload for doc_id=$docId")
          val w = img.getWidth; val h = img.getHeight
          // nearest-neighbor 9x8 sample of the decoded grayscale
          val s = Array.ofDim[Int](9, 8)
          var gx = 0
          while (gx < 9) {
            var gy = 0
            while (gy < 8) {
              val sx = gx * w / 9; val sy = gy * h / 8
              s(gx)(gy) = img.getRGB(sx, sy) & 0xff // r=g=b: blue channel
              gy += 1
            }
            gx += 1
          }
          val bands = new Array[Int](4)
          var gy = 0
          while (gy < 8) {
            var g = 0
            while (g < 8) {
              if (s(g + 1)(gy) > s(g)(gy))
                bands(gy / 2) |= 1 << ((gy % 2) * 8 + g)
              g += 1
            }
            gy += 1
          }
          DhashRow(docId, w, h, bands(0), bands(1), bands(2), bands(3))
        }
      }
  }

  /** All pairs within hamming distance `maxHamming` (must be <= 3 for the
    * 4-band pigeonhole to be exact): candidates form on (band index, band
    * value) equality — one equi-join shuffle, never all-pairs — then the
    * exact 64-bit hamming confirms. Output: (doc_a, doc_b, hamming). */
  def nearDupPairs(hashes: Dataset[DhashRow], maxHamming: Int): DataFrame =
    nearDupPairsDf(hashes.toDF(), maxHamming)

  /** DataFrame variant of [[nearDupPairs]] (the shape the warmed shared
    * spine serves — see graft.catalog.MediaCatalog.dhashShared). */
  def nearDupPairsDf(df: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4x16 banding is exact only for hamming <= 3")
    val banded = bandedOf(df)
    val x = banded.alias("x")
    val y = banded.alias("y")
    def ham(k: Int): org.apache.spark.sql.Column =
      bit_count(col(s"x.b$k").bitwiseXOR(col(s"y.b$k")))
    x.join(y,
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        (ham(0) + ham(1) + ham(2) + ham(3)).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /**
   * Linear-output production dial for image near-dup at scale: a STAR COVER
   * instead of all confirmed pairs. Per (band, bucket-value) bucket the
   * member with the minimum doc_id is canonical, and every other member is
   * confirmed against THAT doc only — so candidates are bounded by 4 per
   * document (one per band), O(n) total, no matter how large the near-dup
   * clusters grow. [[nearDupPairs]] enumerates the full pair set, whose
   * SIZE is inherently quadratic in cluster width (the plan is
   * candidate-bounded but the OUTPUT isn't — SCALE.md's
   * `dedup_image_dhash_pairs` 16x cell shows exactly that); production
   * dedup wants (canonical, member) edges to group and pick survivors,
   * which is this shape. Every emitted edge is a true hamming<=maxHamming
   * pair and every doc sharing a bucket with its canonical is covered —
   * the same guarantee class as the text LSH cluster path
   * (`dedup_cluster_canonical`).
   */
  def nearDupStarDf(df: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4x16 banding is exact only for hamming <= 3")
    val banded = bandedOf(df)
    // bucket canonical via a window min: one shuffle on (band, v), no
    // self-join of the banded frame
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "v")
    val cand = banded
      .withColumn("canon_id", min(col("doc_id")).over(w))
      .filter(col("canon_id") < col("doc_id"))
      .select(col("canon_id").as("doc_a"), col("doc_id").as("doc_b"),
        col("b0").as("y0"), col("b1").as("y1"), col("b2").as("y2"),
        col("b3").as("y3"))
      .distinct()
    // fetch the canonical's bands: one equi-join against the hash table
    // (vocabulary-sized at worst — never wider than the corpus)
    val canonSide = df.select(col("doc_id").as("doc_a"), col("b0").as("x0"),
      col("b1").as("x1"), col("b2").as("x2"), col("b3").as("x3"))
    def ham(k: Int): org.apache.spark.sql.Column =
      bit_count(col(s"x$k").bitwiseXOR(col(s"y$k")))
    cand.join(canonSide, "doc_a")
      .select(col("doc_a"), col("doc_b"),
        (ham(0) + ham(1) + ham(2) + ham(3)).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  private def bandedOf(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("b0"), col("b1"), col("b2"),
      col("b3"), posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band", "v")))
}
