package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImageHashSpec extends SparkSpec {

  import spark.implicits._

  /** Reference dHash straight from the closed form — no decode involved. */
  private def referenceBands(p: ImageHash.GradParams): Array[Int] = {
    val s = Array.tabulate(9, 8) { (gx, gy) =>
      ImageHash.luminance(p, gx * p.w / 9, gy * p.h / 8)
    }
    val bands = new Array[Int](4)
    for (gy <- 0 until 8; gx <- 0 until 8)
      if (s(gx + 1)(gy) > s(gx)(gy)) bands(gy / 2) |= 1 << ((gy % 2) * 8 + gx)
    bands
  }

  private def pngOf(p: ImageHash.GradParams): Array[Byte] = {
    val img = new BufferedImage(p.w, p.h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until p.h; x <- 0 until p.w) {
      val l = ImageHash.luminance(p, x, y)
      img.setRGB(x, y, (l << 16) | (l << 8) | l)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decoded dHash == closed-form dHash for every fixture doc") {
    val ids = (0L until 300L).toSeq
    val decoded = ImageHash
      .dhash(ids.map(id => (id, ImageHash.gradPngFixture(id))).toDF("doc_id", "content"))
      .collect()
      .map(r => r.doc_id -> Seq(r.b0, r.b1, r.b2, r.b3))
      .toMap
    ids.foreach { id =>
      val exp = referenceBands(ImageHash.gradParams(id)).toSeq
      assert(decoded(id) == exp, s"doc $id decode/closed-form divergence")
    }
  }

  test("banded pair search == exact quadratic hamming-3 ball") {
    val hashes = ImageHash.dhash(
      (0L until 400L).map(id => (id, ImageHash.gradPngFixture(id)))
        .toDF("doc_id", "content"))
    val banded = ImageHash.nearDupPairs(hashes, maxHamming = 3)
    val df = hashes.toDF()
    val x = df.alias("x"); val y = df.alias("y")
    def ham = (0 to 3).map(k =>
      bit_count(col(s"x.b$k").bitwiseXOR(col(s"y.b$k")))).reduce(_ + _)
    val quadratic = x.join(y, col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        ham.cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
    assert(banded.exceptAll(quadratic).isEmpty
      && quadratic.exceptAll(banded).isEmpty)
    assert(banded.count() > 0)
  }

  test("variant corner spike perturbs at most one bit") {
    for (id <- Seq(0L, 5L, 12L, 40L, 101L)) {
      val base = ImageHash.gradParams(id).copy(variant = false)
      val spiked = base.copy(variant = true)
      val d = referenceBands(base).zip(referenceBands(spiked))
        .map { case (a, b) => Integer.bitCount(a ^ b) }.sum
      assert(d <= 1, s"doc $id: spike flipped $d bits")
    }
  }

  test("the decode is load-bearing: corrupted payload fails fast") {
    val bad = Seq((1L, Array.fill[Byte](32)(7))).toDF("doc_id", "content")
    val e = intercept[org.apache.spark.SparkException] {
      ImageHash.dhash(bad).collect()
    }
    assert(e.getMessage != null)
  }

  test("pair search plans as an equi-join, never cartesian") {
    val hashes = ImageHash.dhash(
      (0L until 50L).map(id => (id, ImageHash.gradPngFixture(id)))
        .toDF("doc_id", "content"))
    val plan = ImageHash.nearDupPairs(hashes, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"), plan)
  }

  test("maxHamming above the banding guarantee is rejected") {
    val hashes = ImageHash.dhash(
      Seq((1L, ImageHash.gradPngFixture(1L))).toDF("doc_id", "content"))
    intercept[IllegalArgumentException] {
      ImageHash.nearDupPairs(hashes, maxHamming = 4)
    }
    intercept[IllegalArgumentException] {
      ImageHash.nearDupStarDf(hashes.toDF(), maxHamming = 4)
    }
  }

  test("star cover: subset of full pairs, linear candidate budget, covers buckets") {
    val hashes = ImageHash.dhash(
      (0L until 300L).map(id => (id, ImageHash.gradPngFixture(id)))
        .toDF("doc_id", "content")).toDF()
    val full = ImageHash.nearDupPairsDf(hashes, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val star = ImageHash.nearDupStarDf(hashes, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(star.nonEmpty)
    // every star edge is a TRUE confirmed pair (same hamming as the full set)
    assert(star.subsetOf(full), s"star emitted non-pairs: ${star.diff(full).take(3)}")
    // linear output bound: at most 4 edges per non-canonical doc
    assert(star.size <= 4 * 300)
    // canonical is always the smaller id (min of its bucket)
    star.foreach { case (a, b, _) => assert(a < b) }
    // coverage: every doc sharing a band bucket with a lower doc within
    // hamming 3 of that bucket's canonical appears as some star doc_b —
    // spot-check via the full set: any doc whose full-set partner IS a
    // bucket canonical must be covered. (Full transitive clustering is the
    // components pass's job, as in the text family.)
    val canonicals = star.map(_._1)
    val coveredB = star.map(_._2)
    val fullPartnersOfCanon = full.collect {
      case (a, b, _) if canonicals.contains(a) => b }
    // weak-but-real invariant: star covers a non-trivial share of those
    assert(coveredB.intersect(fullPartnersOfCanon).size * 10 >=
      fullPartnersOfCanon.size,
      "star cover lost >90% of the canonical-adjacent pairs")
  }

  test("PNG round-trip: spec-built PNG and fixture PNG decode identically") {
    for (id <- Seq(3L, 77L, 200L)) {
      val viaFixture = ImageHash.gradPngFixture(id)
      val viaSpec = pngOf(ImageHash.gradParams(id))
      assert(java.util.Arrays.equals(viaFixture, viaSpec))
    }
  }
}
