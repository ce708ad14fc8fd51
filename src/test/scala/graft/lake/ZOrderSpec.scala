package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Z-order clustering ([[ZOrder]]): a box probe over two independent
 * columns admits a small fraction of a z-ordered layout's files where a
 * single-key range layout admits (nearly) all of them; [[ZOrder.readBox]]
 * is always exactly the full scan + filter; the staleness guard degrades
 * to the full scan after DML rewrites files; clustering republish carries
 * the live version's sidecars and markers.
 */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-zorder").toString

  // two deterministic pseudo-random 16-bit columns, independent of the
  // key order (so a key-range layout gives every file a full-span box)
  private val N = 40000L
  private def base: DataFrame =
    spark.range(N).select(
      col("id").as("k"),
      ((col("id") * 48271L) % 65536L).as("x"),
      ((col("id") * 69621L) % 65536L).as("y"))

  private def brute(dir: String, preds: Seq[(String, Long, Long)]) =
    preds.foldLeft(spark.read.parquet(dir)) { case (df, (c, lo, hi)) =>
      df.filter(col(c) >= lo && col(c) <= hi)
    }.select($"k").as[Long].collect().sorted.toSeq

  private def viaBox(dir: String, preds: Seq[(String, Long, Long)]) =
    ZOrder.readBox(spark, dir, preds)
      .select($"k").as[Long].collect().sorted.toSeq

  // a quarter-span box on both columns, and a y-only slab
  private val box = Seq(("x", 49152L, 65535L), ("y", 49152L, 65535L))
  private val slab = Seq(("y", 49152L, 65535L))

  test("a box probe admits few z-ordered files, all of a key-range layout") {
    val t = s"$root/orders_like"
    // key-range layout: 16 files clustered on k; x/y boxes are full-span
    assert(Forget.publishIndexed(base, t, nFiles = 16, keyCol = "k",
      stats = true) == 1L)
    ZOrder.buildBoxStats(spark, s"$t/v=1", Seq("x", "y"))
    val before = ZOrder.admittedBoxCount(spark, s"$t/v=1", box)
    assert(before >= 14, s"key-range layout should admit ~all, got $before")
    assert(viaBox(s"$t/v=1", box) == brute(s"$t/v=1", box))

    // target sized so the ~sub-MB fixture lands in 8+ files
    val v = ZOrder.cluster(spark, t, Seq("x", "y"), keyCol = "k",
      targetBytes = 24 * 1024)
    assert(v == 2L)
    val dir = s"$t/v=$v"
    val files = ZOrder.loadBoxStats(spark, dir).get._2.size
    assert(files >= 8, s"want a multi-file layout to skip over, got $files")
    // the z-ordered layout: a 1/16-volume box admits a small fraction
    val after = ZOrder.admittedBoxCount(spark, dir, box)
    assert(after <= files / 2,
      s"z-order should prune the box probe: $after of $files admitted")
    assert(after < before)
    // a single-column slab (1/4 volume) also prunes — the whole point
    // vs the k-range layout where it admits everything
    assert(ZOrder.admittedBoxCount(spark, dir, slab) <= (3 * files) / 4)
    // and the skipping read is exactly the full scan + filter
    assert(viaBox(dir, box) == brute(dir, box))
    assert(viaBox(dir, slab) == brute(dir, slab))
    // row totals survive the rewrite
    assert(spark.read.parquet(dir).count() == N)
  }

  test("empty box is schema-stable empty; missing column rejects") {
    val t = s"$root/empty_probe"
    Versioned.publish(base, t)
    ZOrder.cluster(spark, t, Seq("x", "y"), keyCol = "k")
    val dir = s"$t/v=${Versioned.currentVersion(spark, t).get}"
    val none = ZOrder.readBox(spark, dir, Seq(("x", 70000L, 80000L)))
    assert(none.columns.toSeq == Seq("k", "x", "y"))
    assert(none.count() == 0)
    val e = intercept[IllegalArgumentException] {
      ZOrder.readBox(spark, dir, Seq(("nope", 0L, 1L)))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("DML after clustering trips the staleness guard, never misses rows") {
    val t = s"$root/stale"
    assert(Forget.publishIndexed(base, t, nFiles = 8, keyCol = "k",
      stats = true) == 1L)
    ZOrder.cluster(spark, t, Seq("x", "y"), keyCol = "k")
    // a merge rewrites some files into v3 WITHOUT maintaining _boxstats
    val changes = Seq((7L, 7L * 48271L % 65536L, 7L * 69621L % 65536L),
      (N + 5L, 123L, 456L)).toDF("k", "x", "y")
    val v3 = Upsert.merge(spark, t, "k", changes)
    val dir3 = s"$t/v=$v3"
    // the new version has no manifest at all -> loud -1 / exception
    assert(ZOrder.admittedBoxCount(spark, dir3, box) == -1)
    intercept[IllegalStateException] { ZOrder.readBox(spark, dir3, box) }
    // rebuilding over the post-DML dir restores exactness
    ZOrder.buildBoxStats(spark, dir3, Seq("x", "y"))
    assert(viaBox(dir3, box) == brute(dir3, box))
    // and a manifest made stale IN PLACE (raw append outside the
    // versioned DML) degrades to the full scan, not to missing rows
    Seq((N + 9L, 50000L, 50000L)).toDF("k", "x", "y")
      .write.mode("append").parquet(dir3)
    val onDisk = spark.read.parquet(dir3).count()
    val parts = new java.io.File(dir3).listFiles()
      .count(f => f.isFile && f.getName.startsWith("part-"))
    assert(ZOrder.admittedBoxCount(spark, dir3, box) == parts)
    assert(viaBox(dir3, box) == brute(dir3, box))
    assert(onDisk == N + 2)
  }

  test("cluster carries sidecars, markers, and the evolved schema") {
    val t = s"$root/carry"
    assert(Forget.publishIndexed(base, t, nFiles = 8, keyCol = "k",
      stats = true) == 1L)
    // evolve (adds `w`), tag a CDC batch, then cluster
    val evolved = Seq((N + 1L, 1L, 2L, 9L)).toDF("k", "x", "y", "w")
    Upsert.applyCdc(spark, t, "k",
      evolved.withColumn("op", lit("I")), batchTag = Some("42"),
      evolveSchema = true)
    val v = ZOrder.cluster(spark, t, Seq("x", "y"), keyCol = "k")
    val dir = s"$t/v=$v"
    // stats manifest rebuilt, cdc tag + schema marker carried
    assert(StatsIndex.exists(spark, dir))
    assert(Upsert.recentBatchTags(spark, t).contains("42"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/_table_schema")))
    val df = Versioned.read(spark, t)
    assert(df.columns.toSeq == Seq("k", "x", "y", "w"))
    assert(df.filter($"k" === (N + 1L)).select($"w").as[Long].head() == 9L)
    assert(df.filter($"w".isNull).count() == N)
    // key-range reads still exact through the z layout
    val got = StatsIndex.readRange(spark, dir, "k", 100L, 200L)
      .select($"k").as[Long].collect().sorted.toSeq
    assert(got == (100L to 200L).toSeq)
  }

  test("zValue interleaves: high bits dominated by every column equally") {
    // 2-col, 4-bit toy: bucket pairs and their Morton codes
    val rows = Seq((0L, 0L), (15L, 0L), (0L, 15L), (15L, 15L), (3L, 5L))
      .toDF("a", "b")
      .select(ZOrder.zValue(Seq(col("a"), col("b")), 4).as("z"))
      .as[Long].collect().toSeq
    // interleave(a,b) with a at even positions, b at odd
    def morton(a: Long, b: Long): Long =
      (0 until 4).map(i => (((a >> i) & 1L) << (2 * i)) |
        (((b >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    assert(rows == Seq(morton(0, 0), morton(15, 0), morton(0, 15),
      morton(15, 15), morton(3, 5)))
  }
}
