package graft.lake

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/**
 * Manifest stats contract ([[StatsIndex]]): the per-file rows reproduce
 * the files' true key min/max, DML ops consult the manifest instead of
 * footers and maintain it across rewrites (carried files keep their rows),
 * all-NULL-key files are excluded precisely, and absence degrades to the
 * footer path with identical results.
 */
class StatsIndexSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-stats").toString

  test("manifest rows equal the files' true per-file key min/max") {
    val t = s"$root/truth"
    val rows = (0L until 1000L).map(k => (k, s"p-$k")).toDF("k", "v")
    Cluster.writeClustered(rows, t, nFiles = 4,
      org.apache.spark.sql.functions.col("k"))
    StatsIndex.build(spark, t, "k")
    val stats = StatsIndex.load(spark, t).get
    assert(stats.size == 4)
    // brute truth: read each file alone
    stats.foreach { case (name, st) =>
      val f = spark.read.parquet(s"$t/$name").select($"k").as[Long]
        .collect()
      assert(st.kmin.contains(f.min) && st.kmax.contains(f.max))
      assert(st.nonNull == f.length && st.rows == f.length)
    }
    // and the file-skipping answer matches footer truth on range layout:
    // a key inside exactly one file's range admits exactly that file
    assert(stats.values.count(_.admitsAny(Seq(17L))) == 1)
  }

  test("purge uses and maintains the manifest; carried rows ride along") {
    val t = s"$root/purge"
    val rows = (0L until 10000L).map(k => (k, s"p-$k")).toDF("k", "v")
    Forget.publishClustered(rows, t, nFiles = 8, keyCol = "k")
    StatsIndex.build(spark, s"$t/v=1", "k")
    val before = StatsIndex.load(spark, s"$t/v=1").get
    val v2 = Forget.purge(spark, t, "k", Seq(5L, 17L)) // one range file
    assert(v2 == 2L)
    val after = StatsIndex.load(spark, s"$t/v=2").get
    assert(after.size == 8)
    // the 7 carried files kept their EXACT old rows
    val carriedNames = before.keySet.intersect(after.keySet)
    assert(carriedNames.size == 7)
    carriedNames.foreach(n => assert(after(n) == before(n)))
    // the rewritten file's stats reflect the purge (5 and 17 were the
    // low file's keys; its min moved off a purged key if it was the min)
    val rewritten = (after.keySet -- before.keySet).head
    assert(after(rewritten).rows == before.values.map(_.rows).min - 2 ||
      after(rewritten).nonNull > 0)
    // and the data is right
    val df = Versioned.read(spark, t)
    assert(df.count() == 9998L)
    assert(df.filter($"k".isin(5L, 17L)).isEmpty)
  }

  test("merge maintains the manifest across its rewrite") {
    val t = s"$root/merge"
    val rows = (0L until 1000L).map(k => (k, s"p-$k")).toDF("k", "v")
    Forget.publishIndexed(rows, t, nFiles = 4, keyCol = "k")
    StatsIndex.build(spark, s"$t/v=1", "k")
    Upsert.merge(spark, t, "k",
      Seq((7L, "UPDATED"), (5000L, "INSERTED")).toDF("k", "v"))
    val after = StatsIndex.load(spark, s"$t/v=2").get
    // every v=2 part file has a manifest row, including rewritten ones
    val files = new java.io.File(s"$t/v=2").listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(_.getName).toSet
    assert(after.keySet == files)
    // the insert's key is covered by some row's range
    assert(after.values.exists(_.admitsAny(Seq(5000L))))
  }

  test("an all-NULL-key file is excluded precisely, not conservatively") {
    val t = s"$root/nulls"
    // file 1: real keys; file 2: only NULL keys (write separately)
    (0L until 100L).map(k => (Some(k), "x")).toDF("k", "v")
      .coalesce(1).write.parquet(t)
    (0 until 10).map(_ => (None: Option[Long], "y")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(t)
    StatsIndex.build(spark, t, "k")
    val stats = StatsIndex.load(spark, t).get
    assert(stats.size == 2)
    val nullFile = stats.values.find(_.nonNull == 0L).get
    assert(nullFile.kmin.isEmpty && nullFile.rows == 10L)
    assert(!nullFile.admitsAny(Seq(0L, 50L, 99L)))
  }

  test("absence degrades to footers: same purge result without a manifest") {
    val withStats = s"$root/with"
    val without = s"$root/without"
    val rows = (0L until 5000L).map(k => (k, s"p-$k")).toDF("k", "v")
    for (t <- Seq(withStats, without))
      Forget.publishClustered(rows, t, nFiles = 4, keyCol = "k")
    StatsIndex.build(spark, s"$withStats/v=1", "k")
    assert(!StatsIndex.exists(spark, s"$without/v=1"))
    for (t <- Seq(withStats, without)) Forget.purge(spark, t, "k", Seq(42L))
    val a = Versioned.read(spark, withStats).orderBy($"k").collect().toSeq
    val b = Versioned.read(spark, without).orderBy($"k").collect().toSeq
    assert(a == b)
    // manifest presence is preserved on one side only
    assert(StatsIndex.exists(spark, s"$withStats/v=2"))
    assert(!StatsIndex.exists(spark, s"$without/v=2"))
    // both sides rewrote the same single range file
    def partNames(t: String, v: Long) =
      new java.io.File(s"$t/v=$v").listFiles()
        .filter(f => f.isFile && f.getName.startsWith("part-"))
        .map(_.getName).toSet
    assert(partNames(withStats, 2).intersect(partNames(withStats, 1)).size
      == partNames(without, 2).intersect(partNames(without, 1)).size)
  }

  test("readRange prunes to the admitted files and equals the full scan") {
    val t = s"$root/range"
    val rows = (0L until 8000L).map(k => (k, s"p-$k")).toDF("k", "v")
    Cluster.writeClustered(rows, t, nFiles = 8,
      org.apache.spark.sql.functions.col("k"))
    StatsIndex.build(spark, t, "k")
    // a range inside one cluster file admits exactly that file
    assert(StatsIndex.admittedCount(spark, t, 100L, 200L) == 1)
    val pruned = StatsIndex.readRange(spark, t, "k", 100L, 200L)
      .orderBy($"k").collect().toSeq
    val full = spark.read.parquet(t)
      .filter($"k" >= 100L && $"k" <= 200L).orderBy($"k").collect().toSeq
    assert(pruned == full && pruned.size == 101)
    // a range straddling a REAL file boundary (read from the manifest —
    // repartitionByRange boundaries are sample-derived) admits exactly the
    // two neighbors; an out-of-domain range none
    val ranges = StatsIndex.load(spark, t).get.values.toSeq
      .map(st => (st.kmin.get, st.kmax.get)).sorted
    val (aMax, bMin) = (ranges(0)._2, ranges(1)._1)
    assert(StatsIndex.admittedCount(spark, t, aMax, bMin) == 2)
    assert(StatsIndex.admittedCount(spark, t, 100000L, 200000L) == 0)
    assert(StatsIndex.readRange(spark, t, "k", 100000L, 200000L).isEmpty)
    // schema survives the empty-result path
    assert(StatsIndex.readRange(spark, t, "k", 100000L, 200000L)
      .columns.toSeq == Seq("k", "v"))
  }

  test("stats=true at publish births the manifest; DML maintains it from v=1 on") {
    val t = s"$root/born"
    val rows = (0L until 2000L).map(k => (k, s"p-$k")).toDF("k", "v")
    Forget.publishClustered(rows, t, nFiles = 4, keyCol = "k", stats = true)
    assert(StatsIndex.exists(spark, s"$t/v=1"))
    Forget.purge(spark, t, "k", Seq(42L))
    assert(StatsIndex.load(spark, s"$t/v=2").get.size == 4)
  }

  test("a stale manifest degrades readRange to the full scan, never missing rows") {
    val t = s"$root/stale"
    (0L until 1000L).map(k => (k, s"p-$k")).toDF("k", "v")
      .coalesce(1).write.parquet(t)
    StatsIndex.build(spark, t, "k")
    // files appended AFTER the build: the manifest no longer covers the dir
    (5000L until 5100L).map(k => (k, s"late-$k")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(t)
    val got = StatsIndex.readRange(spark, t, "k", 5000L, 5050L)
      .orderBy($"k").as[(Long, String)].collect().toSeq
    assert(got.size == 51 && got.head == (5000L, "late-5000"),
      "stale manifest must fall back to the full scan")
  }

  test("manifest and untouched files survive vacuum-free time travel") {
    val t = s"$root/travel"
    val rows = (0L until 1000L).map(k => (k, s"p-$k")).toDF("k", "v")
    Forget.publishClustered(rows, t, nFiles = 2, keyCol = "k")
    StatsIndex.build(spark, s"$t/v=1", "k")
    Forget.purge(spark, t, "k", Seq(1L))
    // v=1's manifest still loads (time-travel pruning stays possible)
    assert(StatsIndex.load(spark, s"$t/v=1").get.size == 2)
    assert(Paths.get(s"$t/v=1").toFile.exists())
  }
}
