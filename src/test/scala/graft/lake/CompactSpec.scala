package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactSpec extends SparkSpec {

  import spark.implicits._

  test("compactLeaf merges small files, preserves content and sidecars, idempotent rerun") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/leaf"
    (1 to 5000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(40).write.parquet(dir)
    // a sidecar like graft.bronze.Lake writes
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(new org.apache.hadoop.fs.Path(dir, "_sidecar.json"), true)
    out.write("""{"record_count":5000}""".getBytes("UTF-8")); out.close()

    val before = spark.read.parquet(dir).collect().toSet
    val stats = Compact.compactLeaf(spark, dir, targetBytes = 1L << 30)
    assert(stats.filesBefore == 40 && stats.filesAfter == 1)
    assert(spark.read.parquet(dir).collect().toSet == before)
    assert(f.exists(new org.apache.hadoop.fs.Path(dir, "_sidecar.json")),
      "sidecar must survive the swap")
    // rerun: already compact, no rewrite
    val again = Compact.compactLeaf(spark, dir, targetBytes = 1L << 30)
    assert(again.filesBefore == 1 && again.filesAfter == 1)
  }

  test("compactLeaf respects targetBytes (splits into multiple files)") {
    val dir = Files.createTempDirectory("graft_compact2").toString + "/leaf"
    (1 to 20000).map(i => (i.toLong, "x" * 100)).toDF("id", "v")
      .repartition(30).write.parquet(dir)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = f.getContentSummary(new org.apache.hadoop.fs.Path(dir)).getLength
    val stats = Compact.compactLeaf(spark, dir, targetBytes = bytes / 4)
    assert(stats.filesAfter > 1 && stats.filesAfter < 30)
    assert(spark.read.parquet(dir).count() == 20000)
  }


  test("compactVersion bin-packs a DML table into a new version, rebuilding its indexes") {
    val root = Files.createTempDirectory("graft-compactv").toString
    val t = s"$root/t"
    val rows = (0L until 20000L).map(k => (k, s"payload-$k")).toDF("k", "v")
    Forget.publishIndexed(rows, t, nFiles = 32, keyCol = "k")
    StatsIndex.build(spark, s"$t/v=1", "k")
    // drive some churn so the table looks post-CDC
    Upsert.merge(spark, t, "k", Seq((3L, "UPDATED")).toDF("k", "v"))
    val filesBefore = new java.io.File(s"$t/v=2").listFiles()
      .count(f => f.isFile && f.getName.startsWith("part-"))
    assert(filesBefore >= 32)
    val v3 = Compact.compactVersion(spark, t, "k", targetBytes = 64L * 1024 * 1024)
    assert(v3 == 3L)
    val filesAfter = new java.io.File(s"$t/v=3").listFiles()
      .count(f => f.isFile && f.getName.startsWith("part-"))
    assert(filesAfter < filesBefore)
    // content identical to the pre-compact snapshot
    val before = Versioned.readVersion(spark, t, 2L).orderBy($"k").collect().toSeq
    val after = Versioned.read(spark, t).orderBy($"k").collect().toSeq
    assert(after == before)
    // indexes rebuilt because the live version carried them
    assert(new java.io.File(s"$t/v=3/_bloom").exists())
    assert(StatsIndex.exists(spark, s"$t/v=3"))
    val stats = StatsIndex.load(spark, s"$t/v=3").get
    assert(stats.size == filesAfter)
    // compaction REPAIRS clustering: per-file ranges are disjoint again,
    // so a point purge after compaction rewrites exactly one file
    val ranges = stats.values.toSeq.map(st => (st.kmin.get, st.kmax.get)).sorted
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax < bMin)
      case _ => ()
    }
    // pre-compact version stays time-travel readable; rerun is a no-op
    assert(Versioned.readVersion(spark, t, 2L).count() == 20000L)
    assert(Compact.compactVersion(spark, t, "k",
      targetBytes = 64L * 1024 * 1024) == 3L)
  }

  test("compactDays walks the bronze partition tree") {
    val root = Files.createTempDirectory("graft_compact3").toString
    for (day <- Seq("2024-01-01", "2024-01-02")) {
      val d = graft.bronze.Lake.dayDir(root, "events", day)
      (1 to 1000).map(i => (i.toLong, day)).toDF("id", "day")
        .repartition(10).write.parquet(d)
    }
    val stats = Compact.compactDays(spark, root, "events", targetBytes = 1L << 30)
    assert(stats.size == 2)
    assert(stats.forall(s => s.filesBefore == 10 && s.filesAfter == 1))
    assert(spark.read.parquet(s"$root/events").count() == 2000)
  }
}
