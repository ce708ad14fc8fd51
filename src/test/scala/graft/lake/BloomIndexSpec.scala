package graft.lake

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The Bloom file index must SKIP (point lookups touch ~1 of N files on a
  * hash-distributed key where min/max stats are blind) without ever
  * LYING (pruned lookup == full scan, absent keys come back empty, a
  * missing sidecar degrades to a full candidate list — never to a wrong
  * answer). */
class BloomIndexSpec extends SparkSpec {

  import spark.implicits._

  private val nFiles = 16

  private def freshTable(): String = {
    val t = Files.createTempDirectory("graft_bloomidx").toString + "/t"
    // high-cardinality long key with a second column to carry through;
    // hash distribution puts every key's rows in exactly one file while
    // each FILE spans nearly the full key domain (min/max stats useless)
    val df = spark.range(0, 20000)
      .select($"id".as("k"), ($"id" % 7).as("v"))
    BloomIndex.writeIndexed(df, t, nFiles, "k")
    t
  }

  test("point lookup touches ~1 of N files and matches the full scan") {
    val t = freshTable()
    val full = spark.read.parquet(t)
    assert(full.inputFiles.length == nFiles)
    for (key <- Seq(0L, 7777L, 19999L)) {
      val cand = BloomIndex.candidateFiles(spark, t, key)
      // the owning file always survives; a 1% fpp admits at most a few more
      assert(cand.nonEmpty && cand.length <= 3,
        s"key $key: ${cand.length} of $nFiles files admitted")
      val got = BloomIndex.lookup(spark, t, "k", key).collect()
      val want = full.filter($"k" === key).collect()
      assert(got.toSet == want.toSet && got.length == 1)
    }
  }

  test("absent keys prune to (almost) nothing and return empty") {
    val t = freshTable()
    for (key <- Seq(-5L, 20001L, 999999L)) {
      val cand = BloomIndex.candidateFiles(spark, t, key)
      assert(cand.length <= 2, s"absent key $key admitted ${cand.length} files")
      assert(BloomIndex.lookup(spark, t, "k", key).isEmpty)
    }
  }

  test("min/max file stats are genuinely blind on this layout (bloom isn't)") {
    val t = freshTable()
    // every file's [min,max] span covers mid-domain keys: range stats would
    // scan all 16 files for k=10000, the bloom index reads ≤ 3
    val spans = spark.read.parquet(t)
      .groupBy(org.apache.spark.sql.functions.input_file_name())
      .agg(org.apache.spark.sql.functions.min($"k").as("lo"),
        org.apache.spark.sql.functions.max($"k").as("hi"))
      .collect()
    assert(spans.forall(r => r.getLong(1) < 10000 && r.getLong(2) > 10000))
    assert(BloomIndex.candidateFiles(spark, t, 10000L).length <= 3)
  }

  test("a missing sidecar degrades to keep-the-file, never to a wrong answer") {
    val t = freshTable()
    val fsys = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new Path(s"$t/_bloom"), true)
    assert(BloomIndex.candidateFiles(spark, t, 7777L).length == nFiles)
    assert(BloomIndex.lookup(spark, t, "k", 7777L).count() == 1)
  }
}
