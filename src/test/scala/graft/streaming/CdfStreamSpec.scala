package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.lake.{Cdf, Compact, Forget, Upsert, Versioned}

/**
 * Streaming change-feed reader ([[CdfStream]]): a replica subscribed via
 * [[CdfStream.subscribe]] tracks the source exactly across multi-version
 * churn — equal to both the source snapshot and a manually
 * [[Cdf.sync]]'d replica; a stream restart replays into tag-dedup no-ops
 * (never a double-apply); layout-only maintenance interleaves without
 * breaking the feed; [[CdfStream.changes]] surfaces the raw change rows
 * with their version sequence.
 */
class CdfStreamSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-cdfstream").toString

  private def cdcBatch(rows: Seq[(String, Long, String)]): DataFrame =
    rows.toDF("op", "k", "v")

  private def snap(t: String): Set[(Long, String)] =
    Versioned.read(spark, t).filter($"k".isNotNull)
      .as[(Long, String)].collect().toSet

  test("stream-fed replica == sync replica == source across churn; replay no-op") {
    val src = s"$root/src"
    val repStream = s"$root/rep_stream"
    val repSync = s"$root/rep_sync"
    val ckpt = s"$root/ckpt"
    Forget.publishIndexed(
      (0L until 500L).map(k => (k, s"p$k")).toDF("k", "v"),
      src, nFiles = 4, keyCol = "k", stats = true)
    // first DML so the feed exists, then seed both replicas at that point
    Upsert.applyCdc(spark, src, "k",
      cdcBatch(Seq(("U", 1L, "u1-a"), ("I", 1000L, "i1000"))))
    Cdf.seed(spark, src, repStream)
    Cdf.seed(spark, src, repSync)

    val q = CdfStream.subscribe(spark, src, repStream, "k")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(200))
      .start()
    try {
      for (round <- 1 to 3) {
        Upsert.applyCdc(spark, src, "k", cdcBatch(Seq(
          ("U", round.toLong, s"u$round-b"),
          ("I", 2000L + round, s"i2-$round"),
          ("D", 10L + round, null))))
        q.processAllAvailable()
        Cdf.sync(spark, src, repSync, "k")
        assert(snap(repStream) == snap(src), s"round $round: stream != src")
        assert(snap(repStream) == snap(repSync),
          s"round $round: stream != sync")
      }
    } finally q.stop()

    // churn while the stream is DOWN, plus interleaved layout maintenance
    // (records _changes_none — no feed rows, but the range stays
    // bridgeable), then restart from the SAME checkpoint: the re-delivered
    // last batch replays into the cdf-tag no-op and the stream catches up
    Compact.compactVersion(spark, src, "k", targetBytes = 1L) // no-op or new v
    Upsert.applyCdc(spark, src, "k",
      cdcBatch(Seq(("U", 2L, "u2-offline"), ("D", 500L, null))))
    val versionsBefore = Versioned.versions(spark, repStream).size
    val q2 = CdfStream.subscribe(spark, src, repStream, "k")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(200))
      .start()
    try {
      q2.processAllAvailable()
      assert(snap(repStream) == snap(src), "post-restart: stream != src")
      // replay produced no duplicate version: at most ONE new replica
      // version for the offline churn (the re-delivered old batch no-ops)
      val versionsAfter = Versioned.versions(spark, repStream).size
      assert(versionsAfter <= versionsBefore + 1,
        s"replay double-applied: $versionsBefore -> $versionsAfter")

      // schema evolution mid-stream: sync re-reads, the replica evolves
      Upsert.merge(spark, src, "k",
        Seq((3L, "u3-evolved", "extra")).toDF("k", "v", "w"),
        evolveSchema = true)
      q2.processAllAvailable()
      val rep = Versioned.read(spark, repStream)
      assert(rep.columns.contains("w"))
      assert(rep.filter($"k" === 3L).select($"w").as[String].head()
        == "extra")
      assert(Cdf.syncedVersion(spark, repStream)
        .contains(Versioned.currentVersion(spark, src).get))
    } finally q2.stop()
  }

  test("changes() surfaces rows with _op and the version sequence") {
    val src = s"$root/raw"
    Forget.publishIndexed(
      (0L until 100L).map(k => (k, s"p$k")).toDF("k", "v"),
      src, nFiles = 2, keyCol = "k")
    Upsert.applyCdc(spark, src, "k",
      cdcBatch(Seq(("U", 5L, "x5"), ("D", 6L, null))))
    Upsert.applyCdc(spark, src, "k", cdcBatch(Seq(("I", 200L, "i200"))))
    val got = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    // sinceV = 1: past the creation publish's break poison (v1, _op = B)
    val q = CdfStream.changes(spark, src, sinceV = 1)
      .select($"_op", $"k", $"_version")
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        got.synchronized {
          got ++= df.as[(String, Long, Long)].collect()
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      // a version published AFTER the stream started is discovered too
      Upsert.applyCdc(spark, src, "k", cdcBatch(Seq(("U", 7L, "x7"))))
      q.processAllAvailable()
    } finally q.stop()
    val expected = Cdf.changesSince(spark, src, 1L)
      .select($"_op", $"k", $"_version")
      .as[(String, Long, Long)].collect().toSet
    assert(got.synchronized(got.toSet) == expected)
    // the op/version fabric is what Cdf records: updates and inserts both
    // land as U (applyCdc applies I as an upsert), deletes as D
    assert(expected.contains(("U", 5L, 2L)))
    assert(expected.contains(("D", 6L, 2L)))
    assert(expected.contains(("U", 200L, 3L)))
    assert(expected.contains(("U", 7L, 4L)))
  }

  test("a wholesale replace poisons the raw feed; assemble rejects it; " +
      "a truly feed-less table still rejects eagerly") {
    val src = s"$root/nofeed"
    Versioned.publish(Seq((1L, "a")).toDF("k", "v"), src) // v1 + break
    // from 0 the raw feed delivers exactly the creation break row — a
    // wholesale replace is VISIBLE to streaming consumers, never a
    // silent skip
    val got = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    var assembleErr: Option[Throwable] = None
    val q = CdfStream.changes(spark, src)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        got.synchronized {
          got ++= df.select($"_op", $"_version")
            .as[(String, Long)].collect()
        }
        // the assemble guard fires on the poison row
        if (assembleErr.isEmpty)
          assembleErr = scala.util.Try(
            LakeStream.assemble(df, "k").count()).failed.toOption
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(got.synchronized(got.toSeq) == Seq(("B", 1L)))
    assert(assembleErr.exists(_.getMessage.contains("poison")))

    // a table published WITHOUT the break machinery (raw publishWith —
    // internal composed builds) still rejects at stream start: the file
    // source needs one glob match
    val bare = s"$root/bare"
    Versioned.publishWith(spark, bare) { dir =>
      Seq((1L, "x")).toDF("k", "v").write.parquet(dir)
    }
    val e = intercept[IllegalArgumentException] {
      CdfStream.changes(spark, bare)
    }
    assert(e.getMessage.contains("_changes"))
  }

  test("a schema change poisons the raw feed (op S): the tail delivers " +
      "it, assemble rejects toward a restart, batch readers bridge") {
    val src = s"$root/schemachange"
    Forget.publishIndexed(
      (0L until 50L).map(k => (k, s"p$k")).toDF("k", "v"),
      src, nFiles = 2, keyCol = "k")
    Upsert.applyCdc(spark, src, "k", cdcBatch(Seq(("U", 1L, "u1")))) // v2
    val got = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    var assembleErr: Option[Throwable] = None
    val q = CdfStream.changes(spark, src, sinceV = 1)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        got.synchronized {
          got ++= df.select($"_op", $"_version")
            .as[(String, Long)].collect()
        }
        if (assembleErr.isEmpty)
          assembleErr = scala.util.Try(
            LakeStream.assemble(df, "k").count()).failed.toOption
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(assembleErr.isEmpty) // plain changes assemble fine
      // ALTER TABLE ADD COLUMNS mid-stream: the tail must DELIVER it
      graft.lake.Evolve.addColumns(spark, src,
        org.apache.spark.sql.types.StructType.fromDDL("w INT")) // v3
      q.processAllAvailable()
    } finally q.stop()
    assert(got.synchronized(got.toSet).contains(("S", 3L)))
    assert(assembleErr.exists(e => e.getMessage.contains("poison") &&
      e.getMessage.contains("schema")))
    // batch readers bridge the overlay to zero rows — and an EVOLVING
    // merge's feed carries its real rows but not its S poison
    graft.lake.Clone.materialize(spark, src) // v4 (rewriting DML needs
    Upsert.merge(spark, src, "k",            //     real files)
      Seq((2L, "u2", 7, 0.5)).toDF("k", "v", "w", "z"),
      evolveSchema = true) // v5
    val batch = Cdf.changesSince(spark, src, 1L)
    assert(batch.filter($"_op" === "S").count() == 0L)
    assert(batch.filter($"_version" === 3L).count() == 0L)
    assert(batch.filter($"_version" === 5L && $"k" === 2L).count() == 1L)
  }

  test("RENAME COLUMN mid-stream: the raw tail DELIVERS the S poison " +
      "(start-time schema cannot read on), assemble rejects toward a " +
      "restart; the batch feed re-unifies under the live logical name") {
    val src = s"$root/renametail"
    Forget.publishIndexed(
      (0L until 20L).map(k => (k, s"p$k")).toDF("k", "v"),
      src, nFiles = 2, keyCol = "k")
    Upsert.applyCdc(spark, src, "k", cdcBatch(Seq(("U", 1L, "u1")))) // v2
    val got = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    var assembleErr: Option[Throwable] = None
    val q = CdfStream.changes(spark, src, sinceV = 1)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        got.synchronized {
          got ++= df.select($"_op", $"_version")
            .as[(String, Long)].collect()
        }
        if (assembleErr.isEmpty)
          assembleErr = scala.util.Try(
            LakeStream.assemble(df, "k").count()).failed.toOption
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(assembleErr.isEmpty)
      graft.lake.Evolve.renameColumn(spark, src, "v", "txt", "k") // v3
      q.processAllAvailable()
    } finally q.stop()
    // the contract, pinned: a rename is a SCHEMA CHANGE to a
    // start-time-schema tail — delivered as poison, never null-bridged
    assert(got.synchronized(got.toSet).contains(("S", 3L)))
    assert(assembleErr.exists(e => e.getMessage.contains("poison") &&
      e.getMessage.contains("schema")))
    // batch feed across the rename: post-rename DML records under the
    // new logical name, and the until-version's column mapping re-unifies
    // PRE-rename frames under it too — one column, no null-filled split
    graft.lake.Dv.merge(spark, src, "k",
      Seq((2L, "u2")).toDF("k", "txt")) // v4 (zero-copy; overlay is a ref)
    val batch = Cdf.changesSince(spark, src, 1L)
    assert(batch.columns.contains("txt") && !batch.columns.contains("v"))
    assert(batch.filter($"_version" === 2L && $"k" === 1L).head()
      .getAs[String]("txt") == "u1")
    assert(batch.filter($"_version" === 4L && $"k" === 2L).head()
      .getAs[String]("txt") == "u2")
  }
}
