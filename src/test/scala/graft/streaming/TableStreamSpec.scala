package graft.streaming

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.lake.{Dv, Forget, Upsert, Versioned}

/**
 * Streaming TABLE source ([[LakeStream.table]]): snapshot + change-feed
 * tail assemble exactly the live table across DML churn (rewriting
 * merges, zero-copy DV deletes) and across a RESTART from the same
 * checkpoint — the snapshot version is pinned in the checkpoint dir, so
 * nothing is double-applied and nothing re-delivers.
 */
class TableStreamSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-tstream").toString

  private def cdc(rows: Seq[(String, Long, String)]): DataFrame =
    rows.toDF("op", "k", "v")

  test("snapshot + tail assemble the live table across churn and restart") {
    val t = s"$root/t"
    val ckpt = s"$root/ckpt"
    Forget.publishIndexed(
      (0L until 300L).map(k => (k, s"p$k")).toDF("k", "v"),
      t, nFiles = 4, keyCol = "k", stats = true)
    // feed exists after the first DML; the stream snapshots at v2
    Upsert.applyCdc(spark, t, "k",
      cdc(Seq(("U", 5L, "u5"), ("D", 7L, null), ("I", 900L, "i900"))))
    assert(Versioned.currentVersion(spark, t).contains(2L))

    val delivered = ArrayBuffer.empty[Row]
    def runOnce(): Unit = {
      val q = LakeStream.table(spark, t, ckpt)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          delivered.synchronized { delivered ++= b.collect(); () }
        }
        .start()
      q.awaitTermination(120000)
      ()
    }
    runOnce()
    // run 1 delivered the v2 snapshot (300 rows: 300 -1 del +1 ins)
    val v2rows = delivered.synchronized(delivered.toSeq)
    assert(v2rows.count(_.getAs[Long]("_version") == 2L) == 300,
      s"snapshot rows: ${v2rows.groupBy(_.getAs[Long]("_version")).view
        .mapValues(_.size).toMap}")
    // assemble == live at v2
    def assembled(): Set[(Long, String)] = {
      val rows = delivered.synchronized(delivered.toSeq)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows),
        LakeStream.table(spark, t, ckpt).schema)
      LakeStream.assemble(df, "k").select("k", "v")
        .as[(Long, String)].collect().toSet
    }
    def live(): Set[(Long, String)] =
      Versioned.read(spark, t).as[(Long, String)].collect().toSet
    assert(assembled() == live())

    // churn while the stream is DOWN: a rewriting merge and a zero-copy
    // DV delete — then restart from the same checkpoint
    Upsert.applyCdc(spark, t, "k",
      cdc(Seq(("U", 5L, "u5-again"), ("I", 901L, "i901")))) // v3
    Dv.purge(spark, t, "k", Seq(10L, 11L)) // v4, zero-copy
    runOnce()
    val all = delivered.synchronized(delivered.toSeq)
    // restart delivered ONLY the new changesets — the snapshot did not
    // re-deliver (pinned version + file-source checkpoint)
    assert(all.count(_.getAs[Long]("_version") == 2L) == 300,
      "snapshot rows must not re-deliver on restart")
    assert(all.count(_.getAs[Long]("_version") == 3L) == 2)
    assert(all.count(_.getAs[Long]("_version") == 4L) == 2) // 2 D rows
    assert(assembled() == live())
    // the pinned snapshot version survives restarts
    val f = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(Versioned.readSmallFile(f,
      new org.apache.hadoop.fs.Path(s"$ckpt/graft_snapshot_version"))
      .contains("2"))
  }

  test("snapshotting a DV version: vectored rows never enter the stream") {
    val t = s"$root/dvsnap"
    val ckpt = s"$root/dvsnapCkpt"
    Forget.publishIndexed(
      (0L until 100L).map(k => (k, s"p$k")).toDF("k", "v"),
      t, nFiles = 2, keyCol = "k", stats = true)
    // zero-copy MERGE becomes the live version the stream snapshots:
    // base dir + appends + vector, all three legs exercised
    Dv.applyCdc(spark, t, "k",
      cdc(Seq(("U", 3L, "u3"), ("D", 4L, null), ("I", 500L, "i500"))))
    val delivered = ArrayBuffer.empty[Row]
    val q = LakeStream.table(spark, t, ckpt)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        delivered.synchronized { delivered ++= b.collect(); () }
      }
      .start()
    q.awaitTermination(120000)
    val rows = delivered.synchronized(delivered.toSeq)
    val snapKs = rows.filter(_.getAs[Long]("_version") == 2L)
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(snapKs.size == 100) // 100 -1 deleted +1 inserted
    assert(!snapKs.contains(4L), "the vectored row leaked into the stream")
    assert(snapKs(3L) == "u3" && snapKs(500L) == "i500")
  }

  test("a mid-stream schema change fails the table stream loudly " +
      "toward a restart (never a silently-narrowed assembly)") {
    val t = s"$root/evolve"
    val ckpt = s"$root/evolve_ckpt"
    Forget.publishIndexed(
      (0L until 50L).map(k => (k, s"p$k")).toDF("k", "v"),
      t, nFiles = 2, keyCol = "k", stats = true)
    Upsert.applyCdc(spark, t, "k", cdc(Seq(("U", 1L, "u1")))) // v2: feed
    var err: Option[Throwable] = None
    val q = LakeStream.table(spark, t, ckpt)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (err.isEmpty)
          err = scala.util.Try(
            LakeStream.assemble(b, "k").count()).failed.toOption
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(err.isEmpty) // snapshot + plain change assemble fine
      graft.lake.Evolve.addColumns(spark, t,
        org.apache.spark.sql.types.StructType.fromDDL("w INT")) // v3
      q.processAllAvailable()
    } finally q.stop()
    assert(err.exists(e => e.getMessage.contains("poison") &&
      e.getMessage.contains("schema")),
      s"expected the schema poison reject, got $err")

    // the documented remedy WORKS: a fresh stream (new checkpoint =
    // new snapshot pin) assembles the evolved table, new column and all
    Dv.merge(spark, t, "k",
      Seq((2L, "u2", 42)).toDF("k", "v", "w")) // v4: post-evolution DML
    val assembled = ArrayBuffer.empty[Row]
    val q2 = LakeStream.table(spark, t, s"$root/evolve_ckpt2")
      .writeStream
      .option("checkpointLocation", s"$root/evolve_ckpt2")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        assembled.synchronized { assembled ++= b.collect(); () }
        ()
      }
      .start()
    q2.awaitTermination(120000)
    val byKey = assembled.synchronized {
      LakeStream.assemble(
        spark.createDataFrame(
          spark.sparkContext.parallelize(assembled.toSeq),
          assembled.head.schema), "k")
        .collect().map(r => r.getAs[Long]("k") -> r).toMap
    }
    val live = Versioned.read(spark, t)
    assert(byKey.size == live.count())
    assert(byKey(2L).getAs[String]("v") == "u2")
    assert(byKey(2L).getAs[Int]("w") == 42)
    assert(byKey(5L).isNullAt(byKey(5L).fieldIndex("w"))) // null-filled
  }
}
