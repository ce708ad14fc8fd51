package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.lake.{Forget, Upsert, Versioned}

/**
 * Streaming CDC -> lake merge ([[CdcSink]]): a change stream lands in a
 * Versioned table one file-targeted merge per micro-batch; a replayed
 * micro-batch (same batchId) is a no-op — exactly-once table state over
 * foreachBatch's at-least-once delivery.
 */
class CdcSinkSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-cdcsink").toString

  private def fresh(name: String): String = {
    val t = s"$root/$name"
    val rows = (0L until 1000L).map(k => (k, s"payload-$k")).toDF("k", "v")
    Forget.publishIndexed(rows, t, nFiles = 4, keyCol = "k")
    t
  }

  test("change stream applies per micro-batch; final state is the fold") {
    val t = fresh("stream")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String)]
    val q = CdcSink.into(
        input.toDF().toDF("op", "k", "v"), t, "k")
      .option("checkpointLocation", s"$root/ckpt-stream").start()
    try {
      input.addData(("U", 10L, "UPDATED-10"), ("I", 5000L, "INSERTED"))
      q.processAllAvailable()
      input.addData(("D", 10L, null.asInstanceOf[String]),
        ("U", 5000L, "RE-UPDATED"))
      q.processAllAvailable()
    } finally q.stop()
    val after = Versioned.read(spark, t)
    assert(after.count() == 1000L) // +1 insert, -1 delete
    assert(after.filter($"k" === 10L).isEmpty)         // updated then deleted
    assert(after.filter($"k" === 5000L).select($"v").as[String].head()
      == "RE-UPDATED")                                 // inserted then updated
    assert(after.filter($"k" === 11L).select($"v").as[String].head()
      == "payload-11")
    // two non-empty batches -> two published versions past v1
    assert(Versioned.currentVersion(spark, t).contains(3L))
    assert(Upsert.lastBatchTag(spark, t).contains("1"))
  }

  test("a replayed micro-batch (same id) is a no-op; the next id applies") {
    val t = fresh("replay")
    val b0 = Seq(("U", 1L, "UPDATED-1")).toDF("op", "k", "v")
    CdcSink.applyBatch(spark, t, "k", b0, batchId = 0L)
    val v = Versioned.currentVersion(spark, t).get
    // at-least-once redelivery of batch 0: skipped, no new version
    CdcSink.applyBatch(spark, t, "k", b0, batchId = 0L)
    assert(Versioned.currentVersion(spark, t).contains(v))
    // batch 1 applies on top
    CdcSink.applyBatch(spark, t, "k",
      Seq(("U", 2L, "UPDATED-2")).toDF("op", "k", "v"), batchId = 1L)
    assert(Versioned.currentVersion(spark, t).contains(v + 1))
    val after = Versioned.read(spark, t)
    assert(after.filter($"k" === 1L).select($"v").as[String].head()
      == "UPDATED-1")
    assert(after.filter($"k" === 2L).select($"v").as[String].head()
      == "UPDATED-2")
    assert(after.count() == 1000L)
  }

  test("seqCol reduces intra-batch churn before the merge (stream path)") {
    val t = fresh("churn")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String, Long)]
    val q = CdcSink.into(
        input.toDF().toDF("op", "k", "v", "seq"), t, "k",
        seqCol = Some("seq"))
      .option("checkpointLocation", s"$root/ckpt-churn").start()
    try {
      // one micro-batch with churn on both keys: I->U->D nets to a
      // delete of 3; U->U nets to the later value for 8
      input.addData(
        ("I", 3000L, "created", 1L), ("U", 3000L, "updated", 2L),
        ("D", 3000L, null.asInstanceOf[String], 3L),
        ("U", 8L, "first", 10L), ("U", 8L, "last", 11L))
      q.processAllAvailable()
    } finally q.stop()
    val after = Versioned.read(spark, t)
    assert(after.filter($"k" === 3000L).isEmpty)
    assert(after.filter($"k" === 8L).select($"v").as[String].head() == "last")
    assert(after.count() == 1000L)
  }

  test("maintenance DML between publish and replay does not defeat dedup") {
    val t = fresh("interleave")
    val b0 = Seq(("U", 1L, "UPDATED-1")).toDF("op", "k", "v")
    CdcSink.applyBatch(spark, t, "k", b0, batchId = 0L)
    // interleaved maintenance inside the crash window, BEFORE the
    // checkpoint commit: a compaction (which must carry the tag forward)
    // and a purge (a fresh, untagged version on top)
    graft.lake.Compact.compactVersion(spark, t, "k",
      targetBytes = Long.MaxValue)
    assert(Upsert.lastBatchTag(spark, t).contains("0"),
      "compaction must carry the CDC tag forward")
    Forget.purge(spark, t, "k", Seq(999L))
    assert(Upsert.lastBatchTag(spark, t).contains("0"),
      "purge must carry the CDC tag forward")
    Upsert.merge(spark, t, "k", Seq((2L, "ADHOC")).toDF("k", "v"))
    assert(Upsert.lastBatchTag(spark, t).contains("0"),
      "an untagged ad-hoc merge must carry the CDC tag forward")
    // with the carry, even a vacuum that DROPS the originally-tagged
    // version dirs cannot erase the watermark — the live version has it
    Versioned.vacuum(spark, t, keep = 0)
    val v = Versioned.currentVersion(spark, t).get
    // crash-replay of batch 0 after compact+purge+merge+vacuum: no-op
    CdcSink.applyBatch(spark, t, "k", b0, batchId = 0L)
    assert(Versioned.currentVersion(spark, t).contains(v))
    val after = Versioned.read(spark, t)
    assert(after.filter($"k" === 1L).select($"v").as[String].head()
      == "UPDATED-1")
    assert(after.filter($"k" === 999L).isEmpty)            // the purge held
    assert(after.filter($"k" === 2L).select($"v").as[String].head()
      == "ADHOC")                                          // the merge held
  }

  test("empty micro-batches publish nothing") {
    val t = fresh("empty")
    val v = Versioned.currentVersion(spark, t).get
    CdcSink.applyBatch(spark, t, "k",
      spark.emptyDataset[(String, Long, String)].toDF("op", "k", "v"),
      batchId = 0L)
    assert(Versioned.currentVersion(spark, t).contains(v))
  }
}
