package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.lake.{Forget, Versioned}

/**
 * [[CdcSink.MaintainPolicy]]: a long-running CDC stream self-heals its
 * accumulating small files — every N-th micro-batch runs one
 * [[graft.lake.Maintain.auto]] pass after the merge commits; off-cadence
 * batches never pay; replay skips both the merge and the pass; and a
 * pass with nothing over the dials is a no-op.
 */
class CdcMaintainSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-cdcm").toString

  private def batch(ks: Seq[Long], x: Long) =
    ks.map(k => ("I", k, x)).toDF("op", "k", "x")

  test("every N-th batch compacts; replay and under-dial passes no-op") {
    val t = s"$root/cm"
    Forget.publishIndexed(Seq((0L, 0L)).toDF("k", "x"), t, 1, "k",
      stats = true)
    val policy = Some(CdcSink.MaintainPolicy(every = 3, maxDataFiles = 2))
    def files(): Int = Versioned.dataFilePaths(spark,
      Versioned.dataDir(spark, t,
        Versioned.currentVersion(spark, t).get)).size
    // batches 0,1: inserts accumulate files, cadence not hit
    CdcSink.applyBatch(spark, t, "k", batch(Seq(10L), 1L), 0L,
      maintain = policy)
    CdcSink.applyBatch(spark, t, "k", batch(Seq(11L), 1L), 1L,
      maintain = policy)
    val before = files()
    assert(before > 2, s"setup: expected >2 small files, got $before")
    val vBefore = Versioned.currentVersion(spark, t).get
    // batch 2 hits the cadence (2 % 3 == 3-1): merge THEN compact
    CdcSink.applyBatch(spark, t, "k", batch(Seq(12L), 1L), 2L,
      maintain = policy)
    assert(files() <= 2, s"compaction did not run: ${files()} files")
    assert(Versioned.currentVersion(spark, t).get == vBefore + 2,
      "expected merge + compact = two versions")
    // content survived the compaction
    assert(Versioned.read(spark, t).count() == 4L)
    // replay of batch 2: tag dedup skips merge AND maintenance
    val vAfter = Versioned.currentVersion(spark, t).get
    CdcSink.applyBatch(spark, t, "k", batch(Seq(12L), 1L), 2L,
      maintain = policy)
    assert(Versioned.currentVersion(spark, t).get == vAfter)
    // next cadence hit with nothing over the dials: merge only, no-op pass
    CdcSink.applyBatch(spark, t, "k", batch(Seq(13L), 1L), 5L,
      maintain = policy)
    assert(Versioned.currentVersion(spark, t).get == vAfter + 1,
      "an under-dial maintenance pass must publish nothing")
  }
}
