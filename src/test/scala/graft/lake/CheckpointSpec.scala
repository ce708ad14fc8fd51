package graft.lake

import java.net.URI
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Instrumented local FS (`cnt:` scheme) — counts metadata calls so the
  * checkpoint's bounded-walk claims are MEASURED, not asserted. Raw local
  * (no checksums): counters stay attributable to the caller under test. */
class CountingLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: URI = URI.create("cnt:///")
  override def getFileStatus(p: Path): org.apache.hadoop.fs.FileStatus = {
    CountingLocalFs.statusCalls.incrementAndGet()
    super.getFileStatus(p)
  }
  // Hadoop 3.4's RawLocalFileSystem short-circuits exists() straight to
  // java.io.File.exists — it never reaches getFileStatus, so the probe
  // calls under test must be counted here too
  override def exists(p: Path): Boolean = {
    CountingLocalFs.statusCalls.incrementAndGet()
    super.exists(p)
  }
  override def open(p: Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    CountingLocalFs.openCalls.incrementAndGet()
    super.open(p, bufferSize)
  }
}
object CountingLocalFs {
  val statusCalls = new AtomicLong
  val openCalls = new AtomicLong
  def reset(): Unit = { statusCalls.set(0L); openCalls.set(0L) }
  def status: Long = statusCalls.get
  def opens: Long = openCalls.get
}

/**
 * [[Checkpoint]] — version-history checkpointing: at a 1,000-version
 * table the metadata walks (probe-forward floor, commit-time resolution,
 * change-feed kind checks) cost O(tail-past-the-checkpoint) small-file
 * calls, measured on an instrumented FS; results are IDENTICAL to the
 * unchecked per-version walk (the checkpoint is a cache, never an
 * answer); vacuum refreshes it so the floor never names a dropped dir.
 */
class CheckpointSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-ckpt").toString

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def withInterval[T](n: Long)(op: => T): T = {
    sys.props("graft.checkpoint.intervalVersions") = n.toString
    try op finally { sys.props -= "graft.checkpoint.intervalVersions"; () }
  }

  // fabricate a committed version dir via raw FS (no Spark job): the
  // checkpoint machinery only touches metadata files, so a 1,000-version
  // history is millis to build this way instead of 1,000 parquet writes
  private def fabricate(f: org.apache.hadoop.fs.FileSystem, t: String,
                        v: Long, ts: Long, kind: Char): Unit = {
    val dir = new Path(s"$t/v=$v")
    f.mkdirs(dir)
    val out = f.create(new Path(dir, "_commit_ts"), true)
    out.write(ts.toString.getBytes); out.close()
    kind match {
      case 'n' =>
        val m = f.create(new Path(dir, "_changes_none"), true)
        m.write("layout-only".getBytes); m.close()
      case _ => () // 'x': no change record
    }
  }

  test("1,000-version table: probes and reads stay O(tail), answers equal") {
    hconf.set("fs.cnt.impl", classOf[CountingLocalFs].getName)
    val t = s"cnt://${Files.createTempDirectory("graft-cnt")}/big"
    val f = new Path(t).getFileSystem(hconf)
    val base = 1700000000000L
    (1L to 999L).foreach(v => fabricate(f, t, v, base + v * 1000, 'n'))
    // v=1000 is REAL (the live snapshot must be readable) — point the
    // pointer at 999 and publish normally; the blind publish lands 1000
    val m = f.create(new Path(s"$t/_manifest"), true)
    m.write("999".getBytes); m.close()
    assert(Versioned.publish(Seq((1L, "x")).toDF("k", "v"), t) == 1000L)

    // checkpoint fires on the next Nth commit; drive it directly at the
    // current floor (the natural hook is exercised in the next test)
    Checkpoint.maybeWrite(f, t, 1000L)
    val st = Checkpoint.read(f, t).get
    assert(st.version == 1000L)
    assert(st.commitTs.size == 1000 && st.feed(500L) == 'n')

    // commitTimes: one checkpoint read + the listing — not 1,000 opens
    CountingLocalFs.reset()
    val times = Versioned.commitTimes(spark, t)
    assert(times.size == 1000 && times(499) == (500L, base + 500000L))
    assert(CountingLocalFs.opens <= 5,
      s"commitTimes opened ${CountingLocalFs.opens} files with a checkpoint")

    // versionAsOf / time travel intact through the checkpointed times
    assert(Versioned.versionAsOf(spark, t, base + 500000L) == 500L)
    assert(Versioned.versionAsOf(spark, t, base + 500500L) == 500L)
    assert(Versioned.readAsOf(spark, t, System.currentTimeMillis())
      .count() == 1L)

    // double pointer loss: the probe floor comes from the checkpoint —
    // a handful of metadata calls, not a 1,000-dir forward walk
    f.delete(new Path(s"$t/_manifest"), false)
    f.delete(new Path(s"$t/_manifest.bak"), false)
    CountingLocalFs.reset()
    assert(Versioned.currentVersion(spark, t).contains(1000L))
    assert(CountingLocalFs.status + CountingLocalFs.opens <= 12,
      s"currentVersion cost ${CountingLocalFs.status} statuses + " +
        s"${CountingLocalFs.opens} opens with a checkpoint floor")
    // without the checkpoint the same recovery walks every version
    f.delete(new Path(s"$t/_checkpoint"), false)
    CountingLocalFs.reset()
    assert(Versioned.currentVersion(spark, t).contains(1000L))
    assert(CountingLocalFs.status + CountingLocalFs.opens >= 1000L,
      "sanity: the uncheckpointed recovery walk is O(versions)")
    // restore a pointer for any later reads
    val m2 = f.create(new Path(s"$t/_manifest"), true)
    m2.write("1000".getBytes); m2.close()

    // changesSince over the checkpointed range: zero per-version
    // existence probes (kinds resolve from the one checkpoint read)
    Checkpoint.maybeWrite(f, t, 1000L)
    CountingLocalFs.reset()
    assert(Cdf.changesSince(spark, t, 0L, untilV = Some(999L)).isEmpty)
    val probed = CountingLocalFs.status
    f.delete(new Path(s"$t/_checkpoint"), false)
    CountingLocalFs.reset()
    assert(Cdf.changesSince(spark, t, 0L, untilV = Some(999L)).isEmpty)
    assert(CountingLocalFs.status >= 999L,
      "sanity: the unchecked kind walk probes per version")
    assert(probed < 100L,
      s"checkpointed changesSince still probed $probed paths")
  }

  test("real-DML table: natural hook fires; feed + travel equal unchecked") {
    val t = s"$root/dml"
    withInterval(3L) {
      Forget.publishIndexed(
        (0L until 100L).map(k => (k, 0L)).toDF("k", "x"),
        t, nFiles = 4, keyCol = "k", stats = true) // v1
      (1 to 3).foreach { r => // v2..v4 — hook fires at v=3
        Upsert.merge(spark, t, "k",
          Seq((r * 10L, r.toLong)).toDF("k", "x"))
      }
      Compact.compactVersion(spark, t, "k") // v5 ('n') — may no-op
    }
    val f = new Path(t).getFileSystem(hconf)
    val st = Checkpoint.read(f, t).get
    assert(st.version == 3L, "the commit hook checkpoints every Nth commit")
    // v1 is the creation publish — a wholesale replace, kind 'b' (break)
    assert(st.feed(1L) == 'b' && st.feed(2L) == 'c' && st.feed(3L) == 'c')

    val live = Versioned.currentVersion(spark, t).get
    val withCkpt = Cdf.changesSince(spark, t, 1L, untilV = Some(live))
      .orderBy("_version", "k").collect().toSeq
    val times = Versioned.commitTimes(spark, t)
    f.delete(new Path(s"$t/_checkpoint"), false)
    val unchecked = Cdf.changesSince(spark, t, 1L, untilV = Some(live))
      .orderBy("_version", "k").collect().toSeq
    assert(withCkpt == unchecked,
      "checkpointed feed must equal the per-version walk")
    assert(times == Versioned.commitTimes(spark, t))
  }

  test("vacuum refreshes the checkpoint: floor never names a dropped dir") {
    val t = s"$root/vac"
    withInterval(2L) {
      Versioned.publish(Seq((1L, "a")).toDF("k", "v"), t) // v1
      Versioned.publish(Seq((2L, "b")).toDF("k", "v"), t) // v2 → ckpt(2)
      Versioned.publish(Seq((3L, "c")).toDF("k", "v"), t) // v3
    }
    val f = new Path(t).getFileSystem(hconf)
    assert(Checkpoint.read(f, t).exists(_.version == 2L))
    Versioned.vacuum(spark, t, keep = 0) // drops v1, v2 — ckpt floor moves
    val st = Checkpoint.read(f, t).get
    assert(st.version == 3L)
    assert(st.commitTs.keySet == Set(3L), "stale rows must not accumulate")
    // floor survives double pointer loss AFTER the vacuum
    f.delete(new Path(s"$t/_manifest"), false)
    f.delete(new Path(s"$t/_manifest.bak"), false)
    assert(Versioned.currentVersion(spark, t).contains(3L))
    assert(Versioned.read(spark, t).count() == 1L)
  }
}
