package graft.lake

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.{SparkSpec, Sql, SqlDml}

/**
 * Time-based retention ([[Versioned.vacuumOlderThan]], SQL `VACUUM ...
 * RETAIN n HOURS`): versions outside the window drop, the LIVE version
 * and the as-of-cutoff ANCHOR survive (timestamp travel to any instant
 * inside the window keeps resolving), undated versions are conservatively
 * kept, and the change feed shares the window (a span over a dropped
 * version rejects toward reseed). Commit times are pinned synthetically
 * by rewriting the `_commit_ts` markers — the specs own the clock.
 */
class VacuumHoursSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-vach").toString
  private def hfs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def seed(n: Int) =
    (0 until n).map(k => (k.toLong, k.toLong)).toDF("k", "x")

  // pin version v's commit time to `ts` (specs own the clock)
  private def setCommitTs(t: String, v: Long, ts: Long): Unit = {
    val f = hfs(t)
    val out = f.create(new Path(s"$t/v=$v/_commit_ts"), true)
    try out.write(ts.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // the checkpoint caches commit times — rebuild it against the pinned
    // clock, as a real deployment's checkpoint would carry real times
    Checkpoint.refresh(f, t,
      Versioned.currentVersion(spark, t).get, Versioned.versions(spark, t))
  }

  private def history(t: String, hoursAgo: Seq[Long]): Unit =
    hoursAgo.zipWithIndex.foreach { case (h, i) =>
      setCommitTs(t, i + 1L,
        System.currentTimeMillis() - h * 3600000L)
    }

  test("window + anchor semantics: drop old, keep anchor + window + live") {
    val t = s"$root/win"
    Forget.publishIndexed(seed(4), t, 1, "k", stats = true)     // v1
    (2 to 5).foreach { i =>
      Upsert.merge(spark, t, "k", Seq((1L, i.toLong)).toDF("k", "x"))
    }                                                           // v2..v5
    // commit times: v1=50h, v2=40h, v3=30h, v4=10h, v5=1h ago
    history(t, Seq(50L, 40L, 30L, 10L, 1L))
    // cutoff 24h: v4, v5 inside the window; v3 is the ANCHOR (newest
    // before cutoff — "state as of 24h ago"); v1, v2 drop
    val plan = Versioned.vacuumPlanOlderThan(spark, t,
      System.currentTimeMillis() - 24L * 3600000L)
    assert(plan == Seq(1L, 2L))
    val dropped = Versioned.vacuumOlderThan(spark, t,
      System.currentTimeMillis() - 24L * 3600000L)
    assert(dropped.sorted == Seq(1L, 2L))
    assert(Versioned.versions(spark, t) == Seq(3L, 4L, 5L))
    // timestamp travel to any instant inside the window still resolves
    val at20h = Versioned.versionAsOf(spark, t,
      System.currentTimeMillis() - 20L * 3600000L)
    assert(at20h == 3L) // the anchor answers
    assert(Versioned.readVersion(spark, t, 3).filter($"k" === 1L)
      .head().getLong(1) == 3L)
    // the change feed shares the window: a span over the dropped v2
    // rejects toward reseed; the surviving span still answers
    val e = intercept[IllegalStateException] {
      Cdf.changesSince(spark, t, 1).collect()
    }
    assert(e.getMessage.contains("resync"))
    assert(Cdf.changesSince(spark, t, 3).count() == 2L) // v4, v5
  }

  test("undated versions are conservatively kept") {
    val t = s"$root/undated"
    Forget.publishIndexed(seed(3), t, 1, "k", stats = true)     // v1
    Upsert.merge(spark, t, "k", Seq((1L, 9L)).toDF("k", "x"))   // v2
    Upsert.merge(spark, t, "k", Seq((1L, 8L)).toDF("k", "x"))   // v3
    val f = hfs(t)
    // v1: ancient; v2: strip the marker (pre-migration version)
    setCommitTs(t, 1L, System.currentTimeMillis() - 100L * 3600000L)
    f.delete(new Path(s"$t/v=2/_commit_ts"), false)
    Checkpoint.refresh(f, t, 3L, Versioned.versions(spark, t))
    val dropped = Versioned.vacuumOlderThan(spark, t,
      System.currentTimeMillis() - 24L * 3600000L)
    // v1 is old BUT it is the as-of-cutoff anchor (v2 has no date) —
    // nothing can drop: reclaiming what cannot be dated deletes wrong
    assert(dropped.isEmpty)
    assert(Versioned.versions(spark, t) == Seq(1L, 2L, 3L))
  }

  test("SQL: VACUUM RETAIN n HOURS + its DRY RUN") {
    val t = s"$root/sqlh"
    Forget.publishIndexed(seed(3), t, 1, "k", stats = true)     // v1
    (2 to 4).foreach { i =>
      Upsert.merge(spark, t, "k", Seq((0L, i.toLong)).toDF("k", "x"))
    }                                                           // v2..v4
    history(t, Seq(72L, 48L, 2L, 1L))
    SqlDml.register(spark, "vh_t", t, "k")
    val dry = Sql.describe(spark, "VACUUM vh_t RETAIN 24 HOURS DRY RUN")
      .collect().map(_.getLong(0)).toSeq
    assert(dry == Seq(1L)) // v2 anchors the 24h cutoff, v1 drops
    // dry run reclaimed nothing
    assert(Versioned.versions(spark, t) == Seq(1L, 2L, 3L, 4L))
    val v = Sql.execute(spark, "VACUUM vh_t RETAIN 24 HOURS")
    assert(v == 4L)
    assert(Versioned.versions(spark, t) == Seq(2L, 3L, 4L))
    // count-based form still works through the same statement
    Sql.execute(spark, "VACUUM vh_t RETAIN 1 VERSIONS")
    assert(Versioned.versions(spark, t) == Seq(3L, 4L))
    // an hour count that would OVERFLOW the window rejects — the
    // "retain forever" misspelling must never vacuum the whole history
    val of = intercept[IllegalArgumentException] {
      Sql.execute(spark, "VACUUM vh_t RETAIN 99999999999999 HOURS")
    }
    assert(of.getMessage.contains("overflows"))
    assert(Versioned.versions(spark, t) == Seq(3L, 4L))
    // merely-huge (non-overflowing) spans vacuum nothing: cutoff is in
    // the pre-epoch past, so every version is inside the window
    assert(Sql.execute(spark, "VACUUM vh_t RETAIN 1000000 HOURS") == 4L)
    assert(Versioned.versions(spark, t) == Seq(3L, 4L))
  }

  test("VACUUM executes on a READ-ONLY binding — the same name set its " +
      "DRY RUN previews (retention is storage work, not DML)") {
    val t = s"$root/ro"
    Versioned.publish(seed(3), t)                               // v1
    Versioned.publish(seed(4), t)                               // v2
    Versioned.publish(seed(5), t)                               // v3
    Sql.registerTable(spark, "vh_ro", t)                        // key-less
    // preview and execute must address the same name: before the
    // lookupAny fix the execute path threw 'not registered' while the
    // DRY RUN happily previewed the very same vacuum
    val dry = Sql.describe(spark, "VACUUM vh_ro DRY RUN")
      .collect().map(_.getLong(0)).toSeq
    assert(dry == Seq(1L))
    assert(Sql.execute(spark, "VACUUM vh_ro") == 3L)
    assert(Versioned.versions(spark, t) == Seq(2L, 3L))
  }
}
