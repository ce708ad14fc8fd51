package graft.lake

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.SparkSpec

/**
 * Optimistic concurrency ([[Versioned]] claim-commit protocol): concurrent
 * blind publishes all land under distinct contiguous versions; concurrent
 * MERGES on one table never lose an update (first-committer-wins, losers
 * re-derive); a derived publish against a stale base rejects; a lost
 * pointer update is invisible to readers (probe-forward); orphaned claims
 * block loudly and [[Versioned.healClaims]] restores liveness.
 */
class OccSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-occ").toString

  private def pool(n: Int) =
    ExecutionContext.fromExecutorService(Executors.newFixedThreadPool(n))

  test("concurrent blind publishes: distinct contiguous versions, no loss") {
    val t = s"$root/blind"
    implicit val ec: scala.concurrent.ExecutionContextExecutorService = pool(2)
    try {
      val writers = (1 to 2).map { w =>
        Future {
          (1 to 8).map { i =>
            Versioned.publish(
              Seq((w.toLong, i.toLong)).toDF("writer", "round"), t)
          }
        }
      }
      val versions = Await.result(Future.sequence(writers), 5.minutes).flatten
      assert(versions.toSet.size == 16, s"duplicate version won twice: " +
        versions.sorted.mkString(","))
      assert(versions.toSet == (1L to 16L).toSet,
        s"non-contiguous: ${versions.sorted.mkString(",")}")
      assert(Versioned.currentVersion(spark, t).contains(16L))
      // every committed version is complete and readable
      (1L to 16L).foreach { v =>
        assert(Versioned.readVersion(spark, t, v).count() == 1L)
      }
    } finally ec.shutdown()
  }

  test("concurrent merges never lose an update (the OCC point)") {
    val t = s"$root/merges"
    Forget.publishIndexed(
      (0L until 2000L).map(k => (k, 0L)).toDF("k", "touched"),
      t, nFiles = 8, keyCol = "k", stats = true)
    // two writers each apply 6 merges on DISJOINT key ranges; under the
    // old last-wins manifest every interleaved pair could drop one side
    implicit val ec: scala.concurrent.ExecutionContextExecutorService = pool(2)
    try {
      val writers = (0 to 1).map { w =>
        Future {
          (1 to 6).foreach { round =>
            val lo = w * 1000 + (round - 1) * 100
            val changes = (lo until lo + 100)
              .map(k => (k.toLong, (w + 1) * 1000L + round))
              .toDF("k", "touched")
            // outer patience on top of merge's built-in retry: under
            // deliberate six-round contention a writer may lose more
            // consecutive races than the default allows
            Versioned.withWriteRetry(10) {
              Upsert.merge(spark, t, "k", changes)
            }
          }
        }
      }
      Await.result(Future.sequence(writers), 5.minutes)
      val after = Versioned.read(spark, t)
      // ALL 1200 touched rows carry their writer's stamp — nothing lost
      assert(after.filter($"touched" > 0L).count() == 1200L)
      (0 to 1).foreach { w =>
        (1 to 6).foreach { round =>
          val lo = w * 1000 + (round - 1) * 100
          val got = after
            .filter($"k" >= lo.toLong && $"k" < (lo + 100).toLong)
            .select($"touched").distinct().as[Long].collect().toSeq
          assert(got == Seq((w + 1) * 1000L + round),
            s"writer $w round $round lost: $got")
        }
      }
      // versions are contiguous: 1 (seed) + 12 merges
      assert(Versioned.currentVersion(spark, t).contains(13L))
      assert(Versioned.versions(spark, t) == (1L to 13L))
      // and the change feed bridges the whole history (no gaps)
      assert(Cdf.changesSince(spark, t, 1L).count() == 1200L)
    } finally ec.shutdown()
  }

  test("mixed concurrent writers: merges, purges, compactions serialize") {
    val t = s"$root/mixed"
    Forget.publishIndexed(
      (0L until 1000L).map(k => (k, 0L)).toDF("k", "stamp"),
      t, nFiles = 8, keyCol = "k", stats = true)
    implicit val ec: scala.concurrent.ExecutionContextExecutorService = pool(3)
    try {
      val merger = Future {
        (1 to 5).foreach { r =>
          val changes = (r * 100L until r * 100L + 50L)
            .map(k => (k, r.toLong)).toDF("k", "stamp")
          Versioned.withWriteRetry(20) { Upsert.merge(spark, t, "k", changes) }
        }
      }
      val purger = Future {
        (0 until 3).foreach { i =>
          Versioned.withWriteRetry(20) {
            Forget.purge(spark, t, "k", Seq(900L + i * 2, 901L + i * 2))
          }
          Thread.sleep(50)
        }
      }
      val compactor = Future {
        (0 until 3).foreach { _ =>
          Versioned.withWriteRetry(20) {
            Compact.compactVersion(spark, t, "k", targetBytes = 32L * 1024)
          }
          Thread.sleep(100)
        }
      }
      Await.result(Future.sequence(Seq(merger, purger, compactor)),
        5.minutes)
      val after = Versioned.read(spark, t)
      assert(after.count() == 1000L - 6L)
      (1 to 5).foreach { r =>
        val got = after
          .filter($"k" >= r * 100L && $"k" < r * 100L + 50L)
          .select($"stamp").distinct().as[Long].collect().toSeq
        assert(got == Seq(r.toLong), s"merge round $r lost: $got")
      }
      assert(after.filter($"k" >= 900L && $"k" <= 905L).count() == 0L,
        "a purge was lost")
      // versions contiguous (no-skip numbering survives the mix)
      val vs = Versioned.versions(spark, t)
      assert(vs == (1L to vs.max), s"non-contiguous: $vs")
      // the change feed bridges the whole history: 250 merge upserts +
      // 6 purge deletions; compactions bridge via _changes_none
      assert(Cdf.changesSince(spark, t, 1L).count() == 256L)
    } finally ec.shutdown()
  }

  test("a derived publish against a stale base rejects; blind moves on") {
    val t = s"$root/stale"
    Versioned.publish(Seq((1L, "a")).toDF("k", "v"), t)
    Versioned.publish(Seq((2L, "b")).toDF("k", "v"), t) // live = 2
    intercept[Versioned.ConcurrentWriteException] {
      Versioned.publishFrom(spark, t, base = 1L) { dir =>
        Seq((9L, "stale")).toDF("k", "v").write.parquet(dir)
      }
    }
    // nothing half-published: live still 2, no v=3, no stage leftovers
    assert(Versioned.currentVersion(spark, t).contains(2L))
    assert(Versioned.versions(spark, t) == Seq(1L, 2L))
    // blind publish keeps working and lands at 3
    assert(Versioned.publish(Seq((3L, "c")).toDF("k", "v"), t) == 3L)
  }

  test("lost pointer update: readers probe forward, writers continue") {
    val t = s"$root/probe"
    Versioned.publish(Seq((1L, "a")).toDF("k", "v"), t)
    Versioned.publish(Seq((2L, "b")).toDF("k", "v"), t)
    // simulate a crash between commit-rename and pointer update: wind the
    // pointer cache back to 1 by hand
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = new org.apache.hadoop.fs.Path(s"$t/_manifest")
    f.delete(m, false)
    val out = f.create(m, true)
    out.write("1".getBytes); out.close()
    // reader sees v=2 anyway (contiguity + _commit_ts probe)
    assert(Versioned.currentVersion(spark, t).contains(2L))
    assert(Versioned.read(spark, t).select($"v").as[String].head() == "b")
    // next publish claims 3, not 2
    assert(Versioned.publish(Seq((3L, "c")).toDF("k", "v"), t) == 3L)
    assert(Versioned.versions(spark, t) == Seq(1L, 2L, 3L))
  }

  test("orphaned claim blocks loudly; healClaims restores liveness") {
    val t = s"$root/orphan"
    Versioned.publish(Seq((1L, "a")).toDF("k", "v"), t)
    // a claimant that died between claim and rename — LONG AGO (the claim
    // mtime is the adjudication signal: older than the grace = orphan)
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(s"$t/_claims/2")
    val out = f.create(orphan, false)
    out.close()
    f.setTimes(orphan, System.currentTimeMillis() - 3600000L, -1L)
    val e = intercept[Versioned.ConcurrentWriteException] {
      Upsert.merge(spark, t, "k", Seq((1L, "blocked")).toDF("k", "v"))
    }
    assert(e.orphaned, "a stale claim must adjudicate as orphaned")
    assert(e.getMessage.contains("healClaims"))
    assert(Versioned.currentVersion(spark, t).contains(1L),
      "a blocked merge must not publish anything")
    // clears the orphan AND v=1's served claim (claims persist until
    // healClaims/vacuum — they only serialize commits)
    assert(Versioned.healClaims(spark, t) == 2)
    assert(Upsert.merge(spark, t, "k",
      Seq((1L, "unblocked")).toDF("k", "v")) == 2L)
    assert(Versioned.read(spark, t).select($"v").as[String].head()
      == "unblocked")
    // vacuum also clears the claim layer + crashed stages
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$t/.stage-deadbeef"))
    Versioned.publish(Seq((9L, "z")).toDF("k", "v"), t)
    Versioned.vacuum(spark, t, keep = 0)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$t/.stage-deadbeef")))
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$t/_claims")))
  }

  test("slow committer inside the grace wins; competitor waits, no throw") {
    val t = s"$root/slow"
    Versioned.publish(Seq((1L, "a")).toDF("k", "v"), t)
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a cross-process committer whose claim→rename window runs
    // 1.2 s (an S3-style rename-as-copy): claim v=2 now, rename later —
    // under the old fixed 10×50 ms poll this was indistinguishable from
    // an orphan and threw; under mtime-grace adjudication the competitor
    // WAITS it out and moves on to v=3
    val stage = new org.apache.hadoop.fs.Path(s"$t/.stage-slowsim")
    f.mkdirs(stage)
    val ts = f.create(new org.apache.hadoop.fs.Path(stage, "_commit_ts"), true)
    ts.write(System.currentTimeMillis().toString.getBytes); ts.close()
    val d = f.create(new org.apache.hadoop.fs.Path(stage, "part-0.parquet"),
      true)
    d.close()
    val claim = f.create(new org.apache.hadoop.fs.Path(s"$t/_claims/2"), false)
    claim.close()
    val renamer = new Thread(() => {
      Thread.sleep(1200)
      f.rename(stage, new org.apache.hadoop.fs.Path(s"$t/v=2"))
      ()
    })
    renamer.start()
    // blind publish: sees claim 2 taken by a LIVE (young-claim) committer,
    // waits for its commit, then lands at 3 — no ConcurrentWriteException
    val v = Versioned.publish(Seq((3L, "c")).toDF("k", "v"), t)
    renamer.join()
    assert(v == 3L, s"expected the competitor to land at 3, got $v")
    assert(Versioned.currentVersion(spark, t).contains(3L))
    assert(Versioned.versions(spark, t) == Seq(1L, 2L, 3L))
  }

  test("publishFromRebasing: a true-returning rebase re-claims, no rethrow") {
    val t = s"$root/rebase-mech"
    Versioned.publish(Seq((1L, "a")).toDF("k", "v"), t) // v1 committed
    val rebased = new java.util.concurrent.atomic.AtomicLong
    // derived against base 0: v=1 is taken, so the hook must fire exactly
    // once with the competitor's version, then the stage commits at 2
    val v = Versioned.publishFromRebasing(spark, t, base = 0L) { dir =>
      Seq((2L, "b")).toDF("k", "v").write.parquet(dir)
    } { (compV, stage) =>
      assert(compV == 1L)
      assert(new org.apache.hadoop.fs.Path(stage).getName.startsWith(".stage-"))
      rebased.incrementAndGet()
      true
    }
    assert(v == 2L && rebased.get == 1L)
    assert(Versioned.readVersion(spark, t, 2L).count() == 1L)
    // and a false-returning hook still throws the plain conflict
    intercept[Versioned.ConcurrentWriteException] {
      Versioned.publishFromRebasing(spark, t, base = 0L) { dir =>
        Seq((3L, "c")).toDF("k", "v").write.parquet(dir)
      }((_, _) => false)
    }
  }

  test("disjoint-file concurrent merges: losers REBASE, one derivation each") {
    val t = s"$root/rebase"
    // RANGE-clustered layout: each file covers a disjoint key range, so
    // two writers on far-apart key ranges provably touch disjoint files
    Forget.publishClustered(
      (0L until 2000L).map(k => (k, 0L)).toDF("k", "stamp"),
      t, nFiles = 8, keyCol = "k", stats = true)
    val d0 = Upsert.derivations.get
    val r0 = Upsert.rebases.get
    implicit val ec: scala.concurrent.ExecutionContextExecutorService = pool(2)
    try {
      var merges = 0
      var round = 0
      // barrier-synced rounds collide with near-certainty (both writers
      // derive ~simultaneously and race the same claim); loop until at
      // least one rebase is observed so the assertion never vacuously
      // passes on a lucky serial schedule
      while (round < 12 && (Upsert.rebases.get == r0 || round < 3)) {
        round += 1
        val barrier = new java.util.concurrent.CyclicBarrier(2)
        val writers = (0 to 1).map { w =>
          Future {
            val lo = w * 1800 + round * 20 // A: 20..260; B: 1820..2060
            val changes = (lo until lo + 20)
              .map(k => (k.toLong, (w + 1) * 100L + round))
              .toDF("k", "stamp")
            barrier.await()
            Upsert.merge(spark, t, "k", changes)
          }
        }
        Await.result(Future.sequence(writers), 5.minutes)
        merges += 2
      }
      assert(Upsert.rebases.get > r0,
        s"no rebase observed in $round barrier-synced rounds — " +
          "either scheduling luck (rerun) or the rebase path is dead")
      // THE contract: every merge derived exactly once — conflicts were
      // absorbed by byte-level rebases, never by a re-derivation
      assert(Upsert.derivations.get - d0 == merges.toLong,
        s"${Upsert.derivations.get - d0} derivations for $merges merges")
      // and nothing was lost: both writers' final-round stamps are live
      val after = Versioned.read(spark, t)
      (0 to 1).foreach { w =>
        val lo = w * 1800 + round * 20
        val got = after.filter($"k" >= lo.toLong && $"k" < lo.toLong + 20L)
          .select($"stamp").distinct().as[Long].collect().toSeq
        assert(got == Seq((w + 1) * 100L + round),
          s"writer $w round $round lost: $got")
      }
      // versions contiguous, feed bridges the whole history
      val vs = Versioned.versions(spark, t)
      assert(vs == (1L to vs.max), s"non-contiguous: $vs")
      assert(Cdf.changesSince(spark, t, 1L).count() == merges * 20L)
    } finally ec.shutdown()
  }

  test("overlapping-file concurrent merges still re-derive (never rebase)") {
    val t = s"$root/overlap"
    Forget.publishClustered(
      (0L until 200L).map(k => (k, 0L)).toDF("k", "stamp"),
      t, nFiles = 2, keyCol = "k", stats = true)
    val r0 = Upsert.rebases.get
    implicit val ec: scala.concurrent.ExecutionContextExecutorService = pool(2)
    try {
      (1 to 3).foreach { round =>
        val barrier = new java.util.concurrent.CyclicBarrier(2)
        val writers = (0 to 1).map { w =>
          Future {
            // both writers hit the SAME file's key range, different keys
            val lo = w * 20 + round
            val changes = Seq((lo.toLong, w * 1000L + round.toLong))
              .toDF("k", "stamp")
            barrier.await()
            Versioned.withWriteRetry(20) {
              Upsert.merge(spark, t, "k", changes)
            }
          }
        }
        Await.result(Future.sequence(writers), 5.minutes)
      }
      assert(Upsert.rebases.get == r0,
        "overlapping-file merges must never take the rebase path")
      // first-committer-wins correctness as before
      val after = Versioned.read(spark, t)
      (1 to 3).foreach { round =>
        (0 to 1).foreach { w =>
          val got = after.filter($"k" === (w * 20 + round).toLong)
            .select($"stamp").as[Long].head()
          assert(got == w * 1000L + round.toLong)
        }
      }
    } finally ec.shutdown()
  }

  test("first-commit crash window: committed v=1 found without a pointer") {
    val t = s"$root/firstcrash"
    Versioned.publish(Seq((1L, "a")).toDF("k", "v"), t)
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash between the stage→v=1 rename and the FIRST pointer write:
    // no _manifest, no bak — readers must still find the committed v=1
    f.delete(new org.apache.hadoop.fs.Path(s"$t/_manifest"), false)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$t/_manifest.bak")))
    assert(Versioned.currentVersion(spark, t).contains(1L))
    assert(Versioned.read(spark, t).count() == 1L)
    // and the next publish claims 2, not a restart at 1
    assert(Versioned.publish(Seq((2L, "b")).toDF("k", "v"), t) == 2L)
  }
}
