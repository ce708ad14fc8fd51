package graft.lake

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/**
 * Cross-table atomic transactions ([[Txn]]): both tables flip in ONE
 * atomic step (no reader ever sees one advanced and the other lagging);
 * read-your-own-writes inside the txn; abort on a body throw restores
 * everything; the two crash windows (pre-flip, post-flip-pre-finalize)
 * adjudicate correctly through readers, colliding writers, and
 * [[Versioned.healClaims]]; replay-tag dedup never counts an
 * uncommitted txn's tag; the streaming feed glob never matches an
 * uncommitted version's change files; and the CdcSink atomic pair is
 * exactly-once across a mid-txn crash.
 */
class TxnSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-txn").toString
  private def hfs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run `thunk` on a fresh thread — the "any other reader/writer" view
    * (txn visibility is carried by the owning thread only). */
  private def outside[T](thunk: => T): T = {
    val ec = ExecutionContext.fromExecutorService(
      Executors.newSingleThreadExecutor())
    try Await.result(Future(thunk)(ec), 5.minutes)
    finally ec.shutdown()
  }

  private def seed(table: String, rows: Seq[(Long, Long)]): Unit = {
    Forget.publishIndexed(rows.toDF("k", "x"), table, nFiles = 2,
      keyCol = "k", stats = true)
    ()
  }

  test("two tables flip atomically; read-your-own-writes inside") {
    val a = s"$root/atomic-a"; val b = s"$root/atomic-b"
    seed(a, Seq((1L, 10L), (2L, 20L)))
    seed(b, Seq((1L, 100L)))
    val ctx = Txn.begin(spark)
    try {
      Upsert.merge(spark, a, "k", Seq((2L, 21L)).toDF("k", "x"))
      Upsert.merge(spark, b, "k", Seq((1L, 101L)).toDF("k", "x"))
      // read-your-own-writes: the owning thread sees both pending versions
      assert(Versioned.currentVersion(spark, a).contains(2L))
      assert(Versioned.read(spark, a).filter($"k" === 2L)
        .head().getLong(1) == 21L)
      // any other thread still sees v1 on BOTH tables
      assert(outside(Versioned.currentVersion(spark, a)).contains(1L))
      assert(outside(Versioned.currentVersion(spark, b)).contains(1L))
      assert(outside(Versioned.read(spark, b).head().getLong(1)) == 100L)
      // streaming-feed invariant: no `_changes` dir exists in a pending
      // version — the CdfStream glob cannot discover uncommitted changes
      val f = hfs(a)
      assert(!f.exists(new Path(s"$a/v=2/_changes")))
      assert(f.exists(new Path(s"$a/v=2/_changes_txn")))
      // history/replay probes skip the pending version
      assert(outside(History.frame(spark, a).count()) == 1L)
    } finally Txn.flip(ctx)
    Txn.detach()
    // ONE flip: both visible everywhere, feed sidecars promoted
    assert(outside(Versioned.currentVersion(spark, a)).contains(2L))
    assert(outside(Versioned.currentVersion(spark, b)).contains(2L))
    assert(hfs(a).exists(new Path(s"$a/v=2/_changes")))
    assert(!hfs(a).exists(new Path(s"$a/v=2/_txn")))
    // the change feed bridges across the txn'd version
    assert(Cdf.changesSince(spark, a, 1L).count() == 1L)
    // no record litter at the coordinator
    assert(hfs(a).listStatus(new Path(s"$a/_txns")).isEmpty)
  }

  test("abort on body throw: both tables untouched, numbers reusable") {
    val a = s"$root/abort-a"; val b = s"$root/abort-b"
    seed(a, Seq((1L, 10L))); seed(b, Seq((1L, 100L)))
    val boom = intercept[IllegalStateException] {
      Txn.atomically(spark) {
        Upsert.merge(spark, a, "k", Seq((1L, 11L)).toDF("k", "x"))
        Upsert.merge(spark, b, "k", Seq((1L, 111L)).toDF("k", "x"))
        throw new IllegalStateException("body failed after both merges")
      }
    }
    assert(boom.getMessage.contains("body failed"))
    Seq(a, b).foreach { t =>
      assert(Versioned.currentVersion(spark, t).contains(1L))
      assert(!hfs(t).exists(new Path(s"$t/v=2")), s"pending dir lingers at $t")
      assert(!hfs(t).exists(new Path(s"$t/_claims/2")), s"claim lingers at $t")
    }
    assert(hfs(a).listStatus(new Path(s"$a/_txns")).isEmpty)
    // the aborted number is immediately reclaimable
    assert(Upsert.merge(spark, a, "k", Seq((1L, 12L)).toDF("k", "x")) == 2L)
    assert(Versioned.read(spark, a).head().getLong(1) == 12L)
  }

  test("crash pre-flip: invisible, writer fails loudly, heal restores") {
    val a = s"$root/crash-a"; val b = s"$root/crash-b"
    seed(a, Seq((1L, 10L))); seed(b, Seq((1L, 100L)))
    val ctx = Txn.begin(spark)
    Upsert.merge(spark, a, "k", Seq((1L, 11L)).toDF("k", "x"),
      maxDriverKeys = 0) // distributed path inside a txn, for coverage
    Upsert.merge(spark, b, "k", Seq((1L, 111L)).toDF("k", "x"))
    Txn.detach() // driver crash: no flip, no abort
    assert(ctx.committedVersions.keySet == Set(a, b))
    // readers: both tables still at v1; time travel to v2 rejects
    assert(Versioned.currentVersion(spark, a).contains(1L))
    val dirty = intercept[IllegalArgumentException] {
      Versioned.readVersion(spark, a, 2L)
    }
    assert(dirty.getMessage.contains("uncommitted cross-table transaction"))
    // replay-tag probe must NOT count the uncommitted version's tag
    assert(Upsert.recentBatchTags(spark, a).isEmpty)
    // a colliding writer waits the txn grace, then fails toward heal
    sys.props("graft.txn.graceMs") = "300"
    try {
      val e = intercept[Versioned.ConcurrentWriteException] {
        Upsert.merge(spark, a, "k", Seq((1L, 13L)).toDF("k", "x"))
      }
      assert(e.txnPending)
      assert(e.getMessage.contains("healClaims"))
    } finally sys.props.remove("graft.txn.graceMs")
    // heal at the coordinator (a — first participant) aborts BOTH tables
    Versioned.healClaims(spark, a)
    Seq(a, b).foreach { t =>
      assert(Versioned.currentVersion(spark, t).contains(1L))
      assert(!hfs(t).exists(new Path(s"$t/v=2")), s"pending dir at $t")
    }
    assert(hfs(a).listStatus(new Path(s"$a/_txns")).isEmpty)
    // liveness restored, numbers contiguous
    assert(Upsert.merge(spark, a, "k", Seq((1L, 14L)).toDF("k", "x")) == 2L)
    assert(Upsert.merge(spark, b, "k", Seq((1L, 114L)).toDF("k", "x")) == 2L)
  }

  test("crash post-flip pre-finalize: committed, heal completes finalize") {
    val a = s"$root/flip-a"; val b = s"$root/flip-b"
    seed(a, Seq((1L, 10L))); seed(b, Seq((1L, 100L)))
    val ctx = Txn.begin(spark)
    Upsert.merge(spark, a, "k", Seq((1L, 11L)).toDF("k", "x"))
    Upsert.merge(spark, b, "k", Seq((1L, 111L)).toDF("k", "x"))
    // the COMMIT POINT alone (what flip does first), then crash before
    // any finalize step
    val f = hfs(a)
    f.create(new Path(ctx.recordPath + ".commit"), false).close()
    Txn.detach()
    // committed: every reader serves v2 on both tables, pointer or not
    assert(Versioned.currentVersion(spark, a).contains(2L))
    assert(Versioned.currentVersion(spark, b).contains(2L))
    assert(Versioned.read(spark, a).head().getLong(1) == 11L)
    // the change feed bridges even while the sidecar still wears the
    // staged name
    assert(f.exists(new Path(s"$a/v=2/_changes_txn")))
    assert(Cdf.changesSince(spark, a, 1L).count() == 1L)
    assert(History.frame(spark, a).count() == 2L)
    // heal completes the finalize: sidecars promoted, markers dropped,
    // record + .commit gone
    Versioned.healClaims(spark, a)
    Seq(a, b).foreach { t =>
      assert(hfs(t).exists(new Path(s"$t/v=2/_changes")), s"feed at $t")
      assert(!hfs(t).exists(new Path(s"$t/v=2/_txn")), s"marker at $t")
    }
    assert(f.listStatus(new Path(s"$a/_txns")).isEmpty)
    assert(Cdf.changesSince(spark, a, 1L).count() == 1L)
    // and the tables keep working
    assert(Upsert.merge(spark, a, "k", Seq((1L, 12L)).toDF("k", "x")) == 3L)
  }

  test("colliding blind writer waits out a pending txn, never loses") {
    val t = s"$root/collide"
    seed(t, Seq((1L, 10L)))
    implicit val ec: scala.concurrent.ExecutionContextExecutorService =
      ExecutionContext.fromExecutorService(Executors.newFixedThreadPool(2))
    try {
      val txnSide = Future {
        val ctx = Txn.begin(spark)
        try {
          Upsert.merge(spark, t, "k", Seq((1L, 11L)).toDF("k", "x"))
          Thread.sleep(900) // hold the pending window open
        } finally { Txn.flip(ctx); Txn.detach() }
      }
      // wait until the txn's v2 has actually landed (pending) before the
      // competitor fires — the collision under test needs the dir there
      val deadline = System.currentTimeMillis() + 60000
      while (!hfs(t).exists(new Path(s"$t/v=2/_commit_ts")) &&
             System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(hfs(t).exists(new Path(s"$t/v=2/_commit_ts")))
      val blindSide = Future {
        Versioned.publish(Seq((9L, 90L)).toDF("k", "x"), t)
      }
      Await.result(txnSide, 2.minutes)
      val blindV = Await.result(blindSide, 2.minutes)
      // the blind publish waited for the flip and landed AFTER the txn —
      // both commits survive, numbers contiguous
      assert(blindV == 3L, s"blind publish landed at $blindV")
      assert(Versioned.currentVersion(spark, t).contains(3L))
      assert(Versioned.readVersion(spark, t, 2L)
        .filter($"k" === 1L).head().getLong(1) == 11L)
    } finally ec.shutdown()
  }

  test("CdcSink atomic pair: exactly-once across a mid-txn crash") {
    val t = s"$root/sink-t"; val view = s"$root/sink-v"
    Forget.publishIndexed(
      Seq((1L, "red", 10L), (2L, "blue", 20L)).toDF("k", "color", "x"),
      t, nFiles = 2, keyCol = "k", stats = true)
    MatView.create(spark, t, "k", view, Seq("color"), Seq("x"))
    def batch(x: Long) = Seq(("U", 1L, "red", x)).toDF("op", "k", "color", "x")
    // batch 1 lands atomically: table and view advance together
    graft.streaming.CdcSink.applyBatchWithView(spark, t, "k", view,
      batch(11L), 1L, atomic = true)
    assert(Versioned.currentVersion(spark, t).contains(2L))
    assert(Versioned.currentVersion(spark, view).contains(2L))
    def sumX(df: org.apache.spark.sql.DataFrame): Long = {
      val r = df.head()
      r.getDecimal(df.columns.indexOf("sum_x")).longValueExact()
    }
    val red = Versioned.read(spark, view).filter($"color" === "red")
    assert(sumX(red) == 11L)
    // replay of batch 1: pure no-op on both
    graft.streaming.CdcSink.applyBatchWithView(spark, t, "k", view,
      batch(11L), 1L, atomic = true)
    assert(Versioned.currentVersion(spark, t).contains(2L))
    assert(Versioned.currentVersion(spark, view).contains(2L))
    // batch 2's txn crashes pre-flip (both halves ran, neither visible)
    val ctx = Txn.begin(spark)
    graft.streaming.CdcSink.applyBatch(spark, t, "k", batch(12L), 2L)
    MatView.refresh(spark, view, batch(12L))
    Txn.detach()
    assert(Versioned.currentVersion(spark, t).contains(2L))
    Versioned.healClaims(spark, t) // the stream's restart-time maintenance
    assert(ctx.committedVersions.size == 2)
    // the replay of batch 2 applies EXACTLY once
    graft.streaming.CdcSink.applyBatchWithView(spark, t, "k", view,
      batch(12L), 2L, atomic = true)
    assert(Versioned.read(spark, t).filter($"k" === 1L)
      .head().getLong(2) == 12L)
    val red2 = Versioned.read(spark, view).filter($"color" === "red")
    assert(sumX(red2) == 12L)
  }

  test("timestamp travel never resolves to a pending version") {
    val t = s"$root/asof"
    seed(t, Seq((1L, 10L)))
    val ctx = Txn.begin(spark)
    Upsert.merge(spark, t, "k", Seq((1L, 11L)).toDF("k", "x"))
    Txn.detach() // crash pre-flip: v2 pending forever (until heal)
    // as-of-now resolves to v1 and READS — not to the pending v2 that
    // readVersion would then reject
    assert(ctx.committedVersions.values.toSeq == Seq(2L))
    val now = System.currentTimeMillis() + 60000
    assert(Versioned.versionAsOf(spark, t, now) == 1L)
    assert(Versioned.readAsOf(spark, t, now).head().getLong(1) == 10L)
    Versioned.healClaims(spark, t)
  }

  test("heal at a NON-coordinator participant completes a crashed " +
      "finalize (feed promoted, marker dropped)") {
    val a = s"$root/nc-a"; val b = s"$root/nc-b"
    seed(a, Seq((1L, 10L))); seed(b, Seq((1L, 100L)))
    val ctx = Txn.begin(spark)
    Upsert.merge(spark, a, "k", Seq((1L, 11L)).toDF("k", "x"))
    Upsert.merge(spark, b, "k", Seq((1L, 111L)).toDF("k", "x"))
    hfs(a).create(new Path(ctx.recordPath + ".commit"), false).close()
    Txn.detach() // crash after the flip, before any finalize
    // healing table B — whose _txns/ is empty (the record lives at A) —
    // must still finalize B's committed participant: B's version is AT
    // the live version, so the scan cannot stop above it
    Versioned.healClaims(spark, b)
    assert(hfs(b).exists(new Path(s"$b/v=2/_changes")))
    assert(!hfs(b).exists(new Path(s"$b/v=2/_txn")))
    // A heals through its own record as usual
    Versioned.healClaims(spark, a)
    assert(hfs(a).exists(new Path(s"$a/v=2/_changes")))
    assert(hfs(a).listStatus(new Path(s"$a/_txns")).isEmpty)
  }

  test("the next commit tidies a crashed finalize's staged feed") {
    val t = s"$root/tidy"
    seed(t, Seq((1L, 10L)))
    val ctx = Txn.begin(spark)
    Upsert.merge(spark, t, "k", Seq((1L, 11L)).toDF("k", "x"))
    hfs(t).create(new Path(ctx.recordPath + ".commit"), false).close()
    Txn.detach() // committed, finalize never ran: feed staged at v2
    assert(hfs(t).exists(new Path(s"$t/v=2/_changes_txn")))
    // an ordinary writer's publish promotes it opportunistically — the
    // streaming glob's gap lasts one commit, not until a manual heal
    Upsert.merge(spark, t, "k", Seq((1L, 12L)).toDF("k", "x"))
    assert(hfs(t).exists(new Path(s"$t/v=2/_changes")))
    assert(!hfs(t).exists(new Path(s"$t/v=2/_txn")))
    assert(Cdf.changesSince(spark, t, 1L).count() == 2L)
  }

  test("replay-dedup window survives pending dirs at the tail") {
    val t = s"$root/window"
    seed(t, Seq((1L, 10L)))
    Upsert.applyCdc(spark, t, "k",
      Seq(("U", 1L, 20L)).toDF("op", "k", "x"), batchTag = Some("b1"))
    val ctx = Txn.begin(spark)
    Upsert.applyCdc(spark, t, "k",
      Seq(("U", 1L, 30L)).toDF("op", "k", "x"), batchTag = Some("b2"))
    Txn.detach() // pending v3 carries tag b2
    assert(ctx.committedVersions.nonEmpty)
    // the pending dir neither surfaces its own tag nor displaces a
    // committed one out of the lookback window
    val tags = Upsert.recentBatchTags(spark, t, lookback = 2)
    assert(tags.contains("b1"))
    assert(!tags.contains("b2"))
    Versioned.healClaims(spark, t)
  }

  test("Drop-mode quarantine + merge flip as one txn; crash replays " +
      "both exactly once") {
    val t = s"$root/exp-t"; val q = s"$root/exp-q"
    Forget.publishIndexed(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "n"), t, 1, "k", stats = true)
    val rules = Seq(Expect.Rule("n_positive", "n >= 0"))
    def batch(good: Long, badV: Long) =
      Seq(("U", 1L, good), ("U", 2L, badV)).toDF("op", "k", "n")
    // normal path: both tables flip together
    val r = Expect.applyCdc(spark, t, "k", batch(11L, -1L), rules,
      Expect.Mode.Drop, Some(q))
    assert(r.published == 1L && r.quarantined == 1L)
    assert(Versioned.currentVersion(spark, t).contains(2L))
    assert(Versioned.currentVersion(spark, q).contains(1L))
    assert(Versioned.read(spark, q).count() == 1L)
    // crash mid-pair: an enclosing txn the Drop path JOINS, detached
    // before its flip — neither the quarantine version nor the merge is
    // visible, and the replay applies BOTH exactly once (the old
    // ordering would have re-published the quarantine a second time)
    val ctx = Txn.begin(spark)
    Expect.applyCdc(spark, t, "k", batch(12L, -2L), rules,
      Expect.Mode.Drop, Some(q), batchTag = Some("b9"))
    Txn.detach()
    assert(ctx.committedVersions.size == 2)
    assert(Versioned.currentVersion(spark, t).contains(2L))
    assert(Versioned.currentVersion(spark, q).contains(1L))
    Versioned.healClaims(spark, t) // coordinator: the TARGET publishes
    // first inside the pair (the shared quarantine's claim is held only
    // flip-long), so the record lives at t
    Expect.applyCdc(spark, t, "k", batch(12L, -2L), rules,
      Expect.Mode.Drop, Some(q), batchTag = Some("b9"))
    assert(Versioned.currentVersion(spark, t).contains(3L))
    assert(Versioned.currentVersion(spark, q).contains(2L))
    assert(Versioned.read(spark, t).filter($"k" === 1L)
      .head().getLong(1) == 12L)
    // exactly ONE quarantine version carries the replayed violator
    assert(Versioned.read(spark, q).count() == 1L)
  }

  test("streaming replay over a crashed txn SELF-HEALS (sink owns its " +
      "tables — no manual healClaims)") {
    val t = s"$root/heal-t"; val view = s"$root/heal-v"
    Forget.publishIndexed(
      Seq((1L, "red", 10L)).toDF("k", "color", "x"),
      t, 1, "k", stats = true)
    MatView.create(spark, t, "k", view, Seq("color"), Seq("x"))
    def batch(x: Long) = Seq(("U", 1L, "red", x)).toDF("op", "k", "color", "x")
    // crash an atomic micro-batch pre-flip
    val ctx = Txn.begin(spark)
    graft.streaming.CdcSink.applyBatch(spark, t, "k", batch(11L), 1L)
    MatView.refresh(spark, view, batch(11L))
    Txn.detach()
    assert(ctx.committedVersions.size == 2)
    // the replay heals the crashed txn itself and applies exactly once —
    // tiny grace so the one-time adjudication wait doesn't slow the spec
    sys.props("graft.txn.graceMs") = "200"
    try graft.streaming.CdcSink.applyBatchWithView(spark, t, "k", view,
      batch(11L), 1L, atomic = true)
    finally sys.props.remove("graft.txn.graceMs")
    assert(Versioned.currentVersion(spark, t).contains(2L))
    assert(Versioned.currentVersion(spark, view).contains(2L))
    assert(Versioned.read(spark, t).head().getLong(2) == 11L)
  }

  test("a flip racing a concurrent heal detects the healed-away txn " +
      "instead of finalizing toward deleted dirs") {
    val t = s"$root/fliprace"
    Forget.publishIndexed(Seq((1L, 5L)).toDF("k", "x"), t, 1, "k",
      stats = true)
    val ctx = Txn.begin(spark)
    Upsert.merge(spark, t, "k", Seq((1L, 6L)).toDF("k", "x"))
    Txn.detach()
    // a heal adjudicates the still-pending txn as crashed (record and
    // participant dir deleted) — run from "another operator's" thread
    outside {
      sys.props("graft.txn.graceMs") = "100"
      try Versioned.healClaims(spark, t)
      finally sys.props.remove("graft.txn.graceMs")
    }
    // the original owner's flip must DETECT the adjudication: no
    // finalize, no pointer advance, the orphaned .commit cleaned up
    val e = intercept[IllegalStateException] { Txn.flip(ctx) }
    assert(e.getMessage.contains("healed away"))
    assert(Versioned.currentVersion(spark, t).contains(1L))
    assert(Versioned.read(spark, t).head().getLong(1) == 5L)
    val txns = new Path(s"$t/_txns")
    val leftover =
      if (!hfs(t).exists(txns)) Seq.empty
      else hfs(t).listStatus(txns).toSeq.map(_.getPath.getName)
    assert(leftover.isEmpty, s"orphaned txn artifacts: $leftover")
    // the table keeps working: the number the healed txn held is free
    Upsert.merge(spark, t, "k", Seq((1L, 7L)).toDF("k", "x"))
    assert(Versioned.read(spark, t).head().getLong(1) == 7L)
  }

  test("a flip racing a COMMITTED-then-finalized heal completes instead " +
      "of claiming abort (no double-apply)") {
    val t = s"$root/flipdone"
    Forget.publishIndexed(Seq((1L, 5L)).toDF("k", "x"), t, 1, "k",
      stats = true)
    val ctx = Txn.begin(spark)
    Upsert.merge(spark, t, "k", Seq((1L, 6L)).toDF("k", "x"))
    Txn.detach()
    // a concurrent heal that saw the .commit marker adjudicates the txn
    // COMMITTED and finalizes (pointer advanced, record+marker deleted)
    val rec = new Path(ctx.recordPath)
    val f = hfs(t)
    f.create(new Path(rec.getParent, rec.getName + ".commit"), false)
      .close()
    outside(Versioned.healClaims(spark, t))
    assert(Versioned.currentVersion(spark, t).contains(2L))
    // the owner's flip must RECOGNIZE the committed outcome — throwing
    // 'aborted, re-run' here would double-apply the merge
    Txn.flip(ctx)
    assert(Versioned.currentVersion(spark, t).contains(2L))
    assert(Versioned.read(spark, t).head().getLong(1) == 6L)
    // no orphaned record artifacts
    val txns = new Path(s"$t/_txns")
    val leftover =
      if (!f.exists(txns)) Seq.empty
      else f.listStatus(txns).toSeq.map(_.getPath.getName)
    assert(leftover.isEmpty, s"orphaned txn artifacts: $leftover")
  }

  test("nested atomically rejects; empty txn is a no-op") {
    val e = intercept[IllegalArgumentException] {
      Txn.atomically(spark) {
        Txn.atomically(spark)(())
      }
    }
    assert(e.getMessage.contains("nested"))
    // an empty txn leaves nothing behind and returns the body value
    assert(Txn.atomically(spark)(42) == 42)
  }
}
