package graft.lake

import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Cross-table atomic transactions over [[Versioned]] tables — the one
 * semantic the per-table commit protocol cannot express: several tables
 * (a CDC target and its [[MatView]], a table and its quarantine, two
 * halves of a double-entry update) flipping to their new versions in ONE
 * atomic step, so no reader ever observes table A advanced while table B
 * lags. (Delta Lake itself stops at single-table transactions; this is
 * the Iceberg/Nessie-style multi-table commit, re-expressed on the
 * claim-commit layout. Reference scope: the reference pipeline's
 * extract-then-load steps (`pipeline.py:76` `run_daily`: extract, then
 * `upload_events` + metadata as separate writes) publish each output
 * independently and accept the skew window — this closes it.)
 *
 * Protocol (one new state on top of the [[Versioned]] claim-commit
 * machinery — every per-table step is unchanged):
 *
 *  1. The txn body runs ordinary DML/publish calls. Each publish claims
 *     and renames its `v=N` exactly as before, but with a `_txn` marker
 *     inside the version dir (delivered complete by the same atomic
 *     rename) naming this txn's RECORD file, and with the pointer-cache
 *     update deferred. The record (`<firstTable>/_txns/<id>`, rewritten
 *     BEFORE each participant's rename so it always lists every renamed
 *     dir) is the recovery manifest.
 *  2. COMMIT POINT: one `create(<record>.commit, overwrite = false)`.
 *     Every participant version becomes visible in that single atomic
 *     metadata op — [[resolve]] is how readers adjudicate a marker.
 *  3. Finalize (best-effort, idempotent, completed by [[heal]] after a
 *     crash): per participant, promote the `_changes_txn` feed sidecar
 *     to `_changes` (streaming tails must not discover change files of
 *     uncommitted versions), drop the `_txn` marker, update the pointer
 *     cache; then delete the record, then its `.commit`.
 *
 * Visibility rule (the whole correctness argument): a version dir whose
 * `_txn` marker is unresolved-PENDING (record exists, `.commit` does
 * not) is NOT committed — [[Versioned.currentVersion]]'s forward probe
 * stops before it, time-travel reads of it throw, replay-tag probes and
 * history listings skip it. A marker whose record carries `.commit` —
 * or has been finalized away entirely — reads as committed ([[abort]]
 * deletes version dirs BEFORE the record, so a surviving marked dir
 * with no record can only be post-finalize). Within the OWNING txn the
 * pending versions are visible (read-your-own-writes): a view refresh
 * inside the txn sees the source version the same txn just published.
 *
 * Crash windows: before any rename — stage cleanup only, claims healed
 * by [[Versioned.healClaims]]. Between a rename and the commit point —
 * the renamed dirs are pending-invisible forever; [[heal]] (run by
 * `healClaims`/`vacuum`, exclusive maintenance) aborts the record:
 * deletes each listed dir whose marker matches, frees the claims,
 * drops the record. After the commit point — committed; [[heal]]
 * completes the finalize. Concurrent writers that collide with a
 * pending version wait for the resolution (flip → plain re-derive;
 * abort → the number frees up) up to [[txnGraceMs]], then fail loudly
 * toward `healClaims` — size the grace above the longest expected txn
 * body, exactly like `claimGraceMs` vs the slowest rename.
 *
 * Scale posture: a txn adds per-participant ONE small-file rewrite (the
 * record), one marker file, and one rename — metadata ops, independent
 * of data size. Steady-state reads pay nothing: markers exist only
 * between a participant's rename and the finalize, so the probe's
 * marker check is one existence probe on dirs younger than the flip.
 * The claims held across the txn body make competing writers on the
 * SAME tables wait/retry (first-committer-wins, with the txn as one
 * commit) — keep txn bodies short, as with any OCC hold.
 */
object Txn {

  /** How long a writer colliding with a PENDING txn version waits for
    * the resolution (commit flip or abort) before failing toward
    * `healClaims`. Via `graft.txn.graceMs`; default 30 s. */
  private[lake] def txnGraceMs: Long =
    sys.props.get("graft.txn.graceMs").flatMap(_.toLongOption)
      .getOrElse(30000L)

  /** One renamed participant: table, version, its FileSystem, and the
    * dir's parquet-file FINGERPRINT as OUR rename delivered it — the
    * identity that distinguishes our dir from a later writer's re-use
    * of the same number after a concurrent heal freed it. Parquet part
    * names carry write UUIDs (and every DML version holds at least its
    * change-feed parquet), so two different publishes can never share a
    * fingerprint — where a timestamp marker could collide across
    * process clocks. */
  private[lake] final case class Participant(table: String, v: Long,
                                             f: FileSystem,
                                             identity: Seq[String])

  /** In-flight transaction state, thread-local (a txn is one driver
    * thread's sequence of publishes — Spark actions inside fan out to
    * executors as usual; only the COMMITS serialize through here). */
  private[lake] final class Ctx(val spark: SparkSession,
                                val id: String) {
    private[Txn] val parts = new ArrayBuffer[Participant]
    private[Txn] var record: Option[Path] = None
    private[Txn] var recordFs: FileSystem = _
    /** Qualified record path — the `_txn` marker's first line. */
    private[lake] def recordPath: String = record.get.toString
    private[graft] def committedVersions: Map[String, Long] =
      parts.map(p => p.table -> p.v).toMap
  }

  private val activeCtx = new ThreadLocal[Ctx]
  private[graft] def current: Option[Ctx] = Option(activeCtx.get)
  private[graft] def currentId: Option[String] = current.map(_.id)

  private def recordDir(table: String) = new Path(s"$table/_txns")
  private def commitMarker(record: Path) =
    new Path(record.getParent, record.getName + ".commit")

  /** Run `body` as one atomic cross-table transaction: every
    * [[Versioned]] publish inside it (merge, purge, view refresh, blind
    * publish — anything that commits a version) becomes a participant,
    * and ALL of them flip visible in one atomic step after `body`
    * returns. Any throw aborts: every renamed participant dir is
    * deleted, claims freed, and the throw propagates — the tables read
    * exactly as before the txn. Returns `body`'s value. Nesting is
    * rejected (one commit point cannot serve two atomicity scopes);
    * [[Versioned.ConcurrentWriteException]] from a participant
    * propagates after the abort, so the standard
    * [[Versioned.withWriteRetry]] wrapper re-runs the WHOLE txn against
    * the new live versions. */
  def atomically[T](spark: SparkSession)(body: => T): T = {
    require(activeCtx.get == null,
      "nested Txn.atomically — one commit point cannot serve two " +
        "atomicity scopes; compose the work into the outer txn body")
    val ctx = new Ctx(spark, java.util.UUID.randomUUID.toString)
    activeCtx.set(ctx)
    try {
      val out =
        try body
        catch { case t: Throwable => abort(ctx); throw t }
      commitOrAbort(ctx)
      out
    } finally activeCtx.remove()
  }

  /** [[flip]], but a flip failure PROVABLY short of the commit point
    * (the `.commit` marker does not exist) aborts so the tables
    * self-heal instead of wedging every writer behind pending dirs
    * until a manual heal. A failure at-or-past the commit point — or
    * one whose outcome cannot be established (the existence probe
    * itself fails) — rethrows without abort: the txn IS committed (or
    * might be), and [[heal]]/the write-path tidy complete the
    * finalize. */
  private[graft] def commitOrAbort(ctx: Ctx): Unit =
    try flip(ctx)
    catch {
      case t: Throwable =>
        if (ctx.parts.nonEmpty) {
          val committed =
            try ctx.recordFs.exists(commitMarker(ctx.record.get))
            catch { case _: java.io.IOException => true } // assume worst
          if (!committed) abort(ctx)
        }
        throw t
    }

  /** Spec seams: begin/flip/abort compose [[atomically]] and let a spec
    * hold the pre-flip state open while another thread observes;
    * [[detach]] drops the thread-local WITHOUT flip or abort — the
    * on-disk state a driver crash mid-txn leaves behind. */
  private[graft] def detach(): Unit = activeCtx.remove()

  private[graft] def begin(spark: SparkSession): Ctx = {
    require(activeCtx.get == null, "nested Txn.begin")
    val ctx = new Ctx(spark, java.util.UUID.randomUUID.toString)
    activeCtx.set(ctx)
    ctx
  }

  /** Called by [[Versioned]] commit internals AFTER winning the claim
    * for `version` and BEFORE the stage→dest rename: ensures the record
    * exists and lists this participant (so a crash after the rename is
    * always adjudicable), and plants the `_txn` marker in the stage (the
    * rename delivers it atomically with the data). */
  private[lake] def prepare(ctx: Ctx, f: FileSystem, table: String,
                            version: Long, stage: Path): Unit = {
    if (ctx.record.isEmpty) {
      // the record lives under the FIRST participant table — the txn's
      // coordinator; heal() at that table adjudicates the whole txn
      val dir = recordDir(table)
      f.mkdirs(dir)
      ctx.record = Some(f.makeQualified(new Path(dir, ctx.id)))
      ctx.recordFs = f
    }
    // rewrite the record with every participant INCLUDING this one —
    // before the rename, so every renamed dir is always listed. Tmp +
    // rename, NOT create-overwrite: an in-place truncate-then-write
    // leaves an empty/partial record in the crash window, and heal()
    // would adjudicate an empty record as a zero-participant abort while
    // earlier-renamed dirs survive — their markers would then resolve
    // "no record = finalized-committed", exposing half a txn
    val body = (ctx.parts.map(p => s"t ${p.table} ${p.v}") :+
      s"t $table $version").mkString("\n")
    val rec = ctx.record.get
    val tmp = new Path(rec.getParent, rec.getName + ".tmp")
    val out = ctx.recordFs.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    ctx.recordFs.delete(rec, false)
    require(ctx.recordFs.rename(tmp, rec),
      s"txn record rewrite failed: $tmp -> $rec")
    val m = f.create(new Path(stage, "_txn"), true)
    try m.write(s"${ctx.recordPath}\n${ctx.id}"
      .getBytes(StandardCharsets.UTF_8))
    finally m.close()
  }

  // the UUID-bearing basenames under a version dir (recursive, so feed
  // sidecars count and the `_changes_txn` -> `_changes` finalize rename
  // does not move any NAME); empty when the dir is gone
  private def parquetNames(f: FileSystem, dir: String): Seq[String] =
    try {
      val it = f.listFiles(new Path(dir), true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet"))
          b += st.getPath.getName
      }
      b.result().sorted
    } catch { case _: java.io.FileNotFoundException => Seq.empty }

  /** Called after the participant's rename won: track it for the flip,
    * fingerprinting the dir (the flip-vs-heal adjudication keys on it —
    * a later writer re-using a heal-freed number can never reproduce
    * our part-file UUIDs). */
  private[lake] def registered(ctx: Ctx, f: FileSystem, table: String,
                               version: Long): Unit =
    ctx.parts += Participant(table, version, f,
      parquetNames(f, s"$table/v=$version"))

  /** COMMIT: one atomic `.commit` create, then finalize. */
  private[graft] def flip(ctx: Ctx): Unit = {
    if (ctx.parts.isEmpty) return // empty txn: nothing renamed, no record
    val rec = ctx.record.get
    val out = ctx.recordFs.create(commitMarker(rec), false) // COMMIT POINT
    out.close()
    // the create succeeds even when a concurrent heal (run in violation
    // of its no-active-writers contract) already adjudicated this txn
    // and DELETED the record — finalizing blindly could pointer-update
    // tables toward dirs that no longer exist. A vanished record has TWO
    // readings, distinguished by the participant dirs themselves:
    //  - the heal adjudicated COMMITTED (it saw an earlier .commit) and
    //    ran the finalize — every participant dir SURVIVES. Complete our
    //    own (idempotent) finalize: the work is done, the txn committed,
    //    and throwing 'aborted, re-run' here would DOUBLE-APPLY it.
    //  - the heal adjudicated CRASHED and aborted — every participant
    //    dir is GONE. Delete the now-orphaned marker and throw.
    if (!ctx.recordFs.exists(rec)) {
      // identity-checked: the dir counts as OURS only when its parquet
      // fingerprint matches what our rename delivered — a later writer
      // re-using a heal-freed number is never misread as our committed
      // participant (its part files carry different write UUIDs)
      val survived = ctx.parts.forall { p =>
        p.identity.nonEmpty &&
          parquetNames(p.f, s"${p.table}/v=${p.v}") == p.identity
      }
      if (!survived) {
        ctx.recordFs.delete(commitMarker(rec), false)
        throw new IllegalStateException(
          s"transaction ${ctx.id} was healed away before its commit " +
            "flip — Versioned.healClaims ran concurrently with an " +
            "active writer (it is exclusive maintenance); the txn " +
            "aborted: no participant version is visible. Re-run the " +
            "transaction.")
      }
      // committed-and-finalized by the heal: finalizeCommitted below
      // re-runs the idempotent per-participant steps and removes our
      // orphaned .commit marker (its record delete no-ops)
    }
    finalizeCommitted(ctx.recordFs, rec,
      ctx.parts.toSeq.map(p => (p.table, p.v, p.f)))
  }

  /** ROLLBACK a not-yet-flipped ctx: delete every renamed participant
    * dir (never exposed — their markers are unresolved-pending), free
    * the claims, drop the record. Dir deletion precedes record deletion
    * — the invariant that makes "marked dir, no record" read as
    * committed-finalized. IDENTITY-GUARDED like [[heal]]'s abort arm:
    * only a dir whose `_txn` marker names THIS txn dies — if a
    * concurrent heal already adjudicated us away and a later writer
    * re-used the freed number, that committed dir (and its claim) is
    * never collateral. */
  private[graft] def abort(ctx: Ctx): Unit = {
    ctx.parts.foreach { case Participant(table, v, f, _) =>
      val vdir = s"$table/v=$v"
      val ours = Versioned.readSmallFile(f, new Path(s"$vdir/_txn"))
        .exists(_.linesIterator.toSeq.lift(1).contains(ctx.id))
      if (ours) {
        // claim BEFORE dir: a competitor that sees the claim vanish
        // while the dir lingers re-adjudicates through the
        // pending-marker wait (ends in Gone); the reverse order would
        // let it misread the moment as an orphaned claim and fail
        // loudly for nothing
        f.delete(new Path(s"$table/_claims/$v"), false)
        f.delete(new Path(vdir), true)
        ()
      }
      // not ours (or already gone): a heal got here first — its abort
      // freed the claim; whatever holds the number now is a stranger's
    }
    ctx.record.foreach { rec =>
      ctx.recordFs.delete(rec, false)
      ()
    }
  }

  // ONE participant's finalize step (feed promote, marker drop, pointer
  // + checkpoint caches) — shared by the flip, heal's committed arm, and
  // heal's foreign-committed arm, so the three paths cannot drift.
  // Idempotent: every step no-ops when already done.
  private def finalizeParticipant(f: FileSystem, table: String,
                                  v: Long): Unit = {
    val dir = s"$table/v=$v"
    val pendingFeed = new Path(s"$dir/_changes_txn")
    if (f.exists(pendingFeed))
      f.rename(pendingFeed, new Path(s"$dir/_changes"))
    f.delete(new Path(s"$dir/_txn"), false)
    Versioned.pointerUpdate(f, table, v)
    Checkpoint.maybeWrite(f, table, v)
  }

  // finalize a COMMITTED txn (flip already durable): promote feed
  // sidecars, drop markers, update pointers, then record, then .commit.
  // Idempotent — heal() re-runs it after a finalize crash.
  private def finalizeCommitted(recordFs: FileSystem, record: Path,
      parts: Seq[(String, Long, FileSystem)]): Unit = {
    parts.foreach { case (table, v, f) => finalizeParticipant(f, table, v) }
    recordFs.delete(record, false)
    recordFs.delete(commitMarker(record), false)
    ()
  }

  /** Opportunistic write-path finalize ([[Versioned]] calls this before a
    * publish): promote any COMMITTED-but-unfinalized participant in the
    * recent version window, so a txn that crashed between its commit flip
    * and its finalize stalls the streaming feed (`_changes_txn` invisible
    * to the `v=*&#47;_changes` glob) for at most one subsequent commit on
    * the table, not until a manual heal. Bounded lookback — the window a
    * crashed finalize can realistically span; older stragglers fall to
    * [[heal]]. Pending markers (ours or others') are left alone. */
  private[lake] def tidy(f: FileSystem, table: String, live: Long): Unit = {
    var v = math.max(1L, live - 8)
    while (v <= live) {
      if (f.exists(new Path(s"$table/v=$v/_txn")) &&
          resolve(f, s"$table/v=$v") == Committed)
        finalizeParticipant(f, table, v)
      v += 1
    }
  }

  /** How a version dir's `_txn` marker reads RIGHT NOW. */
  private[lake] sealed trait Resolution
  /** No marker — an ordinary single-table commit. */
  private[lake] case object NoTxn extends Resolution
  /** The txn committed (`.commit` exists, or the record is finalized
    * away — abort deletes dirs before the record, so a surviving marked
    * dir without a record is always post-finalize). */
  private[lake] case object Committed extends Resolution
  /** In-flight or crashed-uncommitted: INVISIBLE to everyone but the
    * owning thread. */
  private[lake] case object PendingOther extends Resolution
  /** Pending, but owned by THIS thread's active txn —
    * read-your-own-writes. */
  private[lake] case object PendingOurs extends Resolution

  private[lake] def resolve(f: FileSystem, versionDir: String): Resolution = {
    val marker = new Path(s"$versionDir/_txn")
    val content =
      try {
        if (!f.exists(marker)) return NoTxn
        Versioned.readSmallFile(f, marker)
      } catch {
        // dir (or marker) vanished under us — an abort raced this read;
        // the caller's existence checks re-adjudicate the dir itself
        case _: java.io.FileNotFoundException => return NoTxn
      }
    content match {
      case None => NoTxn // unreadable husk — markers arrive complete
      case Some(s) =>
        val lines = s.linesIterator.toSeq
        if (lines.size < 2) return NoTxn
        if (currentId.contains(lines(1))) return PendingOurs
        val rec = new Path(lines.head)
        val rf = rec.getFileSystem(f.getConf)
        if (rf.exists(commitMarker(rec))) Committed
        // the `.tmp` counts as record-present: prepare's atomic rewrite
        // (tmp + delete + rename) has a moment where only the tmp exists,
        // and reading it as "finalized away" would expose half a txn
        else if (rf.exists(rec) ||
                 rf.exists(new Path(rec.getParent, rec.getName + ".tmp")))
          PendingOther
        else Committed // finalized (or abort mid-record-delete: its dirs
                       // are already gone, so this dir isn't one of them)
    }
  }

  /** Reader-side gate: may this EXISTING version dir be served? */
  private[lake] def visible(f: FileSystem, versionDir: String): Boolean =
    resolve(f, versionDir) != PendingOther

  private[lake] sealed trait Awaited
  private[lake] case object Visible extends Awaited
  private[lake] case object Gone extends Awaited
  private[lake] case object StillPending extends Awaited

  /** Writer-side wait on a committed-looking dir at a number we want:
    * poll until the marker resolves (txn committed → [[Visible]], the
    * competitor's number stands), the dir vanishes (txn aborted →
    * [[Gone]], the number is claimable), or [[txnGraceMs]] runs out
    * ([[StillPending]] — in-flight-too-long or crashed; the caller
    * fails toward `healClaims`). */
  private[lake] def awaitResolution(f: FileSystem, versionDir: String): Awaited = {
    val deadline = System.currentTimeMillis() + txnGraceMs
    while (true) {
      if (!f.exists(new Path(s"$versionDir/_commit_ts"))) return Gone
      resolve(f, versionDir) match {
        case PendingOther =>
          if (System.currentTimeMillis() > deadline) return StillPending
          Thread.sleep(25)
        case _ => return Visible
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Adjudicate every txn this table COORDINATES (its `_txns/` records)
    * plus any foreign-coordinated pending dir above the live version:
    * committed records complete their finalize; uncommitted records
    * ABORT — every listed participant dir whose marker matches is
    * deleted (across tables: the record lists them), claims freed,
    * record dropped. EXCLUSIVE maintenance, run with no writers active
    * (the [[Versioned.healClaims]] contract — which calls this first);
    * under that exclusivity any uncommitted record is a crashed txn, so
    * no age check is needed. Returns the number of txns adjudicated. */
  def heal(spark: SparkSession, table: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val f = new Path(table).getFileSystem(conf)
    var healed = 0
    val dir = recordDir(table)
    if (f.exists(dir)) {
      // adopt orphaned rewrite tmps first: a crash inside prepare's
      // tmp+delete+rename leaves the tmp as the NEWEST participant list
      // (possibly beside a stale record) — promote it before reading
      f.listStatus(dir).toSeq.filter(_.isFile)
        .filter(_.getPath.getName.endsWith(".tmp")).foreach { s =>
          val rec = new Path(dir, s.getPath.getName.stripSuffix(".tmp"))
          f.delete(rec, false)
          f.rename(s.getPath, rec)
        }
      val entries = f.listStatus(dir).toSeq.filter(_.isFile)
      val commits = entries.map(_.getPath.getName)
        .filter(_.endsWith(".commit")).toSet
      entries.filterNot(_.getPath.getName.endsWith(".commit")).foreach { s =>
        val rec = s.getPath
        // tolerant parse: a malformed line (torn write) must not brick
        // the heal — every well-formed participant still adjudicates
        val parts = Versioned.readSmallFile(f, rec).toSeq
          .flatMap(_.linesIterator)
          .flatMap { l =>
            if (!l.startsWith("t ")) None
            else {
              val i = l.lastIndexOf(' ')
              if (i <= 2) None
              else l.substring(i + 1).toLongOption
                .map(v => (l.substring(2, i), v))
            }
          }
          .map { case (t, v) => (t, v, new Path(t).getFileSystem(conf)) }
        if (commits.contains(rec.getName + ".commit")) {
          finalizeCommitted(f, rec, parts)
        } else {
          // crashed uncommitted: abort. Only dirs whose marker names
          // THIS record die — a reused version number committed by a
          // later writer is never collateral.
          parts.foreach { case (t, v, tf) =>
            val vdir = s"$t/v=$v"
            val named = Versioned.readSmallFile(tf,
              new Path(s"$vdir/_txn")).exists(
              _.linesIterator.toSeq.headOption.contains(rec.toString))
            if (named || !tf.exists(new Path(s"$vdir/_commit_ts")))
              tf.delete(new Path(s"$t/_claims/$v"), false)
            if (named) tf.delete(new Path(vdir), true)
          }
          f.delete(rec, false)
        }
        healed += 1
      }
      // orphaned .commit markers (record already finalized away)
      f.listStatus(dir).toSeq.filter(_.isFile)
        .filter(_.getPath.getName.endsWith(".commit"))
        .filter(s => !f.exists(new Path(dir,
          s.getPath.getName.stripSuffix(".commit"))))
        .foreach(s => f.delete(s.getPath, false))
    }
    // foreign-coordinated participants — dirs still carrying a marker
    // whose record lives at another table. ALL versions, not just the
    // tail above live: a committed-but-unfinalized participant sits AT or
    // BELOW the live version (it is visible), and healing its own table
    // must complete its finalize — the operator cannot be expected to
    // know which other table coordinated the txn.
    Versioned.versions(spark, table).foreach { v =>
      val vdir = s"$table/v=$v"
      val marker = new Path(s"$vdir/_txn")
      if (f.exists(marker))
        Versioned.readSmallFile(f, marker).foreach { s =>
          val rec = new Path(s.linesIterator.next())
          if (!f.makeQualified(rec.getParent)
              .equals(f.makeQualified(recordDir(table)))) {
            val rf = rec.getFileSystem(conf)
            val recPresent = rf.exists(rec) ||
              rf.exists(new Path(rec.getParent, rec.getName + ".tmp"))
            if (rf.exists(commitMarker(rec)) || !recPresent) {
              // committed (or finalized) remotely: complete locally
              finalizeParticipant(f, table, v)
            } else {
              // still-pending foreign txn — under heal's exclusivity
              // that is a crashed txn: abort the local participant (the
              // coordinator's own heal drops the record and the rest)
              f.delete(new Path(s"$table/_claims/$v"), false)
              f.delete(new Path(vdir), true)
            }
            healed += 1
          }
        }
    }
    healed
  }

  /** [[atomically]], unless a txn is already ACTIVE on this thread — then
    * the body simply runs inside it (joining the enclosing atomicity
    * scope instead of rejecting as a nested begin). The composition
    * primitive for library code that wants its own publishes atomic but
    * must remain callable from a caller's larger txn — e.g.
    * [[Expect]]'s quarantine-publish + gated-merge pair inside
    * [[graft.streaming.CdcSink]]'s atomic micro-batch. */
  def atomicallyOrJoin[T](spark: SparkSession)(body: => T): T =
    if (current.isDefined) body else atomically(spark)(body)

  /** Consistent multi-table READ versions — the read-side complement of
    * [[atomically]]: a set of live versions across `tables` that no txn
    * flip straddled. Seqlock-style validate: read every table's live
    * version, read them all again, and accept only when the two passes
    * agree — a flip (or any commit) landing between a pass's reads
    * changes some version between the passes and forces a retry. With
    * txn flips the ONLY multi-table mutation, agreement proves the set
    * is a cut of the version history: either entirely before or
    * entirely after every flip. Cost: 2×|tables| pointer reads per
    * attempt, metadata only. Gives up loudly after `attempts` (a table
    * under continuous write churn needs a quiescent moment — or pin
    * versions explicitly). */
  def snapshot(spark: SparkSession, tables: Seq[String],
               attempts: Int = 64): Map[String, Long] = {
    require(tables.nonEmpty, "snapshot of zero tables")
    def pass(): Map[String, Long] =
      tables.map(t => t -> Versioned.currentVersion(spark, t).getOrElse(
        throw new IllegalStateException(
          s"no published version at $t"))).toMap
    var tried = 0
    while (tried < attempts) {
      val a = pass()
      val b = pass()
      if (a == b) return a
      tried += 1
    }
    throw new IllegalStateException(
      s"no stable multi-table snapshot after $attempts attempts — " +
        "continuous write churn across " + tables.mkString(", ") +
        "; retry at a quieter moment or pin versions explicitly")
  }

  /** The feed-sidecar name DML builds write under: pending txn
    * participants stage their change feed as `_changes_txn` so the
    * streaming file source (globbing `v=*&#47;_changes`) never discovers
    * change files of an uncommitted version; the flip's finalize
    * promotes it. */
  private[lake] def feedName: String =
    if (current.isDefined) "_changes_txn" else "_changes"
}
