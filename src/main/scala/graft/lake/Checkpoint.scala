package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Version-history checkpointing — Delta's `_last_checkpoint` re-expressed
 * on this layout: a single `_checkpoint` file at the table root that
 * SUMMARIZES per-version metadata (commit timestamp + change-record kind)
 * for every version up to its floor, so the metadata walks that would
 * otherwise touch one small file or existence probe PER VERSION stay
 * O(window-past-the-checkpoint) at 10⁴⁺-version histories:
 *
 *  - [[Versioned.currentVersion]] uses the checkpoint version as a
 *    probe-forward floor when BOTH pointer files are unreadable (the
 *    double-loss recovery path would otherwise probe from v=1);
 *  - [[Versioned.commitTimes]] (and so `versionAsOf` / timestamp travel)
 *    reads per-version `_commit_ts` files only PAST the checkpoint;
 *  - [[Cdf.changesSince]] resolves each version's change-record kind
 *    (has `_changes` / `_changes_none` / neither) from the checkpoint
 *    instead of two existence probes per version.
 *
 * The checkpoint is a CACHE, exactly like the manifest pointer: written
 * best-effort every [[interval]] commits (amortized O(1) small-file reads
 * per commit), monotone-guarded, swapped atomically via tmp+rename, and
 * NEVER load-bearing — every reader falls back to the per-version files
 * for versions the checkpoint does not cover, and intersects checkpoint
 * rows with the dirs that actually exist (vacuum may have dropped some).
 * [[Versioned.vacuum]] refreshes it afterward so the probe floor never
 * points at a vacuumed dir.
 *
 * Format: line-oriented text — `v <floor>` then one `<version> <commitTs>
 * <kind>` row per version, kind ∈ {c = `_changes`, n = `_changes_none`,
 * x = neither (full publish / shallow clone)}. ~20 bytes per version:
 * a 10⁴-version history checkpoints at ~200 KB, one small read.
 */
object Checkpoint {

  /** Parsed checkpoint: summary rows for every version ≤ [[version]] that
    * existed at write time. */
  final case class State(version: Long, commitTs: Map[Long, Long],
                         feed: Map[Long, Char])

  /** Checkpoint every N commits (system property
    * `graft.checkpoint.intervalVersions`). 100 keeps the uncheckpointed
    * tail two orders below the 10⁴-version histories the cache exists
    * for, at one extra small-file write per 100 commits. */
  private[lake] def interval: Long =
    sys.props.get("graft.checkpoint.intervalVersions")
      .flatMap(_.toLongOption).filter(_ > 0).getOrElse(100L)

  private def path(table: String) = new Path(s"$table/_checkpoint")
  private def tmp(table: String) = new Path(s"$table/_checkpoint.tmp")

  /** Read and parse the checkpoint; None when absent or unreadable (it is
    * a cache — a torn write degrades to the per-version walk, never to an
    * error). */
  private[lake] def read(f: FileSystem, table: String): Option[State] =
    try Versioned.readSmallFile(f, path(table)).flatMap(parse)
    catch { case _: java.io.IOException => None }

  private def parse(text: String): Option[State] = {
    val lines = text.linesIterator.toSeq
    val floor = lines.headOption.collect {
      case h if h.startsWith("v ") => h.stripPrefix("v ").toLongOption
    }.flatten
    floor.map { v =>
      val ts = Map.newBuilder[Long, Long]
      val feed = Map.newBuilder[Long, Char]
      lines.drop(1).foreach { l =>
        l.split(' ') match {
          case Array(ver, t, k) if k.length == 1 =>
            (ver.toLongOption, t.toLongOption) match {
              case (Some(vr), Some(tt)) =>
                ts += vr -> tt; feed += vr -> k.charAt(0)
              case _ => () // malformed row: skip (cache discipline)
            }
          case _ => ()
        }
      }
      State(v, ts.result(), feed.result())
    }
  }

  // one version's summary row, from its dir (None when the dir carries no
  // readable _commit_ts — not a committed version, skip it)
  private def rowOf(f: FileSystem, table: String,
                    v: Long): Option[(Long, Long, Char)] =
    Versioned.readSmallFile(f, new Path(s"$table/v=$v/_commit_ts"))
      .flatMap(_.toLongOption).map { ts =>
        val kind =
          if (f.exists(new Path(s"$table/v=$v/_changes_break"))) 'b'
          // `_changes_txn`: a committed txn participant's feed awaiting
          // its finalize rename — same changeset, staged name (Txn)
          else if (f.exists(new Path(s"$table/v=$v/_changes")) ||
                   f.exists(new Path(s"$table/v=$v/_changes_txn"))) 'c'
          else if (f.exists(new Path(s"$table/v=$v/_changes_none"))) 'n'
          else 'x'
        (v, ts, kind)
      }

  private def write(f: FileSystem, table: String, floor: Long,
                    rows: Seq[(Long, Long, Char)]): Unit = {
    val body = (s"v $floor" +:
      rows.sortBy(_._1).map { case (v, ts, k) => s"$v $ts $k" })
      .mkString("\n")
    val out = f.create(tmp(table), true)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp(table), path(table))) {
      f.delete(path(table), false)
      if (!f.rename(tmp(table), path(table))) f.delete(tmp(table), false)
    }
    ()
  }

  /** Best-effort checkpoint after a commit at `next`: fires every
    * [[interval]] commits, extends the prior checkpoint by scanning only
    * the window past it, monotone-guarded under the table's pointer
    * lock. Never throws — a failed checkpoint costs nothing (readers
    * fall back), a failed COMMIT over a cache write would be absurd. */
  private[lake] def maybeWrite(f: FileSystem, table: String,
                               next: Long): Unit = {
    if (next % interval != 0L) return
    try {
      Versioned.pointerLockFor(f, table).synchronized {
        val prior = read(f, table)
        if (prior.exists(_.version >= next)) return
        val floorDone = prior.map(_.version).getOrElse(0L)
        val carried = prior.toSeq.flatMap(s =>
          s.commitTs.keys.map(v => (v, s.commitTs(v), s.feed(v))))
        val fresh = ((floorDone + 1) to next)
          .flatMap(rowOf(f, table, _))
        write(f, table, next, carried ++ fresh)
      }
    } catch { case _: java.io.IOException => () }
  }

  /** Rewrite the checkpoint against the versions that EXIST — called by
    * [[Versioned.vacuum]] (exclusive maintenance) after dropping dirs, so
    * the floor never names a vacuumed version and stale rows don't
    * accumulate. No-op when the table has never checkpointed. */
  private[lake] def refresh(f: FileSystem, table: String, live: Long,
                            existing: Seq[Long]): Unit = {
    if (!f.exists(path(table))) return
    try {
      Versioned.pointerLockFor(f, table).synchronized {
        val prior = read(f, table).getOrElse(State(0L, Map.empty, Map.empty))
        val rows = existing.filter(_ <= live).flatMap { v =>
          prior.commitTs.get(v).map(ts => (v, ts, prior.feed(v)))
            .orElse(rowOf(f, table, v))
        }
        write(f, table, live, rows)
      }
    } catch { case _: java.io.IOException => () }
  }
}
