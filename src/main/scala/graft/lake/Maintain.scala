package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * AUTO-MAINTENANCE policy — Delta's auto-compaction story as one
 * idempotent, metadata-decided pass: the zero-copy DML family
 * ([[Dv]] merges/purges, [[CopyInto]] landings, [[Evolve]] overlays)
 * deliberately DEFERS physical work (appends accumulate beside a
 * `_ref`, deletes accumulate in a vector, small files accumulate
 * across CDC trickles), and something must decide when the deferred
 * bill is worth paying. That decision belongs in a policy object a
 * scheduler calls after its write burst — not inside every write
 * (Delta's OPTIMIZE scheduling is likewise out-of-band; in-line
 * auto-compaction taxes the ingest's latency with the compactor's
 * work).
 *
 * [[auto]] reads ONLY metadata (dir listings + the deletion-sized
 * vector count), applies the dials in the documented order, and
 * returns what it did:
 *
 *  1. MATERIALIZE when the live version is a shallow ref whose
 *     deferred state exceeds a dial — `maxAppendedFiles` (zero-copy
 *     merge/landing appends) or `maxVectorRows` (DV'd deletes) — or
 *     unconditionally when `materializeRefs = true` (the explicit
 *     lever: ANY ref costs a table copy to materialize, so forcing it
 *     is an operator decision — e.g. unwedging an over-budget landing,
 *     or readying a clone seed / restore / schema overlay for
 *     rewriting DML).
 *  2. COMPACT when (after any materialize) the live data dir holds
 *     more than `maxDataFiles` files — [[Compact.compactVersion]],
 *     which re-establishes clustering and rebuilds the skipping
 *     sidecars.
 *
 * Content never changes (both actions are layout-only: `_changes_none`
 * versions, constraints exempt, CDC watermark carried); a second call
 * right after is a no-op. OCC-safe like everything else — both actions
 * derive via `publishFrom` inside `withWriteRetry`.
 */
object Maintain {

  /** What one [[auto]] pass did, in order. Empty = nothing to do. */
  final case class Actions(taken: Seq[String], liveVersion: Long)

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** One metadata-decided maintenance pass; see object doc. */
  def auto(spark: SparkSession, table: String, keyCol: String,
           maxDataFiles: Int = 64,
           maxAppendedFiles: Int = 8,
           maxVectorRows: Long = 1000000L,
           materializeRefs: Boolean = false): Actions = {
    val live = Versioned.currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no published version at $table"))
    val taken = Seq.newBuilder[String]

    if (Versioned.isShallowRef(spark, table, live)) {
      val ownAppends = Versioned.dataFilePaths(spark, s"$table/v=$live").size
      val vectorRows = Dv.deletedRows(spark, table, live)
      val due =
        ownAppends > maxAppendedFiles || vectorRows > maxVectorRows ||
          materializeRefs
      if (due) {
        Clone.materialize(spark, table)
        taken += s"materialize(appends=$ownAppends, vector=$vectorRows)"
      }
    }

    val nowLive = Versioned.currentVersion(spark, table).get
    if (!Versioned.isShallowRef(spark, table, nowLive)) {
      val files =
        Versioned.dataFilePaths(spark,
          Versioned.dataDir(spark, table, nowLive)).size
      if (files > maxDataFiles) {
        Compact.compactVersion(spark, table, keyCol)
        taken += s"compact(files=$files)"
      }
    }
    Actions(taken.result(),
      Versioned.currentVersion(spark, table).get)
  }
}
