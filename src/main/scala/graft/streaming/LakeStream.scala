package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.bronze.Lake
import graft.lake.{Dv, Upsert, Versioned}

/**
 * Streaming source over the bronze lake: tail the `year=/month=/day=`
 * partition tree that graft.bronze.Runner writes, as a file stream — the
 * "bronze lands daily, gold streams continuously" wiring. New day
 * partitions are picked up as they commit (`maxFilesPerTrigger` bounds each
 * micro-batch; at 100 TB/day that is the backpressure knob).
 *
 * Bronze rows carry `ts_us` epoch-micros (timestamps don't survive the
 * extraction — SURVEY §7.3); the stream surfaces a real `ts` for
 * watermarks/session windows.
 *
 * [[table]] is the VERSIONED-lake twin — Delta's `readStream` on a table:
 * a downstream job subscribes to the TABLE, not just its change feed.
 */
object LakeStream {

  def events(spark: SparkSession, root: String, dataType: String = "events",
             maxFilesPerTrigger: Int = 10): DataFrame = {
    // file streams need an a-priori schema: read one committed partition's
    // footer (metadata-only driver work, no data scan)
    val schema = spark.read.parquet(s"$root/$dataType").schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(s"$root/$dataType")
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }

  /** Convenience: lake -> 30-minute session gold, ready for writeStream. */
  def sessionizedEvents(spark: SparkSession, root: String): DataFrame =
    Sessions.sessionize(events(spark, root))

  /** Streaming read of a WHOLE [[Versioned]] table — Delta's `readStream`
    * on a table, composed as snapshot + change-feed tail: the snapshot
    * version's data files are delivered as the stream's initial batches
    * (each row `_op` = "U", `_version` = the snapshot version; a deletion
    * vector on the snapshot is applied as a stream-static broadcast
    * anti-join, so vectored rows never enter the stream), then
    * [[CdfStream.changes]] tails every LATER version's changeset as it
    * commits. The union ASSEMBLES the table: reduce any prefix with
    * [[assemble]] and you hold exactly the table as of the highest
    * delivered version (spec-pinned across churn and restarts).
    *
    * Restart discipline — no double-apply: the snapshot version must not
    * move between restarts of one query (a restart that re-resolved a
    * NEWER live version would re-deliver rows whose changes the tail
    * already sent). The version is therefore pinned in a small
    * `graft_snapshot_version` file INSIDE `checkpointDir` on first start
    * and read back thereafter — the caller reuses the checkpoint dir
    * across restarts anyway (that is what makes the file-source legs
    * exactly-once per file). Both legs' files are immutable once
    * committed; vacuum retention must exceed the stream's restart window
    * (the [[CdfStream]] contract, inherited — the snapshot version's dirs
    * are part of that window until fully delivered).
    *
    * The feed needs at least one `_changes` sidecar to exist (the file
    * source validates its glob eagerly) — subscribe after the first DML,
    * as with [[CdfStream.changes]]. */
  def table(spark: SparkSession, table: String, checkpointDir: String,
            maxFilesPerTrigger: Int = 64): DataFrame = {
    val v0 = pinnedSnapshotVersion(spark, table, checkpointDir)
    val base = Versioned.read(spark, table).schema
    require(!base.fieldNames.contains("_op") &&
      !base.fieldNames.contains("_version"),
      s"$table already has an _op/_version column")
    val dataDir = Versioned.dataDir(spark, table, v0)
    val ownDir = s"$table/v=$v0"
    // the vector anti-join needs the per-relation `_metadata` column, so
    // it applies to EACH leg before any union (after a union the
    // pseudo-column is unresolvable)
    def leg(dir: String): DataFrame =
      Dv.applyVector(spark, table, v0,
        spark.readStream.schema(base)
          .option("maxFilesPerTrigger", maxFilesPerTrigger)
          .parquet(dir))
    // a zero-copy merge snapshot carries appends beside its _ref: union
    // the base dir and the version dir's own files
    val raw =
      if (dataDir == ownDir) leg(dataDir)
      else if (Versioned.dataFilePaths(spark, ownDir).isEmpty) leg(dataDir)
      else leg(dataDir).unionByName(leg(ownDir))
    val snapshot = raw
      .withColumn("_op", lit("U"))
      .withColumn("_version", lit(v0))
    snapshot.unionByName(
      CdfStream.changes(spark, table, sinceV = v0, maxFilesPerTrigger))
  }

  /** Reduce a batch of [[table]] change rows to the table they assemble:
    * last op per key by `_version` (the snapshot is version-tagged like
    * any change), deletes drop out. REJECTS the feed poison rows
    * instead of assembling a silently-diverged table: `_op` = "B" (a
    * wholesale replace landed mid-stream — full publish, clone seed,
    * RESTORE; the feed cannot represent it) and `_op` = "S" (the table
    * SCHEMA changed — ALTER TABLE ADD/DROP COLUMNS or an evolving
    * merge; this stream runs with its start-time schema and would drop
    * the new columns from every later change). Restart from a fresh
    * snapshot/checkpoint — the restart picks up the new schema, Delta's
    * streaming-read behavior. */
  def assemble(changeRows: DataFrame, keyCol: String): DataFrame =
    Upsert.lastPerKey(changeRows, keyCol, seqCol = "_version",
        opCol = "_op", rejectOps = Set("B", "S"))
      .filter(col("_op") =!= "D")
      .drop("_op")

  // resolve the snapshot version ONCE per checkpoint lineage: first start
  // pins the live version into the checkpoint dir (create-exclusive — a
  // concurrent first-starter loses the race and reads the winner's pin),
  // restarts read it back
  private def pinnedSnapshotVersion(spark: SparkSession, table: String,
                                    checkpointDir: String): Long = {
    val p = new Path(s"$checkpointDir/graft_snapshot_version")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Versioned.readSmallFile(f, p).flatMap(_.toLongOption).getOrElse {
      val live = Versioned.currentVersion(spark, table).getOrElse(
        throw new IllegalStateException(s"no published version at $table"))
      f.mkdirs(p.getParent)
      try {
        val out = f.create(p, false)
        try out.write(live.toString.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        live
      } catch {
        case _: java.io.IOException =>
          Versioned.readSmallFile(f, p).flatMap(_.toLongOption).getOrElse(
            throw new IllegalStateException(
              s"cannot pin the snapshot version under $checkpointDir"))
      }
    }
  }
}
