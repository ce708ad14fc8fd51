package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.lake.{Cdf, Versioned}

/**
 * Streaming reader over a [[graft.lake.Versioned]] table's change feed —
 * Delta's `readChangeFeed` re-expressed on this layout: every DML version
 * records its changeset as a `_changes` parquet sidecar inside the version
 * dir ([[Cdf]]), so the feed IS a growing set of parquet files under
 * `table/v=*&#47;_changes` — exactly what Structured Streaming's file
 * source incrementally tails (the glob re-resolves every micro-batch, so
 * versions published after the stream starts are discovered as they
 * commit; spec-pinned). No custom Source implementation needed: the
 * change log is already files.
 *
 * [[changes]] is the read surface — a streaming frame of change rows
 * (table columns + `_op` U/D + `_version`) for monitoring, enrichment, or
 * custom sinks. Delivery is per FILE, at-least-once within a restart
 * window, ordered by file discovery — NOT guaranteed to be version-ordered
 * when several versions land between triggers; `_version` carries the
 * sequence, so order-sensitive consumers reduce with
 * [[graft.lake.Upsert.lastPerKey]] (seqCol = `_version`) per batch and
 * must tolerate version interleaving ACROSS batches. A WHOLESALE REPLACE
 * (full publish, clone seed, RESTORE) delivers one `_op` = "B" poison
 * row ([[graft.lake.Cdf.recordBreak]]) — the feed cannot represent it;
 * consumers must stop and resync ([[graft.streaming.LakeStream.assemble]]
 * rejects on it, [[subscribe]]'s sync rejects on the marker).
 *
 * [[subscribe]] is the replica leg, which needs exactly-once and strict
 * version order — so it deliberately does NOT apply the delivered rows.
 * The stream is the WAKE-UP (work happens only when changeset files
 * actually appear); each non-empty micro-batch runs one [[Cdf.sync]],
 * which reads the pending changesets off the version dirs in order,
 * reduces multi-version churn to the last op per key, applies ONE
 * tagged merge (`cdf:<version>` — replay is a no-op), and loudly rejects
 * an unbridgeable feed (full publish / vacuumed gap → reseed from a
 * snapshot). A crash between sync's publish and the stream checkpoint
 * commit replays the batch into the tag-dedup no-op: the pairing is
 * exactly-once without a cross-system transaction, the same argument as
 * [[CdcSink]]. File-delivery order therefore cannot matter: sync reads
 * versions from the manifest sequence, not from the batch.
 *
 * Scale posture: discovery cost is the file listing (metadata); each
 * sync costs the changeset + the touched file fraction ([[Cdf.sync]] →
 * [[graft.lake.Upsert.applyCdc]]). The source table needs vacuum
 * retention longer than the stream's restart window — the [[CdcSink]]
 * contract, inherited.
 */
object CdfStream {

  /** The feed's schema: the source's live columns + `_op` + `_version`.
    * Fixed at stream start (file streams need an a-priori schema);
    * columns added by a LATER schema evolution need a stream restart to
    * appear — pre-evolution change files null-fill them, as in
    * [[Cdf.changesSince]]. */
  def feedSchema(spark: SparkSession, table: String): StructType = {
    val base = Versioned.read(spark, table).schema
    require(!base.fieldNames.contains("_op") &&
      !base.fieldNames.contains("_version"),
      s"$table already has an _op/_version column")
    new StructType((base.fields :+
      org.apache.spark.sql.types.StructField("_op", StringType)).toArray)
  }

  /** The change feed from version `sinceV` (exclusive; default 0 = from
    * the beginning of retained history) as a STREAMING frame. See the
    * object doc for the delivery contract. `maxFilesPerTrigger` is the
    * backpressure knob. */
  def changes(spark: SparkSession, table: String, sinceV: Long = 0L,
              maxFilesPerTrigger: Int = 64): DataFrame = {
    val schema = feedSchema(spark, table)
    // the glob needs at least one match at stream START (the file source
    // resolves it once eagerly to validate) — Cdf guarantees one exists
    // after any DML; reject a feed-less table toward "DML first"
    val f = new Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val any = f.globStatus(new Path(s"$table/v=*/_changes"))
    require(any != null && any.nonEmpty,
      s"$table has no _changes sidecars yet — the feed starts after the " +
        "first DML publish (Upsert/Forget); seed replicas with Cdf.seed")
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(s"$table/v=*/_changes")
      .withColumn("_version",
        regexp_extract(input_file_name(), "/v=(\\d+)/_changes/", 1)
          .cast(LongType))
      .filter(col("_version") > sinceV)
  }

  /** Wire a replica subscription: seed `replica` first ([[Cdf.seed]]),
    * then start this writer (caller sets trigger/checkpoint). Each
    * non-empty micro-batch catches the replica up to the source's live
    * version via ONE [[Cdf.sync]] — see the object doc for why the
    * delivered rows themselves are only the wake-up. */
  def subscribe(spark: SparkSession, source: String, replica: String,
                keyCol: String,
                maxFilesPerTrigger: Int = 64): DataStreamWriter[Row] = {
    val since = Cdf.syncedVersion(spark, replica).getOrElse(
      throw new IllegalStateException(
        s"$replica carries no cdf watermark — Cdf.seed it first"))
    changes(spark, source, sinceV = since, maxFilesPerTrigger)
      .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          Cdf.sync(batch.sparkSession, source, replica, keyCol)
          ()
        }
      }
  }
}
