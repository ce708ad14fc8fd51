package graft.lake

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * DESCRIBE HISTORY — Delta's table-history view on this layout, built
 * from the per-version metadata every commit already writes: the
 * `_commit_ts` marker (timestamp), the [[Versioned.CommitInfo]] sidecar
 * (file-level base/removed/added, present on file-targeted DML), the
 * change-record kind (`_changes` / `_changes_none` / absent — the same
 * trichotomy [[Cdf.changesSince]] reads), the `_ref`/`_dv` markers
 * (zero-copy shape) and the `_cdc_batch` replay tag.
 *
 * Cost: O(existing versions) driver-side small-file reads — the
 * inherent cost of the ANSWER (every row describes one version), the
 * same shape as Delta's history scan of its log. Vacuumed versions are
 * absent (their metadata is gone with their data); at long histories
 * the listing itself is one directory scan.
 */
object History {

  val schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("committed_at", TimestampType, nullable = true),
    StructField("operation", StringType, nullable = false),
    StructField("is_zero_copy", BooleanType, nullable = false),
    StructField("has_deletion_vector", BooleanType, nullable = false),
    StructField("base_version", LongType, nullable = true),
    StructField("files_removed", IntegerType, nullable = true),
    StructField("files_added", IntegerType, nullable = true),
    StructField("batch_tag", StringType, nullable = true)))

  /** One row per EXISTING version of `table`, ascending. `operation` is
    * derived from the commit's recorded markers:
    *  - "dml"         — recorded a row changeset (`_changes`: merge/
    *                     purge/CDC, rewriting or zero-copy);
    *  - "maintenance" — layout-only (`_changes_none`: compact/cluster);
    *  - "schema"      — a metadata-only [[Evolve]] overlay (its
    *                     `_schema_change` marker);
    *  - "restore"     — a zero-copy ref WITHOUT a changeset
    *                     ([[Restore.restore]], or a [[Clone.shallow]]
    *                     seed version — both are wholesale replaces);
    *  - "publish"     — a full snapshot publish. */
  def frame(spark: SparkSession, table: String): DataFrame = {
    val f = new Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ts = Versioned.commitTimes(spark, table).toMap
    val rows = Versioned.versions(spark, table)
      // an uncommitted cross-table txn's pending dirs are not history —
      // they either flip visible (then they list) or abort away
      .filter(v => Txn.visible(f, s"$table/v=$v"))
      .map { v =>
      val dir = s"$table/v=$v"
      def has(p: String) = f.exists(new Path(s"$dir/$p"))
      val isRef = has("_ref")
      val op =
        if (has("_changes_break")) { if (isRef) "restore" else "publish" }
        else if (has("_schema_change")) "schema" // Evolve overlay
        // `_changes_txn`: a committed txn participant's changeset
        // awaiting its finalize rename — same "dml", staged name
        else if (has("_changes") || has("_changes_txn")) "dml"
        else if (has("_changes_none"))
          // legacy Evolve overlays (pre-`_schema_change` marker) wrote
          // `_changes_none` + an own marker on a ref — keep labeling
          // them "schema" (compaction/materialize are never refs)
          { if (isRef && has("_table_schema")) "schema" else "maintenance" }
        else if (isRef) "restore" // pre-break-marker refs (legacy dirs)
        else "publish"
      val info = Versioned.readCommitInfo(f, dir)
      Row(v,
        ts.get(v).map(new Timestamp(_)).orNull,
        op,
        isRef,
        has("_dv"),
        info.map(i => java.lang.Long.valueOf(i.base)).orNull,
        info.map(i => java.lang.Integer.valueOf(i.removed.size)).orNull,
        info.map(i => java.lang.Integer.valueOf(i.added.size)).orNull,
        Versioned.readSmallFile(f, new Path(s"$dir/_cdc_batch")).orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  val detailSchema: StructType = StructType(Seq(
    StructField("location", StringType, nullable = false),
    StructField("live_version", LongType, nullable = false),
    StructField("committed_at", TimestampType, nullable = true),
    StructField("num_versions", LongType, nullable = false),
    StructField("num_data_files", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("is_zero_copy", BooleanType, nullable = false),
    StructField("deletion_vector_rows", LongType, nullable = false),
    StructField("constraints", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("indexes", ArrayType(StringType, containsNull = false),
      nullable = false)))

  /** DESCRIBE DETAIL — one row of table-level facts: location, live
    * version + commit time, version count, LIVE data file count and
    * bytes (the resolved data dir plus any zero-copy appends), zero-copy
    * flag, vectored-row count, registered constraint names, and which
    * skipping indexes the live version carries. All driver-side
    * metadata reads (listings + small files) except the vector count
    * (one deletion-sized parquet count when a vector exists). */
  def detail(spark: SparkSession, table: String): DataFrame = {
    val f = new Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = Versioned.currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no published version at $table"))
    val liveDir = s"$table/v=$live"
    val dataDir = Versioned.dataDir(spark, table, live)
    val files = (Versioned.dataFilePaths(spark, dataDir) ++
      (if (dataDir == liveDir) Seq.empty
       else Versioned.dataFilePaths(spark, liveDir))).map(new Path(_))
    val bytes = files.map(p => f.getFileStatus(p).getLen).sum
    val indexes = Seq(
      "bloom" -> f.exists(new Path(s"$dataDir/_bloom")),
      "stats" -> StatsIndex.exists(spark, dataDir),
      "tokbloom" -> f.exists(new Path(s"$dataDir/_tokbloom")),
      "boxstats" -> f.exists(new Path(s"$dataDir/_boxstats")))
      .collect { case (n, true) => n }
    val row = Row(
      table,
      live,
      Versioned.commitTimes(spark, table).toMap.get(live)
        .map(new Timestamp(_)).orNull,
      Versioned.versions(spark, table).size.toLong,
      files.size.toLong,
      bytes,
      Versioned.isShallowRef(spark, table, live),
      Dv.deletedRows(spark, table, live),
      Constraints.list(spark, table).map(_.name),
      indexes)
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), detailSchema)
  }
}
