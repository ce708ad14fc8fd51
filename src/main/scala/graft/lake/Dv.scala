package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deletion vectors — Delta's DV story on this layout: a delete that
 * rewrites NO data file. [[Forget.purge]] rewrites every index-admitted
 * file (touched-fraction cost); at 100 TB even that is hours of parquet
 * encode for a deletion request naming a handful of users. [[purge]] here
 * publishes a ZERO-COPY version instead:
 *
 *  - `_ref` points at the live version's data dir (the shallow-clone
 *    pointer — [[Versioned.dataDir]] resolves it transparently, and the
 *    referenced dir is PINNED against vacuum by the same `_clones/`
 *    back-pointer machinery [[Clone]] uses);
 *  - `_dv/` is a deletion-sized parquet of (file, row_index) pairs — the
 *    rows this version considers deleted (CUMULATIVE: a re-purge on a DV
 *    version unions into it, so every version dir is self-describing and
 *    time travel needs no replay);
 *  - `_changes` records the deletions, so the change feed and replica
 *    sync see a DV purge exactly like a rewriting one.
 *
 * Reads: [[Versioned.readVersion]] (and so [[Versioned.read]], time
 * travel, [[Upsert.diff]], [[MatView]], SQL views, Cdf seeds) anti-join
 * the scan against the version's vector on the parquet metadata columns
 * (`_metadata.file_name`, `_metadata.row_index`) — a broadcast anti-join
 * against a deletion-sized set, no data rewrite ever. Row indexes are
 * stable per immutable parquet file, which the versioned layout
 * guarantees.
 *
 * Write cost: ONE column-pruned scan of the index-admitted files to
 * locate victim row indexes + one metadata-sized parquet write + the
 * pointer files. Nothing else moves.
 *
 * Materialization: a DV version is a shallow ref, so every file-targeted
 * DML op already REJECTS it loudly toward [[Clone.materialize]] — which
 * reads through [[Versioned.readVersion]] and therefore applies the
 * vector while copying: materialize IS the DV compactor. After it, DML
 * proceeds on real files with the deleted rows physically gone.
 *
 * COMPLIANCE NOTE (same as [[Forget.purge]], one step stronger): a DV
 * delete is logical until materialize + vacuum remove the referenced
 * data dir; a deletion-SLA deployment runs purge → materialize →
 * vacuum(keep = 0) inside its window. Dir-level scan utilities that take
 * RAW data-dir paths ([[TokenBloom.search]], [[ZOrder.readBox]],
 * [[StatsIndex.readRange]]) read the data dir beneath the vector and so
 * see pre-delete rows — materialize before relying on them against a
 * DV'd table (the advisory-index posture: never wrong through
 * [[Versioned]] readers, stale only through raw-dir utilities).
 */
object Dv {

  private[lake] def dvDir(versionDir: String) = s"$versionDir/_dv"

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Does version `v` of `table` carry a deletion vector? */
  def hasVector(spark: SparkSession, table: String, v: Long): Boolean =
    fs(spark, table).exists(new Path(dvDir(s"$table/v=$v")))

  /** Deleted (file, row_index) count of version `v` (0 = no vector). */
  def deletedRows(spark: SparkSession, table: String, v: Long): Long =
    if (!hasVector(spark, table, v)) 0L
    else spark.read.parquet(dvDir(s"$table/v=$v")).count()

  /** Apply version `v`'s deletion vector to a frame READ FROM ITS DATA
    * DIR (the frame must still expose the parquet `_metadata` column —
    * i.e. be the raw scan, before projections). No-op without a vector.
    * Works on STREAMING frames too (a stream-static broadcast anti-join —
    * [[graft.streaming.LakeStream.table]]'s snapshot leg). */
  private[graft] def applyVector(spark: SparkSession, table: String, v: Long,
                                 df: DataFrame): DataFrame = {
    if (!hasVector(spark, table, v)) return df
    val dv = spark.read.parquet(dvDir(s"$table/v=$v"))
      .withColumnRenamed("file", "_graft_dv_file")
      .withColumnRenamed("row_index", "_graft_dv_ri")
    val keyed = df
      .withColumn("_graft_dv_file", col("_metadata.file_name"))
      .withColumn("_graft_dv_ri", col("_metadata.row_index"))
    keyed.join(broadcast(dv), Seq("_graft_dv_file", "_graft_dv_ri"),
        "left_anti")
      .drop("_graft_dv_file", "_graft_dv_ri")
  }

  /** Zero-copy delete: every row whose `keyCol` is in `keys` becomes
    * invisible behind a new version that REWRITES NOTHING — `_ref` to the
    * live data dir + a deletion-vector sidecar. Key-set dial as
    * [[Forget.purge]] (a deletion request: driver-resident). Idempotent:
    * keys no live row matches publish nothing (returns the live version).
    * Works on an already-DV'd live version (vectors accumulate — refs
    * never chain, both versions share one data dir). Returns the live
    * version. */
  def purge(spark: SparkSession, table: String, keyCol: String,
            keys: Seq[Long]): Long =
    Versioned.withWriteRetry() { purgeOnce(spark, table, keyCol, keys) }

  /** Zero-copy MERGE — deletion vectors extended from deletes to the
    * whole CDC triad, so update-heavy CDC stops rewriting admitted files
    * entirely: each changed key's OLD row is vectored out (one
    * column-pruned victim-locating scan of the index-admitted files, as
    * [[purge]]) and the batch's I/U rows land as FRESH changeset-sized
    * files INSIDE the new version dir, beside the `_ref` to the untouched
    * base data dir. [[Versioned.readVersion]] unions base + appended
    * files and anti-joins the vector, so every reader (live, time travel,
    * diff, views, SQL, Cdf seeds) sees exactly what a rewriting
    * [[Upsert.merge]] would have produced — the change feed is recorded
    * identically. Chained zero-copy merges byte-copy the (changeset-
    * sized) prior appends forward so `_ref` never chains; after enough
    * churn, [[Clone.materialize]] compacts appends + vector back into
    * real files, exactly as for a DV purge.
    *
    * Scope dials (reject, don't guess): batches up to
    * [[Upsert.MaxDriverKeysDefault]] keys (this is the CDC-trickle path —
    * a restatement belongs on [[Upsert.merge]]'s distributed path) and NO
    * schema evolution (evolution needs the rewriting merge's marker
    * machinery). Same batch contract as [[Upsert.applyCdc]], enforced by
    * the same validation. */
  def applyCdc(spark: SparkSession, table: String, keyCol: String,
               batch: DataFrame, opCol: String = "op",
               batchTag: Option[String] = None): Long = {
    val owned =
      batch.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    if (owned) batch.persist()
    try {
      val p = Upsert.validateCdc(batch, keyCol, opCol)
      require(p.nKeys > 0, "empty changeset")
      require(p.nKeys <= Upsert.MaxDriverKeysDefault,
        s"${p.nKeys} keys — past the zero-copy merge's driver budget " +
          s"(${Upsert.MaxDriverKeysDefault}); a batch this wide belongs " +
          "on Upsert.merge's distributed path")
      Constraints.enforce(spark, table, p.upserts, "Dv.applyCdc")
      Versioned.withWriteRetry() {
        mergeOnce(spark, table, keyCol, p.upserts, p.deletes,
          p.nKeys - p.nDeletes, p.nDeletes, batchTag)
      }
    } finally { if (owned) { batch.unpersist(); () } }
  }

  /** Zero-copy upsert (no deletes): see [[applyCdc]]. `insertOnly`
    * enforces SQL INSERT INTO's live-key contract — a changeset key a
    * live row carries flips the statement into a loud reject, never a
    * silent update; checked INSIDE the OCC retry against each attempt's
    * victim scan (a victim IS a live row with that key). */
  def merge(spark: SparkSession, table: String, keyCol: String,
            changes: DataFrame, insertOnly: Boolean = false): Long = {
    changes.persist()
    try {
      import org.apache.spark.sql.functions.{col => fcol}
      val v = changes.agg(
        count(when(fcol(keyCol).isNull, 1)).as("nulls"),
        count(lit(1)).as("n"),
        countDistinct(fcol(keyCol)).as("nk")).head()
      require(v.getLong(0) == 0L,
        s"changeset has NULL $keyCol keys — a NULL key matches no row")
      require(v.getLong(1) == v.getLong(2),
        s"${v.getLong(1) - v.getLong(2)} duplicate $keyCol key(s) in the " +
          "changeset — each would insert its own row")
      require(v.getLong(1) > 0, "empty changeset")
      require(v.getLong(1) <= Upsert.MaxDriverKeysDefault,
        s"${v.getLong(1)} keys — past the zero-copy merge's driver budget")
      Constraints.enforce(spark, table, changes, "Dv.merge")
      val empty = spark
        .emptyDataset(org.apache.spark.sql.Encoders.scalaLong).toDF(keyCol)
      Versioned.withWriteRetry() {
        mergeOnce(spark, table, keyCol, changes, empty,
          v.getLong(1), 0L, None, insertOnly)
      }
    } finally { changes.unpersist(); () }
  }

  private def mergeOnce(spark: SparkSession, table: String, keyCol: String,
                        upserts: DataFrame, deletes: DataFrame,
                        nUpserts: Long, nDeletes: Long,
                        batchTag: Option[String],
                        insertOnly: Boolean = false): Long = {
    import spark.implicits._
    val live = Versioned.currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no published version at $table"))
    val liveVDir = s"$table/v=$live"
    val dataDir = Versioned.dataDir(spark, table, live) // one hop, always
    val f = fs(spark, table)
    val conf = spark.sparkContext.hadoopConfiguration

    // schema discipline: version-aware marker resolution — the live
    // version's OWN marker (an [[Evolve.addColumns]] overlay) wins over
    // the base dir's; the zero-copy path refuses FURTHER evolution
    // (scope dial above), but composes with a prior metadata-only one
    val schema = Versioned.readSchemaMarker(f, liveVDir)
      .orElse(Versioned.readSchemaMarker(f, dataDir))
      .getOrElse(spark.read.parquet(dataDir).schema)
    // renamed table: logical → physical names for the appends write
    val mapping = Versioned.readColumnMapping(f, liveVDir)
      .getOrElse(Map.empty[String, String])
    val cols = schema.fieldNames.toSeq
    val missing = cols.filterNot(upserts.columns.contains)
    val extra = upserts.columns.toSeq.filterNot(cols.contains)
    require(missing.isEmpty,
      s"changeset schema lacks table column(s) $missing — a merge row " +
        "replaces the WHOLE row")
    require(extra.isEmpty,
      s"changeset adds column(s) $extra — the zero-copy merge does not " +
        "evolve schemas; use Upsert.merge(evolveSchema = true)")
    // TYPE equality on every shared column (same guard as the rewriting
    // merge, [[Upsert]]): the zero-copy merge appends the changeset's
    // files BESIDE the referenced base files, so a mistyped column
    // (decimal(38,6) vs the table's decimal(38,18)) would strand two
    // physical types in one readable version — exactly the
    // footer-inference lottery the rewriting path rejects. NullType
    // (NULL-literal columns) promotes losslessly and stays exempt.
    val mistyped = cols.filter(c =>
      upserts.schema(c).dataType != schema(c).dataType &&
        upserts.schema(c).dataType !=
          org.apache.spark.sql.types.NullType)
    require(mistyped.isEmpty,
      s"changeset column type(s) differ from the table: " +
        mistyped.map(c => s"$c (${upserts.schema(c).dataType.simpleString}" +
          s" vs table ${schema(c).dataType.simpleString})").mkString(", ") +
        " — cast the changeset to the table's types")

    val upsertKeys = upserts.select(col(keyCol).cast("long"))
      .as[Long].collect().toSeq
    val deleteKeys = deletes.select(col(keyCol).cast("long"))
      .as[Long].collect().toSeq
    val ks = (upsertKeys ++ deleteKeys).distinct

    // candidate files: the base data dir AND the live version's own
    // appended files (a prior zero-copy merge) — victims can live in both
    val stats = StatsIndex.load(spark, dataDir)
    def admitted(dir: String): Seq[Path] = {
      val parts = Versioned.dataFilePaths(spark, dir).map(new Path(_))
      parts.filter { p =>
        BloomIndex.mightContainAny(f, dir, p.getName, ks) &&
          ((if (dir == dataDir) stats.flatMap(_.get(p.getName)) else None)
            match {
              case Some(st) => st.admitsAny(ks)
              case None => Forget.rangeAdmitsAny(conf, p, keyCol, ks)
            })
      }
    }
    val ownParts =
      if (dataDir == liveVDir) Seq.empty
      else Versioned.dataFilePaths(spark, liveVDir).map(new Path(_))
    val admittedAll = admitted(dataDir) ++
      (if (dataDir == liveVDir) Seq.empty else admitted(liveVDir))

    val prior =
      if (hasVector(spark, table, live))
        spark.read.parquet(dvDir(liveVDir))
      else spark
        .emptyDataset(org.apache.spark.sql.Encoders.product[(String, Long)])
        .toDF("file", "row_index")
    val victims =
      if (admittedAll.isEmpty)
        prior.limit(0)
      else Versioned.readFiles(spark, dataDir, admittedAll.map(_.toString))
        .select(col("_metadata.file_name").as("file"),
          col("_metadata.row_index").as("row_index"),
          col(keyCol).cast("long").as("_k"))
        .filter(col("_k").isin(ks: _*))
        .select(col("file"), col("row_index"))
        .join(broadcast(prior), Seq("file", "row_index"), "left_anti")
    victims.persist()
    try {
      val nNew = victims.count()
      // insert-only contract (SQL INSERT INTO on a zero-copy base):
      // a victim IS a live row carrying a changeset key — re-checked
      // each OCC attempt, same guarantee as Upsert.merge's guard
      if (insertOnly) require(nNew == 0L,
        s"insert-only merge names $nNew key(s) that already exist in " +
          s"$table — an insert on a live key is an UPDATE (or a " +
          "MERGE); refusing to guess which was meant")
      // nothing vectored AND nothing to upsert: the idempotent no-op
      if (nNew == 0L && nUpserts == 0L) return live
      Clone.pin(spark, dataDir, table) // ordering argument: see purgeOnce
      Versioned.publishFrom(spark, table, live) { dir =>
        val fd = fs(spark, dir)
        // 1. fresh appends FIRST (the parquet overwrite creates the dir);
        //    key-sorted so later footer admission stays tight. A RENAMED
        //    table's appends are written under PHYSICAL names (the
        //    column-mapping contract: every file in a readable version
        //    agrees on physical names; readVersion maps them back) —
        //    the key column never renames, so sort/Bloom stay untouched
        if (nUpserts > 0L) {
          val parts = math.max(1L, math.min(64L,
            nUpserts / 1000000L + 1)).toInt
          upserts.select(cols.map(c =>
              col(s"`$c`").as(mapping.getOrElse(c, c))): _*)
            .repartitionByRange(parts, col(keyCol))
            .sortWithinPartitions(col(keyCol))
            .write.mode("overwrite").parquet(dir)
          // Bloom sidecars for the appends (only they exist here yet)
          BloomIndex.indexExisting(spark, dir, keyCol)
        } else fd.mkdirs(new Path(dir))
        // 2. carry the prior zero-copy merges' appends forward (byte
        //    copies, changeset-scale) so _ref never chains
        ownParts.foreach { p =>
          require(org.apache.hadoop.fs.FileUtil.copy(
            f, p, fd, new Path(dir, p.getName), false, conf),
            s"append carry failed: $p")
          val bs = BloomIndex.sidecar(liveVDir, p.getName)
          if (f.exists(bs))
            org.apache.hadoop.fs.FileUtil.copy(f, bs, fd,
              BloomIndex.sidecar(dir, p.getName), false, conf)
        }
        // manifests ride the landing: when the base data dir is
        // stats-indexed on this key, mint a `_stats` manifest over the
        // new version's OWN files (fresh appends + carried priors) from
        // their footers — driver-side, changeset-scale — so plan-time
        // skipping ([[SkipScan]]) keeps pruning the landed files with
        // no ANALYZE in between
        if (StatsIndex.keyOf(spark, dataDir).exists(
            _.equalsIgnoreCase(keyCol)))
          StatsIndex.buildFromFooters(spark, dir, keyCol)
        // 3. ref + cumulative vector + tag + change feed, as purge
        val out = fd.create(new Path(s"$dir/_ref"), true)
        try out.write(dataDir.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        prior.unionByName(victims)
          .coalesce(math.max(1, (nNew / 4000000L).toInt + 1))
          .write.mode("overwrite").parquet(dvDir(dir))
        val tagPath = new Path(s"$liveVDir/_cdc_batch")
        batchTag match {
          case Some(t) =>
            val o = fd.create(new Path(s"$dir/_cdc_batch"), true)
            try o.write(t.getBytes(StandardCharsets.UTF_8))
            finally o.close()
          case None =>
            if (f.exists(tagPath))
              org.apache.hadoop.fs.FileUtil.copy(f, tagPath, fd,
                new Path(s"$dir/_cdc_batch"), false, true, conf)
        }
        // carry an Evolve overlay's OWN schema marker forward — the new
        // ref version must keep resolving the EXTENDED schema
        val sm = new Path(s"$liveVDir/_table_schema")
        if (f.exists(sm))
          org.apache.hadoop.fs.FileUtil.copy(f, sm, fd,
            new Path(s"$dir/_table_schema"), false, true, conf)
        Versioned.carryColumnMapping(f, liveVDir, fd, dir, conf)
        Cdf.record(spark, dir, schema, keyCol,
          upserts.select(cols.map(col): _*), nUpserts, deletes, nDeletes)
      }
    } finally { victims.unpersist(); () }
  }

  private def purgeOnce(spark: SparkSession, table: String, keyCol: String,
                        keys: Seq[Long]): Long = {
    require(keys.nonEmpty, "purge needs a non-empty key set")
    val ks = keys.distinct
    val live = Versioned.currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no published version at $table"))
    val liveVDir = s"$table/v=$live"
    val dataDir = Versioned.dataDir(spark, table, live) // one hop, always
    val f = fs(spark, table)
    val conf = spark.sparkContext.hadoopConfiguration
    // admission: same Bloom + stats/footer intersection as Forget.purge,
    // over the DATA dir (the sidecars live beside the data) AND the live
    // version's own appended files (a prior zero-copy merge leaves
    // changeset-sized appends beside its _ref — victims can live there)
    val stats = StatsIndex.load(spark, dataDir)
    def admit(dir: String): Seq[Path] =
      Versioned.dataFilePaths(spark, dir).map(new Path(_)).filter { p =>
        BloomIndex.mightContainAny(f, dir, p.getName, ks) &&
          ((if (dir == dataDir) stats.flatMap(_.get(p.getName)) else None)
            match {
              case Some(st) => st.admitsAny(ks)
              case None => Forget.rangeAdmitsAny(conf, p, keyCol, ks)
            })
      }
    val admitted = admit(dataDir) ++
      (if (dataDir == liveVDir) Seq.empty else admit(liveVDir))
    if (admitted.isEmpty) return live // no file can hold any key: no-op

    // victim locations: ONE column-pruned scan of the admitted files.
    // Prior-vector rows are excluded so the count below means NEW deletes
    // (re-deleting an already-deleted key stays a no-op).
    val prior =
      if (hasVector(spark, table, live))
        spark.read.parquet(dvDir(liveVDir))
      else spark.emptyDataset(org.apache.spark.sql.Encoders.product[(String, Long)])
        .toDF("file", "row_index")
    val schemaed = Versioned.readFiles(spark, dataDir,
      admitted.map(_.toString))
    val victims = schemaed
      .select(col("_metadata.file_name").as("file"),
        col("_metadata.row_index").as("row_index"),
        col(keyCol).cast("long").as("_k"))
      .filter(col("_k").isin(ks: _*))
      .select(col("file"), col("row_index"))
      .join(broadcast(prior), Seq("file", "row_index"), "left_anti")
    victims.persist()
    try {
      if (victims.isEmpty) return live // all named rows already deleted/absent
      val nNew = victims.count()
      // pin the shared data dir BEFORE publishing the ref (Clone.shallow's
      // ordering argument: an orphaned pin blocks reclaim, a missing pin
      // breaks reads silently). An OCC conflict below may abandon the pin
      // — deliberately NOT released here: two concurrent purges share ONE
      // pin file (pinName is (table, dataDir)-keyed), and a loser
      // releasing it can unpin a winner whose rename is still in flight
      // cross-process, silently exposing the live DV version to vacuum.
      // Stale self-pins are instead garbage-collected by the next
      // [[Versioned.vacuum]], whose exclusivity contract makes the
      // no-version-references-this-dir check race-free.
      Clone.pin(spark, dataDir, table)
      publishPurge(spark, table, live, liveVDir, dataDir, keyCol, ks,
        prior, victims, nNew, f, conf)
    } finally { victims.unpersist(); () }
  }

  private def publishPurge(spark: SparkSession, table: String, live: Long,
                           liveVDir: String, dataDir: String,
                           keyCol: String, ks: Seq[Long],
                           prior: DataFrame, victims: DataFrame,
                           nNew: Long, f: org.apache.hadoop.fs.FileSystem,
                           conf: org.apache.hadoop.conf.Configuration)
      : Long =
    Versioned.publishFrom(spark, table, live) { dir =>
        val fd = fs(spark, dir)
        fd.mkdirs(new Path(dir))
        // carry a prior zero-copy MERGE's appended files forward (byte
        // copies, changeset-scale) — their rows are part of the snapshot
        // and _ref only names the base dir
        if (dataDir != liveVDir)
          Versioned.dataFilePaths(spark, liveVDir).map(new Path(_))
            .foreach { p =>
              require(org.apache.hadoop.fs.FileUtil.copy(
                f, p, fd, new Path(dir, p.getName), false, conf),
                s"append carry failed: $p")
              val bs = BloomIndex.sidecar(liveVDir, p.getName)
              if (f.exists(bs))
                org.apache.hadoop.fs.FileUtil.copy(f, bs, fd,
                  BloomIndex.sidecar(dir, p.getName), false, conf)
            }
        // carried appends keep their manifest coverage (see mergeOnce)
        if (dataDir != liveVDir &&
            StatsIndex.keyOf(spark, dataDir).exists(
              _.equalsIgnoreCase(keyCol)))
          StatsIndex.buildFromFooters(spark, dir, keyCol)
        val out = fd.create(new Path(s"$dir/_ref"), true)
        try out.write(dataDir.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        // cumulative vector: prior ∪ new — each version self-describing
        prior.unionByName(victims)
          .coalesce(math.max(1, (nNew / 4000000L).toInt + 1))
          .write.mode("overwrite").parquet(dvDir(dir))
        // replay-dedup tag + change feed ride along like every DML
        val tag = new Path(s"$liveVDir/_cdc_batch")
        if (f.exists(tag))
          org.apache.hadoop.fs.FileUtil.copy(
            f, tag, f, new Path(s"$dir/_cdc_batch"), false, true, conf)
        // carry an Evolve overlay's OWN schema marker (wins over the
        // base dir's — see Versioned.schemaMarkerAt)
        val sm = new Path(s"$liveVDir/_table_schema")
        if (f.exists(sm))
          org.apache.hadoop.fs.FileUtil.copy(f, sm, fd,
            new Path(s"$dir/_table_schema"), false, true, conf)
        Versioned.carryColumnMapping(f, liveVDir, fd, dir, conf)
        val schema = Versioned.readSchemaMarker(f, liveVDir)
          .orElse(Versioned.readSchemaMarker(f, dataDir))
          .getOrElse(spark.read.parquet(dataDir).schema)
        Cdf.record(spark, dir, schema, keyCol,
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
          upsertRows = 0L,
          deletes = spark.createDataset(ks)(
            org.apache.spark.sql.Encoders.scalaLong).toDF(keyCol),
          deleteRows = ks.size.toLong)
      }
}
