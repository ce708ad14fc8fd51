package graft.lake

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Targeted delete (right-to-be-forgotten) over a [[Versioned]] table — the
 * governance operator a 100 TB training-data lake needs when a deletion
 * request names a key set (user ids, document ids): remove every row for
 * those keys by REWRITING ONLY THE FILES THAT CAN CONTAIN THEM, copying
 * every other file byte-identically, and exposing the purged snapshot in
 * one atomic manifest swap. The reference lake has no deletion story at
 * all (its S3 loader is append-only, `s3_loader.py`); this is the missing
 * compliance leg.
 *
 * Why file-targeted: an in-place full-table rewrite at 100 TB is both a
 * multi-hour job and a reader hazard. Candidates are pruned by BOTH
 * available indexes, each conservative so their intersection is safe:
 * [[BloomIndex]] sidecars on the key column (hash-distributed keys defeat
 * min/max stats — the Bloom sidecar is exactly the skipping dimension
 * that survives) shrink the candidate set to ~`|keys| x fpp`-bounded
 * files, and parquet FOOTER min/max covers [[Cluster]]/[[ZOrder]] range
 * layouts with no sidecars at all (~1 admitted file per key when ranges
 * are disjoint). Untouched files are transferred with a raw
 * byte copy — no decode/re-encode, no row-group rewrite, bitwise-equal
 * output (on S3 a server-side copy; on HDFS a block copy) — so the rewrite
 * cost scales with the AFFECTED fraction, not the table.
 *
 * Versioning contract: the purged snapshot becomes `v=N+1` behind
 * [[Versioned]]'s manifest swap — readers never see a half-purged table,
 * and the pre-purge version stays readable (time travel) until
 * [[Versioned.vacuum]] drops it. COMPLIANCE NOTE: the purge is not
 * physically complete until vacuum removes the old version dirs; a
 * deployment runs `purge` then `vacuum(keep = 0)` inside its deletion-SLA
 * window.
 *
 * Sidecar maintenance: untouched files keep their sidecars (copied
 * byte-identically alongside); rewritten files get freshly built ones.
 * A deletion only shrinks a file's key set, so even a stale copied filter
 * stays a superset — false positives only, never a missed file.
 *
 * Key-set dial: `keys` is driver-resident (a deletion request batch —
 * thousands, not billions). Each candidate file costs one sidecar load and
 * `|keys|` hash probes. A key set large enough to admit most files has
 * degenerated to a full rewrite anyway — at that point publish
 * `read().join(keys, "left_anti")` via [[Versioned.publish]] instead.
 */
object Forget {

  private def fs(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Publish `df` as the first/next version of `table`, hash-distributed
    * into `nFiles` files on `keyCol` with Bloom sidecars — the layout
    * [[purge]] prunes against. `stats = true` also births the
    * [[StatsIndex]] manifest, which every later [[purge]]/[[Upsert]]
    * rewrite then maintains incrementally. */
  def publishIndexed(df: DataFrame, table: String, nFiles: Int,
                     keyCol: String, fpp: Double = 0.01,
                     stats: Boolean = false): Long = {
    Constraints.enforce(df.sparkSession, table, df, "publishIndexed")
    Versioned.publishWith(df.sparkSession, table) { dir =>
      BloomIndex.writeIndexed(df, dir, nFiles, keyCol, fpp)
      if (stats) StatsIndex.build(df.sparkSession, dir, keyCol)
      Cdf.recordBreak(df.sparkSession, dir, df.schema) // wholesale replace
    }
  }

  /** Publish `df` range-clustered on `keyCol` ([[Cluster]] layout, no
    * sidecars): every file covers a disjoint key range, so [[purge]]
    * prunes candidates from parquet FOOTER min/max alone — ~1 admitted
    * file per key. `stats = true` additionally births the [[StatsIndex]]
    * manifest so that pruning costs one metadata read instead of
    * per-file footer opens. */
  def publishClustered(df: DataFrame, table: String, nFiles: Int,
                       keyCol: String, stats: Boolean = false): Long = {
    Constraints.enforce(df.sparkSession, table, df, "publishClustered")
    Versioned.publishWith(df.sparkSession, table) { dir =>
      Cluster.writeClustered(df, dir, nFiles, col(keyCol))
      if (stats) StatsIndex.build(df.sparkSession, dir, keyCol)
      Cdf.recordBreak(df.sparkSession, dir, df.schema) // wholesale replace
    }
  }

  /** Does any row group of `file` have [min,max] admitting ANY of `keys`?
    * Missing/absent stats admit (conservative, like a missing sidecar).
    * One footer open per candidate file, driver-side and metadata-sized —
    * a production deployment keeps the same stats in a manifest table
    * (Delta/Iceberg style) and prunes without touching the files. */
  private[lake] def rangeAdmitsAny(conf: org.apache.hadoop.conf.Configuration,
                                   file: Path, keyCol: String,
                                   keys: Seq[Long]): Boolean = {
    import scala.jdk.CollectionConverters._
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      r.getFooter.getBlocks.asScala.exists { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == keyCol) match {
          case None => true
          case Some(cc) =>
            val st = cc.getStatistics
            if (st == null || !st.hasNonNullValue) true
            else (st.genericGetMin, st.genericGetMax) match {
              case (mn: java.lang.Long, mx: java.lang.Long) =>
                keys.exists(k => k >= mn && k <= mx)
              case (mn: java.lang.Integer, mx: java.lang.Integer) =>
                keys.exists(k => k >= mn.longValue && k <= mx.longValue)
              case _ => true // unexpected physical type: admit
            }
        }
      }
    } finally r.close()
  }

  /** Byte-copy the untouched files + their sidecars into `newDir`,
    * IN PARALLEL across a driver thread pool: the copies are independent
    * I/O (server-side on S3), and a 100 TB table's carried-file count is
    * thousands — serializing them would make the COPY loop, not the
    * rewrite, the wall-clock floor. Shared by [[purge]] and
    * [[Upsert.applyChanges]]. */
  private[lake] def copyUntouched(f: FileSystem,
                                  conf: org.apache.hadoop.conf.Configuration,
                                  liveDir: String, newDir: String,
                                  untouched: Seq[Path]): Unit = {
    import scala.collection.parallel.CollectionConverters._
    untouched.par.foreach { p =>
      require(FileUtil.copy(f, p, f, new Path(newDir, p.getName),
        false, conf), s"copy failed: $p")
      val side = BloomIndex.sidecar(liveDir, p.getName)
      if (f.exists(side))
        require(FileUtil.copy(f, side,
          f, BloomIndex.sidecar(newDir, p.getName), false, conf),
          s"sidecar copy failed: $side")
      val tok = TokenBloom.sidecar(liveDir, p.getName)
      if (f.exists(tok))
        require(FileUtil.copy(f, tok,
          f, TokenBloom.sidecar(newDir, p.getName), false, conf),
          s"token sidecar copy failed: $tok")
    }
  }

  /** Delete every row whose `keyCol` is in `keys`, rewriting only
    * Bloom-admitted files; returns the new live version (or the current
    * one unchanged when no file can contain any key — an idempotent
    * no-op, e.g. a re-submitted deletion request). */
  def purge(spark: SparkSession, table: String, keyCol: String,
            keys: Seq[Long]): Long =
    Versioned.withWriteRetry() { purgeOnce(spark, table, keyCol, keys) }

  private def purgeOnce(spark: SparkSession, table: String, keyCol: String,
                        keys: Seq[Long]): Long = {
    require(keys.nonEmpty, "purge needs a non-empty key set")
    val ks = keys.distinct
    val live = Versioned.currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no published version at $table"))
    require(!Versioned.isShallowRef(spark, table, live),
      s"$table v$live is a shallow-clone reference (no data of its own) — " +
        "Clone.materialize(...) first, then purge")
    val liveDir = s"$table/v=$live"
    val f = fs(spark, table)
    val parts = f.listStatus(new Path(liveDir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath)
    val conf = spark.sparkContext.hadoopConfiguration
    // both prunes are conservative, so their INTERSECTION is safe: the
    // Bloom sidecar carries hash-distributed layouts (min/max blind), the
    // range stats carry range-clustered layouts (no sidecars needed);
    // a file must be admitted by every available index to rewrite.
    // Range source: the [[StatsIndex]] manifest when present (ONE
    // metadata read for the whole dir), per-file footer opens otherwise.
    val stats = StatsIndex.load(spark, liveDir)
    val (affected, untouched) = parts.partition { p =>
      BloomIndex.mightContainAny(f, liveDir, p.getName, ks) &&
        (stats.flatMap(_.get(p.getName)) match {
          case Some(st) => st.admitsAny(ks)
          case None => rangeAdmitsAny(conf, p, keyCol, ks)
        })
    }
    if (affected.isEmpty) return live

    Versioned.publishFrom(spark, table, live) { newDir =>
      // 1. rewrite the affected files in ONE distributed job (Spark owns
      //    the dir): anti-filter the key set, keep file granularity with a
      //    RANGE repartition + sort — restores sorted, mostly-disjoint
      //    per-file ranges on the rewritten subset (boundaries are
      //    sample-derived, so a rewritten file's [min,max] can straddle a
      //    carried file's range; footer pruning stays conservative either
      //    way, it just admits the occasional extra file on a later purge)
      //    and is layout-neutral for hash-Bloom tables (their sidecars are
      //    rebuilt below either way).
      //    NULL-key guard: `!isin` is NULL for NULL keys and filter drops
      //    NULL predicates — without the isNull arm, rows the deletion
      //    request never named would vanish from rewritten files
      val marker = Versioned.readSchemaMarker(f, liveDir)
      marker.map(s => spark.read.schema(s)).getOrElse(spark.read)
        .parquet(affected.map(_.toString): _*)
        .filter(col(keyCol).isNull || !col(keyCol).isin(ks: _*))
        .repartitionByRange(affected.size, col(keyCol))
        .sortWithinPartitions(col(keyCol))
        .write.mode("overwrite").parquet(newDir)
      // 2. fresh sidecars for the rewritten files (only they exist in
      //    newDir at this point)
      BloomIndex.indexExisting(spark, newDir, keyCol)
      // 3. untouched files + their sidecars: raw byte copy, bitwise-equal
      copyUntouched(f, conf, liveDir, newDir, untouched)
      // 4. stats manifest rides along when the table keeps one: carried
      //    files keep their rows, only the rewritten files read their own
      //    footers (reuses the manifest the prune step already loaded)
      StatsIndex.rebuildAfterRewrite(spark, liveDir, newDir, keyCol,
        preloaded = stats)
      //    token-Bloom twin: carried files' sidecars were byte-copied in
      //    step 3; re-index just the rewritten files from the carried
      //    recipe — touched-fraction maintenance, like `_stats`
      TokenBloom.carryMeta(spark, liveDir, newDir)
      TokenBloom.indexMissing(spark, newDir)
      // 5. carry the CDC replay-dedup tag forward (see compactVersion): a
      //    purge interleaved inside a streaming sink's crash window must
      //    not erase the applied-batch watermark
      val tag = new Path(s"$liveDir/_cdc_batch")
      if (f.exists(tag))
        org.apache.hadoop.fs.FileUtil.copy(
          f, tag, f, new Path(s"$newDir/_cdc_batch"), false, true, conf)
      // 6. so does the schema marker: byte-copied pre-evolution files keep
      //    the new version's footer inference ambiguous
      marker.foreach(Versioned.writeSchemaMarker(f, newDir, _))
      // 7. change feed: a purge's changeset is its deletions
      val schema = marker.getOrElse(spark.read.parquet(liveDir).schema)
      Cdf.record(spark, newDir, schema, keyCol,
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
        upsertRows = 0L,
        deletes = spark.createDataset(ks)(
          org.apache.spark.sql.Encoders.scalaLong).toDF(keyCol),
        deleteRows = ks.size.toLong)
      // 8. file-level commit record (what this purge removed/added vs its
      //    base) — lets a concurrent disjoint-file MERGE rebase over this
      //    commit instead of re-deriving (see Upsert's conflict check)
      val untouchedNames = untouched.map(_.getName).toSet
      val added = f.listStatus(new Path(newDir)).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .map(_.getPath.getName).toSet -- untouchedNames
      Versioned.writeCommitInfo(f, newDir,
        Versioned.CommitInfo(live, affected.map(_.getName).toSet, added))
    }
  }
}
