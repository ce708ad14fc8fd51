package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}

/**
 * Small-files compaction — the lake maintenance pass a long-lived
 * partitioned store needs: streaming sinks, incremental backfills and
 * per-day appends accumulate many sub-target files per partition, and at
 * 100 TB the scan-side task count (one per file) becomes the bottleneck,
 * not the bytes. Compaction rewrites a leaf directory into
 * ceil(bytes / targetBytes) files.
 *
 * Safety protocol: write to a `_compact_tmp` sibling, then swap via two
 * renames (dir-level rename is atomic on HDFS and a plain move on the
 * local FS; on S3A this maps to the committer's copy+delete — documented
 * trade-off, same as every S3 table-maintenance job without a
 * transactional table format). The original survives as `_compact_bak`
 * until the swap completes, so a crash mid-compact never loses data —
 * rerunning heals: a leftover tmp/bak is cleared before the next attempt.
 *
 * Scale posture: the rewrite is one distributed read-repartition-write of
 * the leaf's data; file listing is driver metadata work only. Partitioned
 * tables compact leaf-by-leaf (see [[compactDays]]) so one pass never
 * holds more than a partition's worth of shuffle.
 */
object Compact {

  final case class Stats(path: String, filesBefore: Int, filesAfter: Int,
                         bytes: Long)

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(f: FileSystem, dir: Path): Array[Path] =
    f.listStatus(dir).filter(s => s.isFile)
      .map(_.getPath)
      .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))

  /**
   * Rewrite one leaf parquet directory into ~targetBytes files.
   * No-op (returns current stats) when the directory already has
   * <= the target file count — rerunning is cheap and idempotent.
   */
  def compactLeaf(spark: SparkSession, dir: String,
                  targetBytes: Long = 128L * 1024 * 1024): Stats = {
    val f = fs(spark, dir)
    val d = new Path(dir)
    val tmp = new Path(dir + "_compact_tmp")
    val bak = new Path(dir + "_compact_bak")
    // heal a crashed previous attempt: tmp is garbage (incomplete write),
    // bak means the swap lost the race after the tmp write — restore it
    if (f.exists(bak) && !f.exists(d)) f.rename(bak, d)
    if (f.exists(tmp)) f.delete(tmp, true)
    if (f.exists(bak)) f.delete(bak, true)

    val files = dataFiles(f, d)
    val bytes = files.map(p => f.getFileStatus(p).getLen).sum
    val want = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (files.length <= want)
      return Stats(dir, files.length, files.length, bytes)

    spark.read.parquet(dir).repartition(want)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // preserve non-data sidecars (_sidecar.json etc.; _SUCCESS is fresh in tmp)
    f.listStatus(d).filter(_.isFile).map(_.getPath)
      .filter(p => p.getName.startsWith("_") && p.getName != "_SUCCESS")
      .foreach(p => f.rename(p, new Path(tmp, p.getName)))
    require(f.rename(d, bak), s"compact: could not stage $dir aside")
    require(f.rename(tmp, d), s"compact: could not swap in compacted $dir")
    f.delete(bak, true)
    Stats(dir, files.length, dataFiles(f, d).length, bytes)
  }

  /** Compact every committed day partition of a bronze data type
    * (`root/dataType/year=/month=/day=` — graft.bronze.Lake's layout),
    * leaf-by-leaf. Returns one Stats per compacted day. */
  def compactDays(spark: SparkSession, root: String, dataType: String,
                  targetBytes: Long = 128L * 1024 * 1024): Seq[Stats] = {
    val f = fs(spark, s"$root/$dataType")
    val glob = new Path(s"$root/$dataType/year=*/month=*/day=*")
    val leaves = f.globStatus(glob)
    if (leaves == null) Seq.empty
    else leaves.filter(_.isDirectory).map(_.getPath.toString).sorted
      .map(compactLeaf(spark, _, targetBytes)).toSeq
  }

  /**
   * Compaction for [[Versioned]] DML tables — the maintenance pass that
   * keeps [[Upsert]]/[[Forget]] rewrites from accreting small files: a
   * long CDC trickle leaves each version with ever more sub-target
   * rewritten files, and the scan-side task count (one per file) becomes
   * the read bottleneck. Bin-packs the live version into
   * ceil(bytes / targetBytes) files AS A NEW VERSION — no in-place swap,
   * so readers keep snapshot isolation and the pre-compact version stays
   * time-travel readable until vacuum (strictly safer than
   * [[compactLeaf]]'s rename dance, which exists for the non-versioned
   * bronze layout).
   *
   * The rewrite is range-repartitioned + sorted on `keyCol`, so
   * [[Cluster]]-style per-file ranges are (re)established — compaction
   * REPAIRS the range overlap a long rewrite history accumulates — and
   * whatever skipping indexes the live version carries are rebuilt:
   * `_bloom` sidecars ([[BloomIndex]]) and the `_stats` manifest
   * ([[StatsIndex]]) each come back exactly when present before.
   * No-op (returns the live version) when already at/below target.
   */
  def compactVersion(spark: SparkSession, table: String, keyCol: String,
                     targetBytes: Long = 128L * 1024 * 1024): Long =
    Versioned.withWriteRetry() {
      compactVersionOnce(spark, table, keyCol, targetBytes)
    }

  private def compactVersionOnce(spark: SparkSession, table: String,
                                 keyCol: String, targetBytes: Long): Long = {
    import org.apache.spark.sql.functions.col
    val live = Versioned.currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no published version at $table"))
    require(!Versioned.isShallowRef(spark, table, live),
      s"$table v$live is a shallow-clone reference (no data of its own) — " +
        "Clone.materialize(...) first, then compact")
    val liveDir = s"$table/v=$live"
    val f = fs(spark, liveDir)
    val files = dataFiles(f, new Path(liveDir))
    val bytes = files.map(p => f.getFileStatus(p).getLen).sum
    val want = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (files.length <= want) return live
    val hadBloom = f.exists(new Path(s"$liveDir/_bloom"))
    val hadStats = StatsIndex.exists(spark, liveDir)
    val marker = Versioned.readSchemaMarker(f, liveDir)
    Versioned.publishFrom(spark, table, live) { newDir =>
      // marker-aware read: mixed pre/post-evolution files null-fill
      // deterministically (compaction then homogenizes the files, but the
      // marker still travels — it is the table's authoritative schema)
      marker.map(s => spark.read.schema(s)).getOrElse(spark.read)
        .parquet(liveDir)
        .repartitionByRange(want, col(keyCol))
        .sortWithinPartitions(col(keyCol))
        .write.mode(SaveMode.Overwrite).parquet(newDir)
      if (hadBloom) BloomIndex.indexExisting(spark, newDir, keyCol)
      if (hadStats) StatsIndex.build(spark, newDir, keyCol)
      // the token-Bloom index rides the same maintenance as its key twin:
      // rebuilt from the `_tokbloom/_meta` recipe when the live version
      // carried one (else keyword search silently degrades to full scans
      // until a manual re-index)
      TokenBloom.rebuildIfIndexed(spark, liveDir, newDir)
      // string min/max manifest: same ride (column list is in the old
      // manifest itself)
      StrStats.rebuildIfPresent(spark, liveDir, newDir)
      // carry the CDC replay-dedup tag forward: compaction changes the
      // layout, not the applied-batch watermark, and a streaming sink's
      // crash-replay probe must survive a maintenance publish + vacuum
      val tag = new Path(s"$liveDir/_cdc_batch")
      if (f.exists(tag))
        org.apache.hadoop.fs.FileUtil.copy(
          f, tag, f, new Path(s"$newDir/_cdc_batch"), false, true,
          spark.sparkContext.hadoopConfiguration)
      marker.foreach(Versioned.writeSchemaMarker(f, newDir, _))
      Cdf.recordNone(f, newDir) // layout-only: no row changed
    }
  }
}
