package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) clustering — the multi-column data-skipping leg
 * of the lake's maintenance surface, Delta's `OPTIMIZE ... ZORDER BY`
 * re-expressed over the [[Versioned]] layout. Range clustering on ONE key
 * ([[Forget.publishIndexed]] / [[Compact.compactVersion]]) makes that
 * key's per-file ranges disjoint, but a predicate on any OTHER column
 * still admits every file. Interleaving the bits of 2-4 columns' bucket
 * numbers into one sort key gives every z-column locality at once: a
 * box predicate over k columns admits O(files^(1-1/k))-ish of the table
 * instead of all of it — at a 100 TB table the difference between a
 * dashboard probe scanning terabytes and scanning gigabytes.
 *
 * Pieces:
 *   - [[cluster]]: republish the live version z-ordered as a NEW version
 *     (snapshot isolation, time travel intact — same posture as
 *     [[Compact.compactVersion]]), carrying every sidecar the live
 *     version had (`_bloom`, `_stats`, `_cdc_batch`, `_table_schema`)
 *     and writing the `_boxstats` manifest below.
 *   - `_boxstats/` manifest: per-file min/max/non-null of EACH z column
 *     (plus the column list), one metadata-sized parquet — the
 *     multi-column twin of [[StatsIndex]], same advisory contract.
 *   - [[readBox]] / [[admittedBoxCount]]: a conjunctive range ("box")
 *     scan reading only files whose per-column bounding box intersects
 *     the probe, with the same staleness guard as
 *     [[StatsIndex.readRange]] — a manifest that no longer covers the
 *     dir degrades to the full scan + filter, never to missing rows.
 *     Later file-targeted DML rewrites files WITHOUT maintaining
 *     `_boxstats` (deliberately: DML stays z-agnostic), which trips the
 *     coverage guard; periodic re-[[cluster]] restores skipping —
 *     exactly the OPTIMIZE-after-ingest cadence Delta documents.
 *
 * Buckets are linear min/max scaling of each column to `bits` bits
 * (pure integer math, overflow-safe divide-first). On heavily skewed
 * columns linear buckets collapse and skipping on that column degrades
 * (never wrong — admission works on RAW per-file min/max, not buckets);
 * an order-preserving rank transform can be slotted into [[zValue]]
 * without touching the manifest or admission layer.
 *
 * Reference behavior this generalizes: the reference's day-partitioned
 * reads prune on exactly one dimension (s3_loader.py partition layout);
 * analytic probes there filter date AND user/store — the second
 * dimension scans everything. Z-order is the standard lakehouse answer.
 */
object ZOrder {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def boxDir(dir: String) = s"$dir/_boxstats"

  /** Bits per column: n=2 -> 16, n=3 -> 16, n=4 -> 12 (z stays within 48
    * bits — comfortably positive in a Long, so range partitioning on it
    * never sees sign wrap). */
  private def bitsFor(n: Int): Int = math.min(16, 48 / n)

  /** Exact equi-width bucket of `v` in [lo, hi] scaled ONTO [0, 2^bits):
    * the bucket width is the power of two 2^shift with shift chosen so
    * the span needs at most `bits` bucket numbers — so the whole
    * transform is (v - lo) >>> shift, pure codegen'd integer bit ops with
    * none of the precision hazard a double division of 2^63-magnitude
    * longs carries (Spark's Column `/` is double division). A span
    * NARROWER than `bits` bits scales UP instead ((v - lo) << fill): a
    * raw-valued narrow bucket would park its information in the LOW bits
    * and leave the top bits constantly zero — the interleave then sorts
    * by the wider columns alone and the narrow column's per-file boxes
    * never tighten (observed: a [0,1500) key z-ordered against a 19-bit
    * column produced files all spanning the FULL key range — zero
    * skipping on that column). Power-of-2 widths are at most 2x coarser
    * than the ideal equi-width split — irrelevant to an approximate
    * clustering layout, and admission works on RAW per-file min/max
    * regardless. The astronomically wide span that overflows a signed
    * Long (lo near MinValue AND hi near MaxValue) falls back to bucketing
    * the sign-flipped raw value — order-preserving, no subtraction to
    * overflow. */
  private[lake] def bucket(v: Column, lo: Long, hi: Long, bits: Int): Column = {
    val span = BigInt(hi) - BigInt(lo)
    if (span.bitLength > 63) {
      // signed -> unsigned order flip, then keep the top `bits` bits
      shiftrightunsigned(v.bitwiseXOR(lit(Long.MinValue)), 64 - bits)
    } else if (span.bitLength >= bits) {
      shiftrightunsigned(v - lit(lo), span.bitLength - bits)
    } else {
      // scale up: the span's top bit must land on the bucket's top bit
      shiftleft(v - lit(lo), bits - span.bitLength)
    }
  }

  /** The interleaved z-value of the columns' buckets: bit b of column j
    * lands at position b*n + j, so all columns contribute to the high
    * bits equally. Built as a flat OR-fold of shift/mask terms — bits*n
    * (<= 48) integer ops per row, all inside whole-stage codegen; this is
    * a maintenance-pass expression, not a hot query path. A NULL in any
    * column yields a NULL z (rows sort together, nulls-first). */
  private[lake] def zValue(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    val terms = for {
      (b, j) <- buckets.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Republish `table`'s live version z-ordered on `zCols` (2-4 numeric /
    * castable-to-long columns) into ceil(bytes/targetBytes) files, as a
    * new version. One stats pass (per-column min/max), one range
    * repartition on the z value, one write; every skipping sidecar and
    * lake marker the live version carried comes back. Returns the new
    * version. `keyCol` is the table's DML key — its `_bloom`/`_stats`
    * rebuild exactly when present before (z-order changes LAYOUT, not the
    * DML contract). */
  def cluster(spark: SparkSession, table: String, zCols: Seq[String],
              keyCol: String,
              targetBytes: Long = 128L * 1024 * 1024): Long =
    Versioned.withWriteRetry() {
      clusterOnce(spark, table, zCols, keyCol, targetBytes)
    }

  private def clusterOnce(spark: SparkSession, table: String,
                          zCols: Seq[String], keyCol: String,
                          targetBytes: Long): Long = {
    require(zCols.size >= 2 && zCols.size <= 4,
      s"z-order interleaves 2-4 columns, got ${zCols.size}")
    val live = Versioned.currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no published version at $table"))
    require(!Versioned.isShallowRef(spark, table, live),
      s"$table v$live is a shallow-clone reference (no data of its own) — " +
        "Clone.materialize(...) first, then cluster")
    val liveDir = s"$table/v=$live"
    val f = fs(spark, liveDir)
    val files = f.listStatus(new Path(liveDir)).toSeq.filter(s =>
      s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
    val bytes = files.map(_.getLen).sum
    val want = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val hadBloom = f.exists(new Path(s"$liveDir/_bloom"))
    val hadStats = StatsIndex.exists(spark, liveDir)
    val marker = Versioned.readSchemaMarker(f, liveDir)
    val df = marker.map(s => spark.read.schema(s)).getOrElse(spark.read)
      .parquet(liveDir)
    zCols.foreach(c => require(df.columns.contains(c),
      s"z column $c not in table schema ${df.columns.toSeq}"))
    // ONE pass for all column spans; a column with no non-null values
    // gets the degenerate [0,0] span (bucket 0 for the z value — it
    // carries no information, and admission excludes it precisely via
    // the manifest's non-null count)
    val spansRow = df.select(zCols.flatMap(c => Seq(
      min(col(c).cast("long")), max(col(c).cast("long")))): _*).head()
    val spans = zCols.indices.map { i =>
      if (spansRow.isNullAt(2 * i)) (0L, 0L)
      else (spansRow.getLong(2 * i), spansRow.getLong(2 * i + 1))
    }
    val bits = bitsFor(zCols.size)
    val z = zValue(zCols.zip(spans).map { case (c, (lo, hi)) =>
      bucket(col(c).cast("long"), lo, hi, bits)
    }, bits)
    Versioned.publishFrom(spark, table, live) { newDir =>
      df.withColumn("_graft_z", z)
        .repartitionByRange(want, col("_graft_z"))
        .sortWithinPartitions(col("_graft_z"))
        .drop("_graft_z")
        .write.mode(SaveMode.Overwrite).parquet(newDir)
      buildBoxStats(spark, newDir, zCols)
      if (hadBloom) BloomIndex.indexExisting(spark, newDir, keyCol)
      if (hadStats) StatsIndex.build(spark, newDir, keyCol)
      // token-Bloom index: rebuilt like `_bloom`/`_stats` (see compactVersion)
      TokenBloom.rebuildIfIndexed(spark, liveDir, newDir)
      StrStats.rebuildIfPresent(spark, liveDir, newDir)
      val tag = new Path(s"$liveDir/_cdc_batch")
      if (f.exists(tag))
        org.apache.hadoop.fs.FileUtil.copy(
          f, tag, f, new Path(s"$newDir/_cdc_batch"), false, true,
          spark.sparkContext.hadoopConfiguration)
      marker.foreach(Versioned.writeSchemaMarker(f, newDir, _))
      Cdf.recordNone(f, newDir) // layout-only: no row changed
    }
  }

  /** Build/refresh the `_boxstats` manifest for every data file in `dir`:
    * one column-pruned scan emitting per-file min/max/non-null for each
    * `cols` entry. Layout-agnostic — callable on any parquet dir, though
    * skipping only pays after [[cluster]] gives the files small boxes. */
  def buildBoxStats(spark: SparkSession, dir: String,
                    cols: Seq[String]): Unit = {
    val aggs = count(lit(1)).as("rows") +:
      cols.flatMap(c => Seq(
        min(col(c).cast("long")).as(s"min_$c"),
        max(col(c).cast("long")).as(s"max_$c"),
        count(col(c)).as(s"nn_$c")))
    Versioned.readDataDir(spark, dir)
      .select(element_at(split(input_file_name(), "/"), -1).as("file") +:
        cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(boxDir(dir))
  }

  /** One file's per-column boxes: (min, max, nonNull) keyed by column.
    * min/max are None iff the column has no non-null values in the file. */
  final case class FileBox(rows: Long,
                           by: Map[String, (Option[Long], Option[Long], Long)]) {
    def admits(preds: Seq[(String, Long, Long)]): Boolean =
      preds.forall { case (c, lo, hi) =>
        by.get(c).exists { case (mn, mx, nn) =>
          nn > 0 && mn.get <= hi && mx.get >= lo
        }
      }
  }

  /** The manifest's column list and per-file boxes; None when `dir` has
    * no `_boxstats`. Driver-side Spark-free read would need a generic
    * parquet-mr walk over a dynamic schema — the manifest is one tiny
    * file, so a single collect is already metadata-cost here (unlike
    * [[StatsIndex.load]], this is a SELECT-planning path called once per
    * probe, not a per-DML inner loop). */
  def loadBoxStats(spark: SparkSession, dir: String)
      : Option[(Seq[String], Map[String, FileBox])] = {
    if (!fs(spark, dir).exists(new Path(boxDir(dir)))) return None
    val m = spark.read.parquet(boxDir(dir))
    val cols = m.columns.toSeq.collect {
      case n if n.startsWith("min_") => n.stripPrefix("min_")
    }
    val rows = m.collect().map { r =>
      val file = r.getAs[String]("file")
      val by = cols.map { c =>
        val i = r.fieldIndex(s"min_$c")
        val j = r.fieldIndex(s"max_$c")
        val mn = if (r.isNullAt(i)) None else Some(r.getLong(i))
        val mx = if (r.isNullAt(j)) None else Some(r.getLong(j))
        c -> ((mn, mx, r.getAs[Long](s"nn_$c")))
      }.toMap
      file -> FileBox(r.getAs[Long]("rows"), by)
    }.toMap
    Some((cols, rows))
  }

  private def partFiles(spark: SparkSession, dir: String): Seq[String] =
    fs(spark, dir).listStatus(new Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath.getName)

  /** Conjunctive range ("box") scan reading only manifest-admitted files;
    * the residual filter trims edge rows, so the result is EXACTLY the
    * full scan's. Requires `_boxstats` covering every probe column.
    * Staleness guard as [[StatsIndex.readRange]]: a manifest that no
    * longer covers the dir's files (DML rewrote some since [[cluster]])
    * degrades to the plain scan + filter. */
  def readBox(spark: SparkSession, dir: String,
              preds: Seq[(String, Long, Long)]): DataFrame = {
    require(preds.nonEmpty, "readBox needs at least one (col, lo, hi)")
    val (cols, boxes) = loadBoxStats(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"no _boxstats manifest at $dir — ZOrder.cluster/buildBoxStats first"))
    val missing = preds.map(_._1).filterNot(cols.contains)
    require(missing.isEmpty,
      s"_boxstats at $dir does not cover probe column(s) $missing " +
        s"(manifest covers $cols)")
    val residual = preds.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    // all reads honor an evolved table's _table_schema marker — an
    // evolved-then-DML'd dir holds mixed-schema files, where plain footer
    // inference is timing-dependent (see Versioned.readDataDir/readFiles)
    if (partFiles(spark, dir).toSet != boxes.keySet)
      return Versioned.readDataDir(spark, dir).filter(residual)
    val admitted = boxes.collect {
      case (name, b) if b.admits(preds) => s"$dir/$name"
    }.toSeq
    if (admitted.isEmpty)
      Versioned.readDataDir(spark, dir).filter(lit(false)) // schema-stable
    else Versioned.readFiles(spark, dir, admitted).filter(residual)
  }

  /** How many files [[readBox]] would open for `preds` — including its
    * staleness fallback (non-covering manifest = full scan = on-disk
    * count). -1 = no manifest. */
  def admittedBoxCount(spark: SparkSession, dir: String,
                       preds: Seq[(String, Long, Long)]): Int =
    loadBoxStats(spark, dir).fold(-1) { case (_, boxes) =>
      val onDisk = partFiles(spark, dir)
      if (onDisk.toSet != boxes.keySet) onDisk.size
      else boxes.values.count(_.admits(preds))
    }
}
