package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._

/** Per-file key min/max for one data file ([[StatsIndex]] row). `kmin`/
  * `kmax` are None iff the file has no non-null keys — which PRECISELY
  * excludes it from any Long-key probe, not merely conservatively. */
final case class FileKeyStats(kmin: Option[Long], kmax: Option[Long],
                              nonNull: Long, rows: Long) {
  def admitsAny(keys: Seq[Long]): Boolean =
    nonNull > 0 && keys.exists(k => k >= kmin.get && k <= kmax.get)
}

/**
 * Manifest stats table — per-file (min, max, counts) of a key column,
 * stored as ONE small parquet under `<dir>/_stats/`. This is the
 * "stats in a manifest, not in the files" leg Delta/Iceberg use for file
 * skipping, promised by [[Forget]]'s scaladoc: parquet footer min/max
 * gives the same answer, but reading it costs ONE FOOTER OPEN PER
 * CANDIDATE FILE — at a 100 TB table with 10⁵ files that is 10⁵ driver
 * round trips per purge/merge, vs one metadata-sized read here. The
 * footer path stays as the fallback for files the manifest doesn't cover,
 * so the index is advisory: stale-or-absent stats degrade to footer
 * opens, never to wrong answers ([[Forget.purge]]/[[Upsert]] consult
 * stats first, footers second, and BOTH are intersected with the Bloom
 * sidecar answer).
 *
 * Maintenance mirrors the Bloom sidecars: [[build]] scans the key column
 * once (column-pruned, map-side-combined — the cheapest possible pass);
 * after a file-targeted rewrite, [[rebuildAfterRewrite]] CARRIES the
 * byte-copied files' rows forward from the old manifest and scans only
 * the rewritten files, so maintenance cost also tracks the touched
 * fraction, not the table.
 */
object StatsIndex {

  private def statsDir(dir: String) = s"$dir/_stats"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Does `dir` carry a stats manifest? */
  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(statsDir(dir)))

  // (file-name, stats) rows for the given parquet files, via one
  // column-pruned scan
  private def scanStats(spark: SparkSession, paths: Seq[String],
                        keyCol: String) =
    spark.read.parquet(paths: _*)
      .select(element_at(split(input_file_name(), "/"), -1).as("file"),
        col(keyCol).cast("long").as("k"))
      .groupBy(col("file"))
      .agg(min(col("k")).as("kmin"), max(col("k")).as("kmax"),
        count(col("k")).as("non_null"), count(lit(1)).as("rows"))

  /** Build/refresh the manifest for every `part-*` file in `dir`. */
  def build(spark: SparkSession, dir: String, keyCol: String): Unit = {
    scanStats(spark, Seq(dir), keyCol)
      .coalesce(1)
      .write.mode("overwrite").parquet(statsDir(dir))
    writeKeyMarker(spark, dir, keyCol)
  }

  /** Build the manifest for a HIVE-PARTITIONED tree (`k=v/` subdirs):
    * rows keyed by the file's PARTITION-RELATIVE path
    * (`k=v/.../part-...`), NOT the basename — one partitioned write job
    * reuses task file names across partition dirs, so basenames
    * collide. One column-pruned scan of the whole tree; consumed by
    * [[SkipScan.scanPartitioned]], which composes directory pruning on
    * the partition values with per-file range admission. */
  def buildPartitionedTree(spark: SparkSession, dir: String,
                           keyCol: String): Unit = {
    spark.read.parquet(dir)
      .select(
        regexp_extract(input_file_name(),
          "((?:[^/]+=[^/]+/)+[^/]+)$", 1).as("file"),
        col(keyCol).cast("long").as("k"))
      .groupBy(col("file"))
      .agg(min(col("k")).as("kmin"), max(col("k")).as("kmax"),
        count(col("k")).as("non_null"), count(lit(1)).as("rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(statsDir(dir))
    writeKeyMarker(spark, dir, keyCol)
  }

  // `_stats/_key` names the indexed column — the manifest is otherwise
  // anonymous, and a planning-time consumer ([[SkipScan]]) needs to know
  // WHICH column the ranges describe without being told
  private def writeKeyMarker(spark: SparkSession, dir: String,
                             keyCol: String): Unit = {
    require(!keyCol.contains("\n"), s"unsafe column name $keyCol")
    val out = fs(spark, dir).create(
      new Path(statsDir(dir), "_key"), true)
    try out.write(keyCol.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The column the `_stats` manifest describes; None when `dir` has no
    * manifest or it predates the key marker. */
  def keyOf(spark: SparkSession, dir: String): Option[String] =
    Versioned.readSmallFile(fs(spark, dir),
      new Path(statsDir(dir), "_key"))

  /** Manifest rows keyed by file name; None when `dir` has no manifest.
    * Read DRIVER-SIDE with parquet-mr — the manifest is files × ~40 bytes,
    * and launching a Spark job to collect it would cost more scheduling
    * overhead than the whole footer-fallback path it exists to replace
    * (measured: a Spark-collect load made the stats arm SLOWER than 512
    * local footer opens; the direct read makes it a few milliseconds). */
  def load(spark: SparkSession, dir: String)
      : Option[Map[String, FileKeyStats]] = {
    if (!exists(spark, dir)) return None
    import org.apache.parquet.example.data.Group
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    val conf = spark.sparkContext.hadoopConfiguration
    val f = fs(spark, dir)
    val parts = f.listStatus(new Path(statsDir(dir))).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath)
    val out = Map.newBuilder[String, FileKeyStats]
    parts.foreach { p =>
      val r = ParquetReader
        .builder(new GroupReadSupport(), p).withConf(conf).build()
      try {
        var g: Group = r.read()
        while (g != null) {
          def opt(c: String): Option[Long] =
            if (g.getFieldRepetitionCount(c) == 0) None
            else Some(g.getLong(c, 0))
          out += g.getString("file", 0) -> FileKeyStats(
            opt("kmin"), opt("kmax"),
            g.getLong("non_null", 0), g.getLong("rows", 0))
          g = r.read()
        }
      } finally r.close()
    }
    Some(out.result())
  }

  // data files currently in `dir` — the coverage reference a stale
  // manifest is checked against
  private def partFiles(spark: SparkSession, dir: String): Seq[String] =
    fs(spark, dir).listStatus(new Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath.getName)

  /** Range scan reading ONLY manifest-admitted files — the SELECT-side
    * twin of [[BloomIndex.lookup]]: Bloom carries point probes on hash
    * layouts, the manifest carries range predicates on clustered layouts
    * WITHOUT opening any data file's footer to plan the scan. Result is
    * exactly the full scan's (the residual filter trims edge rows of
    * admitted files); requires a manifest ([[build]] first).
    *
    * Staleness guard: a manifest that no longer COVERS the dir (files
    * appended or rewritten in place since [[build]] — the Versioned DML
    * paths can't cause this, but a raw `mode("append")` can) degrades to
    * the plain full scan + filter, never to silently missing rows. */
  def readRange(spark: SparkSession, dir: String, keyCol: String,
                lo: Long, hi: Long): org.apache.spark.sql.DataFrame = {
    val stats = load(spark, dir).getOrElse(throw new IllegalStateException(
      s"no stats manifest at $dir — StatsIndex.build it first"))
    val onDisk = partFiles(spark, dir)
    if (onDisk.toSet != stats.keySet)
      return spark.read.parquet(dir)
        .filter(col(keyCol) >= lo && col(keyCol) <= hi)
    val admitted = stats.collect {
      case (name, st)
          if st.nonNull > 0 && st.kmin.get <= hi && st.kmax.get >= lo =>
        s"$dir/$name"
    }.toSeq
    if (admitted.isEmpty)
      spark.read.parquet(dir).filter(lit(false)) // schema-stable empty
    else
      spark.read.parquet(admitted: _*)
        .filter(col(keyCol) >= lo && col(keyCol) <= hi)
  }

  /** How many files [[readRange]] would open for [lo, hi] (planning /
    * spec observability) — INCLUDING its staleness fallback: a manifest
    * not covering the dir means readRange full-scans, so the answer is
    * the on-disk file count, keeping both APIs consistent. -1 = no
    * manifest at all. */
  def admittedCount(spark: SparkSession, dir: String,
                    lo: Long, hi: Long): Int =
    load(spark, dir).fold(-1) { stats =>
      val onDisk = partFiles(spark, dir)
      if (onDisk.toSet != stats.keySet) onDisk.size
      else stats.values.count(st =>
        st.nonNull > 0 && st.kmin.get <= hi && st.kmax.get >= lo)
    }

  // per-file stats straight from the file's own parquet footer (the
  // rewrite just wrote it, so the footer already holds exact min/max/null
  // counts) — driver-side, no Spark job
  private def footerStats(conf: org.apache.hadoop.conf.Configuration,
                          file: Path, keyCol: String): FileKeyStats = {
    import scala.jdk.CollectionConverters._
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      var kmin: Option[Long] = None; var kmax: Option[Long] = None
      var nonNull = 0L; var rows = 0L
      var unknown = false // some block's key stats absent/truncated
      r.getFooter.getBlocks.asScala.foreach { b =>
        rows += b.getRowCount
        b.getColumns.asScala.find(_.getPath.toDotString == keyCol) match {
          case None => unknown = true
          case Some(cc) =>
            val st = cc.getStatistics
            if (st == null || !st.isNumNullsSet) unknown = true
            else {
              nonNull += b.getRowCount - st.getNumNulls
              if (st.hasNonNullValue)
                (st.genericGetMin, st.genericGetMax) match {
                  case (a: java.lang.Long, b0: java.lang.Long) =>
                    kmin = Some(kmin.fold(a.longValue)(math.min(_, a.longValue)))
                    kmax = Some(kmax.fold(b0.longValue)(math.max(_, b0.longValue)))
                  case (a: java.lang.Integer, b0: java.lang.Integer) =>
                    kmin = Some(kmin.fold(a.longValue.toLong)(math.min(_, a.longValue)))
                    kmax = Some(kmax.fold(b0.longValue.toLong)(math.max(_, b0.longValue)))
                  case _ => unknown = true
                }
              else if (b.getRowCount - st.getNumNulls > 0)
                unknown = true // non-null rows but no min/max recorded
            }
        }
      }
      // a footer that doesn't fully describe the key column must yield a
      // MAXIMALLY-ADMISSIVE row (every probe admits, like a missing Bloom
      // sidecar), never a precise-looking one that skips a purge target
      if (unknown)
        FileKeyStats(Some(Long.MinValue), Some(Long.MaxValue), rows, rows)
      else FileKeyStats(kmin, kmax, nonNull, rows)
    } finally r.close()
  }

  private def writeManifest(conf: org.apache.hadoop.conf.Configuration,
                            dir: String,
                            rows: Seq[(String, FileKeyStats)]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.MessageTypeParser
    val schema = MessageTypeParser.parseMessageType(
      """message stats {
        |  required binary file (UTF8);
        |  optional int64 kmin;
        |  optional int64 kmax;
        |  required int64 non_null;
        |  required int64 rows;
        |}""".stripMargin)
    val sd = new Path(statsDir(dir))
    val f = sd.getFileSystem(conf)
    f.delete(sd, true)
    val w = ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new Path(sd, "part-00000-manifest.parquet"), conf))
      .withType(schema).build()
    try rows.foreach { case (name, st) =>
      val g = new SimpleGroup(schema)
      g.add("file", name)
      st.kmin.foreach(g.add("kmin", _))
      st.kmax.foreach(g.add("kmax", _))
      g.add("non_null", st.nonNull)
      g.add("rows", st.rows)
      w.write(g)
    } finally w.close()
  }

  /** Mint a manifest covering exactly the `part-` files currently in
    * `dir`, from their own just-written parquet footers — driver-side,
    * no Spark job, touched-fraction cost. The LANDING-TIME hook
    * ([[Dv]]'s zero-copy merge/purge version dirs, and through them
    * [[CopyInto]]): without it a zero-copy landing leaves the new
    * version's own appended files uncovered by any manifest and
    * plan-time skipping ([[SkipScan]]) silently degrades those files to
    * always-admitted until a manual rebuild. No-op on a dir with no
    * `part-` files (a pure DV purge version appends nothing). */
  private[lake] def buildFromFooters(spark: SparkSession, dir: String,
                                     keyCol: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rows = fs(spark, dir).listStatus(new Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath)
      .map(p => p.getName -> footerStats(conf, p, keyCol))
    if (rows.nonEmpty) {
      writeManifest(conf, dir, rows)
      writeKeyMarker(spark, dir, keyCol)
    }
  }

  /** Manifest for `newDir` after a file-targeted rewrite: carried files
    * keep their OLD rows (byte-identical data ⇒ identical stats), fresh
    * files read their OWN just-written footers — the whole rebuild is
    * driver-side metadata work, NO Spark job (measured: the previous
    * Spark-scan rebuild cost more than the footer fallback it replaced
    * at local-FS latencies). No-op when `oldDir` had no manifest (the
    * index stays opt-in). */
  def rebuildAfterRewrite(spark: SparkSession, oldDir: String,
                          newDir: String, keyCol: String,
                          preloaded: Option[Map[String, FileKeyStats]] = None)
      : Unit =
    preloaded.orElse(load(spark, oldDir)).foreach { old =>
      val conf = spark.sparkContext.hadoopConfiguration
      val rows = fs(spark, newDir).listStatus(new Path(newDir)).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .map(_.getPath)
        .map(p => p.getName ->
          old.getOrElse(p.getName, footerStats(conf, p, keyCol)))
      writeManifest(conf, newDir, rows)
      writeKeyMarker(spark, newDir, keyCol)
    }
}
