package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Versioned table publishes — the "poor-man's table format": every publish
 * writes a COMPLETE new version directory (`v=N/`), then atomically swaps a
 * one-line manifest pointing at it. Readers resolve the manifest first, so
 * they only ever see fully-written snapshots — no partial reads during a
 * republish (the failure mode of in-place `mode("overwrite")` on a live
 * table) — and any historical version stays readable until vacuumed
 * (time travel).
 *
 * Swap protocol (same tmp/bak discipline as [[Compact]], where Hadoop's
 * no-clobber `rename` forces a two-step): write `_manifest.tmp`, demote the
 * live manifest to `_manifest.bak`, promote tmp, drop bak. A crash between
 * steps leaves either the old manifest or the bak — [[currentVersion]]
 * resolves by falling back to the bak READ-ONLY, never to a half-published
 * version (the new `v=N/` dir without a manifest pointing at it is
 * invisible and simply overwritten by the next publish). Restoring the
 * manifest file itself is [[recover]], invoked only from the write path:
 * a reader that renamed bak back to live would race a concurrent publish's
 * demote→promote window and make its no-clobber promote fail. On HDFS the
 * promote step is atomic; on S3 a production deployment swaps via
 * conditional PUT (If-None-Match) — the layout and reader contract stay
 * identical.
 *
 * Concurrency contract: ONE writer at a time (publish/recover/vacuum are
 * single-process operations — serialize them externally); any number of
 * concurrent readers.
 *
 * Scale posture: the manifest is one small file read once per query plan;
 * data paths are immutable-once-published, so caches and speculative
 * re-reads stay consistent by construction.
 */
object Versioned {

  private def fs(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifest(table: String) = new Path(s"$table/_manifest")
  private def tmp(table: String) = new Path(s"$table/_manifest.tmp")
  private def bak(table: String) = new Path(s"$table/_manifest.bak")

  /** Read a small metadata file to EOF as a trimmed UTF-8 string; None when
    * absent or empty. The ONE reader every pointer file goes through
    * (manifest, `_ref`, `_commit_ts`, clone pins, `_cdc_batch` via
    * [[Upsert]]): a fixed-size buffer would silently truncate a long value
    * and a single `in.read()` is a short-read hazard on FSDataInputStream. */
  private[lake] def readSmallFile(f: FileSystem, p: Path): Option[String] =
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream(256)
        val chunk = new Array[Byte](4096)
        var r = in.read(chunk)
        while (r > 0) { buf.write(chunk, 0, r); r = in.read(chunk) }
        val s = new String(buf.toByteArray, StandardCharsets.UTF_8).trim
        if (s.isEmpty) None else Some(s)
      } finally in.close()
    }

  private def readVersionFile(f: FileSystem, p: Path): Option[Long] =
    readSmallFile(f, p).map(_.toLong)

  /** The live version — manifest, falling back (read-only) to the bak a
    * crashed swap may have left. None when never published. */
  def currentVersion(spark: SparkSession, table: String): Option[Long] = {
    val f = fs(spark, table)
    readVersionFile(f, manifest(table)).orElse(readVersionFile(f, bak(table)))
  }

  /** Finish an interrupted swap: promote the bak back to live. Write-path
    * only (publish calls it first); see the concurrency contract above.
    * The trigger is an UNREADABLE manifest (absent, empty, or truncated —
    * the rename-without-fsync crash can leave a zero-byte husk), not mere
    * absence: a husk that shadowed a live bak would otherwise restart
    * versioning at 1 and destroy the only good pointer. */
  def recover(spark: SparkSession, table: String): Option[Long] = {
    val f = fs(spark, table)
    if (readVersionFile(f, manifest(table)).isEmpty && f.exists(bak(table))) {
      f.delete(manifest(table), false) // drop the unreadable husk, if any
      f.rename(bak(table), manifest(table))
    }
    readVersionFile(f, manifest(table))
  }

  /** All published version dirs, ascending (includes pre-vacuum history). */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val f = fs(spark, table)
    val root = new Path(table)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }

  /** Publish `df` as the next version; returns the new version number.
    * The data dir is complete before the manifest swap exposes it. */
  def publish(df: DataFrame, table: String): Long =
    publishWith(df.sparkSession, table) { dir =>
      df.write.mode("overwrite").parquet(dir)
    }

  /** Publish a version whose data dir is COMPOSED by `build` (e.g.
    * [[Forget]]'s mix of byte-copied untouched files and rewritten
    * affected files) rather than written from one DataFrame. `build`
    * receives the new version dir path and must leave it complete; only
    * then does the manifest swap expose it. Same single-writer contract
    * as [[publish]]. */
  def publishWith(spark: SparkSession, table: String)
                 (build: String => Unit): Long = {
    val f = fs(spark, table)
    // single-writer path: safe to heal a predecessor's interrupted swap here
    // Double pointer loss (manifest AND bak unreadable) with version dirs
    // still on disk must not rewind the counter to 1 — that would overwrite
    // v=1, which versions()/time travel still expose. Seed past the highest
    // dir instead; if that dir was a half-written crash leftover this skips
    // one version number, which is harmless.
    val next = recover(spark, table)
      .orElse(versions(spark, table).lastOption).getOrElse(0L) + 1
    // clear a half-written dir from a publish that crashed before its swap
    // (that version number was never exposed, so deleting it is safe)
    f.delete(new Path(s"$table/v=$next"), true)
    build(s"$table/v=$next")
    // commit timestamp INSIDE the version dir (appears atomically with the
    // data at the manifest swap — an object-store-honest commit log with no
    // append dependency): the [[readAsOf]] timestamp-travel handle
    val ts = f.create(new Path(s"$table/v=$next/_commit_ts"), true)
    try ts.write(System.currentTimeMillis().toString
      .getBytes(StandardCharsets.UTF_8))
    finally ts.close()
    val out = f.create(tmp(table), true)
    try out.write(next.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (f.exists(manifest(table))) {
      f.delete(bak(table), false)
      f.rename(manifest(table), bak(table))
    }
    require(f.rename(tmp(table), manifest(table)),
      s"manifest promote failed for $table v$next")
    f.delete(bak(table), false)
    next
  }

  /** Read the live snapshot. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val v = currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no published version at $table"))
    readVersion(spark, table, v)
  }

  /** Time travel: read a specific published version — under the version's
    * schema marker when it carries one (see [[readSchemaMarker]]). */
  def readVersion(spark: SparkSession, table: String, v: Long): DataFrame =
    readDataDir(spark, dataDir(spark, table, v))

  /** Read a version DATA dir, honoring its `_table_schema` marker. Once a
    * table has schema-evolved ([[Upsert]] `evolveSchema=true`), its version
    * dirs hold MIXED parquet schemas — byte-copied pre-evolution files lack
    * the new columns — and a plain `spark.read.parquet` would take ONE
    * file's footer as the dir schema (which file is timing-dependent, so
    * the new columns would appear or vanish at random). The marker pins the
    * authoritative schema; parquet schema-on-read null-fills columns a file
    * lacks, deterministically. */
  private[lake] def readDataDir(spark: SparkSession, dir: String): DataFrame =
    readSchemaMarker(fs(spark, dir), dir) match {
      case Some(s) => spark.read.schema(s).parquet(dir)
      case None => spark.read.parquet(dir)
    }

  /** Read an EXPLICIT file list under `dir`'s `_table_schema` marker when
    * one exists (footer inference otherwise) — the one definition of
    * "marker-aware pruned read" every skipping index (ZOrder boxes, token
    * Blooms, MatView's old-row lookups) shares, so the marker contract
    * evolves in one place. NOTE: [[Upsert]]'s rewrite path deliberately
    * does NOT use this — it reads under the batch's EVOLVED output schema,
    * which may extend the marker. */
  private[lake] def readFiles(spark: SparkSession, dir: String,
                              paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "readFiles needs at least one path")
    readSchemaMarker(fs(spark, dir), dir) match {
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
  }

  /** The `_table_schema` marker of a version DATA dir: the table's
    * authoritative [[org.apache.spark.sql.types.StructType]] (as Spark
    * schema JSON), written by the first schema-EVOLVING merge and carried
    * forward by every later file-targeted rewrite
    * ([[Upsert]]/[[Forget.purge]]/[[Compact.compactVersion]]). Absent on
    * tables that never evolved — their files all agree, inference is
    * safe. */
  private[lake] def readSchemaMarker(
      f: FileSystem, dir: String): Option[org.apache.spark.sql.types.StructType] =
    readSmallFile(f, new Path(s"$dir/_table_schema")).map(
      org.apache.spark.sql.types.DataType.fromJson(_)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  private[lake] def writeSchemaMarker(
      f: FileSystem, dir: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val out = f.create(new Path(s"$dir/_table_schema"), true)
    try out.write(schema.json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The directory a version's DATA actually lives in: the version dir
    * itself, or — for a [[Clone.shallow]] version — the source data dir
    * its `_ref` pointer names. Always one hop: shallow publishes resolve
    * their source through this first, so refs never chain. */
  def dataDir(spark: SparkSession, table: String, v: Long): String = {
    val dir = s"$table/v=$v"
    val f = fs(spark, table)
    readSmallFile(f, new Path(s"$dir/_ref")).getOrElse(dir)
  }

  /** True when version `v` is a shallow-clone REFERENCE (no data of its
    * own) — file-targeted DML must materialize first ([[Clone]]). */
  def isShallowRef(spark: SparkSession, table: String, v: Long): Boolean =
    fs(spark, table).exists(new Path(s"$table/v=$v/_ref"))

  /** Commit timestamps (version → epoch millis) for every EXISTING version
    * that carries a `_commit_ts` marker, ascending by version. Versions
    * published before the marker existed are absent (and so invisible to
    * [[readAsOf]] — documented migration caveat, not a failure). */
  def commitTimes(spark: SparkSession, table: String): Seq[(Long, Long)] = {
    val f = fs(spark, table)
    versions(spark, table).flatMap { v =>
      readSmallFile(f, new Path(s"$table/v=$v/_commit_ts"))
        .map(v -> _.toLong)
    }
  }

  /** Timestamp travel: the newest version committed at or before
    * `tsMillis` — Delta's `timestampAsOf` read on this layout. Throws when
    * nothing was committed by then (reading "before the table existed" is
    * a caller bug, not an empty frame). */
  def readAsOf(spark: SparkSession, table: String, tsMillis: Long): DataFrame = {
    val at = commitTimes(spark, table).filter(_._2 <= tsMillis)
    require(at.nonEmpty,
      s"no version of $table committed at or before $tsMillis")
    readVersion(spark, table, at.map(_._1).max)
  }

  /** Version dirs of THIS table that a registered shallow clone still
    * references (`_clones/` back-pointers, written by [[Clone.shallow]]).
    * Matching is PATH-normalized (`FileSystem.makeQualified` on both the
    * pin target's parent and this table), not raw-string: a trailing
    * slash, `file:` scheme, or relative spelling on either side must not
    * silently unpin a version — that would be exactly the vacuum-breaks-
    * clones hazard the pin exists to close. */
  private[lake] def clonePinnedVersions(spark: SparkSession,
                                        table: String): Set[Long] = {
    val f = fs(spark, table)
    val dir = new Path(s"$table/_clones")
    if (!f.exists(dir)) Set.empty
    else {
      val tableQ = f.makeQualified(new Path(table))
      f.listStatus(dir).toSeq.filter(_.isFile).flatMap { s =>
        readSmallFile(f, s.getPath)
          .map(_.linesIterator.next())
          .flatMap { target =>
            val tp = new Path(target)
            val name = tp.getName
            if (name.startsWith("v=") &&
                f.makeQualified(tp.getParent) == tableQ)
              name.stripPrefix("v=").toLongOption
            else None
          }
      }.toSet
    }
  }

  /** Drop all version dirs older than the live one minus `keep` — EXCEPT
    * versions a registered shallow clone still references
    * ([[Clone.shallow]]'s `_clones/` back-pointers): deleting those would
    * break the clone's reads, the Delta shallow-clone hazard this layout
    * closes. When a DROPPED version of THIS table was itself a shallow
    * ref, its pin at the source releases here — but only once no
    * SURVIVING version still names the same data dir (a materialized-over
    * or re-cloned-over ref keeps older siblings readable until they too
    * vacuum away). Pins therefore live exactly as long as a referencing
    * version exists; [[Clone.detach]] stays the manual cleanup for clones
    * deleted by raw `rm`. */
  def vacuum(spark: SparkSession, table: String, keep: Int = 1): Seq[Long] = {
    val f = fs(spark, table)
    val live = currentVersion(spark, table).getOrElse(return Seq.empty)
    val pinned = clonePinnedVersions(spark, table)
    val dropped = versions(spark, table)
      .filter(v => v < live - keep && !pinned.contains(v))
    // refs the dropped versions hold on OTHER tables' data — resolve
    // BEFORE deleting (the _ref files are about to go). Both sets are
    // compared PATH-QUALIFIED: two refs to the same dir under different
    // spellings (file: scheme vs bare path, from re-clones) must cancel,
    // or the subtraction passes a dir a SURVIVING version still needs to
    // releasePin — whose own qualified content scan would then delete the
    // survivor's pin too, reopening the vacuum-breaks-clones hazard.
    def refOf(v: Long): Option[String] =
      readSmallFile(f, new Path(s"$table/v=$v/_ref"))
    def qual(p: String): String = f.makeQualified(new Path(p)).toString
    val droppedRefs = dropped.flatMap(refOf).map(r => qual(r) -> r).toMap
    dropped.foreach(v => f.delete(new Path(s"$table/v=$v"), true))
    if (droppedRefs.nonEmpty) {
      val survivingRefs =
        versions(spark, table).flatMap(refOf).map(qual).toSet
      (droppedRefs -- survivingRefs).values.foreach(
        Clone.releasePin(spark, _, table))
    }
    dropped
  }
}
