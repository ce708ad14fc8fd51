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
  def build(spark: SparkSession, dir: String, keyCol: String): Unit =
    scanStats(spark, Seq(dir), keyCol)
      .coalesce(1)
      .write.mode("overwrite").parquet(statsDir(dir))

  /** Manifest rows keyed by file name; None when `dir` has no manifest.
    * One metadata-sized read — files × ~40 bytes. */
  def load(spark: SparkSession, dir: String)
      : Option[Map[String, FileKeyStats]] =
    if (!exists(spark, dir)) None
    else Some(spark.read.parquet(statsDir(dir))
      .collect()
      .map { r =>
        val get = (c: String) =>
          if (r.isNullAt(r.fieldIndex(c))) None
          else Some(r.getLong(r.fieldIndex(c)))
        r.getString(r.fieldIndex("file")) -> FileKeyStats(
          get("kmin"), get("kmax"),
          r.getLong(r.fieldIndex("non_null")), r.getLong(r.fieldIndex("rows")))
      }.toMap)

  /** Manifest for `newDir` after a file-targeted rewrite: carried files
    * keep their OLD rows (byte-identical data ⇒ identical stats), only
    * files new in `newDir` are scanned. No-op when `oldDir` had no
    * manifest (the index stays opt-in). */
  def rebuildAfterRewrite(spark: SparkSession, oldDir: String,
                          newDir: String, keyCol: String): Unit =
    load(spark, oldDir).foreach { old =>
      val newFiles = fs(spark, newDir).listStatus(new Path(newDir)).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .map(_.getPath)
      val (carried, fresh) = newFiles.partition(p => old.contains(p.getName))
      import spark.implicits._
      val carriedRows = carried.map { p =>
        val st = old(p.getName)
        (p.getName, st.kmin, st.kmax, st.nonNull, st.rows)
      }.toDF("file", "kmin", "kmax", "non_null", "rows")
      val freshRows =
        if (fresh.isEmpty) carriedRows.limit(0)
        else scanStats(spark, fresh.map(_.toString), keyCol)
      carriedRows.unionByName(freshRows)
        .coalesce(1)
        .write.mode("overwrite").parquet(statsDir(newDir))
    }
}
