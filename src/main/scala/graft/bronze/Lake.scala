package graft.bronze

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bronze-layer lake I/O: the reference's S3 loader surface (SURVEY.md §2.1
 * S5-S8) as Spark-native partitioned-Parquet operations.
 *
 * Layout mirrors /root/reference/src/pipeline/loaders/s3_loader.py:85-86 —
 * one calendar day of one data type lives under
 * `{root}/{dataType}/year=YYYY/month=MM/day=DD/`, with a JSON metadata
 * sidecar (s3_loader.py:111-145) next to the data files and Spark's own
 * `_SUCCESS` marker as the idempotence/commit signal (s3_loader.py:147-169's
 * HEAD-the-object check).
 *
 * Scale posture: writes go through the distributed Parquet committer (no
 * driver materialization — the reference buffered the whole day in driver
 * RAM, s3_loader.py:90); listings touch only directory metadata, never data;
 * the day-partition layout is exactly what Catalyst partition-prunes on
 * read, so a 100 TB lake reads one day by listing one directory.
 */
object Lake {

  /** `year=YYYY/month=MM/day=DD` relative partition path for an ISO date
    * (zero-padded like s3_loader.py:85-86). */
  def partitionPath(date: String): String = {
    val d = java.time.LocalDate.parse(date)
    f"year=${d.getYear}%04d/month=${d.getMonthValue}%02d/day=${d.getDayOfMonth}%02d"
  }

  def dayDir(root: String, dataType: String, date: String): String =
    s"$root/$dataType/${partitionPath(date)}"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** S5: write one day-slice as Parquet under the day's partition dir,
    * overwriting any prior attempt (idempotent re-run). Returns row count,
    * observed DURING the write (no second scan of the day's data). */
  def writeDay(spark: SparkSession, df: DataFrame, root: String,
               dataType: String, date: String): Long = {
    val dir = dayDir(root, dataType, date)
    val obs = org.apache.spark.sql.Observation(s"writeDay-$dataType-$date")
    df.observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).parquet(dir)
    val n = obs.get("n").asInstanceOf[Long]
    writeMetadata(spark, df, root, dataType, date, n)
    n
  }

  /** S6: JSON metadata sidecar (record_count/columns/schema/bytes/timestamp —
    * s3_loader.py:121-130) written next to the day's data files. */
  def writeMetadata(spark: SparkSession, df: DataFrame, root: String,
                    dataType: String, date: String, recordCount: Long): Unit = {
    val dir = dayDir(root, dataType, date)
    val f = fs(spark, dir)
    val sizeBytes = f.getContentSummary(new Path(dir)).getLength
    def q(s: String) = graft.Jsons.quote(s)
    val json =
      s"""{
         |  "date": ${q(date)},
         |  "data_type": ${q(dataType)},
         |  "record_count": $recordCount,
         |  "columns": [${df.columns.map(q).mkString(", ")}],
         |  "size_mb": ${math.round(sizeBytes / 1048576.0 * 100) / 100.0},
         |  "upload_timestamp": ${q(java.time.Instant.now.toString)},
         |  "path": ${q(dir)},
         |  "schema": ${df.schema.json}
         |}""".stripMargin
    val out = f.create(new Path(dir, "_sidecar.json"), true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Parsed metadata sidecar for a day, if present. */
  def readMetadata(spark: SparkSession, root: String, dataType: String,
                   date: String): Option[String] = {
    val p = new Path(dayDir(root, dataType, date), "_sidecar.json")
    val f = fs(spark, p.toString)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** S7: has this day been committed? (`_SUCCESS` marker — the committer
    * writes it last, so a torn job never reads as present.) */
  def checkExists(spark: SparkSession, root: String, dataType: String,
                  date: String): Boolean = {
    val p = new Path(dayDir(root, dataType, date), "_SUCCESS")
    fs(spark, p.toString).exists(p)
  }

  /** S8: committed dates for a data type, newest first, capped at `limit`
    * (s3_loader.py:171-216). Pure directory listing — no data reads. */
  def listAvailableDates(spark: SparkSession, root: String, dataType: String,
                         limit: Int = 100): Seq[String] = {
    val base = new Path(s"$root/$dataType")
    val f = fs(spark, base.toString)
    if (!f.exists(base)) return Seq.empty
    val glob = new Path(base, "year=*/month=*/day=*/_SUCCESS")
    f.globStatus(glob).toSeq
      .map(_.getPath.getParent)
      .flatMap { dir =>
        val (dStr, mDir) = (dir.getName, dir.getParent)
        val (mStr, yDir) = (mDir.getName, mDir.getParent)
        for {
          y <- yDir.getName.stripPrefix("year=").toIntOption
          m <- mStr.stripPrefix("month=").toIntOption
          d <- dStr.stripPrefix("day=").toIntOption
        } yield f"$y%04d-$m%02d-$d%02d"
      }
      .sorted(Ordering[String].reverse)
      .take(limit)
  }

  /** Retention policy: drop every day partition strictly OLDER than
    * `keepFrom` (ISO date, inclusive cutoff — partitions on or after it
    * survive). A day-partitioned bronze layer makes retention a
    * METADATA-ONLY delete: whole partition dirs (data + sidecar) go at
    * listing cost, no file is read or rewritten — the shape that reclaims
    * a 100 TB tree in seconds where a row-level `DELETE WHERE ts < cutoff`
    * would rewrite it. Lists WITHOUT [[listAvailableDates]]'s default cap
    * (an expiry that silently stopped at 100 partitions would leak the
    * tail forever). Returns the dropped dates, ascending. */
  def expireDays(spark: SparkSession, root: String, dataType: String,
                 keepFrom: String): Seq[String] = {
    java.time.LocalDate.parse(keepFrom) // fail fast on a malformed cutoff
    val base = new Path(s"$root/$dataType")
    val f = fs(spark, root)
    if (!f.exists(base)) return Seq.empty
    // enumerate day DIRS, not _SUCCESS markers ([[listAvailableDates]]'s
    // glob): a partition a crashed writeDay left without its marker is
    // invisible to readers but still holds bytes — retention must reclaim
    // it too, or it leaks forever
    val expired = f.globStatus(new Path(base, "year=*/month=*/day=*")).toSeq
      .filter(_.isDirectory)
      .flatMap { s =>
        val (dDir, mDir) = (s.getPath, s.getPath.getParent)
        for {
          y <- mDir.getParent.getName.stripPrefix("year=").toIntOption
          m <- mDir.getName.stripPrefix("month=").toIntOption
          d <- dDir.getName.stripPrefix("day=").toIntOption
        } yield (f"$y%04d-$m%02d-$d%02d", dDir)
      }
      .filter(_._1 < keepFrom) // ISO strings order like dates
      .sortBy(_._1)
    // delete the GLOBBED path, never a reconstructed spelling: a partition
    // another tool wrote un-zero-padded (month=1/day=2) parses to the same
    // date but lives at a different path — rebuilding it would miss-delete
    // and silently leak the bytes. And report only what actually went: a
    // failed delete (permissions, transient FS error) recorded as
    // "dropped" would hide a partition that is still on disk.
    expired.filter { case (_, p) => f.delete(p, true) }.map(_._1)
  }

  /** J1: reconciliation anti-difference — dates available at the source but
    * missing from the sink (pipeline.py:252's list comprehension). */
  def missingDates(sourceDates: Seq[String], sinkDates: Seq[String]): Seq[String] = {
    val sink = sinkDates.toSet
    sourceDates.distinct.filterNot(sink).sorted
  }
}
