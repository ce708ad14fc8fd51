package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._

/**
 * Per-file STRING min/max manifest (`_strstats/`) — the string-column
 * leg of the skipping manifests ([[StatsIndex]] covers one long key,
 * [[ZOrder]]'s `_boxstats` covers multi-column long boxes). Delta and
 * Iceberg collect string min/max per file for exactly this: on a
 * name/title/url-clustered layout, an equality or `LIKE 'prefix%'`
 * predicate prunes to the files whose [min,max] interval can hold the
 * probe — at a 100 TB catalog the difference between a point lookup by
 * product name reading two files and reading the corpus.
 *
 * Ordering contract: admission compares in UTF8-BINARY order (Spark's
 * own string comparison semantics, and what Spark's min/max aggregate
 * over strings produces), via `UTF8String.compareTo` — NOT Java
 * `String.compareTo`, whose UTF-16 code-unit order diverges above the
 * BMP. One tiny parquet, column-pruned single scan to build; same
 * advisory posture as the other manifests: [[SkipScan]]'s coverage
 * guard degrades a stale manifest to the full scan, and layout
 * maintenance ([[Compact.compactVersion]], [[ZOrder.cluster]]) rebuilds
 * it for the rewritten files like the other sidecars.
 */
object StrStats {

  private def dirOf(dir: String) = s"$dir/_strstats"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Build/refresh the manifest for every data file in `dir`: one
    * column-pruned scan emitting per-file (min, max, non-null) for each
    * `cols` entry (string columns). */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "StrStats.build needs at least one column")
    val aggs = count(lit(1)).as("rows") +:
      cols.flatMap(c => Seq(
        min(col(c).cast("string")).as(s"min_$c"),
        max(col(c).cast("string")).as(s"max_$c"),
        count(col(c)).as(s"nn_$c")))
    Versioned.readDataDir(spark, dir)
      .select(element_at(split(input_file_name(), "/"), -1).as("file") +:
        cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(dirOf(dir))
  }

  /** Does `dir` carry a string-stats manifest? */
  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(dirOf(dir)))

  /** The manifest's column list and per-file (min, max, nonNull, rows)
    * — min/max None when the column has no non-null values in the file.
    * None when `dir` has no `_strstats`. */
  def load(spark: SparkSession, dir: String)
      : Option[(Seq[String],
        Map[String, (Map[String, (Option[String], Option[String], Long)],
          Long)])] = {
    if (!exists(spark, dir)) return None
    val m = spark.read.parquet(dirOf(dir))
    val cols = m.columns.toSeq.collect {
      case n if n.startsWith("min_") => n.stripPrefix("min_")
    }
    val rows = m.collect().map { r =>
      val file = r.getAs[String]("file")
      val by = cols.map { c =>
        val i = r.fieldIndex(s"min_$c")
        val j = r.fieldIndex(s"max_$c")
        val mn = if (r.isNullAt(i)) None else Some(r.getString(i))
        val mx = if (r.isNullAt(j)) None else Some(r.getString(j))
        c -> ((mn, mx, r.getAs[Long](s"nn_$c")))
      }.toMap
      file -> ((by, r.getAs[Long]("rows")))
    }.toMap
    Some((cols, rows))
  }

  /** Rebuild `newDir`'s manifest when `oldDir` carried one — the layout
    * maintenance hook ([[Compact.compactVersion]], [[ZOrder.cluster]]),
    * mirroring [[TokenBloom.rebuildIfIndexed]]: the column list comes
    * from the old manifest itself (self-describing). */
  private[lake] def rebuildIfPresent(spark: SparkSession, oldDir: String,
                                     newDir: String): Unit =
    load(spark, oldDir).foreach { case (cols, _) =>
      build(spark, newDir, cols)
    }
}
