package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * TABLE-level statistics for the SQL surface's join planning — the CBO
 * feed `ANALYZE TABLE ... COMPUTE STATISTICS` persists (one small
 * `_table_stats` file at the table root: analyzed version, LOGICAL row
 * count, estimated LOGICAL bytes). The point at 100 TB: a zero-copy
 * table's parquet footprint wildly overstates what a reader sees — a
 * DV-heavy version's files may hold 100× the live rows, and the DV
 * anti-join in its read plan hides the small size from Spark's
 * file-size estimation entirely, so a dimension that SHOULD broadcast
 * sort-merges instead. [[Sql.registerTable]] consults these stats at
 * registration: a table analyzed at its live version whose logical
 * bytes fit under `spark.sql.autoBroadcastJoinThreshold` registers with
 * a broadcast hint — the join side flips on a COLD plan, before AQE
 * ever sees runtime sizes.
 *
 * Staleness contract: stats are version-stamped and consulted only when
 * they match the LIVE version at registration — a stale file is ignored
 * (never wrong, merely un-hinted); DML re-binds drop the hint until the
 * next ANALYZE. Cost: one logical count (DV-aware) + one
 * footer-metadata count + one listing — no data scan beyond the count's
 * column-pruned pass.
 */
object TableStats {

  final case class Stats(version: Long, rows: Long, bytes: Long)

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def file(table: String) = new Path(s"$table/_table_stats")

  /** Compute the LIVE version's logical stats: rows through the full
    * read path (DV anti-join, overlay, appends), bytes as the physical
    * footprint scaled by the logical/physical row ratio. */
  def compute(spark: SparkSession, table: String): Stats = {
    val live = Versioned.currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no published version at $table"))
    val dataDir = Versioned.dataDir(spark, table, live)
    val ownDir = s"$table/v=$live"
    val paths = (Versioned.dataFilePaths(spark, dataDir) ++
      (if (dataDir == ownDir) Seq.empty
       else Versioned.dataFilePaths(spark, ownDir))).distinct
    val f = fs(spark, table)
    val physBytes = paths.map(p => f.getFileStatus(new Path(p)).getLen).sum
    // footer-metadata count (parquet count pushdown — no data pages read)
    val physRows =
      if (paths.isEmpty) 0L else spark.read.parquet(paths: _*).count()
    val rows = Versioned.readVersion(spark, table, live).count()
    val bytes =
      if (physRows <= 0L) physBytes
      else math.max(1L, (physBytes.toDouble * rows / physRows).toLong)
    Stats(live, rows, bytes)
  }

  def write(spark: SparkSession, table: String, s: Stats): Unit = {
    val out = fs(spark, table).create(file(table), true)
    try out.write(s"${s.version} ${s.rows} ${s.bytes}"
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def read(spark: SparkSession, table: String): Option[Stats] =
    Versioned.readSmallFile(fs(spark, table), file(table)).flatMap { s =>
      s.trim.split("\\s+") match {
        case Array(v, r, b) =>
          for (vv <- v.toLongOption; rr <- r.toLongOption;
               bb <- b.toLongOption) yield Stats(vv, rr, bb)
        case _ => None
      }
    }
}
