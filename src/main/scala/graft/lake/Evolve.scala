package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/**
 * METADATA-ONLY schema evolution — Delta's `ALTER TABLE t ADD COLUMNS
 * (...)` re-expressed on this layout: adding nullable columns to a
 * 100 TB table must cost metadata writes, not a table rewrite (the
 * reference's pipeline grows its event schema release-over-release —
 * `extract_events.sql` selects an ever-wider GA4 surface — and a
 * re-extract per schema bump is exactly what a lakehouse avoids).
 *
 * Mechanics: [[addColumns]] publishes a SCHEMA-OVERLAY version — a
 * shallow ref (`_ref` to the live version's untouched data dir, pinned
 * against vacuum by the same `_clones/` back-pointer [[Clone]], [[Dv]]
 * and [[Restore]] use) whose OWN `_table_schema` marker carries the
 * EXTENDED schema. Version-aware readers ([[Versioned.readVersion]],
 * and every marker consumer routed through
 * [[Versioned.schemaMarkerAt]]) resolve the overlay's own marker FIRST,
 * so the new columns appear — null-filled by parquet schema-on-read —
 * in the live snapshot, SQL views, clones, restores and the streaming
 * snapshot leg, while TIME TRAVEL to pre-evolution versions still shows
 * the old schema (their dirs carry no overlay marker). The live
 * version's zero-copy state travels whole: changeset-sized appends are
 * byte-copied forward (file NAMES preserved — deletion-vector row
 * addressing is (file_name, row_index)), the cumulative `_dv` vector
 * and the CDC replay watermark are carried, and the change feed records
 * `_changes_none` (no row changed — feed consumers bridge it, exactly
 * like compaction).
 *
 * After the overlay: the ZERO-COPY DML family ([[Dv.merge]],
 * [[Dv.applyCdc]], [[Dv.purge]]) reads the overlay schema and keeps
 * working (changesets must carry the new columns — whole-row
 * replacement, the documented merge contract); the REWRITING family
 * keeps its existing shallow-ref contract (materialize first — which
 * reads through the overlay and so bakes the evolved schema into real
 * files). Contrast [[Upsert]]'s `evolveSchema = true`, which evolves
 * DURING a rewriting merge: that path byte-copies every untouched file
 * (write-amplification proportional to the table); this one touches
 * nothing.
 */
object Evolve {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Add nullable columns to `table`'s live schema — metadata-only (see
    * object doc). `cols` is the new tail of the schema, e.g.
    * `StructType.fromDDL("score DOUBLE, tags ARRAY<STRING>")`; every
    * field is forced nullable (existing rows read NULL — there is no
    * backfill to default values, by design: a DEFAULT is a rewrite).
    * Collisions with existing columns (case-insensitive, matching
    * Spark's resolution) and duplicate new names reject before any
    * claim. Returns the overlay's version. */
  def addColumns(spark: SparkSession, table: String,
                 cols: StructType): Long = {
    require(cols.nonEmpty, "ADD COLUMNS needs at least one column")
    val dupNew = cols.fieldNames.groupBy(_.toLowerCase)
      .collect { case (_, vs) if vs.length > 1 => vs.head }
    require(dupNew.isEmpty,
      s"duplicate new column name(s) ${dupNew.toSeq.sorted}")
    Versioned.withWriteRetry() {
      val live = Versioned.currentVersion(spark, table).getOrElse(
        throw new IllegalStateException(s"no published version at $table"))
      val liveVDir = s"$table/v=$live"
      val dataDir = Versioned.dataDir(spark, table, live)
      val f = fs(spark, table)
      val conf = spark.sparkContext.hadoopConfiguration
      val liveSchema = Versioned.schemaAt(spark, table, live)
      val lower = liveSchema.fieldNames.map(_.toLowerCase).toSet
      val clash = cols.fieldNames.filter(c => lower(c.toLowerCase))
      require(clash.isEmpty,
        s"column(s) ${clash.toSeq} already exist on $table")
      val outSchema = StructType(
        liveSchema.fields ++ cols.fields.map(_.copy(nullable = true)))
      // pin the shared data dir BEFORE publishing the ref (Clone.shallow's
      // ordering argument; an OCC-abandoned pin is GC'd by vacuum)
      Clone.pin(spark, dataDir, table)
      Versioned.publishFrom(spark, table, live) { dir =>
        val fd = fs(spark, dir)
        fd.mkdirs(new Path(dir))
        // carry a zero-copy MERGE's changeset-sized appends forward —
        // their rows are part of the snapshot and _ref names only the
        // base dir; file names preserved (DV addressing is by name)
        if (dataDir != liveVDir)
          Versioned.dataFilePaths(spark, liveVDir).map(new Path(_))
            .foreach { p =>
              require(FileUtil.copy(f, p, fd, new Path(dir, p.getName),
                false, conf), s"append carry failed: $p")
              val bs = BloomIndex.sidecar(liveVDir, p.getName)
              if (f.exists(bs))
                FileUtil.copy(f, bs, fd,
                  BloomIndex.sidecar(dir, p.getName), false, conf)
            }
        val out = fd.create(new Path(s"$dir/_ref"), true)
        try out.write(dataDir.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        // the live version's deletion vector is part of its content
        val dv = new Path(Dv.dvDir(liveVDir))
        if (f.exists(dv))
          require(FileUtil.copy(f, dv, fd, new Path(Dv.dvDir(dir)),
            false, conf), s"deletion-vector carry failed: $dv")
        // replay-dedup watermark: unchanged by a schema change
        val tag = new Path(s"$liveVDir/_cdc_batch")
        if (f.exists(tag))
          FileUtil.copy(f, tag, fd, new Path(s"$dir/_cdc_batch"),
            false, true, conf)
        // THE point: the extended schema as this version's OWN marker —
        // version-aware readers resolve it ahead of the base dir's
        Versioned.writeSchemaMarker(fd, dir, outSchema)
        // no row changed: feed consumers bridge, never a break
        Cdf.recordNone(fd, dir)
      }
    }
  }
}
