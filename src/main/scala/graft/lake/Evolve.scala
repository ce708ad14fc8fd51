package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/**
 * METADATA-ONLY schema evolution — Delta's `ALTER TABLE t ADD COLUMNS
 * (...)` / `DROP COLUMN` re-expressed on this layout: widening or
 * narrowing a 100 TB table must cost metadata writes, not a table
 * rewrite (the reference's pipeline grows its event schema
 * release-over-release — `extract_events.sql` selects an ever-wider GA4
 * surface — and a re-extract per schema bump is exactly what a
 * lakehouse avoids).
 *
 * Mechanics: both statements publish a SCHEMA-OVERLAY version — a
 * shallow ref (`_ref` to the live version's untouched data dir, pinned
 * against vacuum by the same `_clones/` back-pointer [[Clone]], [[Dv]]
 * and [[Restore]] use) whose OWN `_table_schema` marker carries the NEW
 * schema. Version-aware readers ([[Versioned.readVersion]], and every
 * marker consumer routed through [[Versioned.schemaMarkerAt]]) resolve
 * the overlay's own marker FIRST, so added columns appear (null-filled
 * by parquet schema-on-read) and dropped columns vanish (never read —
 * explicit-schema scans project them out at the footer) in the live
 * snapshot, SQL views, clones, restores and the streaming snapshot leg,
 * while TIME TRAVEL to pre-evolution versions still shows the old
 * schema (their dirs carry no overlay marker). The live version's
 * zero-copy state travels whole: changeset-sized appends are
 * byte-copied forward (file NAMES preserved — deletion-vector row
 * addressing is (file_name, row_index)), the cumulative `_dv` vector
 * and the CDC replay watermark are carried. The change feed gets ONE
 * `_op` = "S" poison row ([[Cdf.recordSchemaChange]]): batch readers
 * bridge the overlay to zero rows (no row changed), while a raw
 * STREAMING tail — which runs with its start-time schema and would
 * otherwise silently drop the new columns from every later change —
 * fails loudly toward a restart, Delta's streaming-read behavior.
 *
 * After the overlay: the ZERO-COPY DML family ([[Dv.merge]],
 * [[Dv.applyCdc]], [[Dv.purge]]) reads the overlay schema and keeps
 * working (changesets must carry exactly the new column set —
 * whole-row replacement, the documented merge contract); the REWRITING
 * family keeps its existing shallow-ref contract (materialize first —
 * which reads through the overlay and so bakes the evolved schema into
 * real files). Contrast [[Upsert]]'s `evolveSchema = true`, which
 * evolves DURING a rewriting merge: that path byte-copies every
 * untouched file (write-amplification proportional to the table); this
 * one touches nothing.
 *
 * DROP-then-re-ADD trap (Delta solves it with column mapping; this
 * layout refuses it loudly): a dropped column's VALUES are still
 * physically present in the data files — re-adding the same name would
 * silently resurrect them on old rows instead of reading NULL.
 * [[addColumns]] therefore collision-checks against the PHYSICAL footer
 * schema too, and rejects a physically-present name toward
 * materialize-first (which rewrites the files without the dropped
 * column, making the re-add safe).
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
    * Spark's resolution), with PHYSICALLY-present dropped columns (see
    * the resurrect trap in the object doc), and duplicate new names all
    * reject before any claim. Returns the overlay's version. */
  def addColumns(spark: SparkSession, table: String,
                 cols: StructType): Long = {
    require(cols.nonEmpty, "ADD COLUMNS needs at least one column")
    val dupNew = cols.fieldNames.groupBy(_.toLowerCase)
      .collect { case (_, vs) if vs.length > 1 => vs.head }
    require(dupNew.isEmpty,
      s"duplicate new column name(s) ${dupNew.toSeq.sorted}")
    overlay(spark, table, { case (liveSchema, mapping, dataDir, liveVDir) =>
      val lower = liveSchema.fieldNames.map(_.toLowerCase).toSet
      val clash = cols.fieldNames.filter(c => lower(c.toLowerCase))
      require(clash.isEmpty,
        s"column(s) ${clash.toSeq} already exist on $table")
      // resurrect guard: a name absent from the marker but present in
      // the FILES was dropped — re-adding it would read the old values
      val ownParts =
        if (dataDir == liveVDir) Seq.empty[String]
        else Versioned.dataFilePaths(spark, liveVDir)
      // mergeSchema = UNION of every footer: an evolved/narrowed dir
      // holds mixed-schema files, and a single sampled footer (the
      // default) could miss the dropped column and let the resurrect
      // slip through — the guard must see every file's columns
      val ownPhysical: Seq[String] =
        if (ownParts.isEmpty) Seq.empty
        else spark.read.option("mergeSchema", "true")
          .parquet(ownParts: _*).schema.fieldNames.toSeq
      val physical =
        (spark.read.option("mergeSchema", "true")
          .parquet(dataDir).schema.fieldNames.toSeq ++
          ownPhysical).map(_.toLowerCase).toSet
      val ghost = cols.fieldNames
        .filter(c => physical(c.toLowerCase) && !lower(c.toLowerCase))
      // a MAPPED table (some rename happened) closes the re-add trap by
      // construction: the new column gets a FRESH physical name, so the
      // physically-present old bytes can never resolve to it. An
      // unmapped table keeps the loud reject — silently starting a
      // mapping on a plain table would surprise raw-parquet readers.
      require(ghost.isEmpty || mapping.nonEmpty,
        s"column(s) ${ghost.toSeq} were DROPPED but their values are " +
          s"still physically present in $table's files — re-adding the " +
          "name would resurrect them on old rows; Clone.materialize " +
          "(or SQL OPTIMIZE) first to rewrite the files without them")
      val ghostSet = ghost.map(_.toLowerCase).toSet
      val freshened = cols.fieldNames.filter(c => ghostSet(c.toLowerCase))
        .map(c => c -> s"${c}__p${java.util.UUID.randomUUID.toString
          .take(8)}").toMap
      (StructType(liveSchema.fields ++
        cols.fields.map(_.copy(nullable = true))),
        mapping ++ freshened)
    })
  }

  /** Drop columns from `table`'s live schema — metadata-only: the
    * overlay's marker simply omits them, so every explicit-schema scan
    * projects them out at the parquet footer (the bytes stay until the
    * next materialize/compaction rewrites the files — the same logical-
    * until-vacuum posture as [[Dv]] deletes, documented for deletion-SLA
    * deployments). The DML key column cannot drop; a registered CHECK
    * constraint naming a dropped column rejects first (its predicate
    * could no longer evaluate); at least one column must remain. Time
    * travel to pre-drop versions (and RESTORE to them) still reads the
    * full wide schema. Returns the overlay's version. */
  def dropColumns(spark: SparkSession, table: String, cols: Seq[String],
                  keyCol: String): Long = {
    require(cols.nonEmpty, "DROP COLUMN needs at least one column")
    require(!cols.exists(_.equalsIgnoreCase(keyCol)),
      s"cannot drop the DML key column '$keyCol' — the key is row " +
        "identity; re-keying is a restatement (CREATE OR REPLACE)")
    val rules = Constraints.list(spark, table)
    cols.foreach { c =>
      // match the name OUTSIDE string literals only — a predicate like
      // `status != 'score'` does not evaluate a column named score
      val hit = rules.find { r =>
        val masked = r.predicate.replaceAll("'[^']*'", " ")
        ("(?i)\\b" + java.util.regex.Pattern.quote(c) + "\\b").r
          .findFirstIn(masked).isDefined
      }
      require(hit.isEmpty,
        s"constraint '${hit.map(_.name).getOrElse("")}' references " +
          s"column '$c' — DROP CONSTRAINT first")
    }
    overlay(spark, table, { case (liveSchema, mapping, _, _) =>
      val lower = liveSchema.fieldNames.map(_.toLowerCase).toSet
      val missing = cols.filterNot(c => lower(c.toLowerCase))
      require(missing.isEmpty,
        s"column(s) $missing do not exist on $table")
      val dropSet = cols.map(_.toLowerCase).toSet
      val out = liveSchema.fields
        .filterNot(f => dropSet(f.name.toLowerCase))
      require(out.nonEmpty,
        "cannot drop every column — a table needs at least one")
      (StructType(out),
        mapping.filterNot { case (l, _) => dropSet(l.toLowerCase) })
    })
  }

  /** Rename a column — metadata-only, via COLUMN MAPPING (Delta's "name"
    * mode on this layout): the overlay's marker carries the new LOGICAL
    * schema and a `_column_mapping` sidecar records logical → PHYSICAL
    * (the renamed column's physical name stays its pre-rename spelling
    * forever; files are never touched). Readers resolve the mapping at
    * scan ([[Versioned.readVersion]]); the zero-copy DML family writes
    * its appends under physical names ([[Dv]]); a materialize/compaction
    * rewrites under logical names and drops the mapping (rename baked
    * in). Time travel to pre-rename versions shows the old name (their
    * dirs carry no mapping). The DML KEY column cannot rename (the
    * session registry and every skipping index are keyed by it — a
    * re-key is a restatement); a CHECK constraint naming the column must
    * drop first (its predicate would stop evaluating). Returns the
    * overlay's version. */
  def renameColumn(spark: SparkSession, table: String, oldName: String,
                   newName: String, keyCol: String): Long = {
    require(newName.nonEmpty && !newName.exists(c =>
        c == '\t' || c == '\n' || c == '\r' || c == '`'),
      s"invalid new column name '$newName'")
    require(!oldName.equalsIgnoreCase(keyCol),
      s"cannot rename the DML key column '$keyCol' — the key is row " +
        "identity (registry + skipping indexes bind to it); re-keying " +
        "is a restatement (CREATE OR REPLACE)")
    val rules = Constraints.list(spark, table)
    val hit = rules.find { r =>
      val masked = r.predicate.replaceAll("'[^']*'", " ")
      ("(?i)\\b" + java.util.regex.Pattern.quote(oldName) + "\\b").r
        .findFirstIn(masked).isDefined
    }
    require(hit.isEmpty,
      s"constraint '${hit.map(_.name).getOrElse("")}' references " +
        s"column '$oldName' — DROP CONSTRAINT first (its predicate " +
        "would stop evaluating after the rename)")
    overlay(spark, table, { case (liveSchema, mapping, _, _) =>
      val field = liveSchema.fields.find(_.name.equalsIgnoreCase(oldName))
        .getOrElse(throw new IllegalArgumentException(
          s"column '$oldName' does not exist on $table"))
      require(!liveSchema.fieldNames.exists(_.equalsIgnoreCase(newName)),
        s"column '$newName' already exists on $table")
      val physOld = mapping.getOrElse(field.name, field.name)
      val outSchema = StructType(liveSchema.fields.map(f =>
        if (f.name.equalsIgnoreCase(oldName)) f.copy(name = newName)
        else f))
      ((outSchema, (mapping - field.name) + (newName -> physOld)))
    })
  }

  /** The shared overlay publish: pin + ref + carry (appends, vector,
    * watermark, column mapping) + the transformed schema as the
    * overlay's OWN marker. `newSchema` receives (live schema, current
    * column mapping, resolved data dir, live version dir) and must
    * validate + return (overlay schema, column mapping to write — empty
    * = no mapping sidecar on the new version). */
  private def overlay(spark: SparkSession, table: String,
                      newSchema: (StructType, Map[String, String], String,
                        String) => (StructType, Map[String, String]))
      : Long =
    Versioned.withWriteRetry() {
      val live = Versioned.currentVersion(spark, table).getOrElse(
        throw new IllegalStateException(s"no published version at $table"))
      val liveVDir = s"$table/v=$live"
      val dataDir = Versioned.dataDir(spark, table, live)
      val f = fs(spark, table)
      val conf = spark.sparkContext.hadoopConfiguration
      val liveSchema = Versioned.schemaAt(spark, table, live)
      val mapping = Versioned.readColumnMapping(f, liveVDir)
        .getOrElse(Map.empty)
      val (outSchema, outMapping) =
        newSchema(liveSchema, mapping, dataDir, liveVDir)
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
        // THE point: the new schema as this version's OWN marker —
        // version-aware readers resolve it ahead of the base dir's
        Versioned.writeSchemaMarker(fd, dir, outSchema)
        // column mapping (rename support): the overlay's OWN sidecar
        if (outMapping.nonEmpty)
          Versioned.writeColumnMapping(fd, dir, outMapping)
        // `_schema_change` names the operation for DESCRIBE HISTORY
        val sc = fd.create(new Path(s"$dir/_schema_change"), true)
        try sc.write("metadata-only".getBytes(StandardCharsets.UTF_8))
        finally sc.close()
        // no ROW changed — batch feed readers bridge to zero rows —
        // but the STREAMING tail runs with its start-time schema and
        // must fail loudly toward a restart: one `_op` = "S" poison row
        // (Cdf.recordSchemaChange; Delta's streaming behavior)
        Cdf.recordSchemaChange(spark, dir, outSchema)
      }
    }
}
