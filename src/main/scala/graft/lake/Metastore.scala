package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Metastore-lite: a DURABLE name → (path, key) catalog directory, so a
 * FRESH session discovers lake tables by name instead of re-registering
 * every path by hand. The reference's status workflow assumes durable
 * discoverability (`pipeline.py:234-257` lists the pipeline's tables
 * without being told their locations); the session-scoped
 * [[graft.SqlDml]] registry dies with the JVM — this closes the gap with
 * one small-file-per-binding directory:
 *
 * {{{
 *   <catalogDir>/tables/<name>   "t <path> <keyCol>"  (keyCol "-" = read-only)
 *   <catalogDir>/views/<name>    "v <path>"           (materialized view)
 * }}}
 *
 * Concurrency: a NEW binding claims its name with
 * `create(overwrite = false)` — the same namenode-atomic/conditional-PUT
 * primitive the version claim protocol uses — so two sessions racing to
 * CREATE TABLE the same name resolve to exactly one winner; the loser
 * gets the loud already-bound reject. Re-recording an IDENTICAL binding
 * is an idempotent no-op (session restarts re-attach cleanly); changing
 * a name's target requires dropping it first — silent re-pointing is how
 * a reader ends up on the wrong table. Removal is one file delete.
 *
 * Scale posture: the catalog is names, not data — one tiny file per
 * table, read once per session attach (ONE `listStatus` of each of
 * `tables/` and `views/` plus |bindings| small-file reads; no per-query
 * traffic, so even a 10⁴-table catalog attaches in one directory listing
 * per kind). Nothing on the query path ever touches it (views bind to
 * version dirs at registration as before), so a 100 TB deployment pays
 * exactly |tables| small reads at startup.
 *
 * Input hygiene: entry NAMES become filesystem path segments and entry
 * BODIES are one space-delimited line — both are validated at the door.
 * A name like `../x` or `a/b` would escape `<catalogDir>/tables/`
 * (recordTable/removeTable are public API, not just SQL-parser-fed), and
 * a path or key containing a space/newline would corrupt the line format
 * [[tables]] parses back. Rejecting loudly here beats a catalog that
 * silently mis-binds on the next attach.
 */
object Metastore {

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // catalog entry names are path segments: NEW claims take SQL-identifier
  // shape only
  private def validName(name: String): String = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"catalog entry name '$name' is not a SQL identifier " +
        "([A-Za-z_][A-Za-z0-9_]*) — names become catalog files, and a " +
        "separator or traversal segment would escape the catalog dir")
    name.toLowerCase
  }

  // ACCESS (has/remove) is laxer than claim: a catalog written before the
  // identifier rule may hold e.g. a leading-digit name, and an entry that
  // exists must stay removable — only path-escape shapes reject
  private def safeSegment(name: String): String = {
    require(name.nonEmpty && name != "." && name != ".." &&
        !name.exists(c => c == '/' || c == '\\' || c.isWhitespace),
      s"catalog entry name '$name' is not a safe path segment")
    name.toLowerCase
  }

  // entry bodies are ONE space-delimited line; a path with whitespace
  // would mis-split at parse ([[tables]] splits on the LAST space) and a
  // newline would truncate the record entirely
  private def validToken(what: String, v: String): String = {
    require(v.nonEmpty && !v.exists(c => c == ' ' || c == '\n' || c == '\r'),
      s"catalog $what '$v' contains whitespace — the entry format is " +
        "one space-delimited line; bind the table under a " +
        "whitespace-free path")
    v
  }

  private def tableEntry(dir: String, name: String,
                         claiming: Boolean = false) =
    new Path(s"$dir/tables/${if (claiming) validName(name)
      else safeSegment(name)}")
  private def viewEntry(dir: String, name: String,
                        claiming: Boolean = false) =
    new Path(s"$dir/views/${if (claiming) validName(name)
      else safeSegment(name)}")

  /** One durable binding. `keyCol = None` = registered read-only. */
  final case class Binding(name: String, path: String,
                           keyCol: Option[String])

  // same-JVM claimants serialize per entry path: the local FS's
  // create(overwrite = false) is exists-then-create, not atomic (the
  // same caveat the version-claim protocol documents) — on HDFS/S3 the
  // create alone is the atomic claim and the lock is a cheap no-op
  private val claimLocks =
    new scala.collection.concurrent.TrieMap[String, Object]()

  // claim-or-verify: atomically create the entry; on a taken name accept
  // only a byte-identical binding (idempotent re-attach), reject a
  // re-point loudly. Returns TRUE only when THIS call created the entry
  // — the atomic freshness signal failure-unwind paths key on (a
  // separate exists-then-record probe would let two racing identical
  // claims both think they were first, and the loser's unwind would
  // delete the winner's entry).
  private def claim(f: FileSystem, entry: Path, body: String,
                    what: String, name: String): Boolean =
    claimLocks.getOrElseUpdate(
        f.makeQualified(entry).toString, new Object).synchronized {
      f.mkdirs(entry.getParent)
      try {
        val out = f.create(entry, false)
        try out.write(body.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case e: java.io.IOException =>
          // name-taken vs transient fault: only an EXISTING entry means
          // the claim lost — a disk-full/permission/network IOException
          // with no entry present must surface as itself, not as a
          // phantom "already bound" that sends the user chasing a
          // nonexistent name conflict
          if (!f.exists(entry)) throw e
          val existing = Versioned.readSmallFile(f, entry)
          if (!existing.contains(body))
            throw new IllegalStateException(
              s"$what '$name' is already bound in this catalog to " +
                s"'${existing.getOrElse("<unreadable>")}' — re-pointing a " +
                s"name is a DROP + CREATE, not a silent replace")
          false
      }
    }

  /** Record a durable TABLE binding (idempotent for identical content;
    * rejects a name bound to a different target). Returns true when
    * THIS call created the entry (vs verified an identical one). */
  def recordTable(spark: SparkSession, catalogDir: String, name: String,
                  path: String, keyCol: Option[String]): Boolean =
    claim(fs(spark, catalogDir), tableEntry(catalogDir, name,
        claiming = true),
      s"t ${validToken("table path", path)} " +
        validToken("key column", keyCol.getOrElse("-")),
      "table", name)

  /** Does a TABLE binding for `name` exist (any target)? */
  def hasTable(spark: SparkSession, catalogDir: String,
               name: String): Boolean =
    fs(spark, catalogDir).exists(tableEntry(catalogDir, name))

  /** Record a durable MATERIALIZED VIEW binding. Returns true when
    * THIS call created the entry. */
  def recordView(spark: SparkSession, catalogDir: String, name: String,
                 path: String): Boolean =
    claim(fs(spark, catalogDir), viewEntry(catalogDir, name,
        claiming = true),
      s"v ${validToken("view path", path)}", "materialized view", name)

  /** Drop a table binding; true when an entry existed. Data untouched
    * (path-based tables are external — VACUUM + rm is data deletion). */
  def removeTable(spark: SparkSession, catalogDir: String,
                  name: String): Boolean =
    fs(spark, catalogDir).delete(tableEntry(catalogDir, name), false)

  /** Drop a view binding; true when an entry existed. */
  def removeView(spark: SparkSession, catalogDir: String,
                 name: String): Boolean =
    fs(spark, catalogDir).delete(viewEntry(catalogDir, name), false)

  /** All durable TABLE bindings, by name. */
  def tables(spark: SparkSession, catalogDir: String): Seq[Binding] =
    list(spark, s"$catalogDir/tables", "t ").map { case (n, rest) =>
      val i = rest.lastIndexOf(' ')
      require(i > 0, s"malformed catalog entry for '$n': 't $rest'")
      val key = rest.substring(i + 1)
      Binding(n, rest.substring(0, i),
        if (key == "-") None else Some(key))
    }

  /** All durable VIEW bindings, by name. */
  def views(spark: SparkSession, catalogDir: String): Seq[(String, String)] =
    list(spark, s"$catalogDir/views", "v ")

  private def list(spark: SparkSession, dir: String,
                   prefix: String): Seq[(String, String)] = {
    val f = fs(spark, dir)
    if (!f.exists(new Path(dir))) Seq.empty
    else f.listStatus(new Path(dir)).toSeq.filter(_.isFile)
      .map(_.getPath)
      .sortBy(_.getName)
      .flatMap { p =>
        Versioned.readSmallFile(f, p).collect {
          case s if s.startsWith(prefix) =>
            p.getName -> s.stripPrefix(prefix)
        }
      }
  }
}
