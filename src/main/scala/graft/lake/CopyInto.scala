package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * COPY INTO — Delta's idempotent file-grain ingest statement on this
 * layout: point it at a landing directory and each file loads EXACTLY
 * ONCE across any number of invocations, so a scheduled re-run (the
 * reference's daily `s3_loader.py` upload rerun after a partial day) is
 * safe by construction instead of by operator care.
 *
 * Mechanics: the table root carries a `_copy_into/` ledger — one small
 * file per successful COPY commit, listing the source file NAMES that
 * commit loaded. An invocation lists the landing dir (non-hidden files),
 * subtracts the ledger union, reads ONLY the fresh files and merges them
 * through the standard gated DML paths (expectations, constraints, OCC
 * retry, change feed all identical to any other write). The merge SHAPE
 * is the scale decision: a landing within the zero-copy driver budget
 * takes [[Dv.merge]] — Delta's append model, `_ref` + the landed rows as
 * fresh files, nothing rewritten or byte-carried, so a daily ingest
 * costs the landed bytes however big the table is ([[Clone.materialize]]
 * / SQL `OPTIMIZE` compacts the accumulated appends); bigger landings
 * fall back to [[Upsert.merge]]'s distributed find-touched-files path.
 * Nothing table-sized ever reaches the driver.
 *
 * Crash ordering (ledger AFTER commit, deliberately): a crash between
 * the merge's publish and the ledger append re-loads the same files on
 * retry — a key-idempotent upsert of identical rows, i.e. a no-op in
 * content (one extra version). The reverse order would mark files
 * loaded that never were — silent data loss. Identity is the file NAME:
 * overwriting a landed file's CONTENT under the same name does NOT
 * reload it (the documented Delta behavior — landing dirs are
 * append-only by contract).
 *
 * An empty table (no published version) seeds with a full publish of
 * the first batch, so COPY INTO also bootstraps.
 */
object CopyInto {

  /** What one invocation did: the live version after it, and the source
    * file names it loaded (empty = everything was already landed). */
  final case class Report(version: Long, loaded: Seq[String])

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ledgerDir(table: String) = s"$table/_copy_into"

  /** File names every prior COPY commit loaded (ledger union). Skips
    * `.tmp` entries — a crash between create and rename leaves one, and
    * reading it would break the no-torn-entry guarantee the tmp+rename
    * write exists to provide. */
  def loadedFiles(spark: SparkSession, table: String): Set[String] = {
    val f = fs(spark, table)
    val dir = new Path(ledgerDir(table))
    if (!f.exists(dir)) Set.empty
    else f.listStatus(dir).toSeq
      .filter(s => s.isFile && !s.getPath.getName.endsWith(".tmp"))
      .flatMap { s =>
        Versioned.readSmallFile(f, s.getPath)
          .map(_.linesIterator.toSeq).getOrElse(Seq.empty)
      }.toSet
  }

  /** Drop the ledger — called by every WHOLESALE REPLACE of the table's
    * content ([[Restore.restore]], SQL `CREATE OR REPLACE TABLE` /
    * `INSERT OVERWRITE`): a restatement invalidates ingest history, so
    * the next COPY re-considers every landing file (re-landing is
    * key-idempotent; an operator restating to get RID of a landed file
    * removes it from the landing dir — that is where file identity
    * lives). Safe no-op when no ledger exists. */
  def clearLedger(spark: SparkSession, table: String): Unit = {
    val f = fs(spark, table)
    f.delete(new Path(ledgerDir(table)), true)
    ()
  }

  /** Load the not-yet-landed parquet files of `srcDir` into `table`
    * (keyed by `keyCol`), exactly once per file name; see object doc.
    * `rules` gate the fresh rows through [[Expect]] exactly as a SQL
    * MERGE would. Returns the live version and the newly loaded names. */
  def load(spark: SparkSession, table: String, keyCol: String,
           srcDir: String,
           rules: Seq[Expect.Rule] = Nil,
           mode: Expect.Mode = Expect.Mode.Fail,
           quarantine: Option[String] = None): Report = {
    val f = fs(spark, srcDir)
    require(f.exists(new Path(srcDir)),
      s"COPY INTO source dir $srcDir does not exist")
    val files = f.listStatus(new Path(srcDir)).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath)
    val landed = loadedFiles(spark, table)
    val fresh = files.filterNot(p => landed(p.getName))
    if (fresh.isEmpty)
      return Report(Versioned.currentVersion(spark, table).getOrElse(
        throw new IllegalStateException(
          s"nothing to copy and no published version at $table")), Nil)

    val df = spark.read.parquet(fresh.map(_.toString): _*)
    require(df.columns.exists(_.equalsIgnoreCase(keyCol)),
      s"COPY INTO source files lack the key column '$keyCol'")

    // persist: the landing-size count, the bootstrap key audit, and the
    // merge/publish must all serve from ONE materialization (parquet
    // input is deterministic, but the 2-3 recomputes are not free)
    df.persist()
    val v = try {
      val n = df.count()
      Versioned.currentVersion(spark, table) match {
        case Some(lv) =>
          // THE append path: a landing within the zero-copy driver
          // budget takes the Delta-append shape — `_ref` to the
          // untouched base + the landed rows as fresh files, NOTHING
          // byte-carried (the rewriting merge would byte-copy every
          // untouched file, i.e. table bytes per landing — wrong shape
          // for a daily ingest at 100 TB; OPTIMIZE / Maintain.auto
          // compacts the accumulated appends). Bigger landings fall
          // back to the rewriting merge's distributed path — which
          // rejects shallow-ref bases, so that combination gets ITS
          // OWN loud reject naming the remedy instead of a dead-end
          // chain of rejects that each point at the other.
          val overBudget = n > Upsert.MaxDriverKeysDefault
          val refBase = Versioned.isShallowRef(spark, table, lv)
          if (refBase && overBudget)
            throw new IllegalStateException(
              s"landing has $n rows (past the zero-copy budget " +
                s"${Upsert.MaxDriverKeysDefault}) and $table's live " +
                "version is a zero-copy ref — compact first " +
                "(Maintain.auto / Clone.materialize / SQL OPTIMIZE), " +
                "then rerun; the ledger makes the rerun safe")
          val zc = refBase || !overBudget
          if (rules.isEmpty) {
            if (zc) Dv.merge(spark, table, keyCol, df)
            else Upsert.merge(spark, table, keyCol, df)
          } else Expect.merge(spark, table, keyCol, df, rules, mode,
            quarantine, zeroCopy = zc).version
            .getOrElse(Versioned.currentVersion(spark, table).get)
        case None =>
          // bootstrap: key-uniqueness is the merge path's validation —
          // enforce the same invariant on the seeding publish
          val agg = df.agg(
            org.apache.spark.sql.functions.countDistinct(
              org.apache.spark.sql.functions.col(keyCol)).as("nk"),
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.when(
                org.apache.spark.sql.functions.col(keyCol).isNull, 1))
              .as("nulls")).head()
          require(agg.getLong(1) == 0L,
            s"COPY INTO batch has NULL $keyCol keys")
          require(n == agg.getLong(0),
            s"${n - agg.getLong(0)} duplicate $keyCol key(s) " +
              "across the copied files — the key column is row identity")
          if (rules.isEmpty) Versioned.publish(df, table)
          else Expect.publish(df, table, rules, mode, quarantine).version
            .getOrElse(throw new IllegalStateException(
              "every copied row was quarantined — nothing published"))
      }
    } finally { df.unpersist(); () }

    // ledger AFTER the commit (see crash-ordering argument); tmp+rename
    // so a reader of the ledger never sees a torn entry
    val ft = fs(spark, table)
    ft.mkdirs(new Path(ledgerDir(table)))
    val entry = s"${ledgerDir(table)}/copy-${java.util.UUID.randomUUID()}"
    val tmp = new Path(s"$entry.tmp")
    val out = ft.create(tmp, true)
    try out.write(fresh.map(_.getName).sorted.mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    require(ft.rename(tmp, new Path(entry)),
      s"ledger entry rename failed: $entry")
    Report(v, fresh.map(_.getName).sorted)
  }
}
