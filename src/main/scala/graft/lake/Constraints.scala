package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Persistent table CHECK constraints — Delta's `ALTER TABLE ADD
 * CONSTRAINT ... CHECK (...)` on this layout. [[Expect]] gates a single
 * write when the CALLER passes rules; a constraint registered here is a
 * property of the TABLE: stored in a `_constraints` sidecar at the table
 * root (outside the version dirs — it governs writes, it is not
 * versioned content) and enforced by every row-adding write path
 * ([[Upsert.merge]]/[[Upsert.applyCdc]], [[Dv.applyCdc]],
 * [[Versioned.publish]], [[Forget.publishIndexed]]/`publishClustered`,
 * and therefore the whole SQL DML surface) with [[Expect.Mode.Fail]]
 * semantics: any violating row aborts the statement before a version is
 * claimed, the table untouched.
 *
 * [[add]] validates EXISTING rows first (one aggregate pass over the
 * live snapshot, Delta's contract) — a constraint the table already
 * violates is a lie and rejects loudly.
 *
 * Enforcement cost: ONE aggregate pass over the CHANGESET per statement
 * (all constraints as conditional sums — [[Expect.audit]]'s map-side
 * combinable shape), not over the table; at 100 TB a CDC trickle pays a
 * changeset-sized audit, a full publish pays one extra pass over data
 * it was already shuffling. A row evaluating a predicate to NULL
 * violates — "unknown" must not pass a gate whose point is malformed
 * rows.
 *
 * NOT re-checked: delete-only changes (removing rows cannot create a
 * violation), layout maintenance (compact/cluster/materialize — same
 * rows), and [[Restore]] (it may legitimately resurrect rows that
 * predate a constraint; re-validate with [[validate]] after a restore
 * when that matters).
 */
object Constraints {

  private def path(table: String) = new Path(s"$table/_constraints")

  private def fs(spark: SparkSession, table: String) =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Registered constraints of `table`, in registration order. */
  def list(spark: SparkSession, table: String): Seq[Expect.Rule] = {
    val f = fs(spark, table)
    Versioned.readSmallFile(f, path(table)).toSeq
      .flatMap(_.linesIterator)
      .filter(_.nonEmpty)
      .map { line =>
        val i = line.indexOf('\t')
        require(i > 0, s"malformed constraint line in ${path(table)}: $line")
        Expect.Rule(line.substring(0, i), line.substring(i + 1))
      }
  }

  // tmp + rename, never create-over: an in-place truncate would open a
  // window where a concurrent writer's enforce() reads an EMPTY rule set
  // and admits a violating batch — the same torn-read discipline as the
  // manifest pointer and Checkpoint sidecars. add/drop additionally
  // serialize same-JVM on the table's pointer lock (cross-process
  // last-writer-wins on the rename is the documented limit: constraint
  // ADMINISTRATION is an operator action, not a concurrent hot path —
  // but a reader can never observe a half-written set).
  private def write(spark: SparkSession, table: String,
                    rules: Seq[Expect.Rule]): Unit = {
    val f = fs(spark, table)
    if (rules.isEmpty) { f.delete(path(table), false); () }
    else {
      val tmp = new Path(s"$table/_constraints.tmp")
      val body = rules.map(r => s"${r.name}\t${r.predicate}")
        .mkString("\n")
      val out = f.create(tmp, true)
      try out.write(body.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (!f.rename(tmp, path(table))) {
        f.delete(path(table), false)
        require(f.rename(tmp, path(table)),
          s"cannot swap ${path(table)} into place")
      }
    }
  }

  /** Register a constraint. Validates the LIVE snapshot first — one
    * aggregate pass; any existing violation rejects with its count and
    * the table keeps its previous constraint set. Predicate names must
    * be unique (re-adding a name rejects; [[drop]] first to replace). */
  def add(spark: SparkSession, table: String, name: String,
          predicate: String): Unit = {
    val rule = Expect.Rule(name, predicate)
    // validate OUTSIDE the lock (a table scan under a lock shared with
    // commit pointer updates would stall writers)...
    if (Versioned.currentVersion(spark, table).isDefined) {
      val bad = Expect.audit(Versioned.read(spark, table), Seq(rule))(name)
      require(bad == 0L,
        s"cannot add constraint '$name' CHECK ($predicate) to $table — " +
          s"$bad existing row(s) violate it")
    }
    // ...then read-modify-write the set under it (same-JVM serialization;
    // see write() for the cross-process posture)
    Versioned.pointerLockFor(fs(spark, table), table).synchronized {
      val existing = list(spark, table)
      require(!existing.exists(_.name.equalsIgnoreCase(name)),
        s"constraint '$name' already exists on $table — drop it first")
      write(spark, table, existing :+ rule)
    }
  }

  /** Drop constraint `name`. Returns whether it existed. */
  def drop(spark: SparkSession, table: String, name: String): Boolean =
    Versioned.pointerLockFor(fs(spark, table), table).synchronized {
      val existing = list(spark, table)
      val kept = existing.filterNot(_.name.equalsIgnoreCase(name))
      if (kept.size == existing.size) false
      else { write(spark, table, kept); true }
    }

  /** Audit the LIVE snapshot against the registered constraints (e.g.
    * after a [[Restore]]) — per-constraint violation counts. */
  def validate(spark: SparkSession, table: String): Map[String, Long] = {
    val rules = list(spark, table)
    if (rules.isEmpty) Map.empty
    else Expect.audit(Versioned.read(spark, table), rules)
  }

  /** The write-path gate: abort (throw) when any row of `changed` (the
    * rows a statement is ADDING — upserts of a merge, the whole frame of
    * a full publish) violates a registered constraint. No-op on tables
    * without constraints (one small-file existence read). */
  private[lake] def enforce(spark: SparkSession, table: String,
                            changed: DataFrame, what: String): Unit = {
    val rules = list(spark, table)
    if (rules.isEmpty) return
    val counts = Expect.audit(changed, rules)
    val bad = counts.filter(_._2 > 0L)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"$what on $table violates table constraint(s) " +
          bad.map { case (n, c) => s"'$n' ($c row(s))" }.mkString(", ") +
          " — the statement was aborted, the table is untouched " +
          "(Constraints.drop to remove a constraint)")
  }
}
