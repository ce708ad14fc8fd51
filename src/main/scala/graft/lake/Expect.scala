package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Publish-time data expectations — the ENFORCEMENT leg of data quality
 * (the `dq_checks` catalog family is the read-side audit): declarative
 * boolean rules gate what enters a [[Versioned]] table, in the three
 * standard modes (Delta Live Tables' expect / expect_or_drop /
 * expect_or_fail, Delta table CHECK constraints for the fail mode):
 *
 *  - [[Mode.Warn]]  — publish everything, report per-rule violation counts;
 *  - [[Mode.Drop]]  — publish passing rows; violating rows land in a
 *    QUARANTINE table (itself versioned — auditable, replayable,
 *    re-admittable after repair) tagged with the names of every rule they
 *    broke, never silently vanishing;
 *  - [[Mode.Fail]]  — abort the publish if ANY rule is violated; the
 *    target table is untouched (nothing is half-written — the check runs
 *    before the version dir is exposed anyway, but Fail also skips the
 *    quarantine write).
 *
 * Scale posture: ONE pass computes all per-rule violation counts as
 * conditional sums (map-side combinable, no per-rule scans); the pass/fail
 * split reuses the same predicates, so the whole gate costs one extra
 * boolean projection over the publish scan. Rules are SQL boolean
 * expressions over the batch's columns — pushdown- and codegen-friendly,
 * no UDFs. A rule evaluating to NULL (e.g. a comparison on a NULL column)
 * counts as a VIOLATION — "unknown" must not slip past a gate whose point
 * is catching exactly the malformed rows.
 */
object Expect {

  /** A named expectation: `predicate` is a SQL boolean expression that
    * must evaluate TRUE for a row to pass (NULL = violation). */
  final case class Rule(name: String, predicate: String)

  sealed trait Mode
  object Mode {
    case object Warn extends Mode
    case object Drop extends Mode
    case object Fail extends Mode
  }

  /** Outcome of a gated publish: the published version (None when Fail
    * aborted), rows published, rows quarantined, and per-rule violation
    * counts (a row violating two rules counts once in each). */
  final case class Report(version: Option[Long], published: Long,
                          quarantined: Long, violations: Map[String, Long])

  private def passCol(rules: Seq[Rule]): Column =
    rules.map(r => coalesce(expr(r.predicate), lit(false)))
      .reduce(_ && _)

  // (total rows, rows violating >=1 rule, per-rule violation counts) in
  // ONE aggregate pass — the totals ride the same 1-row aggregate so
  // [[publish]]/[[applyCdc]] never re-count
  private def auditWithTotal(df: DataFrame, rules: Seq[Rule])
      : (Long, Long, Map[String, Long]) = {
    require(rules.nonEmpty, "no rules to audit")
    require(rules.map(_.name).distinct.size == rules.size,
      "duplicate rule names")
    val row = df.agg(
      count(lit(1)).as("_n"),
      sum(when(passCol(rules), 0L).otherwise(1L)).as("_nbad") +:
        rules.map(r => sum(when(coalesce(expr(r.predicate), lit(false)),
          0L).otherwise(1L)).as(r.name)): _*).head()
    val counts = rules.map(r => r.name ->
      Option(row.getAs[java.lang.Long](r.name)).map(_.longValue)
        .getOrElse(0L)).toMap
    val bad = Option(row.getAs[java.lang.Long]("_nbad"))
      .map(_.longValue).getOrElse(0L)
    (row.getAs[Long]("_n"), bad, counts)
  }

  /** Violation counts for every rule in ONE aggregate pass. */
  def audit(df: DataFrame, rules: Seq[Rule]): Map[String, Long] =
    auditWithTotal(df, rules)._3

  /** Gate `df` through `rules` and publish to `table` per `mode`.
    * Quarantined rows (Drop mode) append a `_violated` column naming every
    * rule they broke and publish as a new version of `quarantine`
    * (required for Drop; ignored otherwise). */
  def publish(df: DataFrame, table: String, rules: Seq[Rule], mode: Mode,
              quarantine: Option[String] = None): Report = {
    // persist BEFORE the audit so the audit scan, the publish write, and
    // (in Drop mode) the split all serve from one materialization — the
    // gate's whole extra cost stays the audited boolean projection
    df.persist()
    try {
      val (total, bad, counts) = auditWithTotal(df, rules)
      mode match {
        case Mode.Fail =>
          failIfBad(bad, counts, "publish")
          val v = Versioned.publish(df, table)
          Report(Some(v), total, 0L, counts)
        case Mode.Warn =>
          val v = Versioned.publish(df, table)
          Report(Some(v), total, 0L, counts)
        case Mode.Drop =>
          val q = quarantine.getOrElse(throw new IllegalArgumentException(
            "Drop mode needs a quarantine table"))
          // clean frame: a single publish is already atomic — no txn
          if (bad == 0L) {
            val v = Versioned.publish(df, table)
            Report(Some(v), total, 0L, counts)
          // table + quarantine flip as one cross-table txn — same
          // argument as the DML legs below (target first, shared
          // quarantine second)
          } else Txn.atomicallyOrJoin(df.sparkSession) {
            val pass = df.filter(passCol(rules))
            val v = Versioned.publish(pass, table)
            Versioned.publish(violatorsOf(df, rules), q)
            Report(Some(v), total - bad, bad, counts)
          }
      }
    } finally { df.unpersist(); () }
  }

  private def failIfBad(bad: Long, counts: Map[String, Long],
                        what: String): Unit =
    if (bad > 0)
      throw new IllegalStateException(
        s"expectation(s) violated, $what aborted: " +
          counts.filter(_._2 > 0).map { case (n, c) => s"$n=$c" }
            .toSeq.sorted.mkString(", "))

  // violating rows tagged with the names of every rule they broke
  private def violatorsOf(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.filter(!passCol(rules))
      .withColumn("_violated",
        array_compact(array(rules.map(r =>
          when(!coalesce(expr(r.predicate), lit(false)),
            lit(r.name))): _*)))

  /** Gate a full-row changeset through `rules`, then MERGE the passing
    * rows ([[Upsert.merge]]) — the DML leg of expectations: a bad
    * changeset quarantines (Drop) or aborts with the table untouched
    * (Fail) instead of merging. Drop mode flips the quarantine version
    * and the merge as ONE cross-table transaction ([[Txn]]) — a crash
    * between the two writes aborts both, and a replay re-runs both
    * exactly once (no duplicate quarantine versions, no
    * quarantined-but-unmerged window); `Report.version` is None when
    * nothing merged (every row quarantined). */
  def merge(spark: SparkSession, table: String, keyCol: String,
            changes: DataFrame, rules: Seq[Rule], mode: Mode,
            quarantine: Option[String] = None,
            evolveSchema: Boolean = false,
            insertOnly: Boolean = false,
            zeroCopy: Boolean = false): Report = {
    require(!(zeroCopy && evolveSchema),
      "zero-copy merges do not evolve schemas (Dv's scope dial) — " +
        "evolve metadata-only via Evolve.addColumns first")
    def run(c: DataFrame): Long =
      if (zeroCopy) Dv.merge(spark, table, keyCol, c, insertOnly)
      else Upsert.merge(spark, table, keyCol, c, evolveSchema,
        insertOnly = insertOnly)
    changes.persist()
    try {
      val (total, bad, counts) = auditWithTotal(changes, rules)
      mode match {
        case Mode.Fail =>
          failIfBad(bad, counts, "merge")
          Report(Some(run(changes)), total, 0L, counts)
        case Mode.Warn =>
          Report(Some(run(changes)), total, 0L, counts)
        case Mode.Drop =>
          val q = quarantine.getOrElse(throw new IllegalArgumentException(
            "Drop mode needs a quarantine table"))
          // clean batch (the common case): one write is already atomic —
          // skip the txn protocol entirely
          if (bad == 0L) Report(Some(run(changes)), total, 0L, counts)
          // quarantine + gated write flip as ONE cross-table txn: a
          // crash between the two can no longer leave the violators
          // quarantined with the table unmoved, and a replay re-runs
          // neither twice. Joins a caller's enclosing txn instead of
          // nesting. TARGET writes first, quarantine second: the
          // quarantine table is often SHARED across writers, and
          // first-published holds its claim until the flip — put the
          // long hold on the writer-owned table, the millisecond hold
          // on the shared one.
          else Txn.atomicallyOrJoin(spark) {
            val v =
              if (bad == total) None // nothing passed — table untouched
              else Some(run(changes.filter(passCol(rules))))
            Versioned.publish(violatorsOf(changes, rules), q)
            Report(v, total - bad, bad, counts)
          }
      }
    } finally { changes.unpersist(); () }
  }

  /** The CDC twin of [[merge]]: gate an I/U/D batch, then
    * [[Upsert.applyCdc]] it. Rules audit only the PAYLOAD rows (I/U) —
    * a D row carries nothing but its key, so it passes through
    * unaudited. `Report.published`/`quarantined` therefore count audited
    * payload rows; deletes ride along whenever anything merges. Same
    * one-txn quarantine + merge flip as [[merge]] (joining a caller's
    * enclosing txn instead of nesting); `batchTag` forwards the
    * streaming sink's replay-dedup tag. */
  def applyCdc(spark: SparkSession, table: String, keyCol: String,
               batch: DataFrame, rules: Seq[Rule], mode: Mode,
               quarantine: Option[String] = None, opCol: String = "op",
               batchTag: Option[String] = None,
               evolveSchema: Boolean = false,
               zeroCopy: Boolean = false): Report = {
    require(!(zeroCopy && evolveSchema),
      "zero-copy merges do not evolve schemas (Dv's scope dial) — " +
        "evolve metadata-only via Evolve.addColumns first")
    batch.persist()
    try {
      val payload = batch.filter(col(opCol) =!= "D")
      val (total, bad, counts) = auditWithTotal(payload, rules)
      def applyAll(b: DataFrame): Long =
        if (zeroCopy) Dv.applyCdc(spark, table, keyCol, b, opCol, batchTag)
        else Upsert.applyCdc(spark, table, keyCol, b, opCol, batchTag,
          evolveSchema)
      mode match {
        case Mode.Fail =>
          failIfBad(bad, counts, "CDC apply")
          Report(Some(applyAll(batch)), total, 0L, counts)
        case Mode.Warn =>
          Report(Some(applyAll(batch)), total, 0L, counts)
        case Mode.Drop =>
          val q = quarantine.getOrElse(throw new IllegalArgumentException(
            "Drop mode needs a quarantine table"))
          if (bad == 0L) Report(Some(applyAll(batch)), total, 0L, counts)
          else Txn.atomicallyOrJoin(spark) {
            // one atomic flip for the gated merge + quarantine publish —
            // a crash-replay of this micro-batch re-runs BOTH exactly
            // once (the merge's batch tag was pending-invisible), where
            // the old ordering re-published the quarantine beside an
            // already-tagged merge. Target first, shared quarantine
            // second (see [[merge]]'s claim-hold note).
            val gated = batch.filter(
              col(opCol) === "D" || passCol(rules))
            val v = if (gated.isEmpty) None else Some(applyAll(gated))
            Versioned.publish(violatorsOf(payload, rules), q)
            Report(v, total - bad, bad, counts)
          }
      }
    } finally { batch.unpersist(); () }
  }
}
