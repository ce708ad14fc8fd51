package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
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

  // (total rows, per-rule violation counts) in ONE aggregate pass — the
  // total rides the same 1-row aggregate so [[publish]] never re-counts
  private def auditWithTotal(df: DataFrame,
                             rules: Seq[Rule]): (Long, Map[String, Long]) = {
    require(rules.nonEmpty, "no rules to audit")
    require(rules.map(_.name).distinct.size == rules.size,
      "duplicate rule names")
    val row = df.agg(
      count(lit(1)).as("_n"),
      rules.map(r => sum(when(coalesce(expr(r.predicate), lit(false)),
        0L).otherwise(1L)).as(r.name)): _*).head()
    val counts = rules.map(r => r.name ->
      Option(row.getAs[java.lang.Long](r.name)).map(_.longValue)
        .getOrElse(0L)).toMap
    (row.getAs[Long]("_n"), counts)
  }

  /** Violation counts for every rule in ONE aggregate pass. */
  def audit(df: DataFrame, rules: Seq[Rule]): Map[String, Long] =
    auditWithTotal(df, rules)._2

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
      val (total, counts) = auditWithTotal(df, rules)
      val bad = counts.values.sum // row-rule violation pairs; 0 iff all pass
      mode match {
        case Mode.Fail =>
          if (bad > 0)
            throw new IllegalStateException(
              s"expectation(s) violated, publish aborted: " +
                counts.filter(_._2 > 0).map { case (n, c) => s"$n=$c" }
                  .toSeq.sorted.mkString(", "))
          val v = Versioned.publish(df, table)
          Report(Some(v), total, 0L, counts)
        case Mode.Warn =>
          val v = Versioned.publish(df, table)
          Report(Some(v), total, 0L, counts)
        case Mode.Drop =>
          val q = quarantine.getOrElse(throw new IllegalArgumentException(
            "Drop mode needs a quarantine table"))
          val pass = df.filter(passCol(rules))
          val v = Versioned.publish(pass, table)
          val nQ =
            if (bad == 0) 0L
            else {
              val failRows = df.filter(!passCol(rules))
                .withColumn("_violated",
                  array_compact(array(rules.map(r =>
                    when(!coalesce(expr(r.predicate), lit(false)),
                      lit(r.name))): _*)))
              Versioned.publish(failRows, q)
              failRows.count()
            }
          Report(Some(v), total - nQ, nQ, counts)
      }
    } finally { df.unpersist(); () }
  }
}
