package graft.lake

import java.nio.file.Files

import graft.SparkSpec

/**
 * Publish-time expectations ([[Expect]]): Warn publishes everything with
 * counts; Drop splits exactly (pass + quarantine == input, quarantined
 * rows name every violated rule); Fail aborts with the target untouched;
 * NULL predicate results count as violations; the audit is one pass.
 */
class ExpectSpec extends SparkSpec {

  import spark.implicits._
  import Expect._

  private lazy val root = Files.createTempDirectory("graft-expect").toString

  // k=3 breaks both rules; k=5 breaks amount_pos; k=7 has NULL name
  // (breaks name_present via NULL -> violation)
  private def batch = Seq(
    (1L, "a", 10), (2L, "b", 20), (3L, null.asInstanceOf[String], -1),
    (5L, "e", -5), (7L, null.asInstanceOf[String], 7), (8L, "h", 0)
  ).toDF("k", "name", "amount")

  private val rules = Seq(
    Rule("name_present", "name IS NOT NULL"),
    Rule("amount_pos", "amount >= 0"))

  test("audit counts per rule in one pass; NULL is a violation") {
    val c = audit(batch, rules)
    assert(c == Map("name_present" -> 2L, "amount_pos" -> 2L))
  }

  test("Warn publishes all rows and reports") {
    val t = s"$root/warn"
    val r = publish(batch, t, rules, Mode.Warn)
    assert(r.version.contains(1L) && r.published == 6L && r.quarantined == 0L)
    assert(r.violations("name_present") == 2L)
    assert(Versioned.read(spark, t).count() == 6L)
  }

  test("Drop splits exactly; quarantined rows name their broken rules") {
    val t = s"$root/drop"
    val q = s"$root/dropq"
    val r = publish(batch, t, rules, Mode.Drop, quarantine = Some(q))
    assert(r.version.contains(1L))
    assert(r.published == 3L && r.quarantined == 3L)
    val good = Versioned.read(spark, t).select($"k").as[Long]
      .collect().sorted.toSeq
    assert(good == Seq(1L, 2L, 8L))
    val quar = Versioned.read(spark, q)
      .select($"k", $"_violated").as[(Long, Seq[String])]
      .collect().toMap
    assert(quar(3L).toSet == Set("name_present", "amount_pos"))
    assert(quar(5L) == Seq("amount_pos"))
    assert(quar(7L) == Seq("name_present"))
    // repair + re-admit path: quarantine is a versioned table
    assert(Versioned.currentVersion(spark, q).contains(1L))
  }

  test("Drop with a clean batch publishes everything, writes no quarantine") {
    val t = s"$root/clean"
    val q = s"$root/cleanq"
    val clean = Seq((1L, "a", 1), (2L, "b", 2)).toDF("k", "name", "amount")
    val r = publish(clean, t, rules, Mode.Drop, quarantine = Some(q))
    assert(r.published == 2L && r.quarantined == 0L)
    assert(Versioned.currentVersion(spark, q).isEmpty)
  }

  test("Fail aborts and leaves the target untouched") {
    val t = s"$root/fail"
    Versioned.publish(Seq((0L, "seed", 1)).toDF("k", "name", "amount"), t)
    val e = intercept[IllegalStateException] {
      publish(batch, t, rules, Mode.Fail)
    }
    assert(e.getMessage.contains("amount_pos=2"))
    assert(Versioned.currentVersion(spark, t).contains(1L))
    assert(Versioned.read(spark, t).count() == 1L)
    // a clean batch passes Fail mode
    val ok = publish(Seq((9L, "z", 9)).toDF("k", "name", "amount"),
      t, rules, Mode.Fail)
    assert(ok.version.contains(2L) && ok.published == 1L)
  }

  test("Drop-mode MERGE lands passing rows, quarantines violators") {
    val t = s"$root/dmlmerge"
    val q = s"$root/dmlmergeq"
    Forget.publishIndexed(
      (1L to 6L).map(k => (k, s"n$k", 100)).toDF("k", "name", "amount"),
      t, nFiles = 3, keyCol = "k")
    // k=2 updates clean; k=4 violates amount_pos; k=9 inserts clean
    val changes = Seq((2L, "UPD", 5), (4L, "BAD", -9), (9L, "INS", 1))
      .toDF("k", "name", "amount")
    val r = Expect.merge(spark, t, "k", changes, rules, Mode.Drop,
      quarantine = Some(q))
    assert(r.version.contains(2L))
    assert(r.published == 2L && r.quarantined == 1L)
    val after = Versioned.read(spark, t)
    assert(after.count() == 7L)
    assert(after.filter($"k" === 2L).select($"name").as[String].head()
      == "UPD")
    // the violating update never landed: k=4 keeps its pre-merge row
    assert(after.filter($"k" === 4L).select($"amount").as[Int].head()
      == 100)
    val quar = Versioned.read(spark, q)
    assert(quar.count() == 1L)
    assert(quar.select($"k").as[Long].head() == 4L)
    assert(quar.select($"_violated").as[Seq[String]].head()
      == Seq("amount_pos"))
  }

  test("Fail-mode MERGE aborts with the table untouched; CDC gates audit payload only") {
    val t = s"$root/dmlfail"
    Forget.publishIndexed(
      (1L to 4L).map(k => (k, s"n$k", 100)).toDF("k", "name", "amount"),
      t, nFiles = 2, keyCol = "k")
    val e = intercept[IllegalStateException] {
      Expect.merge(spark, t, "k",
        Seq((1L, "X", -1)).toDF("k", "name", "amount"), rules, Mode.Fail)
    }
    assert(e.getMessage.contains("amount_pos=1"))
    assert(Versioned.currentVersion(spark, t).contains(1L),
      "Fail mode must not publish")

    // CDC: D rows carry NULL payload and must NOT be audited as violations
    val cdc = Seq(
      ("D", 2L, null.asInstanceOf[String], null.asInstanceOf[Integer]),
      ("U", 3L, "U3", Integer.valueOf(7)))
      .toDF("op", "k", "name", "amount")
    val r = Expect.applyCdc(spark, t, "k", cdc, rules, Mode.Fail)
    assert(r.version.contains(2L) && r.published == 1L)
    assert(Versioned.read(spark, t).count() == 3L)

    // Drop-mode CDC where EVERY payload row violates: deletes still apply
    val q = s"$root/dmlfailq"
    val allBad = Seq(
      ("D", 1L, null.asInstanceOf[String], null.asInstanceOf[Integer]),
      ("U", 3L, "neg", Integer.valueOf(-3)))
      .toDF("op", "k", "name", "amount")
    val r2 = Expect.applyCdc(spark, t, "k", allBad, rules, Mode.Drop,
      quarantine = Some(q))
    assert(r2.quarantined == 1L && r2.published == 0L)
    assert(r2.version.contains(3L), "the delete should still merge")
    val live = Versioned.read(spark, t)
    assert(live.filter($"k" === 1L).count() == 0L, "D row applied")
    assert(live.filter($"k" === 3L).select($"amount").as[Int].head() == 7,
      "the violating update must not land")
    assert(Versioned.read(spark, q).select($"k").as[Long].head() == 3L)
  }

  test("the streaming sink quarantines per micro-batch, replay-safe") {
    import graft.streaming.CdcSink
    val t = s"$root/sink"
    val q = s"$root/sinkq"
    Forget.publishIndexed(
      (1L to 4L).map(k => (k, s"n$k", 100)).toDF("k", "name", "amount"),
      t, nFiles = 2, keyCol = "k")
    val b1 = Seq(("U", 1L, "ok", 5), ("I", 10L, "bad", -1))
      .toDF("op", "k", "name", "amount")
    CdcSink.applyBatch(spark, t, "k", b1, batchId = 0L,
      rules = rules, expectMode = Mode.Drop, quarantine = Some(q))
    val live = Versioned.read(spark, t)
    assert(live.count() == 4L, "the violating insert must not land")
    assert(live.filter($"k" === 1L).select($"amount").as[Int].head() == 5)
    assert(Versioned.read(spark, q).count() == 1L)
    // replayed batch (same id): tag-dedup no-ops BOTH the merge and the
    // quarantine — no duplicate quarantine version
    CdcSink.applyBatch(spark, t, "k", b1, batchId = 0L,
      rules = rules, expectMode = Mode.Drop, quarantine = Some(q))
    assert(Versioned.currentVersion(spark, q).contains(1L))
    assert(Versioned.read(spark, t).count() == 4L)
  }
}
