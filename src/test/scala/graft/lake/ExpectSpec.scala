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
}
