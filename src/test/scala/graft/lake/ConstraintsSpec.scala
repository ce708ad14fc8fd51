package graft.lake

import java.nio.file.Files

import graft.{Sql, SqlDml, SparkSpec}

/**
 * Persistent table CHECK constraints ([[Constraints]]): registered once,
 * enforced by every row-adding write path — DataFrame API and SQL DML
 * alike — with Fail semantics (statement aborts, table untouched). ADD
 * validates existing rows; deletes and layout maintenance are exempt;
 * NULL predicate results violate.
 */
class ConstraintsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root =
    Files.createTempDirectory("graft-constraints").toString

  private def mk(name: String): String = {
    val t = s"$root/$name"
    Forget.publishIndexed(
      (0L until 100L).map(k => (k, s"v$k", k % 10)).toDF("k", "v", "n"),
      t, nFiles = 2, keyCol = "k")
    t
  }

  test("violating writes abort on every path; passing writes proceed") {
    val t = mk("gate")
    Constraints.add(spark, t, "n_bounded", "n >= 0 AND n < 10")
    Constraints.add(spark, t, "v_present", "v IS NOT NULL")

    // merge: violating batch aborts BEFORE any version claim
    val e1 = intercept[IllegalStateException](
      Upsert.merge(spark, t, "k", Seq((5L, "x", 99L)).toDF("k", "v", "n")))
    assert(e1.getMessage.contains("n_bounded"))
    assert(Versioned.currentVersion(spark, t).contains(1L)) // untouched

    // NULL predicate result = violation
    val e2 = intercept[IllegalStateException](
      Upsert.merge(spark, t, "k",
        Seq((5L, null.asInstanceOf[String], 1L)).toDF("k", "v", "n")))
    assert(e2.getMessage.contains("v_present"))

    // applyCdc: upserts gated, deletes exempt
    intercept[IllegalStateException](
      Upsert.applyCdc(spark, t, "k",
        Seq(("U", 5L, "x", 42L)).toDF("op", "k", "v", "n")))
    assert(Upsert.applyCdc(spark, t, "k",
      Seq(("D", 7L, null, 0L)).toDF("op", "k", "v", "n")) == 2L)

    // zero-copy paths gated too
    intercept[IllegalStateException](
      Dv.merge(spark, t, "k", Seq((8L, "x", -1L)).toDF("k", "v", "n")))
    intercept[IllegalStateException](
      Dv.applyCdc(spark, t, "k",
        Seq(("I", 500L, "x", 77L)).toDF("op", "k", "v", "n")))

    // full publish gated
    intercept[IllegalStateException](
      Versioned.publish(Seq((1L, "x", 11L)).toDF("k", "v", "n"), t))

    // passing writes proceed
    assert(Upsert.merge(spark, t, "k",
      Seq((5L, "ok", 3L)).toDF("k", "v", "n")) == 3L)
  }

  test("ADD validates existing rows; DROP re-opens; list round-trips") {
    val t = mk("add")
    val e = intercept[IllegalArgumentException](
      Constraints.add(spark, t, "impossible", "n > 5"))
    assert(e.getMessage.contains("existing row(s) violate"))
    assert(Constraints.list(spark, t).isEmpty) // nothing registered

    Constraints.add(spark, t, "n_small", "n < 10")
    assert(Constraints.list(spark, t).map(_.name) == Seq("n_small"))
    val e2 = intercept[IllegalArgumentException](
      Constraints.add(spark, t, "n_small", "n < 99"))
    assert(e2.getMessage.contains("already exists"))

    intercept[IllegalStateException](
      Upsert.merge(spark, t, "k", Seq((1L, "x", 50L)).toDF("k", "v", "n")))
    assert(Constraints.drop(spark, t, "n_small"))
    assert(!Constraints.drop(spark, t, "n_small")) // idempotent report
    Upsert.merge(spark, t, "k", Seq((1L, "x", 50L)).toDF("k", "v", "n"))
    assert(Constraints.validate(spark, t).isEmpty) // no rules left
  }

  test("SQL surface: ALTER TABLE ADD/DROP CONSTRAINT; DML statements " +
      "gated") {
    val t = mk("sql")
    SqlDml.register(spark, "tcons", t, "k")
    Sql.execute(spark,
      "ALTER TABLE tcons ADD CONSTRAINT n_bounded CHECK (n >= 0 AND n < 10)")

    val e = intercept[IllegalStateException](Sql.execute(spark,
      "INSERT INTO tcons VALUES (500, 'x', 42)"))
    assert(e.getMessage.contains("n_bounded"))
    val e2 = intercept[IllegalStateException](Sql.execute(spark,
      "UPDATE tcons SET n = 99 WHERE k = 1"))
    assert(e2.getMessage.contains("n_bounded"))
    assert(Versioned.currentVersion(spark, t).contains(1L))

    // a passing UPDATE proceeds; then DROP CONSTRAINT re-opens the gate
    Sql.execute(spark, "UPDATE tcons SET n = 9 WHERE k = 1")
    Sql.execute(spark, "ALTER TABLE tcons DROP CONSTRAINT n_bounded")
    Sql.execute(spark, "UPDATE tcons SET n = 99 WHERE k = 1")
    assert(spark.sql("SELECT n FROM tcons WHERE k = 1").head().getLong(0)
      == 99L)

    // unknown constraint and malformed forms reject loudly
    intercept[IllegalArgumentException](Sql.execute(spark,
      "ALTER TABLE tcons DROP CONSTRAINT nope"))
    intercept[IllegalArgumentException](Sql.execute(spark,
      "ALTER TABLE tcons ADD CHECK (n > 0)"))
  }
}
