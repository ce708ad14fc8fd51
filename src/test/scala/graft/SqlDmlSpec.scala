package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.lake.{Cdf, Dv, Expect, Forget, Upsert, Versioned}

/**
 * SQL DML surface ([[SqlDml]] / [[Sql.execute]]): statement text routes
 * to the lake's DataFrame DML with IDENTICAL results — a SQL MERGE
 * equals the equivalent [[Upsert.applyCdc]] row-for-row including the
 * change feed and version history; UPDATE/DELETE are read-modify-write
 * and purge; expectations gate the SQL path exactly as the API path;
 * unsupported syntax rejects loudly.
 */
class SqlDmlSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-sqldml").toString

  private def seed(n: Int) =
    (0 until n).map(k => (k.toLong, s"v$k", k.toLong)).toDF("k", "v", "n")

  test("SQL MERGE == Upsert.applyCdc row-for-row, feed and history too") {
    val tA = s"$root/mergeA"
    val tB = s"$root/mergeB"
    Forget.publishIndexed(seed(100), tA, 4, "k", stats = true)
    Forget.publishIndexed(seed(100), tB, 4, "k", stats = true)
    SqlDml.register(spark, "ta", tA, "k")

    Seq(
      (5L, "five!", 500L, false), (10L, "ten!", 1000L, false),
      (200L, "fresh", 2000L, false), (7L, "", 0L, true))
      .toDF("k", "v", "n", "del").createOrReplaceTempView("chg")

    val v = Sql.execute(spark,
      """MERGE INTO ta AS t USING chg AS s ON t.k = s.k
        |WHEN MATCHED AND s.del THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED AND NOT s.del THEN INSERT *""".stripMargin)
    assert(v == 2L)

    // the API twin on tB
    val batch = Seq(
      ("U", 5L, "five!", 500L), ("U", 10L, "ten!", 1000L),
      ("I", 200L, "fresh", 2000L), ("D", 7L, null, 0L))
      .toDF("op", "k", "v", "n")
    assert(Upsert.applyCdc(spark, tB, "k", batch) == 2L)

    val a = Versioned.read(spark, tA).orderBy("k").collect().toSeq
    val b = Versioned.read(spark, tB).orderBy("k").collect().toSeq
    assert(a == b, "SQL MERGE must equal the DataFrame merge row-for-row")
    assert(a.size == 100) // 100 - 1 delete + 1 insert
    // change feed identical (modulo the D row's non-key nulls, which both
    // paths null out)
    val fa = Cdf.changesSince(spark, tA, 1L).orderBy("_op", "k")
      .collect().toSeq
    val fb = Cdf.changesSince(spark, tB, 1L).orderBy("_op", "k")
      .collect().toSeq
    assert(fa == fb, "change feeds must match")
    // the registered view re-bound to the post-DML version
    assert(spark.table("ta").filter($"k" === 7L).isEmpty)
    assert(spark.table("ta").filter($"k" === 200L).count() == 1L)
  }

  test("MERGE with a USING subquery and explicit assignment lists") {
    val t = s"$root/sub"
    Forget.publishIndexed(seed(20), t, 2, "k", stats = true)
    SqlDml.register(spark, "tsub", t, "k")
    Seq((1L, 111L), (2L, 222L), (50L, 555L))
      .toDF("kk", "nn").createOrReplaceTempView("raw")
    val v = Sql.execute(spark,
      """MERGE INTO tsub t
        |USING (SELECT kk, nn FROM raw WHERE nn > 100) AS s
        |ON t.k = s.kk
        |WHEN MATCHED THEN UPDATE SET n = s.nn, v = concat(t.v, '+')
        |WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.kk, 'new', s.nn)
        |""".stripMargin)
    assert(v == 2L)
    val rows = Versioned.read(spark, t)
      .filter($"k".isin(1L, 2L, 50L)).orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    assert(rows == Seq((1L, "v1+", 111L), (2L, "v2+", 222L),
      (50L, "new", 555L)))
    // untouched rows untouched
    assert(Versioned.read(spark, t).filter($"k" === 3L)
      .as[(Long, String, Long)].head() == ((3L, "v3", 3L)))
  }

  test("UPDATE: read-modify-write merge; key assignment rejects") {
    val t = s"$root/upd"
    Forget.publishIndexed(seed(30), t, 2, "k", stats = true)
    SqlDml.register(spark, "tupd", t, "k")
    val v = Sql.execute(spark,
      "UPDATE tupd SET v = concat(v, '!'), n = n + 100 WHERE k < 3")
    assert(v == 2L)
    val rows = Versioned.read(spark, t).filter($"k" < 5L).orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    assert(rows == Seq((0L, "v0!", 100L), (1L, "v1!", 101L),
      (2L, "v2!", 102L), (3L, "v3", 3L), (4L, "v4", 4L)))
    // a no-match predicate publishes nothing
    assert(Sql.execute(spark, "UPDATE tupd SET n = 0 WHERE k > 999") == 2L)
    val e = intercept[IllegalArgumentException] {
      Sql.execute(spark, "UPDATE tupd SET k = 1 WHERE k = 2")
    }
    assert(e.getMessage.contains("key column"))
  }

  test("DELETE: rewriting purge by default, deletion-vector on request") {
    val t = s"$root/del"
    Forget.publishIndexed(seed(40), t, 4, "k", stats = true)
    SqlDml.register(spark, "tdel", t, "k")
    assert(Sql.execute(spark, "DELETE FROM tdel WHERE n >= 38") == 2L)
    assert(Versioned.read(spark, t).count() == 38L)
    assert(!Versioned.isShallowRef(spark, t, 2L), "default purge rewrites")
    // zero-copy arm: a DV version (ref + vector), same visible result
    assert(Sql.execute(spark, "DELETE FROM tdel WHERE k < 2",
      zeroCopyDelete = true) == 3L)
    assert(Versioned.isShallowRef(spark, t, 3L))
    assert(Dv.deletedRows(spark, t, 3L) == 2L)
    assert(Versioned.read(spark, t).count() == 36L)
    assert(spark.table("tdel").count() == 36L) // view re-bound
    // matching nothing is a no-op, not a publish
    assert(Sql.execute(spark, "DELETE FROM tdel WHERE k = 12345") == 3L)
  }

  test("Drop-mode expectations quarantine via the SQL path") {
    val t = s"$root/gate"
    val q = s"$root/gateQ"
    Forget.publishIndexed(seed(10), t, 2, "k", stats = true)
    SqlDml.register(spark, "tgate", t, "k")
    Seq((1L, "ok", 50L), (2L, "bad", -5L), (300L, "ok2", 7L))
      .toDF("k", "v", "n").createOrReplaceTempView("gatesrc")
    val v = Sql.execute(spark,
      """MERGE INTO tgate t USING gatesrc s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      rules = Seq(Expect.Rule("nonneg", "n >= 0")),
      mode = Expect.Mode.Drop, quarantine = Some(q))
    assert(v == 2L)
    val after = Versioned.read(spark, t)
    assert(after.filter($"k" === 1L).select($"n").as[Long].head() == 50L)
    assert(after.filter($"k" === 300L).count() == 1L)
    // the violating row: quarantined with its broken rule, NOT merged
    assert(after.filter($"k" === 2L).select($"v").as[String].head() == "v2")
    val quarantined = Versioned.read(spark, q).collect().toSeq
    assert(quarantined.size == 1 &&
      quarantined.head.getAs[Long]("k") == 2L)
    // Fail mode aborts with the table untouched
    intercept[IllegalStateException] {
      Sql.execute(spark,
        """MERGE INTO tgate t USING gatesrc s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin,
        rules = Seq(Expect.Rule("nonneg", "n >= 0")),
        mode = Expect.Mode.Fail)
    }
    assert(Versioned.currentVersion(spark, t).contains(2L))
  }

  test("unsupported syntax rejects loudly; nothing half-executes") {
    val t = s"$root/rej"
    Forget.publishIndexed(seed(5), t, 1, "k", stats = true)
    SqlDml.register(spark, "trej", t, "k")
    def rejects(sql: String, why: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Sql.execute(spark, sql)
      }
      assert(e.getMessage.toLowerCase.contains(why.toLowerCase),
        s"message for '$sql' was: ${e.getMessage}")
    }
    rejects("TRUNCATE TABLE trej", "statement kind")
    rejects("MERGE INTO trej USING x WHEN MATCHED THEN DELETE", "USING, ON")
    rejects(
      """MERGE INTO trej t USING trej s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET n = 1
        |WHEN MATCHED THEN UPDATE SET n = 2""".stripMargin,
      "at most one")
    rejects(
      """MERGE INTO trej t USING trej s ON t.k = s.k
        |WHEN MATCHED THEN UPSERT""".stripMargin, "unsupported WHEN action")
    rejects(
      """MERGE INTO trej t USING trej s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET k = 99""".stripMargin, "key column")
    rejects("DESCRIBE HISTORY trej", "Sql.describe")
    rejects("DELETE FROM nowhere WHERE k = 1", "not a registered")
    rejects("UPDATE trej SET WHERE k = 1", "assignment")
    // and every version is still the seed — nothing half-executed
    assert(Versioned.currentVersion(spark, t).contains(1L))
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: sync-to-source and flagging") {
    val t = s"$root/bysrc"
    Forget.publishIndexed(seed(10), t, 2, "k", stats = true)
    SqlDml.register(spark, "tsync", t, "k")

    // full sync: target becomes exactly the source (update / insert /
    // delete-the-rest) — the replication shape BY SOURCE exists for
    Seq((3L, "s3", 30L), (7L, "s7", 70L), (99L, "s99", 990L))
      .toDF("k", "v", "n").createOrReplaceTempView("sync_src")
    val v = Sql.execute(spark,
      """MERGE INTO tsync t USING sync_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED BY TARGET THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(v == 2L)
    val got = Versioned.read(spark, t).as[(Long, String, Long)]
      .collect().toSet
    assert(got == Set((3L, "s3", 30L), (7L, "s7", 70L), (99L, "s99", 990L)))

    // conditional BY SOURCE UPDATE: flag (don't delete) the unmatched
    val t2 = s"$root/bysrc2"
    Forget.publishIndexed(seed(6), t2, 2, "k", stats = true)
    SqlDml.register(spark, "tflag", t2, "k")
    Seq((1L, "x", 0L), (2L, "x", 0L)).toDF("k", "v", "n")
      .createOrReplaceTempView("flag_src")
    Sql.execute(spark,
      """MERGE INTO tflag t USING flag_src s ON t.k = s.k
        |WHEN NOT MATCHED BY SOURCE AND t.k >= 4 THEN UPDATE SET v = 'stale'
        |""".stripMargin)
    val flags = Versioned.read(spark, t2).as[(Long, String, Long)]
      .collect().map { case (k, vv, n) => k -> ((vv, n)) }.toMap
    assert(flags(4L)._1 == "stale" && flags(5L)._1 == "stale")
    assert(flags(0L)._1 == "v0" && flags(3L)._1 == "v3") // under the cond
    assert(flags(1L)._1 == "v1") // matched rows untouched (no MATCHED arm)

    // SET * is undefined without a source row
    val e = intercept[IllegalArgumentException](Sql.execute(spark,
      """MERGE INTO tflag t USING flag_src s ON t.k = s.k
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *""".stripMargin))
    assert(e.getMessage.contains("no source row"))
  }

  test("INSERT INTO: VALUES and subquery forms append; live keys reject") {
    val t = s"$root/ins"
    Forget.publishIndexed(seed(20), t, 2, "k", stats = true)
    SqlDml.register(spark, "tins", t, "k")

    // VALUES form, full column list implied
    val v2 = Sql.execute(spark,
      "INSERT INTO tins VALUES (100, 'hundred', 1), (101, 'hundred-one', 2)")
    assert(v2 == 2L)
    assert(spark.table("tins").count() == 22)

    // explicit column list: omitted columns read NULL
    Sql.execute(spark, "INSERT INTO tins (k, v) VALUES (102, 'no-n')")
    val r = spark.sql("SELECT n FROM tins WHERE k = 102").head()
    assert(r.isNullAt(0))

    // subquery form
    Seq((200L, "sub-200", 9L)).toDF("k", "v", "n")
      .createOrReplaceTempView("ins_src")
    Sql.execute(spark, "INSERT INTO tins SELECT k, v, n FROM ins_src")
    assert(spark.sql("SELECT v FROM tins WHERE k = 200").head()
      .getString(0) == "sub-200")

    // a live key rejects loudly — this surface never guesses
    // insert-or-update
    val e = intercept[IllegalArgumentException](
      Sql.execute(spark, "INSERT INTO tins VALUES (5, 'dup', 0)"))
    assert(e.getMessage.contains("already exist"))
    // key column must be present in an explicit list
    val e2 = intercept[IllegalArgumentException](
      Sql.execute(spark, "INSERT INTO tins (v, n) VALUES ('x', 1)"))
    assert(e2.getMessage.contains("key column"))
  }

  test("utility statements: RESTORE / VACUUM / OPTIMIZE / DESCRIBE " +
      "HISTORY route to the lake maintenance API") {
    val t = s"$root/util"
    Forget.publishIndexed(seed(50), t, 4, "k", stats = true)
    SqlDml.register(spark, "tutil", t, "k")
    Sql.execute(spark, "UPDATE tutil SET v = 'bad-load' WHERE k < 10") // v2
    Sql.execute(spark, "DELETE FROM tutil WHERE k = 49")               // v3

    // RESTORE publishes a zero-copy version with v1's exact content
    // and re-binds the registered view
    val v4 = Sql.execute(spark, "RESTORE TABLE tutil TO VERSION AS OF 1")
    assert(v4 == 4L)
    assert(Versioned.isShallowRef(spark, t, 4L))
    assert(spark.table("tutil").count() == 50)
    assert(spark.sql("SELECT v FROM tutil WHERE k = 3").head().getString(0)
      == "v3")

    // DESCRIBE HISTORY: one row per version, operations derived from
    // the commit markers
    val h = Sql.describe(spark, "DESCRIBE HISTORY tutil")
      .orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(h.map(_.getString(2)).toSeq ==
      Seq("publish", "dml", "dml", "restore"))
    assert(h.forall(r => !r.isNullAt(1))) // every commit carries its ts
    assert(h(3).getBoolean(3)) // the restore is zero-copy

    // DESCRIBE DETAIL: one row of table-level facts (live = the ref)
    val det = Sql.describe(spark, "DESCRIBE DETAIL tutil").head()
    assert(det.getString(0) == t)
    assert(det.getLong(1) == 4L) // live_version
    assert(det.getLong(3) == 4L) // num_versions
    assert(det.getBoolean(6)) // the restore ref is zero-copy
    assert(det.getLong(4) > 0L && det.getLong(5) > 0L) // files + bytes

    // OPTIMIZE materializes the ref and compacts — file-targeted DML
    // works again afterwards
    Sql.execute(spark, "OPTIMIZE tutil")
    val live = Versioned.currentVersion(spark, t).get
    assert(!Versioned.isShallowRef(spark, t, live))
    Sql.execute(spark, "UPDATE tutil SET v = 'post' WHERE k = 0")

    // VACUUM RETAIN 1 VERSIONS keeps live + 1 (and anything pinned)
    Sql.execute(spark, "VACUUM tutil RETAIN 1 VERSIONS")
    val left = Versioned.versions(spark, t)
    assert(left.size <= 3 && left.contains(live + 1))
    // the table still reads its full restored-then-updated content
    assert(spark.sql("SELECT count(*) FROM tutil").head().getLong(0) == 50)

    rejectsUtil("RESTORE tutil VERSION 1")
    rejectsUtil("VACUUM tutil RETAIN x VERSIONS")
    rejectsUtil("OPTIMIZE tutil FULL")
    rejectsUtil("DESCRIBE HISTORY") // missing table
  }

  test("inline time travel: VERSION/TIMESTAMP AS OF in statement text") {
    val t = s"$root/tt"
    Forget.publishIndexed(seed(10), t, 2, "k", stats = true)
    SqlDml.register(spark, "ttt", t, "k")
    Sql.execute(spark, "UPDATE ttt SET v = 'new' WHERE k = 1") // v2

    assert(Sql.sql(spark,
      "SELECT v FROM ttt VERSION AS OF 1 WHERE k = 1").head().getString(0)
      == "v1")
    assert(spark.sql("SELECT v FROM ttt WHERE k = 1").head().getString(0)
      == "new")
    // live vs historical in ONE statement (the audit-diff shape)
    val changed = Sql.sql(spark,
      """SELECT count(*) AS c FROM ttt a
        |JOIN ttt VERSION AS OF 1 b ON a.k = b.k
        |WHERE a.v <> b.v""".stripMargin).head().getLong(0)
    assert(changed == 1L)
    // timestamp form resolves through Versioned.versionAsOf
    val ts = new java.sql.Timestamp(System.currentTimeMillis() + 3600000L)
    assert(Sql.sql(spark,
      s"SELECT v FROM ttt TIMESTAMP AS OF '$ts' WHERE k = 1")
      .head().getString(0) == "new")
    // a travel clause on an unregistered name rejects loudly
    intercept[IllegalArgumentException](
      Sql.sql(spark, "SELECT * FROM nope VERSION AS OF 1"))

    // repair-from-history: a MERGE whose USING subquery reads a
    // historical snapshot (selective row-level restore)
    Sql.execute(spark,
      """MERGE INTO ttt t
        |USING (SELECT k, v, n FROM ttt VERSION AS OF 1 WHERE k = 1) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(spark.sql("SELECT v FROM ttt WHERE k = 1").head().getString(0)
      == "v1")
  }

  private def rejectsUtil(sql: String): Unit = {
    val e = intercept[IllegalArgumentException] {
      if (sql.toUpperCase.startsWith("DESCRIBE")) Sql.describe(spark, sql)
      else Sql.execute(spark, sql)
    }
    assert(e.getMessage.contains("unsupported SQL DML") ||
      e.getMessage.contains("not a registered"), e.getMessage)
  }

  test("statements on a zero-copy (shallow-ref) base auto-route through " +
      "the Dv family — no materialize needed, base files untouched") {
    val t = s"$root/zc_route"
    Forget.publishIndexed(seed(50), t, 4, "k", stats = true)
    SqlDml.register(spark, "zcr", t, "k")
    // make the live version a ref: a zero-copy DELETE
    Sql.execute(spark, "DELETE FROM zcr WHERE k = 49", zeroCopyDelete = true)
    assert(Versioned.isShallowRef(spark, t,
      Versioned.currentVersion(spark, t).get))
    def baseParts = Option(new java.io.File(s"$t/v=1").listFiles())
      .map(_.count(f => f.isFile && f.getName.startsWith("part-")))
      .getOrElse(0)
    val nBase = baseParts

    // UPDATE on the ref base: works, stays zero-copy
    Sql.execute(spark, "UPDATE zcr SET v = 'upd' WHERE k = 1")
    assert(spark.sql("SELECT v FROM zcr WHERE k = 1").head().getString(0)
      == "upd")
    // INSERT on the ref base: works; live-key guard still enforced
    Sql.execute(spark, "INSERT INTO zcr VALUES (500, 'new', 5)")
    val dup = intercept[Exception] {
      Sql.execute(spark, "INSERT INTO zcr VALUES (500, 'again', 5)")
    }
    assert(dup.getMessage.contains("already exist"))
    // MERGE on the ref base: works
    Seq((2L, "merged", 20L)).toDF("k", "v", "n")
      .createOrReplaceTempView("zcr_chg")
    Sql.execute(spark,
      """MERGE INTO zcr AS t USING zcr_chg AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT v FROM zcr WHERE k = 2").head().getString(0)
      == "merged")
    // DELETE auto-routes zero-copy on a ref base even without the flag
    Sql.execute(spark, "DELETE FROM zcr WHERE k = 3")
    assert(spark.sql("SELECT count(*) FROM zcr WHERE k = 3").head()
      .getLong(0) == 0L)
    // every statement above was zero-copy: still a ref, base untouched
    assert(Versioned.isShallowRef(spark, t,
      Versioned.currentVersion(spark, t).get))
    assert(baseParts == nBase)
    assert(spark.sql("SELECT count(*) FROM zcr").head().getLong(0) == 49L)
  }
}
