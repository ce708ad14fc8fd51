package graft

import java.nio.file.Files

import graft.lake.{Forget, Versioned}

/**
 * SQL transaction blocks ([[Sql.executeScript]] `BEGIN ... COMMIT /
 * ROLLBACK`): statements across SEVERAL lake tables flip atomically at
 * the COMMIT; a failure inside the block aborts every half-done version
 * and the tables read exactly as before the BEGIN; ROLLBACK executes
 * then discards; nested/unclosed blocks and VACUUM-in-block reject; and
 * view bindings heal after an abort.
 */
class SqlTxnSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-sqltxn").toString

  private def seed(n: Int) =
    (0 until n).map(k => (k.toLong, s"v$k", k.toLong)).toDF("k", "v", "n")

  test("BEGIN...COMMIT: two tables flip atomically at the COMMIT") {
    val tA = s"$root/txA"; val tB = s"$root/txB"
    Forget.publishIndexed(seed(10), tA, 2, "k", stats = true)
    Forget.publishIndexed(seed(10), tB, 2, "k", stats = true)
    SqlDml.register(spark, "txa", tA, "k")
    SqlDml.register(spark, "txb", tB, "k")
    val vs = Sql.executeScript(spark,
      """-- the classic double-entry shape: both sides or neither
        |BEGIN TRANSACTION;
        |UPDATE txa SET n = 999 WHERE k = 1;
        |DELETE FROM txb WHERE k = 1;
        |COMMIT;
        |INSERT INTO txa VALUES (100, 'after', 1)""".stripMargin)
    assert(vs == Seq(2L, 2L, 3L)) // two txn'd v2s, then a plain v3
    assert(Versioned.currentVersion(spark, tA).contains(3L))
    assert(Versioned.currentVersion(spark, tB).contains(2L))
    assert(spark.sql("SELECT n FROM txa WHERE k = 1").head().getLong(0)
      == 999L)
    assert(spark.sql("SELECT count(*) FROM txb WHERE k = 1").head()
      .getLong(0) == 0L)
    // both tables' histories carry the txn'd version as plain dml
    assert(Sql.describe(spark, "DESCRIBE HISTORY txa").count() == 3L)
  }

  test("failure inside the block aborts BOTH tables' half-done versions") {
    val tA = s"$root/failA"; val tB = s"$root/failB"
    Forget.publishIndexed(seed(10), tA, 2, "k", stats = true)
    Forget.publishIndexed(seed(10), tB, 2, "k", stats = true)
    SqlDml.register(spark, "fla", tA, "k")
    SqlDml.register(spark, "flb", tB, "k")
    val e = intercept[Exception] {
      Sql.executeScript(spark,
        """BEGIN;
          |UPDATE fla SET n = 1000 WHERE k = 2;
          |DELETE FROM flb WHERE k = 2;
          |FROBNICATE flb;
          |COMMIT""".stripMargin)
    }
    assert(e.getMessage.contains("FROBNICATE"))
    Seq(tA, tB).foreach { t =>
      assert(Versioned.currentVersion(spark, t).contains(1L),
        s"half-done txn version leaked at $t")
    }
    // the session's views survived the abort (rebound to live)
    assert(spark.sql("SELECT n FROM fla WHERE k = 2").head().getLong(0)
      == 2L)
    assert(spark.sql("SELECT count(*) FROM flb WHERE k = 2").head()
      .getLong(0) == 1L)
  }

  test("ROLLBACK executes under the gates, then discards") {
    val t = s"$root/rollback"
    Forget.publishIndexed(seed(5), t, 2, "k", stats = true)
    SqlDml.register(spark, "rb", t, "k")
    val vs = Sql.executeScript(spark,
      """BEGIN;
        |UPDATE rb SET v = 'discarded' WHERE k = 1;
        |ROLLBACK;
        |UPDATE rb SET v = 'kept' WHERE k = 2""".stripMargin)
    assert(vs == Seq(2L)) // only the post-block statement contributes
    assert(Versioned.currentVersion(spark, t).contains(2L))
    assert(spark.sql("SELECT v FROM rb WHERE k = 1").head().getString(0)
      == "v1")
    assert(spark.sql("SELECT v FROM rb WHERE k = 2").head().getString(0)
      == "kept")
  }

  test("COMMIT TRANSACTION / ROLLBACK WORK closers are accepted") {
    val t = s"$root/closers"
    Forget.publishIndexed(seed(5), t, 2, "k", stats = true)
    SqlDml.register(spark, "cl", t, "k")
    val vs = Sql.executeScript(spark,
      """BEGIN TRANSACTION;
        |UPDATE cl SET v = 'committed' WHERE k = 1;
        |COMMIT TRANSACTION;
        |BEGIN;
        |UPDATE cl SET v = 'discarded' WHERE k = 2;
        |ROLLBACK WORK""".stripMargin)
    assert(vs == Seq(2L))
    assert(spark.sql("SELECT v FROM cl WHERE k = 1").head().getString(0)
      == "committed")
    assert(spark.sql("SELECT v FROM cl WHERE k = 2").head().getString(0)
      == "v2")
  }

  test("unversioned-side-effect statements reject inside a block") {
    val t = s"$root/sidefx"
    Forget.publishIndexed(seed(3), t, 1, "k", stats = true)
    SqlDml.register(spark, "sfx", t, "k")
    val cons = intercept[IllegalArgumentException] {
      Sql.executeScript(spark,
        "BEGIN; ALTER TABLE sfx ADD CONSTRAINT c CHECK (n > 0); COMMIT")
    }
    assert(cons.getMessage.contains("constraint DDL inside BEGIN"))
    val copy = intercept[IllegalArgumentException] {
      Sql.executeScript(spark,
        "BEGIN; COPY INTO sfx FROM '/tmp/nowhere'; COMMIT")
    }
    assert(copy.getMessage.contains("COPY INTO inside BEGIN"))
    val clone = intercept[IllegalArgumentException] {
      Sql.executeScript(spark,
        s"BEGIN; CREATE TABLE c2 SHALLOW CLONE sfx LOCATION '$root/c2'; " +
          "COMMIT")
    }
    assert(clone.getMessage.contains("SHALLOW CLONE inside BEGIN"))
    // restatements clear the unversioned COPY INTO ledger — an abort
    // cannot restore it, so both forms reject inside a block
    val corTbl = intercept[IllegalArgumentException] {
      Sql.executeScript(spark,
        s"BEGIN; CREATE OR REPLACE TABLE sfx KEY k LOCATION '$t' AS " +
          "SELECT 1 AS k; COMMIT")
    }
    assert(corTbl.getMessage.contains("CREATE OR REPLACE TABLE inside BEGIN"))
    val iow = intercept[IllegalArgumentException] {
      Sql.executeScript(spark,
        "BEGIN; INSERT OVERWRITE sfx VALUES (1, 'a', 1); COMMIT")
    }
    assert(iow.getMessage.contains("INSERT OVERWRITE inside BEGIN"))
    // DROP (session unbind + durable catalog removal), ANALYZE (stats
    // sidecar) and USE CATALOG (session re-bind) are likewise
    // un-rollbackable
    val drop = intercept[IllegalArgumentException] {
      Sql.executeScript(spark, "BEGIN; DROP TABLE sfx; COMMIT")
    }
    assert(drop.getMessage.contains("DROP inside BEGIN"))
    val ana = intercept[IllegalArgumentException] {
      Sql.executeScript(spark,
        "BEGIN; ANALYZE TABLE sfx COMPUTE STATISTICS; COMMIT")
    }
    assert(ana.getMessage.contains("ANALYZE TABLE inside BEGIN"))
    val usec = intercept[IllegalArgumentException] {
      Sql.executeScript(spark, "BEGIN; USE CATALOG '/tmp/nowhere'; COMMIT")
    }
    assert(usec.getMessage.contains("USE CATALOG inside BEGIN"))
    // nothing half-ran (and sfx stays registered — the DROP rejected)
    assert(Versioned.currentVersion(spark, t).contains(1L))
    assert(spark.sql("SELECT count(*) FROM sfx").head().getLong(0) == 3L)
  }

  test("a plain CREATE TABLE inside an aborted block leaves no binding") {
    val t = s"$root/ctasheal"
    Forget.publishIndexed(seed(4), t, 1, "k", stats = true)
    SqlDml.register(spark, "cth", t, "k")
    intercept[Exception] {
      Sql.executeScript(spark,
        s"""BEGIN;
           |CREATE TABLE cth_dead KEY k LOCATION '$root/cth_dead' AS
           |SELECT k, v, n FROM cth;
           |FROBNICATE cth;
           |COMMIT""".stripMargin)
    }
    // the aborted CTAS's path has no published version — the registry
    // entry and temp view must be gone, not bound to vanished files
    assert(Versioned.currentVersion(spark, s"$root/cth_dead").isEmpty)
    val gone = intercept[IllegalArgumentException] {
      Sql.execute(spark, "UPDATE cth_dead SET v = 'x' WHERE k = 1")
    }
    assert(gone.getMessage.contains("not a registered lake table"))
    assert(!spark.catalog.tableExists("cth_dead"))
  }

  test("CREATE / REFRESH MATERIALIZED VIEW; MERGE+REFRESH flip " +
      "together inside a block") {
    val t = s"$root/mvsrc"
    (0 until 20).map(k => (k.toLong, s"c${k % 3}", k.toLong))
      .toDF("k", "color", "amt")
      .write.mode("overwrite").parquet(s"$root/mvseed")
    Forget.publishIndexed(
      spark.read.parquet(s"$root/mvseed"), t, 2, "k", stats = true)
    SqlDml.register(spark, "mvs", t, "k")
    val v1 = Sql.execute(spark,
      s"""CREATE MATERIALIZED VIEW mv_amt LOCATION '$root/mv' AS
         |SELECT color, count(*), sum(amt), min(amt), max(amt)
         |FROM mvs GROUP BY color""".stripMargin)
    assert(v1 == 1L)
    val c0 = spark.sql(
      "SELECT n_rows, sum_amt, min_amt, max_amt FROM mv_amt " +
        "WHERE color = 'c0'").head()
    assert(c0.getLong(0) == 7L) // k = 0,3,...,18
    assert(c0.getDecimal(1).longValueExact() == 63L)
    // atomically: restate a row AND bring the view current in ONE flip
    val vs = Sql.executeScript(spark,
      """BEGIN;
        |UPDATE mvs SET amt = 1000 WHERE k = 0;
        |REFRESH MATERIALIZED VIEW mv_amt;
        |COMMIT""".stripMargin)
    assert(vs.length == 2)
    val c0b = spark.sql(
      "SELECT sum_amt, max_amt FROM mv_amt WHERE color = 'c0'").head()
    assert(c0b.getDecimal(0).longValueExact() == 1063L)
    assert(c0b.getLong(1) == 1000L)
    // guards: aliases and non-algebra aggregates reject
    val alias = intercept[IllegalArgumentException] {
      Sql.execute(spark,
        s"CREATE MATERIALIZED VIEW mv2 LOCATION '$root/mv2' AS " +
          "SELECT color, sum(amt) AS total FROM mvs GROUP BY color")
    }
    assert(alias.getMessage.contains("alias"))
    val avg = intercept[IllegalArgumentException] {
      Sql.execute(spark,
        s"CREATE MATERIALIZED VIEW mv3 LOCATION '$root/mv3' AS " +
          "SELECT color, avg(amt) FROM mvs GROUP BY color")
    }
    assert(avg.getMessage.contains("self-maintainable"))
    val unreg = intercept[IllegalArgumentException] {
      Sql.execute(spark, "REFRESH MATERIALIZED VIEW nope")
    }
    assert(unreg.getMessage.contains("not a registered materialized view"))
  }

  test("an aborted block heals MATERIALIZED VIEW bindings too") {
    val t = s"$root/mvheal"
    (0 until 12).map(k => (k.toLong, s"c${k % 2}", k.toLong))
      .toDF("k", "color", "amt")
      .write.mode("overwrite").parquet(s"$root/mvhealseed")
    Forget.publishIndexed(
      spark.read.parquet(s"$root/mvhealseed"), t, 2, "k", stats = true)
    SqlDml.register(spark, "mvh", t, "k")
    Sql.execute(spark,
      s"CREATE MATERIALIZED VIEW mvh_view LOCATION '$root/mvh_v' AS " +
        "SELECT color, count(*), sum(amt) FROM mvh GROUP BY color")
    // a block that REFRESHes the view, then fails: the view's pending
    // version aborts and its binding must re-point at the live one
    intercept[Exception] {
      Sql.executeScript(spark,
        """BEGIN;
          |UPDATE mvh SET amt = 500 WHERE k = 0;
          |REFRESH MATERIALIZED VIEW mvh_view;
          |FROBNICATE mvh;
          |COMMIT""".stripMargin)
    }
    assert(Versioned.currentVersion(spark, s"$root/mvh_v").contains(1L))
    // the session keeps reading BOTH views at the pre-block state
    assert(spark.sql(
      "SELECT sum_amt FROM mvh_view WHERE color = 'c0'").head()
      .getDecimal(0).longValueExact() == 30L) // 0+2+...+10
    assert(spark.sql("SELECT amt FROM mvh WHERE k = 0").head()
      .getLong(0) == 0L)
    // a CREATE inside an aborted block leaves no dangling binding
    intercept[Exception] {
      Sql.executeScript(spark,
        s"""BEGIN;
           |CREATE MATERIALIZED VIEW mvh_dead LOCATION '$root/mvh_d' AS
           |SELECT color, count(*) FROM mvh GROUP BY color;
           |FROBNICATE mvh;
           |COMMIT""".stripMargin)
    }
    val gone = intercept[IllegalArgumentException] {
      Sql.execute(spark, "REFRESH MATERIALIZED VIEW mvh_dead")
    }
    assert(gone.getMessage.contains("not a registered materialized view"))
    assert(!spark.catalog.tableExists("mvh_dead"))
  }

  test("registerSnapshot pins a consistent cut across tables") {
    val a = s"$root/snap-a"; val b = s"$root/snap-b"
    Forget.publishIndexed(seed(5), a, 1, "k", stats = true)
    Forget.publishIndexed(seed(5), b, 1, "k", stats = true)
    SqlDml.register(spark, "sna", a, "k")
    SqlDml.register(spark, "snb", b, "k")
    // move both tables together through a txn
    Sql.executeScript(spark,
      """BEGIN;
        |UPDATE sna SET n = 100 WHERE k = 1;
        |UPDATE snb SET n = 200 WHERE k = 1;
        |COMMIT""".stripMargin)
    val pins = Sql.registerSnapshot(spark, Seq("sna", "snb"))
    assert(pins == Map("sna" -> 2L, "snb" -> 2L))
    // a pending txn does not tear the snapshot: pin DURING a txn held
    // open by another thread sees the pre-txn cut on BOTH tables
    val hold = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(1)
    @volatile var bothMerged = false
    val writer = new Thread(() => {
      val ctx = graft.lake.Txn.begin(spark)
      try {
        graft.lake.Upsert.merge(spark, a, "k",
          Seq((2L, "x", 9L)).toDF("k", "v", "n"))
        graft.lake.Upsert.merge(spark, b, "k",
          Seq((2L, "x", 9L)).toDF("k", "v", "n"))
        bothMerged = true
      } finally {
        // countDown in the finally: a merge failure must FAIL the test,
        // never wedge the main thread on hold.await(); and only a fully
        // staged pair may flip — a half-staged ctx aborts
        hold.countDown()
        done.await()
        if (bothMerged) graft.lake.Txn.flip(ctx)
        else graft.lake.Txn.abort(ctx)
        graft.lake.Txn.detach()
      }
    })
    writer.start()
    hold.await()
    try {
      val mid = Sql.registerSnapshot(spark, Seq("sna", "snb"))
      assert(mid == Map("sna" -> 2L, "snb" -> 2L),
        s"snapshot tore mid-txn: $mid")
    } finally { done.countDown(); writer.join() }
    assert(bothMerged, "writer thread failed to stage both merges")
    val after = Sql.registerSnapshot(spark, Seq("sna", "snb"))
    assert(after == Map("sna" -> 3L, "snb" -> 3L))
  }

  test("atomic multi-table point-in-time RESTORE via a BEGIN block") {
    val a = s"$root/rst-a"; val b = s"$root/rst-b"
    Forget.publishIndexed(seed(5), a, 1, "k", stats = true)
    Forget.publishIndexed(seed(5), b, 1, "k", stats = true)
    SqlDml.register(spark, "rsta", a, "k")
    SqlDml.register(spark, "rstb", b, "k")
    // move both tables together twice, then rewind BOTH to the first cut
    Sql.executeScript(spark,
      """BEGIN; UPDATE rsta SET n = 1 WHERE k = 0;
        |UPDATE rstb SET n = 1 WHERE k = 0; COMMIT;
        |BEGIN; UPDATE rsta SET n = 2 WHERE k = 0;
        |UPDATE rstb SET n = 2 WHERE k = 0; COMMIT""".stripMargin)
    assert(Versioned.currentVersion(spark, a).contains(3L))
    // the rewind is itself one atomic flip: no reader ever sees table a
    // restored while b still shows the later state
    val vs = Sql.executeScript(spark,
      """BEGIN;
        |RESTORE TABLE rsta TO VERSION AS OF 2;
        |RESTORE TABLE rstb TO VERSION AS OF 2;
        |COMMIT""".stripMargin)
    assert(vs == Seq(4L, 4L))
    Seq("rsta", "rstb").foreach { n =>
      assert(spark.sql(s"SELECT n FROM $n WHERE k = 0").head()
        .getLong(0) == 1L, s"$n not at the v2 cut")
    }
    // history preserved on both (zero-copy rewind, not a rollback)
    assert(Sql.describe(spark, "DESCRIBE HISTORY rsta").count() == 4L)
  }

  test("nested BEGIN, unclosed block, and VACUUM-in-block reject") {
    val t = s"$root/guards"
    Forget.publishIndexed(seed(3), t, 1, "k", stats = true)
    SqlDml.register(spark, "gd", t, "k")
    val nested = intercept[IllegalArgumentException] {
      Sql.executeScript(spark, "BEGIN; BEGIN; COMMIT; COMMIT")
    }
    assert(nested.getMessage.contains("nested BEGIN"))
    val open = intercept[IllegalArgumentException] {
      Sql.executeScript(spark,
        "BEGIN; UPDATE gd SET v = 'x' WHERE k = 1")
    }
    assert(open.getMessage.contains("open BEGIN block"))
    assert(spark.sql("SELECT v FROM gd WHERE k = 1").head().getString(0)
      == "v1") // nothing from the open block applied
    val vac = intercept[IllegalArgumentException] {
      Sql.executeScript(spark, "BEGIN; VACUUM gd; COMMIT")
    }
    assert(vac.getMessage.contains("VACUUM inside BEGIN"))
    // the API-level guards hold too
    val m = intercept[IllegalArgumentException] {
      graft.lake.Txn.atomically(spark) {
        Versioned.vacuum(spark, t)
      }
    }
    assert(m.getMessage.contains("maintenance outside the txn"))
  }
}
