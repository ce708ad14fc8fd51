package graft.lake

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.{SparkSpec, Sql, SqlDml}

/**
 * Durable catalog ([[Metastore]] + `SqlDml.useCatalog`): a FRESH session
 * discovers tables and materialized views by name, runs DML against
 * them, and refreshes views; DROP removes the durable entry; concurrent
 * registration of one name is claim-safe (exactly one winner); and an
 * aborted txn block's CREATE leaves no durable entry behind.
 */
class MetastoreSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-meta").toString

  private def freshSession(): Unit = SqlDml.resetSessionBindings(spark)

  // the registries are JVM-global and other suites in this forked JVM
  // assert over SHOW TABLES — leave no binding (in particular the
  // versionless 'boot' bootstrap entry) behind
  override protected def afterAll(): Unit = {
    freshSession()
    super.afterAll()
  }

  test("a fresh session discovers tables + MVs by name and runs DML") {
    val cat = s"$root/cat1"
    SqlDml.useCatalog(spark, cat)
    Sql.executeScript(spark,
      s"""CREATE TABLE mtab KEY k LOCATION '$root/mtab' AS
         |  SELECT CAST(id AS BIGINT) AS k, CAST(id % 3 AS STRING) AS g,
         |         CAST(id * 10 AS BIGINT) AS amt
         |  FROM range(12);
         |CREATE MATERIALIZED VIEW mview LOCATION '$root/mview' AS
         |  SELECT g, count(*), sum(amt) FROM mtab GROUP BY g
         |""".stripMargin)
    // cold start: wipe every session binding, re-attach by name only
    freshSession()
    assert(!spark.catalog.tableExists("mtab"))
    val n = SqlDml.useCatalog(spark, cat)
    assert(n == 2, s"expected 2 restored bindings, got $n")
    val shown = SqlDml.describe(spark, "SHOW TABLES").collect()
      .map(_.getString(0)).toSet
    assert(shown == Set("mtab"))
    assert(spark.sql("SELECT count(*) FROM mtab").head().getLong(0) == 12L)
    // DML by discovered name, then the view catches up by discovered name
    Sql.executeScript(spark,
      """UPDATE mtab SET amt = 999 WHERE k = 0;
        |REFRESH MATERIALIZED VIEW mview""".stripMargin)
    assert(spark.sql(
      "SELECT sum_amt FROM mview WHERE g = '0'").head()
      .getDecimal(0).longValueExact() == 999L + 30L + 60L + 90L)
  }

  test("USE CATALOG statement form; DROP removes the durable entry") {
    val cat = s"$root/cat2"
    SqlDml.useCatalog(spark, cat)
    Sql.execute(spark,
      s"CREATE TABLE dtab KEY k LOCATION '$root/dtab' AS " +
        "SELECT CAST(id AS BIGINT) AS k FROM range(5)")
    Sql.execute(spark, "DROP TABLE dtab")
    freshSession()
    // the statement form returns the binding count — zero after the drop
    assert(Sql.execute(spark, s"USE CATALOG '$cat'") == 0L)
    intercept[IllegalArgumentException] {
      Sql.execute(spark, "UPDATE dtab SET k = 1 WHERE k = 0")
    }
    // the DATA survived the unbind (external-table semantics)
    assert(Versioned.currentVersion(spark, s"$root/dtab").contains(1L))
  }

  test("concurrent registration of one name is claim-safe") {
    val cat = s"$root/cat3"
    val ec = ExecutionContext.fromExecutorService(
      Executors.newFixedThreadPool(4))
    try {
      implicit val iec: ExecutionContext = ec
      val attempts = Future.sequence((0 until 4).map { i =>
        Future {
          try {
            Metastore.recordTable(spark, cat, "hot",
              s"$root/hot-$i", Some("k"))
            Right(i)
          } catch { case e: IllegalStateException => Left(e) }
        }
      })
      val results = Await.result(attempts, 2.minutes)
      assert(results.count(_.isRight) == 1,
        s"expected exactly one winner, got $results")
      // the losers' rejects name the conflict
      results.collect { case Left(e) =>
        assert(e.getMessage.contains("already bound"))
      }
    } finally ec.shutdown()
    // idempotent re-record of the WINNING binding is a no-op
    val winner = Metastore.tables(spark, cat).head
    Metastore.recordTable(spark, cat, "hot", winner.path, winner.keyCol)
    assert(Metastore.tables(spark, cat).size == 1)
  }

  test("a CREATE TABLE name conflict rejects BEFORE publishing") {
    val cat = s"$root/cat6"
    SqlDml.useCatalog(spark, cat)
    Sql.execute(spark,
      s"CREATE TABLE ctab KEY k LOCATION '$root/ctabA' AS " +
        "SELECT CAST(id AS BIGINT) AS k FROM range(4)")
    // a second session (simulated) tries to CREATE the same NAME at a
    // DIFFERENT path: the durable claim must reject before any data
    // publishes or the session re-binds
    freshSession()
    SqlDml.useCatalog(spark, cat)
    val e = intercept[IllegalStateException] {
      Sql.execute(spark,
        s"CREATE TABLE ctab KEY k LOCATION '$root/ctabB' AS " +
          "SELECT CAST(id AS BIGINT) AS k FROM range(99)")
    }
    assert(e.getMessage.contains("already bound"))
    // nothing published at the conflicting path; the session still
    // reads the CATALOG's binding, not the attempted one
    assert(Versioned.currentVersion(spark, s"$root/ctabB").isEmpty)
    assert(spark.sql("SELECT count(*) FROM ctab").head().getLong(0) == 4L)
    // and a failed CTAS after a FRESH claim unwinds the claim
    intercept[Exception] {
      Sql.execute(spark,
        s"CREATE TABLE dupkey KEY k LOCATION '$root/dupkey' AS " +
          "SELECT CAST(id % 2 AS BIGINT) AS k FROM range(8)") // dup keys
    }
    assert(!Metastore.hasTable(spark, cat, "dupkey"),
      "a failed CTAS left its fresh durable claim behind")
  }

  test("an aborted txn block's CREATE leaves no durable entry") {
    val cat = s"$root/cat4"
    SqlDml.useCatalog(spark, cat)
    Sql.execute(spark,
      s"CREATE TABLE seedtab KEY k LOCATION '$root/seedtab' AS " +
        "SELECT CAST(id AS BIGINT) AS k FROM range(3)")
    intercept[Exception] {
      Sql.executeScript(spark,
        s"""BEGIN;
           |CREATE TABLE ghost KEY k LOCATION '$root/ghost' AS
           |  SELECT k FROM seedtab;
           |FROBNICATE seedtab;
           |COMMIT""".stripMargin)
    }
    assert(Metastore.tables(spark, cat).map(_.name) == Seq("seedtab"))
  }

  test("an allowMissing bootstrap binding survives the catalog round-trip") {
    val cat = s"$root/cat5"
    SqlDml.useCatalog(spark, cat)
    SqlDml.register(spark, "boot", s"$root/boot", "k", allowMissing = true)
    freshSession()
    assert(SqlDml.useCatalog(spark, cat) == 1)
    // still registered (discoverable), still unreadable until data lands
    val rows = SqlDml.describe(spark, "SHOW TABLES").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("boot"))
    assert(rows.head.isNullAt(3)) // no live version yet
  }

  test("hostile entry names and whitespace paths reject at the door") {
    val cat = s"$root/cat-hostile"
    // names become catalog FILES: a separator or traversal segment would
    // escape <catalogDir>/tables/ through the public recordTable API
    Seq("../escape", "a/b", "..", "1leading", "sp ace", "semi;colon")
      .foreach { n =>
        val e = intercept[IllegalArgumentException] {
          Metastore.recordTable(spark, cat, n, s"$root/x", Some("k"))
        }
        assert(e.getMessage.contains("not a SQL identifier"), n)
        intercept[IllegalArgumentException] {
          Metastore.recordView(spark, cat, n, s"$root/x")
        }
      }
    // ACCESS is laxer than claim (a pre-rule catalog may hold such
    // names and they must stay removable): only path-escape shapes
    // reject on remove, odd-but-safe segments are addressable
    Seq("../escape", "a/b", "..", "sp ace").foreach { n =>
      intercept[IllegalArgumentException] {
        Metastore.removeTable(spark, cat, n)
      }
    }
    Seq("1leading", "semi;colon").foreach { n =>
      assert(!Metastore.removeTable(spark, cat, n)) // no entry; no throw
    }
    // nothing escaped: the catalog dir gained no files at all
    assert(!new java.io.File(cat).exists() ||
      new java.io.File(cat).listFiles().forall(d =>
        Option(d.listFiles()).forall(_.isEmpty)))
    // entry bodies are ONE space-delimited line: a path or key with
    // whitespace would mis-split at the next attach's parse
    val sp = intercept[IllegalArgumentException] {
      Metastore.recordTable(spark, cat, "ok", s"$root/has space", Some("k"))
    }
    assert(sp.getMessage.contains("whitespace"))
    intercept[IllegalArgumentException] {
      Metastore.recordTable(spark, cat, "ok", s"$root/x", Some("k col"))
    }
    intercept[IllegalArgumentException] {
      Metastore.recordView(spark, cat, "okv", s"$root/x\ny")
    }
    // a hand-corrupted entry still rejects loudly at parse (defense in
    // depth for files this API never wrote)
    val f = new java.io.File(s"$cat/tables"); f.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$cat/tables/bad"),
      "t onlyonefield".getBytes("UTF-8"))
    val pe = intercept[IllegalArgumentException] {
      Metastore.tables(spark, cat)
    }
    assert(pe.getMessage.contains("malformed catalog entry"))
  }

  test("a FAILED useCatalog leaves the session DETACHED — later DDL " +
      "must not record into a catalog that never attached") {
    val cat = s"$root/cat-halffail"
    freshSession()
    SqlDml.useCatalog(spark, cat)
    Sql.execute(spark,
      s"CREATE TABLE hgood KEY k LOCATION '$root/hgood' AS " +
        "SELECT CAST(id AS BIGINT) AS k FROM range(3)")
    freshSession()
    // corrupt ONE entry (sorts after hgood, so the loop restores the
    // good binding first, then throws mid-restore)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$cat/tables/zzz_corrupt"),
      "t nofield".getBytes("UTF-8"))
    intercept[IllegalArgumentException] { SqlDml.useCatalog(spark, cat) }
    // the half-restored session is NOT attached: a CREATE here must stay
    // session-only instead of silently recording into the failed catalog
    Sql.execute(spark,
      s"CREATE TABLE horphan KEY k LOCATION '$root/horphan' AS " +
        "SELECT CAST(id AS BIGINT) AS k FROM range(2)")
    assert(!new java.io.File(s"$cat/tables/horphan").exists())
    freshSession()
  }

  test("SHALLOW CLONE claims its destination name BEFORE publishing — " +
      "a name conflict leaves no orphaned clone dir") {
    val cat = s"$root/cat-clone"
    freshSession()
    SqlDml.useCatalog(spark, cat)
    Sql.executeScript(spark,
      s"""CREATE TABLE csrc KEY k LOCATION '$root/csrc' AS
         |  SELECT CAST(id AS BIGINT) AS k FROM range(6);
         |CREATE TABLE cheld KEY k LOCATION '$root/cheld' AS
         |  SELECT CAST(id AS BIGINT) AS k FROM range(2)
         |""".stripMargin)
    val e = intercept[IllegalStateException] {
      Sql.execute(spark,
        s"CREATE TABLE cheld SHALLOW CLONE csrc LOCATION '$root/cheld2'")
    }
    assert(e.getMessage.contains("already bound"))
    // the conflict rejected BEFORE the clone landed: no orphaned data
    // dir at the destination, no lingering pin on the source
    assert(!new java.io.File(s"$root/cheld2").exists())
    // the session binding is untouched — cheld still reads its table
    assert(spark.table("cheld").count() == 2L)
    freshSession()
  }
}
