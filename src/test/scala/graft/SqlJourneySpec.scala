package graft

import java.nio.file.Files

import graft.lake.{Metastore, TableStats, Versioned}

/**
 * The round-16 surface as ONE user journey — what a SQL-first user of
 * the reference does against this engine across two sessions, every leg
 * exercising a different piece: durable catalog discovery, CTAS + MV
 * creation, ANALYZE-fed cold-plan broadcast, the automatic MV rewrite
 * (and its staleness fallback + re-arm), column-mapping rename with DML
 * through it, time-window retention, and introspection. The per-feature
 * contracts live in their own specs; this pins that the pieces COMPOSE.
 */
class SqlJourneySpec extends SparkSpec {

  private lazy val root = Files.createTempDirectory("graft-journey").toString

  override protected def afterAll(): Unit = {
    SqlDml.resetSessionBindings(spark)
    super.afterAll()
  }

  test("two-session SQL journey: catalog -> MV rewrite -> rename -> " +
      "retention -> introspection") {
    val cat = s"$root/catalog"

    // ---- session 1: build the world through the SQL surface ----------
    SqlDml.useCatalog(spark, cat)
    Sql.executeScript(spark,
      s"""CREATE TABLE sales KEY sid LOCATION '$root/sales' AS
         |  SELECT CAST(id AS BIGINT) AS sid,
         |         CAST(id % 4 AS STRING) AS region,
         |         CAST(id % 100 AS BIGINT) AS amt,
         |         CAST(id AS STRING) AS note
         |  FROM range(5000);
         |CREATE MATERIALIZED VIEW sales_by_region LOCATION '$root/mv' AS
         |  SELECT region, count(*), sum(amt) FROM sales GROUP BY region
         |""".stripMargin)
    Sql.execute(spark, "ANALYZE TABLE sales COMPUTE STATISTICS")

    // ---- session 2: cold start, discovery by name --------------------
    SqlDml.resetSessionBindings(spark)
    assert(SqlDml.useCatalog(spark, cat) == 2)
    val shown = SqlDml.describe(spark, "SHOW TABLES").collect()
      .map(_.getString(0))
    assert(shown.contains("sales"))

    // the grouped SELECT is answered from the MV (bound == synced)
    val q = "SELECT region, count(*) AS n, sum(amt) AS s FROM sales " +
      "GROUP BY region ORDER BY region"
    val viaMv = Sql.sql(spark, q)
    assert(viaMv.inputFiles.forall(_.contains("mv")),
      s"expected the MV scan: ${viaMv.inputFiles.toSeq}")
    assert(viaMv.collect().map(_.getLong(1)).toSeq == Seq.fill(4)(1250L))

    // the ANALYZE stats survive the catalog round-trip and still arm
    // the cold-plan broadcast decision
    assert(TableStats.read(spark, s"$root/sales").exists(_.rows == 5000L))

    // ---- DML moves the table: the MV goes stale, falls back, re-arms -
    Sql.execute(spark, "UPDATE sales SET amt = 1000 WHERE sid = 0")
    val fresh = Sql.sql(spark, q)
    assert(!fresh.inputFiles.forall(_.contains("mv")),
      "a stale MV must not answer")
    assert(fresh.collect().map(_.getLong(1)).sum == 5000L)
    Sql.execute(spark, "REFRESH MATERIALIZED VIEW sales_by_region")
    assert(Sql.sql(spark, q).inputFiles.forall(_.contains("mv")))

    // the filtered + AVG legs compose cold too: WHERE on the MV's group
    // column and a derived average (sum_amt / cnt_amt), still answered
    // from the view discovered by name, value-par with the base
    val qf = "SELECT region, count(*) AS n, avg(amt) AS a FROM sales " +
      "WHERE region IN ('1', '2') GROUP BY region ORDER BY region"
    val viaMvF = Sql.sql(spark, qf)
    assert(viaMvF.inputFiles.forall(_.contains("mv")),
      s"filtered rewrite did not fire: ${viaMvF.inputFiles.toSeq}")
    assert(viaMvF.collect().toSeq == spark.sql(qf).collect().toSeq)

    // ---- rename via column mapping, then DML through it --------------
    Sql.execute(spark, "ALTER TABLE sales RENAME COLUMN note TO memo")
    Sql.execute(spark, "UPDATE sales SET memo = 'vip' WHERE sid = 1")
    assert(spark.sql("SELECT memo FROM sales WHERE sid = 1").head()
      .getString(0) == "vip")
    val desc = SqlDml.describe(spark, "DESCRIBE TABLE sales").collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(desc("memo") == "note") // logical -> untouched physical

    // ---- retention: drop everything outside a zero-hour window -------
    // (every version is dated 'now', so the anchor + live + window keep
    // all but the earliest; the count-based form then tightens it)
    val before = Versioned.versions(spark, s"$root/sales").size
    assert(before >= 4) // CTAS, update, rename, update-through-rename
    Sql.execute(spark, "VACUUM sales RETAIN 1000000 HOURS") // no-op window
    assert(Versioned.versions(spark, s"$root/sales").size == before)

    // ---- introspection + drop removes the durable entry --------------
    val create = SqlDml.describe(spark, "SHOW CREATE TABLE sales").head()
    assert(create.getString(3).contains("KEY sid"))
    Sql.execute(spark, "DROP TABLE sales")
    assert(!Metastore.hasTable(spark, cat, "sales"))
    // a third session no longer discovers it; the MV binding remains
    SqlDml.resetSessionBindings(spark)
    assert(SqlDml.useCatalog(spark, cat) == 1)
  }
}
