package graft.catalog

import org.apache.spark.sql.functions.col

import graft.lake.Tables

/**
 * The EXTERNAL-WAREHOUSE extraction leg of S1 under the cross-engine
 * hash gate. The reference extracts day slices from a SQL endpoint
 * (/root/reference/src/pipeline/extractors/bigquery_extractor.py:21-83 —
 * a BigQuery connection, WHERE shipped remote, one slice per query);
 * [[graft.lake.Tables.loadJdbc]] is that connector shape on Spark, and
 * this row drives it END TO END against an embedded Derby engine: the
 * committed fixture rows load into a per-JVM Derby table on first use
 * (the same bytes the DuckDB oracle reads as parquet, so the oracle has
 * no JDBC code in the loop), then read back through Spark's JDBC
 * relation with a key-range predicate and range-parallel cursors. The
 * `require`s prove the two scale levers FIRED, not just that values
 * match: the predicate landed in the remote scan's `PushedFilters`
 * (shipped as remote WHERE — at a warehouse source this is the
 * difference between moving a slice and moving the table), and the scan
 * split into the requested number of range-partitioned cursors (the
 * only way a JDBC extract scales past one connection's throughput).
 *
 * Spark's JDBC writer QUOTES identifiers at CREATE TABLE, so the
 * fixture's lower-case names survive Derby's upper-folding and the
 * round-trip needs no re-aliasing.
 */
object JdbcSource extends Family {

  private def fx(): String = Fixtures.abs("fixtures/jdbc/orders_jdbc.parquet")

  // ONE embedded engine per JVM, seeded on first use (repeat catalog
  // runs — bench's warmup+timed passes, Verify — reuse it instead of
  // booting and leaking a Derby instance + temp dir per execution; the
  // dir registers deleteOnExit best-effort)
  @volatile private var seeded: Option[String] = None
  private def seededUrl(
      spark: org.apache.spark.sql.SparkSession): String = synchronized {
    seeded.getOrElse {
      val dbDir = java.nio.file.Files
        .createTempDirectory("graft-jdbc-cat").toFile
      dbDir.deleteOnExit()
      val url = s"jdbc:derby:${dbDir.getAbsolutePath}/wh;create=true"
      spark.read.parquet(fx())
        .write.mode("overwrite").jdbc(url, "orders_src",
          new java.util.Properties())
      seeded = Some(url)
      url
    }
  }

  private val pushdownExtract = Q(
    "jdbc_pushdown_extract",
    Some(s"""
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      FROM read_parquet('${fx()}/part-*.parquet', hive_partitioning=false)
      WHERE o_orderkey BETWEEN 40 AND 160
      ORDER BY o_orderkey
    """)) { (spark, _) =>
    // the per-JVM embedded engine, seeded once from the SAME committed
    // bytes the oracle reads
    val url = seededUrl(spark)
    val df = Tables.loadJdbc(spark, url, "orders_src",
        partitionCol = Some("o_orderkey"), bounds = Some((0L, 200L)),
        numPartitions = 4)
      .filter(col("o_orderkey") >= 40L && col("o_orderkey") <= 160L)
    val plan = df.queryExecution.executedPlan.toString
    require(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(o_orderkey") &&
      plan.contains("LessThanOrEqual(o_orderkey"),
      s"the key range did not push into the remote scan:\n$plan")
    require(plan.contains("numPartitions=4"),
      s"the scan is not range-parallel (expected 4 cursors):\n$plan")
    df.orderBy(col("o_orderkey"))
  }

  def specs: Seq[Q] = Seq(pushdownExtract)
}
