package graft.lake

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/**
 * [[Tables.loadJdbc]] against an EMBEDDED Derby database — the closest a
 * zero-egress sandbox gets to the reference's external-warehouse source
 * (`/root/reference/src/pipeline/extractors/bigquery_extractor.py:21-83`
 * extracts day slices from BigQuery over a SQL connection; Derby's
 * in-process JDBC engine exercises the identical Spark connector path:
 * DriverManager URL resolution, JDBCRelation schema inference, filter and
 * projection pushdown into remote SQL, range-partitioned parallel cursors).
 *
 * What is pinned:
 *  - round-trip fidelity: rows and dtypes (BIGINT→LongType,
 *    DOUBLE→DoubleType, TIMESTAMP→TimestampType, VARCHAR→StringType)
 *    survive warehouse→DataFrame unchanged;
 *  - range partitioning: partitionCol+bounds+numPartitions yields exactly
 *    N scan partitions whose union is the full table (edge partitions
 *    unbounded — rows OUTSIDE the bounds are still read);
 *  - pushdown: a day-slice filter lands in the JDBC scan's PushedFilters,
 *    not in a Spark Filter above it — the reference's one-day extraction
 *    unit shipped as remote WHERE.
 */
class JdbcSourceSpec extends SparkSpec {

  private lazy val dbDir = Files.createTempDirectory("graft-derby").toFile
  private lazy val url = s"jdbc:derby:${dbDir.getAbsolutePath}/wh;create=true"

  // (o_orderkey, o_custkey, o_totalprice, o_orderts) — a 10-row orders
  // slice spanning two calendar days, keys 1..10
  private val rows = (1 to 10).map { i =>
    val day = if (i <= 6) "2024-01-01" else "2024-01-02"
    (i.toLong, (100 + i % 3).toLong, i * 10.5, f"$day $i%02d:00:00")
  }

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE orders_src (
          |  o_orderkey BIGINT NOT NULL PRIMARY KEY,
          |  o_custkey BIGINT,
          |  o_totalprice DOUBLE,
          |  o_orderts TIMESTAMP)""".stripMargin)
      val ps = conn.prepareStatement(
        "INSERT INTO orders_src VALUES (?, ?, ?, ?)")
      rows.foreach { case (k, c, p, ts) =>
        ps.setLong(1, k); ps.setLong(2, c); ps.setDouble(3, p)
        ps.setTimestamp(4, java.sql.Timestamp.valueOf(ts))
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  override protected def afterAll(): Unit = {
    // embedded Derby shuts down per-database via the shutdown URL (throws
    // SQLException 08006 on SUCCESS — the documented contract)
    try DriverManager.getConnection(
      s"jdbc:derby:${dbDir.getAbsolutePath}/wh;shutdown=true")
    catch { case _: java.sql.SQLException => () }
    super.afterAll()
  }

  test("single-cursor read: rows and dtypes round-trip") {
    val df = Tables.loadJdbc(spark, url, "orders_src")
    val s = df.schema
    assert(s("O_ORDERKEY").dataType === LongType)
    assert(s("O_CUSTKEY").dataType === LongType)
    assert(s("O_TOTALPRICE").dataType === DoubleType)
    assert(s("O_ORDERTS").dataType === TimestampType)
    val got = df.select(col("O_ORDERKEY"), col("O_CUSTKEY"),
        col("O_TOTALPRICE"), date_format(col("O_ORDERTS"),
          "yyyy-MM-dd HH:mm:ss"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getString(3))).toSet
    assert(got === rows.toSet)
  }

  test("range-partitioned read: N cursors, lossless union, out-of-bounds kept") {
    // bounds deliberately EXCLUDE keys 1 and 10: range partitioning must
    // still return them (edge partitions are unbounded)
    val df = Tables.loadJdbc(spark, url, "orders_src",
      partitionCol = Some("O_ORDERKEY"), bounds = Some((2L, 9L)),
      numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.select(col("O_ORDERKEY")).collect().map(_.getLong(0)).sorted
      === (1L to 10L).toArray)
  }

  test("day-slice filter and projection push into the remote scan") {
    val day = Tables.loadJdbc(spark, url, "orders_src")
      .filter(col("O_ORDERTS") >= lit("2024-01-02 00:00:00").cast("timestamp"))
      .select(col("O_ORDERKEY"), col("O_TOTALPRICE"))
    val plan = day.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("O_ORDERTS"),
      s"day bound not pushed into JDBC scan:\n$plan")
    assert(plan.contains("ReadSchema") ||
      plan.contains("[O_ORDERKEY#") || plan.contains("O_ORDERKEY,O_TOTALPRICE"),
      s"projection not visible in scan:\n$plan")
    assert(day.collect().map(_.getLong(0)).sorted === (7L to 10L).toArray)
  }

  test("missing bounds with a partition column is an explicit error") {
    intercept[IllegalArgumentException] {
      Tables.loadJdbc(spark, url, "orders_src",
        partitionCol = Some("O_ORDERKEY"))
    }
  }
}
