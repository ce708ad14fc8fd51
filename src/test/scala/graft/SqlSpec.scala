package graft

import graft.lake.Tables

/**
 * Raw-SQL surface ([[Sql]]): registered temp views answer SQL identical
 * to the DataFrame catalog (same loaders underneath), the custom codegen
 * functions are callable from SQL, and view reads keep pushdown.
 */
class SqlSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("SQL over registered views equals the DataFrame catalog") {
    val names = Sql.register(spark, sf)
    assert(names.toSet == Tables.all.toSet)
    val viaSql = spark.sql("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""").collect().toSeq
    val viaDf = Tables.load(spark, sf, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy($"l_returnflag", $"l_linestatus").collect().toSeq
    assert(viaSql == viaDf)
    // a star join straight from SQL
    val rev = Sql.query(spark, sf, """
      SELECT n_name, COUNT(*) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_cust DESC, n_name LIMIT 3""")
    assert(rev.count() == 3)
  }

  test("custom codegen functions are SQL-callable over the views") {
    Sql.register(spark, sf)
    val r = spark.sql("""
      SELECT doc_id, normalize_text(text) AS norm, simhash60(text) AS sh
      FROM documents ORDER BY doc_id LIMIT 5""").collect()
    assert(r.length == 5)
    assert(r.forall(row => !row.isNullAt(1) && !row.isNullAt(2)))
  }

  test("version-pinned lake views: live vs AS OF, pushdown intact") {
    import org.apache.spark.sql.functions._
    import graft.lake.{Upsert, Versioned}
    val table =
      java.nio.file.Files.createTempDirectory("graft-sqlasof").toString + "/t"
    Versioned.publish(
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amount"), table)
    val t1 = Versioned.commitTimes(spark, table).head._2
    Upsert.merge(spark, table, "k",
      Seq((2L, 99.0), (3L, 30.0)).toDF("k", "amount"))

    assert(Sql.registerTable(spark, "t_live", table) == 2L)
    Sql.registerAsOf(spark, "t_v1", table, 1L)
    assert(Sql.registerAsOfTimestamp(spark, "t_at1", table, t1) == 1L)

    def vals(view: String): Map[Long, Double] =
      spark.sql(s"SELECT k, amount FROM $view").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(vals("t_live") == Map(1L -> 10.0, 2L -> 99.0, 3L -> 30.0))
    assert(vals("t_v1") == Map(1L -> 10.0, 2L -> 20.0))
    assert(vals("t_at1") == vals("t_v1"))
    // both relations keep pushdown: the as-of view is a plain parquet
    // relation over the immutable old version dir
    val plan = spark.sql("SELECT amount FROM t_v1 WHERE k = 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(k,2)"),
      s"expected pushed filter in:\n$plan")
    // the LIVE view stays bound to the version live at registration —
    // a later merge doesn't shift it; re-registration does
    Upsert.merge(spark, table, "k", Seq((1L, -1.0)).toDF("k", "amount"))
    assert(vals("t_live")(1L) == 10.0)
    Sql.registerTable(spark, "t_live", table)
    assert(vals("t_live")(1L) == -1.0)

    // the change feed is SQL-queryable too (table_changes-style): every
    // merge since v1, with its op and version
    assert(Sql.registerChanges(spark, "t_changes", table, sinceV = 1L) == 3L)
    val ch = spark.sql(
      "SELECT _op, k, amount, _version FROM t_changes ORDER BY _version, k")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(ch == Seq(("U", 2L, 99.0, 2L), ("U", 3L, 30.0, 2L),
      ("U", 1L, -1.0, 3L)))
  }

  test("view reads keep filter pushdown (same relation underneath)") {
    Sql.register(spark, sf)
    val plan = spark.sql(
      "SELECT o_orderkey FROM orders WHERE o_orderkey = 42")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.toLowerCase.contains("isnotnull(o_orderkey)"),
      s"expected pushed filters in:\n$plan")
  }
}
