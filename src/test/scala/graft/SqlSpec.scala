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
