package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.lake.Tables

/**
 * The raw-SQL surface: register every testdata table as a temp view so
 * `spark.sql("SELECT ...")` works directly against the same loaders the
 * DataFrame catalog uses ([[graft.lake.Tables.load]] — schema-adaptive
 * events timestamps included), alongside the custom codegen functions
 * [[GraftExtensions]] exposes to SQL (`normalize_text`, `simhash60`,
 * ...). A user of the reference writes SQL against DuckDB/BigQuery;
 * this is the drop-in equivalent entry point on Spark — views are
 * session-scoped metadata, so registration costs no scan and a
 * registered view's reads still push filters and prune columns like the
 * direct loader (same relation underneath).
 */
object Sql {

  /** Register all tables of `sfDir` as session temp views (idempotent —
    * re-registration replaces). Returns the view names. */
  def register(spark: SparkSession, sfDir: String): Seq[String] = {
    Tables.all.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
    Tables.all
  }

  /** Register, then run one SQL statement — the one-call form for
    * notebook-style use. */
  def query(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(sql)
  }
}
