package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog._

/**
 * Driver contract (see SURVEY.md §7): the full named-query catalog, each with
 * a DuckDB oracle twin where SQL-expressible. Families:
 *
 *   - [[catalog.Relational]] — joins/aggregations/windows/set-ops over the
 *     star schema (SURVEY.md §2.4-2.6)
 *   - [[catalog.Events]] — the reference's extraction semantics + gold-layer
 *     event analytics (funnel, sessions, attribution, cohort)
 */
object SparkEntry {

  private val families: Seq[Family] =
    Seq(Relational, Events, TextLlm, Vectors, MediaCatalog, Nested, Corpus,
      Warehouse, Mining, Search, Lm, Eval, LakeCatalog, LakeSkipping,
      JdbcSource)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("bronze_extract_day")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.flatMap(_.oracles).toMap
}
