package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object catalog {

  /**
   * One named catalog query: the Spark implementation plus (when the
   * semantics are SQL-expressible) its DuckDB oracle twin. The driver
   * hash-compares the two on identical parquet inputs, so:
   *   - output column NAMES and row ORDER must match exactly,
   *   - aggregated doubles go through [[graft.ops.Exact]],
   *   - no raw timestamp columns in outputs (tz-awareness differs across
   *     engines) — epoch micros / dates / strings instead,
   *   - every query ends in a total ORDER BY over non-null keys.
   */
  final case class Q(
      name: String,
      oracle: Option[String])(
      val run: (SparkSession, String) => DataFrame)

  trait Family {
    def specs: Seq[Q]
    final def queries: Map[String, (SparkSession, String) => DataFrame] =
      specs.map(q => q.name -> q.run).toMap
    final def oracles: Map[String, String] =
      specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
  }
}
