package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Multi-format lake I/O: the same tables the parquet lake serves, ingested
 * from or exported to line-oriented formats (GA4-style exports commonly
 * arrive as newline-delimited JSON; partners ship CSV).
 *
 * Two non-negotiables at 100 TB, both enforced here:
 *
 *  - **Explicit schema, never inference.** Schema inference is an extra
 *    full scan of the source before the real one, and inferred types drift
 *    with the data sample (a day of all-null columns infers string). Readers
 *    take the lake's declared `StructType`.
 *  - **FAILFAST, never silent null-fill.** The default PERMISSIVE mode turns
 *    a corrupt line into a row of nulls — at billions of lines that is
 *    silent data loss. A malformed record here fails the task with the line
 *    in the error.
 *
 * Format notes: JSON round-trips nested/array columns (embeddings,
 * media metadata); CSV is for FLAT tables only (arrays/structs/binary have
 * no portable CSV encoding — callers get an explicit error, not a mangled
 * column); ORC is the second columnar citizen (nested types, predicate
 * pushdown, min/max + optional bloom stats like parquet — lakes migrating
 * from Hive commonly arrive on it), read through the same
 * explicit-schema discipline.
 */
object Formats {

  val supported: Set[String] = Set("parquet", "orc", "json", "csv")

  private def flatOnly(schema: StructType, format: String): Unit =
    if (format == "csv") {
      import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType}
      val bad = schema.fields.filter(f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType | BinaryType => true
        case _ => false
      })
      require(bad.isEmpty,
        s"csv cannot carry non-atomic columns: ${bad.map(_.name).mkString(", ")}")
    }

  /** Read `path` as `format` with the declared `schema` (FAILFAST). */
  def read(spark: SparkSession, path: String, format: String,
           schema: StructType): DataFrame = {
    require(supported.contains(format), s"unsupported format: $format")
    flatOnly(schema, format)
    format match {
      case "parquet" => spark.read.schema(schema).parquet(path)
      case "orc" => spark.read.schema(schema).orc(path)
      case "json" => spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(path)
      case "csv" => spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .csv(path)
    }
  }

  /**
   * Quarantine ingest — the middle path for sources known to carry a few
   * bad lines: FAILFAST kills a 100 TB job for 12 malformed records,
   * PERMISSIVE null-fills them silently; this returns BOTH sides
   * explicitly as (good, quarantine):
   *
   *  - `good`: schema-clean rows (malformed lines dropped),
   *  - `quarantine`: the malformed lines VERBATIM (`raw_record`), ready
   *    for a quarantine sink + reconciliation count.
   *
   * Two single-purpose scans of the source, deliberately: no `.cache()` of
   * the full input (the documented workaround for Spark's corrupt-record-
   * column restriction caches the good rows too — wrong trade at scale).
   * The malformed detector runs `from_json`/`from_csv` with a corrupt-
   * record slot over a text scan, so detection is per-row expression work,
   * and the invariant |good| + |quarantine| == data lines holds (spec).
   */
  def readWithQuarantine(spark: SparkSession, path: String, format: String,
                         schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, from_csv, from_json, lit, trim}
    import org.apache.spark.sql.types.StringType
    require(format == "json" || format == "csv",
      s"quarantine ingest is for line formats, not $format")
    flatOnly(schema, format)
    val corrupt = "_graft_corrupt"
    val schemaPlus = schema.add(corrupt, StringType)
    val opts = Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> corrupt,
      "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    val lines = spark.read.text(path)
    val (good, parsed) = format match {
      case "json" =>
        (spark.read.schema(schema)
          .option("mode", "DROPMALFORMED")
          .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
          .json(path),
          lines.select(col("value"),
            from_json(col("value"), schemaPlus, opts).as("p")))
      case "csv" =>
        val header = schema.fieldNames.mkString(",")
        (spark.read.schema(schema)
          .option("mode", "DROPMALFORMED")
          .option("header", "true")
          .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
          .csv(path),
          lines.filter(trim(col("value")) =!= lit(header))
            .select(col("value"),
              from_csv(col("value"), schemaPlus, opts).as("p")))
    }
    val quarantine = parsed
      .filter(col(s"p.$corrupt").isNotNull)
      .select(col("value").as("raw_record"))
    (good, quarantine)
  }

  /** Write `df` to `path` as `format`, with the symmetric options so a
    * [[read]] with `df.schema` round-trips value-identical. */
  def write(df: DataFrame, path: String, format: String): Unit = {
    require(supported.contains(format), s"unsupported format: $format")
    flatOnly(df.schema, format)
    val w = df.write.mode("overwrite")
    format match {
      case "parquet" => w.parquet(path)
      case "orc" => w.orc(path)
      case "json" => w
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(path)
      case "csv" => w
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .csv(path)
    }
  }
}
