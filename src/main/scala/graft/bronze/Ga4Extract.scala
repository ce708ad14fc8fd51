package graft.bronze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * GA4-shape struct flattening: the reference's extraction projection
 * (/root/reference/config/queries/extract_events.sql:5-95) as a reusable
 * column set over a nested event schema — dot-path extraction with aliasing
 * (`traffic_source.source AS traffic_source`, `device.category AS
 * device_category`, ...), nested-struct passthrough (`items`,
 * `event_params` ride whole), and the variant-slot coalesce for GA4's
 * typed-union `value` struct.
 *
 * The driver testdata has no struct columns (its `props` JSON plays that
 * role — see `bronze_extract_day`), so this module is exercised by spec on
 * a constructed GA4-shaped frame; on a real GA4 export lake these columns
 * apply unchanged.
 */
object Ga4Extract {

  /** Flattened projection of a GA4-ish nested row (representative subset of
    * the reference's 60+ columns — same shapes, fewer repetitions). */
  def flattenedColumns: Seq[Column] = Seq(
    col("event_date"),
    col("event_timestamp"),
    timestamp_micros(col("event_timestamp")).as("event_time"),
    col("event_name"),
    col("user_id"),
    // struct-field flattening + aliasing (extract_events.sql:24-26,29-43)
    col("traffic_source.source").as("traffic_source"),
    col("traffic_source.medium").as("traffic_medium"),
    col("device.category").as("device_category"),
    col("device.operating_system").as("device_os"),
    col("device.web_info.browser").as("browser"), // 2-level nesting
    col("geo.country").as("country"),
    col("geo.city").as("city"),
    col("ecommerce.transaction_id").as("transaction_id"),
    col("ecommerce.purchase_revenue").as("purchase_revenue"),
    // nested passthrough (extract_events.sql:10,80)
    col("event_params"),
    col("items"))

  /** GA4 `event_params` array<struct<key,value:struct<slots>>> to
    * map<string,string>: per-entry coalesce of the typed slots, then
    * map_from_entries — the variant-union pivot (SURVEY §1.3). */
  def paramsAsMap(params: Column): Column =
    map_from_entries(transform(params, p =>
      struct(
        p.getField("key").as("key"),
        coalesce(
          p.getField("value").getField("string_value"),
          p.getField("value").getField("int_value").cast("string"),
          p.getField("value").getField("double_value").cast("string")
        ).as("value"))))

  /** One-param lookup without the map build:
    * `filter(params, p -> p.key = k)[0].value.string_value`. */
  def param(params: Column, key: String): Column =
    element_at(filter(params, p => p.getField("key") === key), 1)
      .getField("value").getField("string_value")

  def flatten(ga4: DataFrame): DataFrame = ga4.select(flattenedColumns: _*)
}
