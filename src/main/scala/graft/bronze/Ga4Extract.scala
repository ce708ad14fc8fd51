package graft.bronze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * GA4-shape struct flattening: the reference's extraction projection
 * (/root/reference/config/queries/extract_events.sql:5-95) as a reusable
 * column set over a nested event schema — the FULL 60+-column surface:
 * dot-path extraction with aliasing (`traffic_source.source AS
 * traffic_source`, `device.category AS device_category`, ...), un-aliased
 * dot-paths that surface under their leaf name (`device.mobile_brand_name`
 * → `mobile_brand_name`, matching BigQuery's projection naming),
 * whole-struct/array passthroughs (`items`, `event_params`,
 * `user_properties`, `web_info`, `user_ltv`, ...), and the variant-slot
 * coalesce for GA4's typed-union `value` struct.
 *
 * The driver testdata has no struct columns (its `props` JSON plays that
 * role — see `bronze_extract_day`), so this module is exercised by spec on
 * a constructed GA4-shaped frame whose column list is asserted against the
 * reference SQL's output, column for column; on a real GA4 export lake
 * these columns apply unchanged. The array-of-struct `items` explode the
 * reference's declared analytics need (top products, README.md:33) is the
 * catalog query `items_explode_first_slot` (oracle-checked on lineitem-built
 * arrays, the same shape at the same cardinalities).
 */
object Ga4Extract {

  /** Flattened projection — the reference's full output surface in its
    * order (extract_events.sql:5-95), plus `event_time` (epoch-micros
    * surfaced as a real timestamp — this engine's one addition). */
  def flattenedColumns: Seq[Column] = Seq(
    // event metadata (extract_events.sql:6-13)
    col("event_date"),
    col("event_timestamp"),
    timestamp_micros(col("event_timestamp")).as("event_time"),
    col("event_name"),
    col("event_params"),
    col("event_previous_timestamp"),
    col("event_value_in_usd"),
    col("event_bundle_sequence_id"),
    col("event_server_timestamp_offset"),
    // user information (extract_events.sql:16-20)
    col("user_id"),
    col("user_pseudo_id"),
    col("user_properties"),
    col("user_first_touch_timestamp"),
    col("user_ltv"),
    // traffic source (extract_events.sql:23-25)
    col("traffic_source.source").as("traffic_source"),
    col("traffic_source.medium").as("traffic_medium"),
    col("traffic_source.name").as("campaign_name"),
    // device information (extract_events.sql:28-42)
    col("device.category").as("device_category"),
    col("device.mobile_brand_name").as("mobile_brand_name"),
    col("device.mobile_model_name").as("mobile_model_name"),
    col("device.mobile_marketing_name").as("mobile_marketing_name"),
    col("device.mobile_os_hardware_model").as("mobile_os_hardware_model"),
    col("device.operating_system").as("operating_system"),
    col("device.operating_system_version").as("operating_system_version"),
    col("device.vendor_id").as("vendor_id"),
    col("device.advertising_id").as("advertising_id"),
    col("device.language").as("language"),
    col("device.is_limited_ad_tracking").as("is_limited_ad_tracking"),
    col("device.time_zone_offset_seconds").as("time_zone_offset_seconds"),
    col("device.browser").as("browser"),
    col("device.browser_version").as("browser_version"),
    col("device.web_info").as("web_info"), // struct passthrough
    // geographic information (extract_events.sql:45-50)
    col("geo.continent").as("continent"),
    col("geo.country").as("country"),
    col("geo.region").as("region"),
    col("geo.city").as("city"),
    col("geo.sub_continent").as("sub_continent"),
    col("geo.metro").as("metro"),
    // app information (extract_events.sql:53-57)
    col("app_info.id").as("app_id"),
    col("app_info.version").as("app_version"),
    col("app_info.install_store").as("install_store"),
    col("app_info.firebase_app_id").as("firebase_app_id"),
    col("app_info.install_source").as("install_source"),
    // platform + stream (extract_events.sql:60,63)
    col("platform"),
    col("stream_id"),
    // e-commerce data (extract_events.sql:66-76)
    col("ecommerce.total_item_quantity").as("total_item_quantity"),
    col("ecommerce.purchase_revenue_in_usd").as("purchase_revenue_in_usd"),
    col("ecommerce.purchase_revenue").as("purchase_revenue"),
    col("ecommerce.refund_value_in_usd").as("refund_value_in_usd"),
    col("ecommerce.refund_value").as("refund_value"),
    col("ecommerce.shipping_value_in_usd").as("shipping_value_in_usd"),
    col("ecommerce.shipping_value").as("shipping_value"),
    col("ecommerce.tax_value_in_usd").as("tax_value_in_usd"),
    col("ecommerce.tax_value").as("tax_value"),
    col("ecommerce.unique_items").as("unique_items"),
    col("ecommerce.transaction_id").as("transaction_id"),
    // items (nested array-of-struct passthrough, extract_events.sql:79)
    col("items"),
    // privacy info (extract_events.sql:82-84)
    col("privacy_info.analytics_storage").as("analytics_storage"),
    col("privacy_info.ads_storage").as("ads_storage"),
    col("privacy_info.uses_transient_token").as("uses_transient_token"),
    // additional schema passthroughs (extract_events.sql:87-94)
    col("event_dimensions"),
    col("collected_traffic_source"),
    col("is_active_user"),
    col("batch_event_index"),
    col("batch_page_id"),
    col("batch_ordering_id"),
    col("session_traffic_source_last_click"),
    col("publisher"))

  /** GA4 `event_params` array<struct<key,value:struct<slots>>> to
    * map<string,string>: per-entry coalesce of ALL FOUR typed slots
    * (string, int, float, double — SURVEY §1.3 / the GA4 export `value`
    * union), then map_from_entries — the variant-union pivot. */
  def paramsAsMap(params: Column): Column =
    map_from_entries(transform(params, p =>
      struct(
        p.getField("key").as("key"),
        coalesce(
          p.getField("value").getField("string_value"),
          p.getField("value").getField("int_value").cast("string"),
          p.getField("value").getField("float_value").cast("string"),
          p.getField("value").getField("double_value").cast("string")
        ).as("value"))))

  /** One-param lookup without the map build, coalescing the same four
    * typed slots as [[paramsAsMap]] (a ga_session_id lives in int_value;
    * a string-only read would return null for it). */
  def param(params: Column, key: String): Column = {
    val v = element_at(filter(params, p => p.getField("key") === key), 1)
      .getField("value")
    coalesce(
      v.getField("string_value"),
      v.getField("int_value").cast("string"),
      v.getField("float_value").cast("string"),
      v.getField("double_value").cast("string"))
  }

  def flatten(ga4: DataFrame): DataFrame = ga4.select(flattenedColumns: _*)
}
