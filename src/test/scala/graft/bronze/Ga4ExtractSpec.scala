package graft.bronze

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Struct flattening over a constructed GA4-shaped frame (the driver
  * testdata has no struct columns; a real GA4 export lake does). The
  * flattened column list is asserted against the reference extraction's
  * full output surface (extract_events.sql:5-95), name for name, in
  * order. */
class Ga4ExtractSpec extends SparkSpec {

  import spark.implicits._

  /** The reference SQL's output columns in its order: un-aliased dot-paths
    * surface under their leaf name (BigQuery projection naming). */
  private val referenceColumns = Seq(
    // event metadata (extract_events.sql:6-13)
    "event_date", "event_timestamp", "event_name", "event_params",
    "event_previous_timestamp", "event_value_in_usd",
    "event_bundle_sequence_id", "event_server_timestamp_offset",
    // user information (:16-20)
    "user_id", "user_pseudo_id", "user_properties",
    "user_first_touch_timestamp", "user_ltv",
    // traffic source (:23-25)
    "traffic_source", "traffic_medium", "campaign_name",
    // device (:28-42)
    "device_category", "mobile_brand_name", "mobile_model_name",
    "mobile_marketing_name", "mobile_os_hardware_model", "operating_system",
    "operating_system_version", "vendor_id", "advertising_id", "language",
    "is_limited_ad_tracking", "time_zone_offset_seconds", "browser",
    "browser_version", "web_info",
    // geo (:45-50)
    "continent", "country", "region", "city", "sub_continent", "metro",
    // app info (:53-57)
    "app_id", "app_version", "install_store", "firebase_app_id",
    "install_source",
    // platform + stream (:60,63)
    "platform", "stream_id",
    // e-commerce (:66-76)
    "total_item_quantity", "purchase_revenue_in_usd", "purchase_revenue",
    "refund_value_in_usd", "refund_value", "shipping_value_in_usd",
    "shipping_value", "tax_value_in_usd", "tax_value", "unique_items",
    "transaction_id",
    // items (:79)
    "items",
    // privacy info (:82-84)
    "analytics_storage", "ads_storage", "uses_transient_token",
    // additional passthroughs (:87-94)
    "event_dimensions", "collected_traffic_source", "is_active_user",
    "batch_event_index", "batch_page_id", "batch_ordering_id",
    "session_traffic_source_last_click", "publisher")

  private lazy val ga4 = spark.sql("""
    SELECT
      '20240103' AS event_date,
      1704240000000000L AS event_timestamp,
      'purchase' AS event_name,
      array(
        named_struct('key', 'page',
          'value', named_struct('string_value', 'home',
            'int_value', CAST(NULL AS BIGINT),
            'float_value', CAST(NULL AS FLOAT), 'double_value', CAST(NULL AS DOUBLE))),
        named_struct('key', 'ga_session_id',
          'value', named_struct('string_value', CAST(NULL AS STRING),
            'int_value', 77L,
            'float_value', CAST(NULL AS FLOAT), 'double_value', CAST(NULL AS DOUBLE))),
        named_struct('key', 'engagement_score',
          'value', named_struct('string_value', CAST(NULL AS STRING),
            'int_value', CAST(NULL AS BIGINT),
            'float_value', CAST(0.5 AS FLOAT), 'double_value', CAST(NULL AS DOUBLE)))
      ) AS event_params,
      1704239000000000L AS event_previous_timestamp,
      12.5D AS event_value_in_usd,
      4242L AS event_bundle_sequence_id,
      120L AS event_server_timestamp_offset,
      'u1' AS user_id,
      'pseudo-1' AS user_pseudo_id,
      array(named_struct('key', 'tier',
        'value', named_struct('string_value', 'gold',
          'set_timestamp_micros', 1704000000000000L))) AS user_properties,
      1703900000000000L AS user_first_touch_timestamp,
      named_struct('revenue', 99.5D, 'currency', 'USD') AS user_ltv,
      named_struct('source', 'google', 'medium', 'cpc',
        'name', 'spring_sale') AS traffic_source,
      named_struct(
        'category', 'mobile', 'mobile_brand_name', 'Pixel',
        'mobile_model_name', '8', 'mobile_marketing_name', 'Pixel 8',
        'mobile_os_hardware_model', 'GP8', 'operating_system', 'android',
        'operating_system_version', '14', 'vendor_id', 'v1',
        'advertising_id', 'ad1', 'language', 'de-de',
        'is_limited_ad_tracking', 'No', 'time_zone_offset_seconds', 3600L,
        'browser', 'chrome', 'browser_version', '120',
        'web_info', named_struct('browser', 'chrome',
          'browser_version', '120', 'hostname', 'shop.example')) AS device,
      named_struct('continent', 'Europe', 'country', 'DE', 'region', 'BE',
        'city', 'Berlin', 'sub_continent', 'Western Europe',
        'metro', '(not set)') AS geo,
      named_struct('id', 'com.example.shop', 'version', '2.1.0',
        'install_store', 'Play', 'firebase_app_id', 'fb1',
        'install_source', 'organic') AS app_info,
      'WEB' AS platform,
      '1234567' AS stream_id,
      named_struct('total_item_quantity', 3L,
        'purchase_revenue_in_usd', 12.5D, 'purchase_revenue', 11.8D,
        'refund_value_in_usd', CAST(NULL AS DOUBLE),
        'refund_value', CAST(NULL AS DOUBLE),
        'shipping_value_in_usd', 1.2D, 'shipping_value', 1.1D,
        'tax_value_in_usd', 0.9D, 'tax_value', 0.8D,
        'unique_items', 2L, 'transaction_id', 't9') AS ecommerce,
      array(
        named_struct('item_id', 'sku1', 'item_name', 'Widget',
          'quantity', 2L, 'price', 5.0D),
        named_struct('item_id', 'sku2', 'item_name', 'Gadget',
          'quantity', 1L, 'price', 2.5D)) AS items,
      named_struct('analytics_storage', 'Yes', 'ads_storage', 'Yes',
        'uses_transient_token', 'No') AS privacy_info,
      named_struct('hostname', 'shop.example') AS event_dimensions,
      named_struct('manual_campaign_id', 'c1', 'manual_source', 'google',
        'manual_medium', 'cpc') AS collected_traffic_source,
      true AS is_active_user,
      0L AS batch_event_index,
      1L AS batch_page_id,
      2L AS batch_ordering_id,
      named_struct('manual_campaign_id', 'c1') AS session_traffic_source_last_click,
      'pub1' AS publisher
  """)

  test("flattened surface == the reference extraction's, column for column") {
    val flat = Ga4Extract.flatten(ga4)
    // event_time is this engine's one addition (epoch micros as a real
    // timestamp); everything else must be the reference list verbatim
    assert(flat.columns.toSeq.filterNot(_ == "event_time") == referenceColumns)
    assert(flat.columns.toSeq.length == referenceColumns.length + 1)
  }

  test("flatten extracts dot-paths incl. 2-level nesting, passes structs through") {
    val flat = Ga4Extract.flatten(ga4)
    val row = flat.head()
    assert(row.getAs[String]("traffic_source") == "google")
    assert(row.getAs[String]("campaign_name") == "spring_sale")
    assert(row.getAs[String]("mobile_brand_name") == "Pixel")
    assert(row.getAs[Long]("time_zone_offset_seconds") == 3600L)
    assert(row.getAs[String]("browser") == "chrome")
    assert(row.getAs[String]("sub_continent") == "Western Europe")
    assert(row.getAs[String]("app_id") == "com.example.shop")
    assert(row.getAs[Double]("purchase_revenue") == 11.8)
    assert(row.getAs[Long]("unique_items") == 2L)
    assert(row.getAs[String]("analytics_storage") == "Yes")
    assert(row.getAs[Boolean]("is_active_user"))
    // whole structs/arrays ride through un-flattened
    assert(row.getAs[org.apache.spark.sql.Row]("web_info")
      .getAs[String]("hostname") == "shop.example")
    assert(row.getAs[org.apache.spark.sql.Row]("user_ltv")
      .getAs[Double]("revenue") == 99.5)
    assert(row.getAs[scala.collection.Seq[_]]("event_params").size == 3)
    assert(row.getAs[scala.collection.Seq[_]]("items").size == 2)
    assert(row.getAs[scala.collection.Seq[_]]("user_properties").size == 1)
    // epoch-micros surfaced as a real timestamp too
    assert(flat.select(unix_micros($"event_time")).as[Long].head()
      == 1704240000000000L)
  }

  test("paramsAsMap coalesces all four typed slots; param() does single-key lookup") {
    val m = ga4.select(Ga4Extract.paramsAsMap($"event_params").as("m"))
      .select(map_keys($"m").as("ks"), $"m".getItem("ga_session_id").as("sid"),
        $"m".getItem("page").as("page"),
        $"m".getItem("engagement_score").as("score"))
      .head()
    assert(m.getAs[scala.collection.Seq[String]]("ks").sorted
      == scala.collection.Seq("engagement_score", "ga_session_id", "page"))
    assert(m.getAs[String]("sid") == "77") // int slot coalesced to string
    assert(m.getAs[String]("page") == "home")
    assert(m.getAs[String]("score") == "0.5") // float-only param surfaces
    assert(ga4.select(Ga4Extract.param($"event_params", "page")).as[String].head()
      == "home")
    // param() coalesces typed slots too — an int-only param is readable
    assert(ga4.select(Ga4Extract.param($"event_params", "ga_session_id"))
      .as[String].head() == "77")
    assert(ga4.select(Ga4Extract.param($"event_params", "engagement_score"))
      .as[String].head() == "0.5")
  }
}
