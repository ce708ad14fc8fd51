package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * One-shot builder for the committed GA4-shaped nested parquet fixture
 * (`fixtures/ga4/events`) consumed by the `bronze_ga4_flatten` catalog
 * query and its DuckDB oracle.
 *
 * The driver testdata has no struct columns, so the GA4 flattening
 * (`graft.bronze.Ga4Extract`, the reference's extract_events.sql:5-95
 * projection) was previously spec-only. This fixture gives it a real
 * nested-parquet day: device/geo/app_info/ecommerce/privacy_info structs,
 * 2-level nesting (device.web_info), an `items` array of structs with
 * per-row cardinality, and `event_params` entries that move between the
 * typed value slots (string for even rows, int for odd — the GA4 variant
 * union) — everything derived from `id` arithmetic, so regeneration is
 * bit-deterministic.
 *
 * Usage: runMain graft.tools.BuildGa4Fixture [outDir]
 */
object BuildGa4Fixture {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("fixtures/ga4")
    val spark = graft.Conf.local(SparkSession.builder(), 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.range(240).selectExpr(
      "concat('2024010', CAST(3 + id % 3 AS STRING)) AS event_date",
      "1704240000000000L + id * 7000000 AS event_timestamp",
      "element_at(array('page_view','click','add_to_cart','purchase','refund'), CAST(id % 5 AS INT) + 1) AS event_name",
      """array(
        named_struct('key', 'page', 'value', named_struct(
          'string_value', concat('page-', CAST(id % 7 AS STRING)),
          'int_value', CAST(NULL AS BIGINT),
          'float_value', CAST(NULL AS FLOAT), 'double_value', CAST(NULL AS DOUBLE))),
        named_struct('key', 'ga_session_id', 'value', named_struct(
          'string_value', CAST(NULL AS STRING),
          'int_value', 1000L + id % 41,
          'float_value', CAST(NULL AS FLOAT), 'double_value', CAST(NULL AS DOUBLE))),
        named_struct('key', 'engagement_score', 'value', named_struct(
          'string_value', CAST(NULL AS STRING),
          'int_value', CAST(NULL AS BIGINT),
          'float_value', CAST(CAST(id % 10 AS DOUBLE) / 4.0 AS FLOAT),
          'double_value', CAST(NULL AS DOUBLE))),
        named_struct('key', 'xvar', 'value', named_struct(
          'string_value', IF(id % 2 = 0, concat('sv-', CAST(id AS STRING)), CAST(NULL AS STRING)),
          'int_value', IF(id % 2 = 1, id * 3, CAST(NULL AS BIGINT)),
          'float_value', CAST(NULL AS FLOAT), 'double_value', CAST(NULL AS DOUBLE)))
      ) AS event_params""",
      "IF(id % 4 = 0, CAST(NULL AS BIGINT), 1704230000000000L + id * 7000000) AS event_previous_timestamp",
      "IF(id % 5 = 3, CAST(id % 50 AS DOUBLE) + 0.25, CAST(NULL AS DOUBLE)) AS event_value_in_usd",
      "4000L + id AS event_bundle_sequence_id",
      "100L + id % 17 AS event_server_timestamp_offset",
      "IF(id % 11 = 0, CAST(NULL AS STRING), concat('u', CAST(id % 23 AS STRING))) AS user_id",
      "concat('pseudo-', CAST(id % 29 AS STRING)) AS user_pseudo_id",
      """array(named_struct('key', 'tier', 'value', named_struct(
        'string_value', element_at(array('free','silver','gold'), CAST(id % 3 AS INT) + 1),
        'set_timestamp_micros', 1704000000000000L + id))) AS user_properties""",
      "1703900000000000L + id * 1000000 AS user_first_touch_timestamp",
      "named_struct('revenue', CAST(id % 200 AS DOUBLE) / 4.0, 'currency', 'USD') AS user_ltv",
      """named_struct(
        'source', element_at(array('google','direct','newsletter'), CAST(id % 3 AS INT) + 1),
        'medium', element_at(array('cpc','organic','email'), CAST(id % 3 AS INT) + 1),
        'name', IF(id % 6 = 0, CAST(NULL AS STRING), concat('camp-', CAST(id % 4 AS STRING)))) AS traffic_source""",
      """named_struct(
        'category', element_at(array('mobile','desktop','tablet'), CAST(id % 3 AS INT) + 1),
        'mobile_brand_name', IF(id % 3 = 0, 'Pixel', CAST(NULL AS STRING)),
        'mobile_model_name', IF(id % 3 = 0, CAST(8 + id % 2 AS STRING), CAST(NULL AS STRING)),
        'mobile_marketing_name', CAST(NULL AS STRING),
        'mobile_os_hardware_model', CAST(NULL AS STRING),
        'operating_system', element_at(array('android','ios','linux'), CAST(id % 3 AS INT) + 1),
        'operating_system_version', CAST(12 + id % 4 AS STRING),
        'vendor_id', concat('v', CAST(id % 5 AS STRING)),
        'advertising_id', IF(id % 7 = 0, CAST(NULL AS STRING), concat('ad', CAST(id % 13 AS STRING))),
        'language', element_at(array('en-us','de-de','fr-fr'), CAST(id % 3 AS INT) + 1),
        'is_limited_ad_tracking', IF(id % 2 = 0, 'No', 'Yes'),
        'time_zone_offset_seconds', (id % 5 - 2) * 3600,
        'browser', element_at(array('chrome','safari','firefox'), CAST(id % 3 AS INT) + 1),
        'browser_version', CAST(118 + id % 6 AS STRING),
        'web_info', named_struct(
          'browser', element_at(array('chrome','safari','firefox'), CAST(id % 3 AS INT) + 1),
          'browser_version', CAST(118 + id % 6 AS STRING),
          'hostname', concat('shop', CAST(id % 2 AS STRING), '.example'))) AS device""",
      """named_struct(
        'continent', element_at(array('Europe','Americas','Asia'), CAST(id % 3 AS INT) + 1),
        'country', element_at(array('DE','US','JP','FR'), CAST(id % 4 AS INT) + 1),
        'region', concat('R', CAST(id % 6 AS STRING)),
        'city', element_at(array('Berlin','Austin','Osaka','Lyon'), CAST(id % 4 AS INT) + 1),
        'sub_continent', '(not set)',
        'metro', IF(id % 9 = 0, CAST(NULL AS STRING), concat('m', CAST(id % 3 AS STRING)))) AS geo""",
      """named_struct(
        'id', 'com.example.shop', 'version', concat('2.', CAST(id % 3 AS STRING), '.0'),
        'install_store', IF(id % 2 = 0, 'Play', 'AppStore'),
        'firebase_app_id', concat('fb', CAST(id % 2 AS STRING)),
        'install_source', element_at(array('organic','ad','referral'), CAST(id % 3 AS INT) + 1)) AS app_info""",
      "element_at(array('WEB','IOS','ANDROID'), CAST(id % 3 AS INT) + 1) AS platform",
      "CAST(1234560 + id % 3 AS STRING) AS stream_id",
      """named_struct(
        'total_item_quantity', IF(id % 5 = 3, 1L + id % 4, CAST(NULL AS BIGINT)),
        'purchase_revenue_in_usd', IF(id % 5 = 3, CAST(id % 80 AS DOUBLE) + 0.5, CAST(NULL AS DOUBLE)),
        'purchase_revenue', IF(id % 5 = 3, CAST(id % 80 AS DOUBLE) + 0.25, CAST(NULL AS DOUBLE)),
        'refund_value_in_usd', IF(id % 5 = 4, CAST(id % 30 AS DOUBLE) + 0.5, CAST(NULL AS DOUBLE)),
        'refund_value', IF(id % 5 = 4, CAST(id % 30 AS DOUBLE) + 0.25, CAST(NULL AS DOUBLE)),
        'shipping_value_in_usd', IF(id % 5 = 3, 1.25, CAST(NULL AS DOUBLE)),
        'shipping_value', IF(id % 5 = 3, 1.0, CAST(NULL AS DOUBLE)),
        'tax_value_in_usd', IF(id % 5 = 3, 0.75, CAST(NULL AS DOUBLE)),
        'tax_value', IF(id % 5 = 3, 0.5, CAST(NULL AS DOUBLE)),
        'unique_items', IF(id % 5 = 3, 1L + id % 3, CAST(NULL AS BIGINT)),
        'transaction_id', IF(id % 5 = 3, concat('t', CAST(id AS STRING)), CAST(NULL AS STRING))) AS ecommerce""",
      """CASE CAST(id % 5 AS INT)
        WHEN 3 THEN array(
          named_struct('item_id', concat('sku', CAST(id % 11 AS STRING)), 'item_name', 'Widget',
            'quantity', 1L + id % 3, 'price', CAST(id % 20 AS DOUBLE) + 0.5),
          named_struct('item_id', concat('sku', CAST((id + 1) % 11 AS STRING)), 'item_name', 'Gadget',
            'quantity', 1L, 'price', 2.5D))
        WHEN 2 THEN array(
          named_struct('item_id', concat('sku', CAST(id % 11 AS STRING)), 'item_name', 'Widget',
            'quantity', 1L, 'price', CAST(id % 20 AS DOUBLE) + 0.5))
        ELSE array()
      END AS items""",
      """named_struct(
        'analytics_storage', IF(id % 2 = 0, 'Yes', 'No'),
        'ads_storage', IF(id % 3 = 0, 'Yes', 'No'),
        'uses_transient_token', 'No') AS privacy_info""",
      "named_struct('hostname', concat('shop', CAST(id % 2 AS STRING), '.example')) AS event_dimensions",
      """named_struct('manual_campaign_id', concat('c', CAST(id % 4 AS STRING)),
        'manual_source', 'google', 'manual_medium', 'cpc') AS collected_traffic_source""",
      "id % 13 <> 0 AS is_active_user",
      "id % 50 AS batch_event_index",
      "id % 7 AS batch_page_id",
      "id AS batch_ordering_id",
      "named_struct('manual_campaign_id', concat('c', CAST(id % 4 AS STRING))) AS session_traffic_source_last_click",
      "IF(id % 8 = 0, CAST(NULL AS STRING), 'pub1') AS publisher"
    ).coalesce(1).write.mode("overwrite").parquet(s"$outDir/events")

    println(s"[ga4-fixture] wrote $outDir/events (240 rows)")
    spark.stop()
  }
}
