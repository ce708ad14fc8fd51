package graft.bronze

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Struct flattening over a constructed GA4-shaped frame (the driver
  * testdata has no struct columns; a real GA4 export lake does). */
class Ga4ExtractSpec extends SparkSpec {

  import spark.implicits._

  private lazy val ga4 = spark.sql("""
    SELECT
      '20240103' AS event_date,
      1704240000000000L AS event_timestamp,
      'purchase' AS event_name,
      'u1' AS user_id,
      named_struct('source', 'google', 'medium', 'cpc') AS traffic_source,
      named_struct('category', 'mobile', 'operating_system', 'android',
        'web_info', named_struct('browser', 'chrome')) AS device,
      named_struct('country', 'DE', 'city', 'Berlin') AS geo,
      named_struct('transaction_id', 't9', 'purchase_revenue', 12.5D) AS ecommerce,
      array(
        named_struct('key', 'page',
          'value', named_struct('string_value', 'home',
            'int_value', CAST(NULL AS BIGINT), 'double_value', CAST(NULL AS DOUBLE))),
        named_struct('key', 'ga_session_id',
          'value', named_struct('string_value', CAST(NULL AS STRING),
            'int_value', 77L, 'double_value', CAST(NULL AS DOUBLE)))
      ) AS event_params,
      array(named_struct('item_id', 'sku1', 'quantity', 2L)) AS items
  """)

  test("flatten extracts dot-paths incl. 2-level nesting, passes arrays through") {
    val flat = Ga4Extract.flatten(ga4)
    val row = flat.head()
    assert(flat.columns.toSeq == Seq("event_date", "event_timestamp", "event_time",
      "event_name", "user_id", "traffic_source", "traffic_medium",
      "device_category", "device_os", "browser", "country", "city",
      "transaction_id", "purchase_revenue", "event_params", "items"))
    assert(row.getAs[String]("traffic_source") == "google")
    assert(row.getAs[String]("browser") == "chrome")
    assert(row.getAs[Double]("purchase_revenue") == 12.5)
    // arrays ride whole
    assert(row.getAs[scala.collection.Seq[_]]("event_params").size == 2)
    assert(row.getAs[scala.collection.Seq[_]]("items").size == 1)
    // epoch-micros surfaced as a real timestamp too
    assert(flat.select(unix_micros($"event_time")).as[Long].head()
      == 1704240000000000L)
  }

  test("paramsAsMap coalesces typed slots; param() does single-key lookup") {
    val m = ga4.select(Ga4Extract.paramsAsMap($"event_params").as("m"))
      .select(map_keys($"m").as("ks"), $"m".getItem("ga_session_id").as("sid"),
        $"m".getItem("page").as("page"))
      .head()
    assert(m.getAs[scala.collection.Seq[String]]("ks").sorted == scala.collection.Seq("ga_session_id", "page"))
    assert(m.getAs[String]("sid") == "77") // int slot coalesced to string
    assert(m.getAs[String]("page") == "home")
    assert(ga4.select(Ga4Extract.param($"event_params", "page")).as[String].head()
      == "home")
  }
}
