package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.lake.Tables
import graft.ops.Exact._
import graft.ops.TextOps

/**
 * Event-stream analytics: the reference's extraction query semantics
 * (project/flatten/filter/sort — extract_events.sql:5-99) re-expressed on the
 * testdata `events` table, plus the declared-but-unimplemented gold layer
 * (funnel, sessionization, attribution, cohort, journey — README.md:23-33).
 *
 * Event timestamps surface as epoch-micros longs in outputs (never raw
 * timestamps — tz-awareness is not portable across engines, SURVEY.md §7.3).
 *
 * Scale posture: every window partitions by `user_id` (high cardinality, one
 * shuffle, no skew hot-spot in GA4-like data); sessionization is the
 * classic lag+cumsum formulation which needs exactly one shuffle; no
 * driver-side state anywhere.
 */
object Events extends Family {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)

  /** Window: a user's events in time order, event_id as total tiebreak. */
  private val byUserTime = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  // -------------------------------------------------------------------------
  // P1-P4 + O1: the reference's bronze extraction, one day slice —
  // projection, JSON prop flattening, partition-key filter, global time sort.
  private val extractDay = Q(
    "bronze_extract_day",
    Some("""
      SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id,
        event_type, value,
        TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
      FROM events
      WHERE CAST(ts AS DATE) = DATE '2024-01-03'
      ORDER BY ts_us, event_id
    """)) { (spark, dir) =>
    Tables.spread(ev(spark, dir)
        .filter(to_date(col("ts")) === lit("2024-01-03").cast("date")))
      .select(
        col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"),
        col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").try_cast("int").as("prop_k"))
      .orderBy(col("ts_us"), col("event_id"))
  }

  // -------------------------------------------------------------------------
  // P1-P4 over REAL nested structs: the GA4 flattening (the reference's
  // extract_events.sql:5-95 projection, graft.bronze.Ga4Extract) run
  // end-to-end on the committed struct-shaped parquet day
  // (fixtures/ga4/events, built by graft.tools.BuildGa4Fixture) — dot-path
  // extraction incl. 2-level nesting (device.web_info.hostname), struct
  // fields with per-row nulls, an items array with per-row cardinality,
  // and the typed-union event_params value: `xvar` stores its value in the
  // STRING slot on even rows and the INT slot on odd rows, so the
  // variant-slot coalesce is exercised in both directions under the hash
  // gate. DuckDB reads the same nested parquet natively; both engines
  // extract identical dot paths. Map-only over the fixture; ORDER BY the
  // unique event_timestamp is the only wide stage.
  // ga4 fixture root via the shared resolver ([[Fixtures]]); the DuckDB
  // oracle embeds the ABSOLUTE form so both arms resolve identically on
  // any checkout
  private def ga4Fix(): String = Fixtures.dir("fixtures/ga4/events")
  private def ga4FixAbs(): String = Fixtures.abs("fixtures/ga4/events")

  private val ga4Flatten = Q(
    "bronze_ga4_flatten",
    Some(s"""
      SELECT
        t.event_date, t.event_timestamp, t.event_name,
        t.user_id, t.user_pseudo_id,
        t.traffic_source.source AS traffic_source,
        t.traffic_source.medium AS traffic_medium,
        t.traffic_source.name AS campaign_name,
        t.device.category AS device_category,
        t.device.operating_system AS operating_system,
        t.device.browser AS browser,
        t.device.language AS language,
        t.device.web_info.hostname AS hostname,
        t.geo.continent AS continent, t.geo.country AS country,
        t.geo.city AS city,
        t.app_info.id AS app_id, t.platform,
        t.ecommerce.total_item_quantity AS total_item_quantity,
        t.ecommerce.purchase_revenue_in_usd AS purchase_revenue_in_usd,
        t.ecommerce.transaction_id AS transaction_id,
        CAST(len(t.items) AS BIGINT) AS n_items,
        t.privacy_info.analytics_storage AS analytics_storage,
        t.is_active_user,
        COALESCE(
          list_filter(t.event_params, p -> p.key = 'ga_session_id')[1].value.string_value,
          CAST(list_filter(t.event_params, p -> p.key = 'ga_session_id')[1].value.int_value AS VARCHAR)) AS session_id,
        COALESCE(
          list_filter(t.event_params, p -> p.key = 'page')[1].value.string_value,
          CAST(list_filter(t.event_params, p -> p.key = 'page')[1].value.int_value AS VARCHAR)) AS page,
        COALESCE(
          list_filter(t.event_params, p -> p.key = 'xvar')[1].value.string_value,
          CAST(list_filter(t.event_params, p -> p.key = 'xvar')[1].value.int_value AS VARCHAR)) AS xvar
      FROM read_parquet('${ga4FixAbs()}/*.parquet') t
      ORDER BY t.event_timestamp
    """)) { (spark, dir) =>
    val flat = graft.bronze.Ga4Extract.flatten(spark.read.parquet(ga4Fix()))
    flat.select(
        col("event_date"), col("event_timestamp"), col("event_name"),
        col("user_id"), col("user_pseudo_id"),
        col("traffic_source"), col("traffic_medium"), col("campaign_name"),
        col("device_category"), col("operating_system"), col("browser"),
        col("language"),
        col("web_info.hostname").as("hostname"),
        col("continent"), col("country"), col("city"),
        col("app_id"), col("platform"),
        col("total_item_quantity"), col("purchase_revenue_in_usd"),
        col("transaction_id"),
        size(col("items")).cast("long").as("n_items"),
        col("analytics_storage"), col("is_active_user"),
        graft.bronze.Ga4Extract.param(col("event_params"), "ga_session_id")
          .as("session_id"),
        graft.bronze.Ga4Extract.param(col("event_params"), "page").as("page"),
        graft.bronze.Ga4Extract.param(col("event_params"), "xvar").as("xvar"))
      .orderBy(col("event_timestamp"))
  }

  // A3: daily KPIs per event type (count / distinct users / exact revenue).
  private val dailyKpis = Q(
    "events_daily_kpis",
    Some("""
      SELECT CAST(ts AS DATE) AS event_date, event_type,
        COUNT(*) AS n_events,
        COUNT(DISTINCT user_id) AS n_users,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY event_date, event_type
      ORDER BY event_date, event_type
    """)) { (spark, dir) =>
    ev(spark, dir)
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sumMoney(col("value")).as("total_value"))
      .orderBy(col("event_date"), col("event_type"))
  }

  // A5/J4: ordered funnel — view, then click strictly after the first view,
  // then purchase strictly after the first qualifying click.
  private val funnel = Q(
    "funnel_view_click_purchase",
    Some("""
      WITH v AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS vt
                 FROM events WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS ct
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.vt
            GROUP BY e.user_id),
      p AS (SELECT e.user_id
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.ct
            GROUP BY e.user_id)
      SELECT (SELECT COUNT(*) FROM v) AS n_view_users,
             (SELECT COUNT(*) FROM c) AS n_click_users,
             (SELECT COUNT(*) FROM p) AS n_purchase_users
    """)) { (spark, dir) =>
    // Single-shuffle shape: the step thresholds are per-user constants, so
    // three chained window mins over ONE user partition replace the oracle's
    // join-per-step cascade (same semantics: vt = first view, ct = first
    // click strictly after vt, pt = first purchase strictly after ct).
    val w = Window.partitionBy(col("user_id"))
    ev(spark, dir)
      .withColumn("vt",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("ct",
        min(when(col("event_type") === "click" && col("ts") > col("vt"),
          col("ts"))).over(w))
      .withColumn("pt",
        min(when(col("event_type") === "purchase" && col("ts") > col("ct"),
          col("ts"))).over(w))
      .agg(
        countDistinct(when(col("vt").isNotNull, col("user_id"))).as("n_view_users"),
        countDistinct(when(col("ct").isNotNull, col("user_id"))).as("n_click_users"),
        countDistinct(when(col("pt").isNotNull, col("user_id"))).as("n_purchase_users"))
  }

  // W1: sessionization — a >30 min silence starts a new session.
  private val sessionize = Q(
    "sessionize_30min",
    Some("""
      WITH o AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
          CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                 OR epoch_us(CAST(ts AS TIMESTAMP))
                    - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
      s AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM o)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        COUNT(*) AS n_events,
        min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      FROM s GROUP BY user_id, session_id
      ORDER BY user_id, session_id
    """)) { (spark, dir) =>
    val gapUs = 30L * 60 * 1000 * 1000
    val prevTs = lag(col("ts"), 1).over(byUserTime)
    val isNew = when(
      prevTs.isNull || (unix_micros(col("ts")) - unix_micros(prevTs)) > gapUs, 1
    ).otherwise(0)
    ev(spark, dir)
      .withColumn("is_new", isNew)
      .withColumn("session_id",
        sum(col("is_new")).over(
          byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        sumMoney(col("value")).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** The session_window body over any (user_id, ts, value) frame — shared
    * by the catalog query and SessionizeSpec's boundary-semantics cases. */
  private[catalog] def sessionWindowAgg(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        sumMoney(col("value")).as("session_value"))
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("start_us"))

  // Sessionization via Spark's native session_window — the same operator
  // sessionize_30min expresses as lag+cumsum, in the form that runs
  // UNCHANGED as a streaming query (streaming/Sessions.scala holds the
  // watermarked stateful variant; this batch twin pins the semantics the
  // stream must fold to). Plan shape: ONE user_id shuffle into a
  // sort-merge session aggregate (UpdatingSessionsIterator) — no window
  // pass, no cumsum — which at 100 TB is the cheaper formulation: the
  // lag+cumsum twin pays the same shuffle PLUS two full window scans.
  //
  // Boundary contract: session_window's merge rule treats the gap as
  // INCLUSIVE — an event landing exactly gap after its predecessor joins
  // the session (merge while next.start <= prev.end, ends at last+gap) —
  // which is precisely the islands formulation's strict `> gap` split.
  // The two formulations are therefore row-identical including the
  // boundary; SessionizeSpec pins this on synthetic exact-gap /
  // gap+1µs pairs plus whole-corpus equality.
  private val sessionizeNative = Q(
    "sessionize_session_window",
    Some("""
      WITH o AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
          CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                 OR epoch_us(CAST(ts AS TIMESTAMP))
                    - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
      s AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM o)
      SELECT user_id, min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      FROM s GROUP BY user_id, session_id
      ORDER BY user_id, start_us
    """)) { (spark, dir) =>
    sessionWindowAgg(ev(spark, dir))
  }

  // W2: first/last-touch attribution per user + purchase LTV.
  private val attribution = Q(
    "attribution_first_last_touch",
    Some("""
      WITH b AS (
        SELECT user_id, event_type, value, event_id, CAST(ts AS TIMESTAMP) AS ts,
          row_number() OVER (PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn_a,
          row_number() OVER (PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn_d
        FROM events)
      SELECT user_id,
        max(CASE WHEN rn_a = 1 THEN event_type END) AS first_touch,
        max(CASE WHEN rn_d = 1 THEN event_type END) AS last_touch,
        min(epoch_us(ts)) AS first_us,
        max(epoch_us(ts)) AS last_us,
        COUNT(*) AS n_events,
        COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
          THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS purchase_ltv
      FROM b GROUP BY user_id ORDER BY user_id
    """)) { (spark, dir) =>
    // min/max over struct(ts, event_id, event_type) IS first/last touch
    // ((ts, event_id) is a total order per user): one hash aggregation with
    // map-side partials instead of two full sort windows — the 100 TB shape
    // for "first/last per key" whenever the whole row isn't needed.
    val touch = struct(col("ts"), col("event_id"), col("event_type"))
    ev(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        min(touch).getField("event_type").as("first_touch"),
        max(touch).getField("event_type").as("last_touch"),
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("n_events"),
        coalesce(
          sum(when(col("event_type") === "purchase", dec2(col("value")))).cast("double"),
          lit(0.0)).as("purchase_ltv"))
      .orderBy(col("user_id"))
  }

  // A7: journey map — each user's first 10 events as an ordered path string.
  private val journeys = Q(
    "journey_first10_paths",
    Some("""
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM (
        SELECT user_id, event_type,
          row_number() OVER (PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events
        WHERE ts IS NOT NULL AND event_id IS NOT NULL
          AND event_type IS NOT NULL)
      WHERE rn <= 10
      GROUP BY user_id
      ORDER BY user_id
    """)) { (spark, dir) =>
    // Bounded first-10 aggregate (graft.functions.PathFirstK): one hash
    // aggregation with map-side partials, and per-group state capped at 10
    // events at every point of the reduce/merge tree — a bot user with
    // millions of events costs 10 buffer rows, not its whole history. Same
    // total order (ts_us, event_id) the row_number formulation used.
    // Null-field events are dropped BEFORE the aggregate (mirrored in the
    // oracle's WHERE): PathEvent's input encoder is non-nullable, and a
    // null ts/id/type carries no position in a path anyway.
    val firstTen = udaf(new graft.functions.PathFirstK(10))
    ev(spark, dir)
      .filter(col("ts").isNotNull && col("event_id").isNotNull &&
        col("event_type").isNotNull)
      .groupBy(col("user_id"))
      .agg(firstTen(
        unix_micros(col("ts")), col("event_id"), col("event_type")).as("path"))
      .orderBy(col("user_id"))
  }

  // Cohort retention: users grouped by first-seen day, activity by day offset.
  private val cohort = Q(
    "cohort_daily_retention",
    Some("""
      WITH first_seen AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id),
      activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events)
      SELECT f.cohort_day,
        CAST(datediff('day', f.cohort_day, a.active_day) AS INTEGER) AS day_offset,
        COUNT(DISTINCT a.user_id) AS n_active
      FROM activity a JOIN first_seen f ON a.user_id = f.user_id
      GROUP BY f.cohort_day, day_offset
      ORDER BY f.cohort_day, day_offset
    """)) { (spark, dir) =>
    // cohort_day is a per-user min — a window over the distinct (user, day)
    // activity set replaces the firstSeen aggregate + re-join (one shuffle
    // on user_id serves both the distinct and the min).
    ev(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("active_day")).distinct()
      .withColumn("cohort_day",
        min(col("active_day")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("cohort_day"),
        datediff(col("active_day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  // J1 analog (reconciliation anti-difference, pipeline.py:252): calendar days
  // in the observed range with no 'error' events.
  private val missingDays = Q(
    "reconcile_days_without_errors",
    Some("""
      WITH bounds AS (
        SELECT min(CAST(ts AS DATE)) AS dmin, max(CAST(ts AS DATE)) AS dmax
        FROM events),
      cal AS (
        SELECT CAST(unnest(generate_series(CAST(dmin AS TIMESTAMP),
          CAST(dmax AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds),
      err AS (SELECT DISTINCT CAST(ts AS DATE) AS day
              FROM events WHERE event_type = 'error')
      SELECT day FROM cal
      WHERE day NOT IN (SELECT day FROM err)
      ORDER BY day
    """)) { (spark, dir) =>
    val e = ev(spark, dir)
    val cal = e.agg(min(to_date(col("ts"))).as("dmin"), max(to_date(col("ts"))).as("dmax"))
      .select(explode(sequence(col("dmin"), col("dmax"))).as("day"))
    val err = e.filter(col("event_type") === "error")
      .select(to_date(col("ts")).as("day")).distinct()
    cal.join(err, Seq("day"), "left_anti").orderBy(col("day"))
  }

  // F-group: JSON prop extraction + bucketed histogram (get_json_object path).
  // Missing / non-integer '$.k' buckets to sentinel -1 in BOTH engines
  // (TRY_CAST + COALESCE) so the total ORDER BY never sorts NULLs — Spark
  // sorts NULLs first, DuckDB last, which would break the oracle compare.
  private val propsHistogram = Q(
    "json_props_histogram",
    Some("""
      SELECT COALESCE(CAST(FLOOR(
               TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) / 10.0)
               AS INTEGER), -1) AS bucket,
        COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      FROM events
      GROUP BY bucket
      ORDER BY bucket
    """)) { (spark, dir) =>
    Tables.spread(ev(spark, dir))
      .select(
        coalesce(
          floor(get_json_object(col("props"), "$.k").try_cast("int") / 10.0)
            .cast("int"),
          lit(-1)).as("bucket"),
        col("user_id"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("bucket"))
  }

  // As-of join: each event paired with the same user's most recent STRICTLY
  // PRIOR purchase. Implemented as an ordered carry-forward window (one
  // shuffle on user_id) rather than a per-row range join — the scalable
  // formulation; a sort-merge as-of needs exactly this sort anyway.
  private val asofQ = Q(
    "join_asof_last_purchase",
    Some("""
      SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id,
        event_type,
        last_value(CASE WHEN event_type = 'purchase'
            THEN epoch_us(CAST(ts AS TIMESTAMP)) END IGNORE NULLS)
          OVER (PARTITION BY user_id
                ORDER BY CAST(ts AS TIMESTAMP), event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          AS last_purchase_us
      FROM events ORDER BY event_id
    """)) { (spark, dir) =>
    val carry = byUserTime.rowsBetween(Window.unboundedPreceding, -1)
    ev(spark, dir)
      .select(
        col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"),
        col("event_type"),
        last(when(col("event_type") === "purchase", unix_micros(col("ts"))),
          ignoreNulls = true).over(carry).as("last_purchase_us"))
      .orderBy(col("event_id"))
  }

  // MapType path: parse the JSON props into map<string,int>, explode to
  // key/value rows, aggregate per key — the GA4 event_params pivot shape
  // (array-of-variant-struct -> map -> explode, SURVEY §1.3/§2.7).
  private val propsKv = Q(
    "json_props_kv_stats",
    Some("""
      WITH kv AS (
        SELECT unnest(json_keys(props)) AS key, props FROM events),
      v AS (
        SELECT key,
          TRY_CAST(json_extract_string(props, '$."' || key || '"') AS INTEGER) AS val
        FROM kv)
      SELECT key, COUNT(*) AS n,
        CAST(SUM(val) AS BIGINT) AS sum_val,
        min(val) AS min_val, max(val) AS max_val
      FROM v GROUP BY key ORDER BY key
    """)) { (spark, dir) =>
    // parse values as STRING then TRY_CAST per entry: a map<string,int>
    // parse would null the whole map on one non-integer value, silently
    // dropping that doc's keys while the oracle still counts them
    Tables.spread(ev(spark, dir))
      .select(explode(from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")))
        .as(Seq("key", "sval")))
      .select(col("key"), col("sval").try_cast("int").as("val"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("val")).as("sum_val"),
        min(col("val")).as("min_val"), max(col("val")).as("max_val"))
      .orderBy(col("key"))
  }

  // Time-to-conversion distribution by acquisition cohort: first view →
  // first subsequent purchase latency, quartiles per cohort day. Same
  // single-shuffle window shape as the funnel (per-user thresholds as
  // chained window mins — no join cascade); latency is integral epoch-
  // micros arithmetic (never interval types — boundary-crossing date_diff
  // semantics differ across engines), and quartiles are exact dyadic
  // percentiles over those integral seconds, parallel across cohort days.
  private val convLatency = Q(
    "conversion_latency",
    Some("""
      WITH v AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS vt
                 FROM events WHERE event_type = 'view' GROUP BY user_id),
      p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS pt
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > v.vt
            GROUP BY e.user_id),
      c AS (SELECT v.user_id, CAST(v.vt AS DATE) AS cohort_date,
              (epoch_us(p.pt) - epoch_us(v.vt)) // 1000000 AS latency_sec
            FROM v JOIN p ON p.user_id = v.user_id)
      SELECT cohort_date, COUNT(*) AS n_converters,
        quantile_cont(latency_sec, 0.25) AS p25_sec,
        quantile_cont(latency_sec, 0.5) AS p50_sec,
        quantile_cont(latency_sec, 0.75) AS p75_sec
      FROM c GROUP BY cohort_date ORDER BY cohort_date
    """)) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id"))
    ev(spark, dir)
      .withColumn("vt",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("pt",
        min(when(col("event_type") === "purchase" && col("ts") > col("vt"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("vt")).as("vt"), min(col("pt")).as("pt"))
      .filter(col("pt").isNotNull)
      .select(to_date(col("vt")).as("cohort_date"),
        expr("(unix_micros(pt) - unix_micros(vt)) div 1000000")
          .as("latency_sec"))
      .groupBy(col("cohort_date"))
      .agg(count(lit(1)).as("n_converters"),
        percentile(col("latency_sec"), lit(0.25)).as("p25_sec"),
        percentile(col("latency_sec"), lit(0.5)).as("p50_sec"),
        percentile(col("latency_sec"), lit(0.75)).as("p75_sec"))
      .orderBy(col("cohort_date"))
  }

  // -------------------------------------------------------------------------
  // A/B experiment readout: deterministic hash-based arm assignment (the
  // rerun-stable split a real experimentation platform derives from
  // user_id + salt), per-arm conversion, and a two-proportion Pearson
  // chi-square significance decision made in EXACT integer arithmetic:
  //
  //   chi2 = N*(ad-bc)^2 / (r1*r2*c1*c2)   vs   3.841459 (95%, df=1)
  //
  // decided as 10^6*N*(ad-bc)^2 > 3841459*(r1*r2*c1*c2) over DECIMAL(38,0)
  // products — no IEEE arithmetic in the DECISION (the anomaly-flag
  // discipline); chi2 itself is reported via one IEEE division of
  // int-exact operands. Scale shape: one user-keyed aggregate (conversion
  // flag), one 2-row arm aggregate, a 1-row readout — the whole readout is
  // a single corpus pass regardless of experiment count per user.
  private val abtest = Q(
    "abtest_conversion_chi2",
    Some("""
      WITH conv AS (
        SELECT user_id,
          CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
            % 2 AS arm,
          CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 13
            THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id),
      cells AS (
        SELECT
          CAST(SUM(CASE WHEN arm = 0 AND converted = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS a,
          CAST(SUM(CASE WHEN arm = 0 AND converted = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS b,
          CAST(SUM(CASE WHEN arm = 1 AND converted = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS c,
          CAST(SUM(CASE WHEN arm = 1 AND converted = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS d
        FROM conv)
      SELECT CAST(a AS BIGINT) AS conv_a, CAST(b AS BIGINT) AS nonconv_a,
        CAST(c AS BIGINT) AS conv_b, CAST(d AS BIGINT) AS nonconv_b,
        CASE WHEN (a+b) * (c+d) * (a+c) * (b+d) = 0 THEN NULL ELSE
          round(CAST((a+b+c+d) * (a*d - b*c) * (a*d - b*c) AS DOUBLE)
            / CAST((a+b) * (c+d) * (a+c) * (b+d) AS DOUBLE), 6) END AS chi2,
        CAST(1000000 * (a+b+c+d) * (a*d - b*c) * (a*d - b*c)
          > 3841459 * ((a+b) * (c+d) * (a+c) * (b+d)) AS INTEGER) AS significant
      FROM cells
    """)) { (spark, dir) =>
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // conversion = heavy buyer (> median purchase count) — "any purchase"
    // is degenerate on this corpus (every user buys), which would zero the
    // non-converter margin and the chi-square denominator with it
    val conv = ev(spark, dir)
      .groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "purchase", 1).otherwise(0)) > 13)
        .cast("int").as("converted"))
      .withColumn("arm", TextOps.h32(col("user_id").cast("string")) % 2)
    def cell(arm: Int, c: Int): Column =
      sum(when(col("arm") === arm && col("converted") === c, 1).otherwise(0))
        .cast(dec)
    val a = col("a"); val b = col("b"); val c = col("c"); val d = col("d")
    val num = (a + b + c + d) * (a * d - b * c) * (a * d - b * c)
    val den = (a + b) * (c + d) * (a + c) * (b + d)
    conv.agg(cell(0, 1).as("a"), cell(0, 0).as("b"),
        cell(1, 1).as("c"), cell(1, 0).as("d"))
      .select(a.cast("long").as("conv_a"), b.cast("long").as("nonconv_a"),
        c.cast("long").as("conv_b"), d.cast("long").as("nonconv_b"),
        when(den === 0, lit(null).cast("double"))
          .otherwise(round(num.cast("double") / den.cast("double"), 6))
          .as("chi2"),
        (num * 1000000 > den * 3841459).cast("int").as("significant"))
  }

  // -------------------------------------------------------------------------
  // Rolling 7-day active users (WAU) + same-day DAU per report day — the
  // dashboard headline metric, computed EXACTLY without a sliding-window
  // distinct: each (user, active-day) pair fans out to the 7 report days
  // it supports (a bounded Generate, fanout = window length), then ONE
  // day-keyed distinct aggregate. The naive alternatives both break at
  // scale: a per-day self-join over the activity table is quadratic in
  // days, and count(DISTINCT) over a RANGE frame isn't supported at all.
  // Report days past the last observed day are cut (partial future
  // windows), via a broadcast 1-row max.
  private val wau = Q(
    "window_wau_rolling",
    Some("""
      WITH ud AS (
        SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        FROM events),
      mx AS (SELECT MAX(day) AS mx FROM ud),
      ex AS (
        SELECT user_id, day,
          unnest(CAST(generate_series(day, day + INTERVAL 6 DAY,
            INTERVAL 1 DAY) AS DATE[])) AS rday
        FROM ud)
      SELECT ex.rday AS day,
        COUNT(DISTINCT ex.user_id) AS wau_7d,
        COUNT(DISTINCT CASE WHEN ex.day = ex.rday THEN ex.user_id END) AS dau
      FROM ex, mx WHERE ex.rday <= mx.mx
      GROUP BY ex.rday ORDER BY day
    """)) { (spark, dir) =>
    val ud = ev(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    val mx = ud.agg(max(col("day")).as("mx"))
    ud.select(col("user_id"), col("day"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("rday"))
      .crossJoin(broadcast(mx))
      .filter(col("rday") <= col("mx"))
      .groupBy(col("rday"))
      .agg(countDistinct(col("user_id")).as("wau_7d"),
        countDistinct(when(col("day") === col("rday"), col("user_id")))
          .as("dau"))
      .select(col("rday").as("day"), col("wau_7d"), col("dau"))
      .orderBy(col("day"))
  }

  // -------------------------------------------------------------------------
  // First-order Markov transition matrix of the event stream: per user, each
  // consecutive (prev -> next) event-type step, counted corpus-wide, with
  // the row-normalized transition probability — the base model behind
  // next-action prediction and journey simulation (and the aggregate twin
  // of journey_first10_paths' per-user sequences). Probability is ONE IEEE
  // division of two exact counts, so both engines emit identical doubles.
  // Scale shape: one user-keyed window shuffle (same partitioning as
  // sessionize — high-cardinality key, no hot spot), then a hash agg on the
  // type-pair domain (bounded, tiny); the normalizing window runs on that
  // bounded aggregate, not on data.
  private val markov = Q(
    "events_markov_transitions",
    Some("""
      WITH tr AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type,
          event_type AS next_type
        FROM events),
      c AS (SELECT prev_type, next_type, COUNT(*) AS n_transitions
        FROM tr WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      SELECT prev_type, next_type, n_transitions,
        CAST(n_transitions AS DOUBLE)
          / SUM(n_transitions) OVER (PARTITION BY prev_type) AS prob
      FROM c ORDER BY prev_type, next_type
    """)) { (spark, dir) =>
    val c = ev(spark, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUserTime))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    c.select(col("prev_type"), col("next_type"), col("n_transitions"),
        (col("n_transitions").cast("double")
          / sum(col("n_transitions")).over(
            Window.partitionBy(col("prev_type")))).as("prob"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  // -------------------------------------------------------------------------
  // Generic point-in-interval join (graft.ops.IntervalJoin): attribute each
  // purchase to every browse session (views/clicks, 30-min gap rule) whose
  // [start, end + 30-min horizon] window contains it. The horizon makes the
  // intervals genuinely overlap-capable — a purchase near a session boundary
  // lands in BOTH adjacent windows, the multiplicity a plain sessionize
  // cannot express. The operator plans as an equi-join on (user, bucket)
  // with a residual range filter — never a per-key nested loop — so one
  // hyperactive user spreads across time buckets instead of one reducer.
  private val intervalAttr = Q(
    "join_interval_purchases",
    Some("""
      WITH b AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
          CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                 OR epoch_us(CAST(ts AS TIMESTAMP))
                    - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS is_new
        FROM events WHERE event_type IN ('view', 'click')
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
      s AS (
        SELECT user_id, ts, SUM(is_new) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM b),
      iv AS (
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
          min(epoch_us(ts)) AS start_us,
          max(epoch_us(ts)) + 1800000000 AS hi_us
        FROM s GROUP BY user_id, session_id)
      SELECT p.user_id, iv.session_id, COUNT(*) AS n_purchases,
        CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
      FROM (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
            FROM events WHERE event_type = 'purchase') p
      JOIN iv ON p.user_id = iv.user_id
             AND p.ts_us BETWEEN iv.start_us AND iv.hi_us
      GROUP BY p.user_id, iv.session_id
      ORDER BY p.user_id, iv.session_id
    """)) { (spark, dir) =>
    val gapUs = 30L * 60 * 1000 * 1000
    val horizonUs = gapUs
    val prevTs = lag(col("ts"), 1).over(byUserTime)
    val isNew = when(
      prevTs.isNull || (unix_micros(col("ts")) - unix_micros(prevTs)) > gapUs, 1
    ).otherwise(0)
    val sessions = ev(spark, dir)
      .filter(col("event_type").isin("view", "click"))
      .withColumn("is_new", isNew)
      .withColumn("session_id",
        sum(col("is_new")).over(
          byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(unix_micros(col("ts"))).as("start_us"),
        (max(unix_micros(col("ts"))) + lit(horizonUs)).as("hi_us"))
    val purchases = ev(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
    graft.ops.IntervalJoin
      .pointsInIntervals(purchases, sessions, Seq("user_id"),
        pt = "ts_us", lo = "start_us", hi = "hi_us", bucketWidth = horizonUs)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sumMoney(col("value")).as("attributed_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  // -------------------------------------------------------------------------
  // Training-dataset assembly: the "feature store" materialization an ML
  // pipeline runs nightly — behavioral features from the events stream
  // (volume, purchases, 30-min session count, active days, exact spend,
  // recency bounds) joined with transactional features from orders and the
  // customer dimension, labeled for a purchase-propensity model. Grain =
  // event users (user_id ⊂ c_custkey in this lake). Scale shape: each
  // source aggregates to user grain BEFORE any join (map-side-combinable;
  // the joins then move one row per user, not per event/order), doubles
  // cross the wire only as exact decimals (graft.ops.Exact), and the two
  // left joins are user-keyed equi-joins AQE can size (the aggregated
  // sides are user-cardinality, far under the raw fact tables).
  private val userFeatures = Q(
    "train_user_features",
    Some("""
      WITH o AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
          CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                 OR epoch_us(CAST(ts AS TIMESTAMP))
                    - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
      ef AS (
        SELECT user_id, COUNT(*) AS n_events,
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
          CAST(SUM(is_new) AS BIGINT) AS n_sessions,
          COUNT(DISTINCT CAST(ts AS DATE)) AS days_active,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS event_value,
          min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
        FROM o GROUP BY user_id),
      yf AS (
        SELECT o_custkey AS user_id, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        FROM orders GROUP BY 1)
      SELECT ef.user_id, ef.n_events, ef.n_purchases, ef.n_sessions,
        ef.days_active, ef.event_value, ef.first_us, ef.last_us,
        COALESCE(yf.n_orders, 0) AS n_orders,
        COALESCE(yf.total_spent, 0.0) AS total_spent,
        c.c_mktsegment AS mktsegment,
        ef.n_purchases > 0 AS label_purchaser
      FROM ef LEFT JOIN yf ON ef.user_id = yf.user_id
      LEFT JOIN customer c ON ef.user_id = c.c_custkey
      ORDER BY ef.user_id
    """)) { (spark, dir) =>
    val gapUs = 30L * 60 * 1000 * 1000
    val prevTs = lag(col("ts"), 1).over(byUserTime)
    val isNew = when(
      prevTs.isNull || (unix_micros(col("ts")) - unix_micros(prevTs)) > gapUs, 1
    ).otherwise(0)
    val eventFeats = ev(spark, dir)
      .withColumn("is_new", isNew)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
        sum(col("is_new").cast("long")).as("n_sessions"),
        countDistinct(to_date(col("ts"))).as("days_active"),
        sumMoney(col("value")).as("event_value"),
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
    val orderFeats = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("user_id"))
      .agg(count(lit(1)).as("n_orders"),
        sumMoney(col("o_totalprice")).as("total_spent"))
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("mktsegment"))
    eventFeats
      .join(orderFeats, Seq("user_id"), "left")
      .join(cust, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"), col("n_purchases"),
        col("n_sessions"), col("days_active"), col("event_value"),
        col("first_us"), col("last_us"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("total_spent"), lit(0.0)).as("total_spent"),
        col("mktsegment"),
        (col("n_purchases") > 0).as("label_purchaser"))
      .orderBy(col("user_id"))
  }

  // -------------------------------------------------------------------------
  // Leakage-safe chronological split: train on the first 80% of the
  // observed day span, evaluate on the rest — the time-based split every
  // forecasting/propensity eval needs (hash splits leak future behavior
  // into train). The cutoff is integer day arithmetic off a 1-row min/max
  // span broadcast, so the assignment is a stateless map over the stream
  // at any scale; output is the 2-row split audit (volumes, user counts,
  // day ranges) a pipeline records next to the artifact.
  private val timeSplit = Q(
    "sample_time_split",
    Some("""
      WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
      span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM e),
      x AS (SELECT user_id, d,
        CASE WHEN d <= d0 + CAST(FLOOR(0.8 * (d1 - d0)) AS INTEGER)
             THEN 'train' ELSE 'test' END AS split
        FROM e CROSS JOIN span)
      SELECT split, COUNT(*) AS n_events,
        COUNT(DISTINCT user_id) AS n_users,
        MIN(d) AS first_day, MAX(d) AS last_day
      FROM x GROUP BY split ORDER BY split
    """)) { (spark, dir) =>
    val e = ev(spark, dir).select(col("user_id"), to_date(col("ts")).as("d"))
    val span = e.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    e.crossJoin(broadcast(span))
      .withColumn("split",
        when(col("d") <= date_add(col("d0"),
          floor(lit(0.8) * datediff(col("d1"), col("d0"))).cast("int")),
          "train").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("d")).as("first_day"), max(col("d")).as("last_day"))
      .orderBy(col("split"))
  }

  // -------------------------------------------------------------------------
  // Class-balanced downsampling: equalize a skewed binary label by keeping
  // every row of the minority class and a DETERMINISTIC hash-ordered
  // subset of the majority (md5-of-key order — reproducible across runs,
  // engines, and partitionings, the same discipline as sample_hash_10pct).
  // The label here is behavioral (user's event count above the per-SF
  // median) so both classes are populated at every scale factor. Scale
  // shape: one user-grain aggregate, two 1-row broadcasts (median, class
  // floor), one user-cardinality rank window per class — nothing
  // event-cardinality crosses a second shuffle.
  private val classBalanced = Q(
    "sample_class_balanced",
    Some("""
      WITH u AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
      m AS (SELECT median(n) AS med FROM u),
      l AS (SELECT user_id, n, n > med AS heavy FROM u CROSS JOIN m),
      k AS (SELECT LEAST(SUM(CASE WHEN heavy THEN 1 ELSE 0 END),
                         SUM(CASE WHEN heavy THEN 0 ELSE 1 END)) AS kmin FROM l),
      r AS (SELECT user_id, n, heavy,
              row_number() OVER (PARTITION BY heavy
                ORDER BY md5(CAST(user_id AS VARCHAR)), user_id) AS rn
            FROM l)
      SELECT user_id, n AS n_events, heavy FROM r CROSS JOIN k
      WHERE rn <= kmin ORDER BY user_id
    """)) { (spark, dir) =>
    val u = ev(spark, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
    val m = u.agg(median(col("n")).as("med"))
    // The labeled user frame feeds BOTH the class-floor scalar and the
    // per-class rank — localCheckpoint materializes it once (user-grain
    // rows, bounded) instead of re-running the event scan + median branch
    // per consumer (the lm_rare_bigram_ratio spine discipline).
    val l = u.crossJoin(broadcast(m))
      .withColumn("heavy", col("n") > col("med"))
      .localCheckpoint()
    val k = l.agg(least(
      sum(when(col("heavy"), 1L).otherwise(0L)),
      sum(when(col("heavy"), 0L).otherwise(1L))).as("kmin"))
    l.withColumn("rn", row_number().over(
        Window.partitionBy(col("heavy"))
          .orderBy(md5(col("user_id").cast("string")), col("user_id"))))
      .crossJoin(broadcast(k))
      .filter(col("rn") <= col("kmin"))
      .select(col("user_id"), col("n").as("n_events"), col("heavy"))
      .orderBy(col("user_id"))
  }

  // -------------------------------------------------------------------------
  // Burst-rate (bot/abuse) flags: each user's maximum event count inside any
  // trailing 24-hour window — the rate-limit signal a training pipeline uses
  // to drop scripted/bot traffic before events feed engagement labels.
  // Exact sliding count via a value-bounded RANGE frame over epoch-micros
  // (peers at identical timestamps are in-frame in both engines by RANGE
  // semantics); flag decided by an integer comparison, no IEEE anywhere.
  // The ≥10 threshold sits above the corpus's median-7 daily peak, so the
  // flag marks the genuine top tail (sf0.01: 2 of 150 users; sf0.1: 20 of
  // 1500), not everyone.
  //
  // Scale shape: one per-user window sort (the frame is value-bounded, so
  // no self-join and no per-hour densification) + one user-keyed
  // aggregate — a single corpus-width shuffle on user_id. A hot user is
  // bounded by their own event count, not the corpus.
  private val burstFlags = Q(
    "events_user_burst",
    Some("""
      WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      b AS (SELECT user_id, COUNT(*) OVER (PARTITION BY user_id ORDER BY us
              RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW) AS burst
            FROM e)
      SELECT user_id, CAST(MAX(burst) AS BIGINT) AS max_burst_24h,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(CASE WHEN MAX(burst) >= 10 THEN 1 ELSE 0 END AS INT) AS flag_burst
      FROM b GROUP BY user_id ORDER BY user_id
    """)) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-86399999999L, Window.currentRow)
    ev(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("burst", count(lit(1)).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("burst")).as("max_burst_24h"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("max_burst_24h"), col("n_events"),
        when(col("max_burst_24h") >= 10, 1).otherwise(0).cast("int")
          .as("flag_burst"))
      .orderBy(col("user_id"))
  }

  // -------------------------------------------------------------------------
  // Training-data drift monitor: does the event-type MIX shift between the
  // first and second half of the observed time span? Per type, a 2x2
  // Pearson chi-square of (this type vs rest) x (first half vs second) —
  // abtest_conversion_chi2's exact-integer significance discipline applied
  // to the data-drift question a pipeline asks before mixing time slices
  // into one training set. Halves split on integer epoch-days from a 1-row
  // min/max broadcast; the decision (chi2 > 3.841459, df=1) is a pure
  // DECIMAL(38,0) product comparison — IEEE appears only in the reported
  // chi2 value.
  //
  // Scale shape: ONE corpus pass to (type, half) counts (map-side
  // combinable); every join after is on the metadata-sized type table.
  private val driftChi2 = Q(
    "drift_event_mix_chi2",
    Some("""
      WITH e AS (SELECT event_type,
          epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        FROM events),
      span AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM e),
      h AS (SELECT event_type,
          CASE WHEN day < (mn + mx + 1) // 2 THEN 0 ELSE 1 END AS half
        FROM e, span),
      tc AS (SELECT event_type,
          CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS a,
          CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS b
        FROM h GROUP BY event_type),
      tot AS (SELECT CAST(SUM(a) AS HUGEINT) AS ta,
                     CAST(SUM(b) AS HUGEINT) AS tb FROM tc)
      SELECT event_type,
        CAST(a AS BIGINT) AS n_first, CAST(b AS BIGINT) AS n_second,
        CASE WHEN (a+b) * ((ta-a)+(tb-b)) * ta * tb = 0 THEN NULL ELSE
          round(CAST((ta+tb) * (a*(tb-b) - b*(ta-a)) * (a*(tb-b) - b*(ta-a))
              AS DOUBLE)
            / CAST((a+b) * ((ta-a)+(tb-b)) * ta * tb AS DOUBLE), 6) END
          AS chi2,
        CAST(1000000 * (ta+tb) * (a*(tb-b) - b*(ta-a)) * (a*(tb-b) - b*(ta-a))
          > 3841459 * ((a+b) * ((ta-a)+(tb-b)) * ta * tb) AS INTEGER)
          AS drift_flag
      FROM tc CROSS JOIN tot ORDER BY event_type
    """)) { (spark, dir) =>
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val e = ev(spark, dir).select(col("event_type"),
      expr("unix_micros(ts) DIV 86400000000").as("day"))
    val span = e.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val tc = e.crossJoin(broadcast(span))
      .withColumn("half",
        when(col("day") < expr("(mn + mx + 1) DIV 2"), 0).otherwise(1))
      .groupBy(col("event_type"))
      .agg(sum(when(col("half") === 0, 1).otherwise(0)).cast(dec).as("a"),
        sum(when(col("half") === 1, 1).otherwise(0)).cast(dec).as("b"))
    val tot = tc.agg(sum(col("a")).cast(dec).as("ta"),
      sum(col("b")).cast(dec).as("tb"))
    val a = col("a"); val b = col("b")
    val ta = col("ta"); val tb = col("tb")
    val c = ta - a; val d = tb - b
    val num = (ta + tb) * (a * d - b * c) * (a * d - b * c)
    val den = (a + b) * (c + d) * ta * tb
    tc.crossJoin(broadcast(tot))
      .select(col("event_type"),
        a.cast("long").as("n_first"), b.cast("long").as("n_second"),
        when(den === 0, lit(null).cast("double"))
          .otherwise(round(num.cast("double") / den.cast("double"), 6))
          .as("chi2"),
        (num * 1000000 > den * 3841459).cast("int").as("drift_flag"))
      .orderBy(col("event_type"))
  }

  // -------------------------------------------------------------------------
  // Behavioral-diversity score: per user, the Gini-Simpson index of their
  // event-type mix — 1 − Σₜ pₜ² = (n² − Σₜ nₜ²) / n², the
  // logarithm-free diversity measure (entropy's ln is not correctly-rounded
  // cross-engine; this is exact integers + ONE division). Scripted/bot
  // traffic concentrates on few types → low diversity; the flag marks
  // users below the corpus median (a 1-row broadcast of an exact
  // interpolated median over per-user doubles — identical inputs give the
  // identical median in both engines). Scale shape: (user, type) aggregate
  // → user aggregate, both map-side combinable on user-keyed shuffles;
  // nothing wider than the user frame after the first reduce.
  private val userDiversity = Q(
    "profile_user_diversity",
    Some("""
      WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
                 FROM events GROUP BY 1, 2),
      u AS (SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
              CAST(SUM(n * n) AS BIGINT) AS sq FROM c GROUP BY 1),
      d AS (SELECT user_id, n_events,
              CAST(n_events * n_events - sq AS DOUBLE)
                / (n_events * n_events) AS diversity
            FROM u),
      m AS (SELECT median(diversity) AS med FROM d)
      SELECT user_id, n_events, diversity,
        CAST(CASE WHEN diversity < med THEN 1 ELSE 0 END AS INT)
          AS flag_low_diversity
      FROM d CROSS JOIN m ORDER BY user_id
    """)) { (spark, dir) =>
    val c = ev(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val u = c.groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_events"), sum(col("n") * col("n")).as("sq"))
    val d = u.select(col("user_id"), col("n_events"),
        ((col("n_events") * col("n_events") - col("sq")).cast("double") /
          (col("n_events") * col("n_events"))).as("diversity"))
      .localCheckpoint() // feeds the median AND the flagged output
    val m = d.agg(median(col("diversity")).as("med"))
    d.crossJoin(broadcast(m))
      .select(col("user_id"), col("n_events"), col("diversity"),
        (col("diversity") < col("med")).cast("int")
          .as("flag_low_diversity"))
      .orderBy(col("user_id"))
  }

  // -------------------------------------------------------------------------
  // Point-in-time feature assembly (feature-store "PIT join" discipline):
  // every purchase event becomes a training example carrying features of
  // the user's STRICTLY-PRIOR activity — running per-type counts and the
  // previous event's value/time — with zero leakage by construction (the
  // window frame ends at 1 PRECEDING). The classic formulation is an
  // as-of join of the spine against feature tables; here spine and
  // features share one source, so the whole assembly is ONE sort per
  // user partition and NO join at all — the shape to reach for before
  // paying an as-of join's range machinery. event_id breaks ts ties, so
  // both engines agree on frame membership bitwise.
  private val pitFeatures = Q(
    "train_pit_features",
    Some("""
      WITH feat AS (
        SELECT event_id, user_id, ts, event_type, value,
          COUNT(*) FILTER (WHERE event_type = 'view') OVER w AS n_prior_views,
          COUNT(*) FILTER (WHERE event_type = 'click') OVER w AS n_prior_clicks,
          COUNT(*) FILTER (WHERE event_type = 'purchase') OVER w AS n_prior_purchases,
          lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS last_prior_value,
          epoch_us(CAST(ts AS TIMESTAMP))
            - lag(epoch_us(CAST(ts AS TIMESTAMP)))
              OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS micros_since_prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      )
      SELECT event_id, user_id,
        CAST(n_prior_views AS BIGINT) AS n_prior_views,
        CAST(n_prior_clicks AS BIGINT) AS n_prior_clicks,
        CAST(n_prior_purchases AS BIGINT) AS n_prior_purchases,
        last_prior_value,
        CAST(micros_since_prev AS BIGINT) AS micros_since_prev
      FROM feat WHERE event_type = 'purchase'
      ORDER BY event_id
    """)) { (spark, dir) =>
    // ONE window ordering serves every feature -> one sort pass
    val prior = byUserTime.rowsBetween(Window.unboundedPreceding, -1)
    def nPrior(tpe: String): Column =
      count(when(col("event_type") === tpe, 1)).over(prior)
    ev(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"),
        nPrior("view").as("n_prior_views"),
        nPrior("click").as("n_prior_clicks"),
        nPrior("purchase").as("n_prior_purchases"),
        lag(col("value"), 1).over(byUserTime).as("last_prior_value"),
        (unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(byUserTime))
          .as("micros_since_prev"))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("n_prior_views"),
        col("n_prior_clicks"), col("n_prior_purchases"),
        col("last_prior_value"), col("micros_since_prev"))
      .orderBy(col("event_id"))
  }

  override val specs: Seq[Q] = Seq(
    extractDay, ga4Flatten, dailyKpis, funnel, sessionize, sessionizeNative,
    attribution,
    journeys, cohort, missingDays, propsHistogram, asofQ, propsKv,
    convLatency, abtest, wau, markov, intervalAttr, userFeatures,
    timeSplit, classBalanced, burstFlags, driftChi2, userDiversity,
    pitFeatures)
}
