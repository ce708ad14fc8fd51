package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.lake.Tables

/**
 * Warehouse-maintenance operators — the jobs a commerce lake runs around
 * its analytics: slowly-changing-dimension history (the MERGE the
 * reference's daily batch loader implies when a dimension row changes,
 * cf. /root/reference/src/pipeline/loaders/s3_loader.py's day-partitioned
 * overwrite model) and a data-quality expectation battery (the
 * schema/row-count validation the reference does ad hoc in
 * /root/reference/src/pipeline/extractors/ga4_extractor.py, generalized to
 * declarative checks).
 *
 * Scale posture: the SCD2 merge is one shuffle on the dimension key plus
 * one Generate (no per-row driver logic — the classic "close out + insert"
 * is expressed as a single declarative plan, so Catalyst pushes the change
 * detection into the join). The DQ battery reads each fact table ONCE via
 * conditional aggregation (all per-table checks share a scan) and each
 * referential check is a single left join whose null-count is the orphan
 * count — no per-check re-scans, which is what makes a 100-check suite
 * affordable at 100 TB.
 */
object Warehouse extends Family {

  // ---------------------------------------------------------------------
  // SCD2 dimension merge: the customer dimension versus an incoming change
  // batch (customers who placed an URGENT order on/after 1995-01-01 move to
  // the 'PRIORITY' segment, effective at their first such order). Changed
  // customers produce TWO history rows — the closed-out original validity
  // interval and the open current one; unchanged customers pass through as
  // open rows. The whole merge is: one aggregate over orders (the change
  // batch), one left join on the dimension key, one Generate — at 100 TB
  // both sides shuffle on c_custkey once and AQE picks SMJ/BHJ by size.
  private val scd2 = Q(
    "scd2_customer_segment",
    Some("""
      WITH eff AS (
        SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS eff
        FROM orders
        WHERE o_orderpriority = '1-URGENT'
          AND CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
        GROUP BY o_custkey),
      j AS (
        SELECT c.c_custkey, c.c_mktsegment, e.eff
        FROM customer c LEFT JOIN eff e ON e.o_custkey = c.c_custkey)
      SELECT c_custkey, segment, valid_from, valid_to, is_current FROM (
        SELECT c_custkey, c_mktsegment AS segment,
          DATE '1992-01-01' AS valid_from, eff AS valid_to, 0 AS is_current
        FROM j WHERE eff IS NOT NULL AND c_mktsegment <> 'PRIORITY'
        UNION ALL
        SELECT c_custkey, 'PRIORITY', eff, NULL, 1
        FROM j WHERE eff IS NOT NULL AND c_mktsegment <> 'PRIORITY'
        UNION ALL
        SELECT c_custkey, c_mktsegment, DATE '1992-01-01', NULL, 1
        FROM j WHERE eff IS NULL OR c_mktsegment = 'PRIORITY'
      ) ORDER BY c_custkey, valid_from
    """)) { (spark, dir) =>
    scd2Dim(spark, dir).orderBy(col("c_custkey"), col("valid_from"))
  }

  /** The type-2 dimension rows (c_custkey, segment, valid_from, valid_to,
    * is_current) — shared by the merge query and the as-of read. */
  private def scd2Dim(spark: SparkSession, dir: String): DataFrame = {
    val dimStart = to_date(lit("1992-01-01"))
    val changes = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        to_date(col("o_orderdate")) >= "1995-01-01")
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("eff"))
    val nullDate = lit(null).cast("date")
    def row(seg: Column, from: Column, to: Column, cur: Int) =
      struct(seg.as("segment"), from.as("valid_from"), to.as("valid_to"),
        lit(cur).as("is_current"))
    Tables.load(spark, dir, "customer")
      .join(changes, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), explode(
        when(col("eff").isNotNull && col("c_mktsegment") =!= "PRIORITY",
          array(
            row(col("c_mktsegment"), dimStart, col("eff"), 0),
            row(lit("PRIORITY"), col("eff"), nullDate, 1)))
          .otherwise(array(
            row(col("c_mktsegment"), dimStart, nullDate, 1)))).as("r"))
      .select(col("c_custkey"), col("r.segment"), col("r.valid_from"),
        col("r.valid_to"), col("r.is_current"))
  }

  // ---------------------------------------------------------------------
  // Point-in-time (as-of) read over the type-2 dimension: each customer's
  // segment as of a fixed date — the query every SCD2 table exists to
  // answer. Validity-window predicate (valid_from <= D < valid_to, open
  // intervals NULL-terminated), map-only over the dim build; exactly one
  // row per customer survives (spec'd by the UNION shape: windows
  // partition the timeline). At 100 TB the dim is read, not rebuilt —
  // the predicate pushes into the dim scan.
  private val scd2AsOf = Q(
    "scd2_as_of_read",
    Some("""
      WITH eff AS (
        SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS eff
        FROM orders
        WHERE o_orderpriority = '1-URGENT'
          AND CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
        GROUP BY o_custkey),
      j AS (
        SELECT c.c_custkey, c.c_mktsegment, e.eff
        FROM customer c LEFT JOIN eff e ON e.o_custkey = c.c_custkey),
      dim AS (
        SELECT c_custkey, c_mktsegment AS segment,
          DATE '1992-01-01' AS valid_from, eff AS valid_to
        FROM j WHERE eff IS NOT NULL AND c_mktsegment <> 'PRIORITY'
        UNION ALL
        SELECT c_custkey, 'PRIORITY', eff, NULL
        FROM j WHERE eff IS NOT NULL AND c_mktsegment <> 'PRIORITY'
        UNION ALL
        SELECT c_custkey, c_mktsegment, DATE '1992-01-01', NULL
        FROM j WHERE eff IS NULL OR c_mktsegment = 'PRIORITY')
      SELECT c_custkey, segment AS segment_as_of
      FROM dim
      WHERE valid_from <= DATE '1996-06-01'
        AND (valid_to IS NULL OR valid_to > DATE '1996-06-01')
      ORDER BY c_custkey
    """)) { (spark, dir) =>
    val d = to_date(lit("1996-06-01"))
    scd2Dim(spark, dir)
      .filter(col("valid_from") <= d &&
        (col("valid_to").isNull || col("valid_to") > d))
      .select(col("c_custkey"), col("segment").as("segment_as_of"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------------
  // Data-quality expectation battery: domain/range/sign checks share ONE
  // conditional-aggregation scan per table; referential checks are left
  // joins whose null-count is the orphan count (one pass each, yielding
  // n_rows AND violations together). Output is the tall report shape a
  // quality dashboard ingests: (check_name, n_rows, n_violations, pass).
  private def v(cond: Column): Column =
    sum(when(cond, 1L).otherwise(0L))

  private def tall(checks: (String, Column, Column)*): Column =
    explode(array(checks.map { case (name, rows, viol) =>
      struct(lit(name).as("check_name"), rows.as("n_rows"),
        viol.as("n_violations"))
    }: _*))

  private val dq = Q(
    "dq_checks",
    Some("""
      SELECT check_name, n_rows, n_violations,
        CAST(n_violations = 0 AS INTEGER) AS pass
      FROM (
        SELECT 'customer_acctbal_range' AS check_name,
          count(*) AS n_rows,
          CAST(coalesce(sum(CASE WHEN c_acctbal < -999.99 OR c_acctbal > 9999.99
            THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations FROM customer
        UNION ALL
        SELECT 'customer_custkey_unique', count(*),
          count(*) - count(DISTINCT c_custkey) FROM customer
        UNION ALL
        SELECT 'lineitem_discount_range', count(*),
          CAST(coalesce(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
            THEN 1 ELSE 0 END), 0) AS BIGINT) FROM lineitem
        UNION ALL
        SELECT 'lineitem_orphan_orderkey', count(*),
          CAST(coalesce(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT)
        FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
          ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'lineitem_price_positive', count(*),
          CAST(coalesce(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) FROM lineitem
        UNION ALL
        SELECT 'lineitem_quantity_range', count(*),
          CAST(coalesce(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
            THEN 1 ELSE 0 END), 0) AS BIGINT) FROM lineitem
        UNION ALL
        SELECT 'orders_orphan_custkey', count(*),
          CAST(coalesce(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT)
        FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
          ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'orders_priority_domain', count(*),
          CAST(coalesce(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT',
            '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
            THEN 1 ELSE 0 END), 0) AS BIGINT) FROM orders
        UNION ALL
        SELECT 'orders_status_domain', count(*),
          CAST(coalesce(sum(CASE WHEN o_orderstatus NOT IN ('P', 'O', 'F')
            THEN 1 ELSE 0 END), 0) AS BIGINT) FROM orders
        UNION ALL
        SELECT 'orders_totalprice_positive', count(*),
          CAST(coalesce(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) FROM orders
      ) ORDER BY check_name
    """)) { (spark, dir) =>
    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")

    val custChecks = cust
      .agg(count(lit(1)).as("n"),
        v(col("c_acctbal") < -999.99 || col("c_acctbal") > 9999.99).as("bal"),
        (count(lit(1)) - countDistinct(col("c_custkey"))).as("uniq"))
      .select(tall(
        ("customer_acctbal_range", col("n"), col("bal")),
        ("customer_custkey_unique", col("n"), col("uniq"))).as("r"))

    val liChecks = li
      .agg(count(lit(1)).as("n"),
        v(col("l_discount") < 0 || col("l_discount") > 0.1).as("disc"),
        v(col("l_extendedprice") <= 0).as("price"),
        v(col("l_quantity") < 1 || col("l_quantity") > 50).as("qty"))
      .select(tall(
        ("lineitem_discount_range", col("n"), col("disc")),
        ("lineitem_price_positive", col("n"), col("price")),
        ("lineitem_quantity_range", col("n"), col("qty"))).as("r"))

    val ordChecks = ord
      .agg(count(lit(1)).as("n"),
        v(!col("o_orderpriority").isin(
          "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")).as("pri"),
        v(!col("o_orderstatus").isin("P", "O", "F")).as("st"),
        v(col("o_totalprice") <= 0).as("tp"))
      .select(tall(
        ("orders_priority_domain", col("n"), col("pri")),
        ("orders_status_domain", col("n"), col("st")),
        ("orders_totalprice_positive", col("n"), col("tp"))).as("r"))

    // Referential checks: ONE left join each — count(*) gives n_rows and
    // the null-count gives orphans in the same pass (no separate anti join
    // + recount). The parent side is reduced to its distinct key first so
    // the join carries keys only.
    val liOrphans = li.select(col("l_orderkey"))
      .join(ord.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n"), v(col("o_orderkey").isNull).as("orph"))
      .select(tall(("lineitem_orphan_orderkey", col("n"), col("orph"))).as("r"))

    val ordOrphans = ord.select(col("o_custkey"))
      .join(cust.select(col("c_custkey")).distinct(),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n"), v(col("c_custkey").isNull).as("orph"))
      .select(tall(("orders_orphan_custkey", col("n"), col("orph"))).as("r"))

    custChecks.unionAll(liChecks).unionAll(ordChecks)
      .unionAll(liOrphans).unionAll(ordOrphans)
      .select(col("r.check_name"), col("r.n_rows"), col("r.n_violations"),
        when(col("r.n_violations") === 0, 1).otherwise(0).as("pass"))
      .orderBy(col("check_name"))
  }

  // ---------------------------------------------------------------------
  // Market-basket co-purchase mining: part pairs bought together in one
  // order, ranked by support, with lift against the parts' independent
  // order frequencies. The pair generation is a self-join on the order key
  // — per-order fanout is (lines choose 2), bounded by the ~7-line order
  // shape, so pair volume is linear in orders, not quadratic in parts.
  // Lift is computed AFTER the top-k cut: only 100 rows join back to the
  // per-part counts. Lift arithmetic: integer products cast to double with
  // a fixed association order, one IEEE division — engine-deterministic.
  private val basket = Q(
    "basket_part_pairs",
    Some("""
      WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM lp a JOIN lp b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      sup AS (SELECT part_a, part_b, COUNT(*) AS n_orders
        FROM pairs GROUP BY part_a, part_b
        ORDER BY n_orders DESC, part_a, part_b LIMIT 100),
      pc AS (SELECT l_partkey, COUNT(*) AS n_part FROM lp GROUP BY l_partkey),
      tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_tot
        FROM lineitem)
      SELECT s.part_a, s.part_b, s.n_orders,
        CAST(s.n_orders * tot.n_tot AS DOUBLE)
          / CAST(ca.n_part * cb.n_part AS DOUBLE) AS lift
      FROM sup s CROSS JOIN tot
      JOIN pc ca ON ca.l_partkey = s.part_a
      JOIN pc cb ON cb.l_partkey = s.part_b
      ORDER BY n_orders DESC, part_a, part_b
    """)) { (spark, dir) =>
    val lp = CoPurchase.orderParts(spark, dir)
    val sup = CoPurchase.support(spark, dir)
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(100)
    val pc = lp.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
    val tot = lp.agg(countDistinct(col("l_orderkey")).as("n_tot"))
    sup
      .join(pc.select(col("l_partkey").as("part_a"), col("n_part").as("ca")),
        Seq("part_a"))
      .join(pc.select(col("l_partkey").as("part_b"), col("n_part").as("cb")),
        Seq("part_b"))
      .crossJoin(broadcast(tot))
      .select(col("part_a"), col("part_b"), col("n_orders"),
        ((col("n_orders") * col("n_tot")).cast("double")
          / (col("ca") * col("cb")).cast("double")).as("lift"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
  }

  // ---------------------------------------------------------------------
  // Calendar gap-fill: daily revenue per order priority, densified so every
  // (day, priority) cell in the table's date span exists — missing cells
  // become explicit zeros (what any time-series model or dashboard needs;
  // the raw fact table silently skips empty days). The calendar axis is
  // GENERATED from a 1-row min/max frame (sequence + explode — metadata,
  // never a scan), crossed with the 5-value priority dimension, then
  // left-joined to the once-aggregated facts. One fact shuffle on
  // (day, priority); the calendar side is broadcast.
  private val calendarFill = Q(
    "calendar_fill_daily_sales",
    Some("""
      WITH f AS (SELECT CAST(o_orderdate AS DATE) AS d, o_orderpriority AS pri,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_orders
        FROM orders GROUP BY 1, 2),
      span AS (SELECT min(CAST(o_orderdate AS DATE)) AS lo,
          max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
      days AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
        FROM span),
      pris AS (SELECT DISTINCT o_orderpriority AS pri FROM orders),
      cal AS (SELECT d, pri FROM days, pris)
      SELECT cal.d AS order_date, cal.pri AS priority,
        COALESCE(f.revenue, 0.0) AS revenue,
        COALESCE(f.n_orders, 0) AS n_orders
      FROM cal LEFT JOIN f ON f.d = cal.d AND f.pri = cal.pri
      ORDER BY order_date, priority
    """)) { (spark, dir) =>
    val o = Tables.load(spark, dir, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        col("o_orderpriority").as("pri"), col("o_totalprice"))
    val f = o.groupBy(col("d"), col("pri"))
      .agg(graft.ops.Exact.sumMoney(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
    val days = o.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
    val pris = o.select(col("pri")).distinct()
    // both cal sides are aggregate-sized; f is calendar-bounded too, so
    // AQE picks the broadcast side at runtime
    days.crossJoin(broadcast(pris))
      .join(f, Seq("d", "pri"), "left")
      .select(col("d").as("order_date"), col("pri").as("priority"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy(col("order_date"), col("priority"))
  }

  // ---------------------------------------------------------------------
  // Column profiling: null count + distinct cardinality for every profiled
  // column, ONE conditional-aggregation scan per table (a naive profiler
  // re-scans per column — 10x the I/O here, fatal at 100 TB). Exact
  // distinct counts keep the oracle twin exact; a production profile at
  // 100 TB would flip them to approx_count_distinct under the same plan.
  private def profileAgg(df: DataFrame, tbl: String, cols: Seq[String]) = {
    val aggs = cols.flatMap { c => Seq(
      v(col(c).isNull).as(s"_n_$c"),
      countDistinct(col(c)).as(s"_d_$c"))
    }
    df.agg(count(lit(1)).as("n"), aggs: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(s"$tbl.$c").as("column_name"), col("n").as("n_rows"),
          col(s"_n_$c").as("n_nulls"), col(s"_d_$c").as("n_distinct"))
      }: _*)).as("r"))
      .select(col("r.column_name"), col("r.n_rows"), col("r.n_nulls"),
        col("r.n_distinct"))
  }

  // ---------------------------------------------------------------------
  // Time-series gap repair: the high-value order series (o_totalprice >
  // 400k) observes ~72% of calendar days; the missing days get LINEAR
  // interpolation between their bracketing observations — the step before
  // any per-day model (forecasting, anomaly scoring) that assumes a dense
  // series. calendar_fill answers "fill with zero"; this answers "fill
  // with the trend".
  //
  // Exactness: observations are BIGINT cents (exact decimal sum); the
  // interpolated value prev + (next-prev)*(d-pd)/(nd-pd) is algebraically
  // regrouped to the integer-exact form
  //   (prev*(nd-d) + next*(d-pd)) / (nd-pd)
  // so both engines do ALL arithmetic in int64 and exactly ONE IEEE
  // division at the end — bit-identical doubles, no floor-division
  // semantics in sight. Scale shape: the day-grain aggregate is the only
  // data-sized stage; the fill windows run over the calendar-bounded frame
  // (a few thousand rows regardless of fact volume — same posture as
  // calendar_fill's single-partition calendar stages).
  private val tsInterp = Q(
    "ts_interpolate_linear",
    Some("""
      WITH f AS (SELECT CAST(o_orderdate AS DATE) AS d,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))*100 AS BIGINT)
            AS rev_cents
        FROM orders WHERE o_totalprice > 400000 GROUP BY 1),
      span AS (SELECT min(d) AS lo, max(d) AS hi FROM f),
      days AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE
          AS d FROM span),
      j AS (SELECT days.d, f.rev_cents FROM days LEFT JOIN f USING (d)),
      w AS (SELECT d, rev_cents,
          last_value(rev_cents IGNORE NULLS) OVER
            (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS prev_v,
          max(CASE WHEN rev_cents IS NOT NULL THEN d END) OVER
            (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS prev_d,
          first_value(rev_cents IGNORE NULLS) OVER
            (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
            AS next_v,
          min(CASE WHEN rev_cents IS NOT NULL THEN d END) OVER
            (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
            AS next_d
        FROM j)
      SELECT d AS day,
        CAST(rev_cents IS NOT NULL AS INTEGER) AS observed,
        CASE WHEN rev_cents IS NOT NULL THEN CAST(rev_cents AS DOUBLE)
          ELSE CAST(prev_v * datediff('day', d, next_d)
                  + next_v * datediff('day', prev_d, d) AS DOUBLE)
               / datediff('day', prev_d, next_d)
        END AS value_cents
      FROM w ORDER BY day
    """)) { (spark, dir) =>
    val f = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg((sum(graft.ops.Exact.dec2(col("o_totalprice"))) * 100).cast("long")
        .as("rev_cents"))
    val days = f.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
    val j = days.join(f, Seq("d"), "left")
    val back = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.orderBy(col("d"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("rev_cents").isNotNull, col("d"))
    j.select(col("d"), col("rev_cents"),
        last(col("rev_cents"), ignoreNulls = true).over(back).as("prev_v"),
        max(obsDay).over(back).as("prev_d"),
        first(col("rev_cents"), ignoreNulls = true).over(fwd).as("next_v"),
        min(obsDay).over(fwd).as("next_d"))
      .select(col("d").as("day"),
        col("rev_cents").isNotNull.cast("int").as("observed"),
        when(col("rev_cents").isNotNull, col("rev_cents").cast("double"))
          .otherwise(
            (col("prev_v") * datediff(col("next_d"), col("d"))
              + col("next_v") * datediff(col("d"), col("prev_d")))
              .cast("double")
              / datediff(col("next_d"), col("prev_d")))
          .as("value_cents"))
      .orderBy(col("day"))
  }

  private val profile = Q(
    "profile_tables",
    Some("""
      SELECT column_name, n_rows, n_nulls, n_distinct FROM (
        SELECT 'customer.c_acctbal' AS column_name, COUNT(*) AS n_rows,
          CAST(coalesce(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_nulls,
          COUNT(DISTINCT c_acctbal) AS n_distinct FROM customer
        UNION ALL
        SELECT 'customer.c_mktsegment', COUNT(*),
          CAST(coalesce(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT),
          COUNT(DISTINCT c_mktsegment) FROM customer
        UNION ALL
        SELECT 'orders.o_custkey', COUNT(*),
          CAST(coalesce(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT),
          COUNT(DISTINCT o_custkey) FROM orders
        UNION ALL
        SELECT 'orders.o_orderstatus', COUNT(*),
          CAST(coalesce(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT),
          COUNT(DISTINCT o_orderstatus) FROM orders
        UNION ALL
        SELECT 'orders.o_totalprice', COUNT(*),
          CAST(coalesce(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT),
          COUNT(DISTINCT o_totalprice) FROM orders
        UNION ALL
        SELECT 'lineitem.l_partkey', COUNT(*),
          CAST(coalesce(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT),
          COUNT(DISTINCT l_partkey) FROM lineitem
        UNION ALL
        SELECT 'lineitem.l_quantity', COUNT(*),
          CAST(coalesce(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT),
          COUNT(DISTINCT l_quantity) FROM lineitem
        UNION ALL
        SELECT 'lineitem.l_returnflag', COUNT(*),
          CAST(coalesce(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT),
          COUNT(DISTINCT l_returnflag) FROM lineitem
      ) ORDER BY column_name
    """)) { (spark, dir) =>
    val cust = profileAgg(Tables.load(spark, dir, "customer"),
      "customer", Seq("c_acctbal", "c_mktsegment"))
    val ord = profileAgg(Tables.load(spark, dir, "orders"),
      "orders", Seq("o_custkey", "o_orderstatus", "o_totalprice"))
    val li = profileAgg(Tables.load(spark, dir, "lineitem"),
      "lineitem", Seq("l_partkey", "l_quantity", "l_returnflag"))
    cust.unionAll(ord).unionAll(li)
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"))
      .orderBy(col("column_name"))
  }

  // ---------------------------------------------------------------------
  // Weekday seasonality decomposition: mean daily revenue per ISO weekday
  // plus each weekday's seasonal index vs the overall daily mean — the
  // multiplicative-seasonality profile a demand forecast deseasonalizes
  // with (and the staffing/inventory readout the reference's dashboards
  // imply). The index is ONE division of exact int64 cross-products
  // (revenue_cents·total_days / n_days·total_cents — no chained ratio
  // rounding); the mean is one division. Scale shape: one conditional
  // aggregate over orders to the 7-row weekday table (map-side
  // combinable; count distinct day is day-cardinality, calendar-bounded),
  // then a 1-row grand-total broadcast.
  private val weekdaySeasonality = Q(
    "ts_weekday_seasonality",
    Some("""
      WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM orders),
      w AS (SELECT isodow(day) AS weekday,
          CAST(SUM(cents) AS BIGINT) AS revenue_cents,
          CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
        FROM d GROUP BY 1),
      t AS (SELECT CAST(SUM(revenue_cents) AS BIGINT) AS tot,
          CAST(SUM(n_days) AS BIGINT) AS tot_days FROM w)
      SELECT weekday, n_days, revenue_cents,
        CAST(revenue_cents AS DOUBLE) / n_days AS mean_daily_cents,
        CAST(revenue_cents * tot_days AS DOUBLE) / (n_days * tot)
          AS seasonal_index
      FROM w CROSS JOIN t ORDER BY weekday
    """)) { (spark, dir) =>
    val d = Tables.load(spark, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        (graft.ops.Exact.dec2(col("o_totalprice")) * 100).cast("long")
          .as("cents"))
    // Spark weekday() is 0=Mon..6=Sun; DuckDB isodow is 1=Mon..7=Sun
    val w = d.groupBy((weekday(col("day")) + 1).cast("long").as("weekday"))
      .agg(sum(col("cents")).as("revenue_cents"),
        countDistinct(col("day")).as("n_days"))
    val t = w.agg(sum(col("revenue_cents")).as("tot"),
      sum(col("n_days")).as("tot_days"))
    w.crossJoin(broadcast(t))
      .select(col("weekday"), col("n_days"), col("revenue_cents"),
        (col("revenue_cents").cast("double") / col("n_days"))
          .as("mean_daily_cents"),
        ((col("revenue_cents") * col("tot_days")).cast("double") /
          (col("n_days") * col("tot"))).as("seasonal_index"))
      .orderBy(col("weekday"))
  }

  // ---------------------------------------------------------------------
  // Lag-7 autocorrelation of daily revenue — the ACF point a forecast
  // inspects to pick (or reject) a weekly seasonal period, numerically
  // confirming what ts_weekday_seasonality shows structurally (this
  // synthetic corpus: indexes ≈ 1.0 and r ≈ 0, an honest null). Pearson r
  // over the (day, day+7) pair series in exact int64 moment sums — the
  // day series is floored to whole kilodollars so every product
  // n·Σx², (Σx)² stays far inside int64 at catalog SFs (rescale the unit
  // dial for corpora ≥ ~1e9 kilodollar-days); IEEE appears only in the
  // final cast/sqrt/divide chain, every step correctly rounded on
  // identical operands in both engines (the temperature-mix sqrt parity).
  // Scale shape: one orders aggregate to the calendar-bounded day grain,
  // a day-keyed self-join at +7 days, a 1-row moment reduction.
  private val autocorrLag7 = Q(
    "ts_autocorr_lag7",
    Some("""
      WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
            // 100000 AS rev
        FROM orders GROUP BY 1),
      p AS (SELECT a.rev AS x, b.rev AS y
            FROM d a JOIN d b ON b.day = a.day + 7),
      s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
              CAST(SUM(x * y) AS BIGINT) AS sxy,
              CAST(SUM(x * x) AS BIGINT) AS sxx,
              CAST(SUM(y * y) AS BIGINT) AS syy
            FROM p)
      SELECT 7 AS lag_days, n AS n_pairs,
        CAST(n * sxy - sx * sy AS DOUBLE)
          / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS autocorr
      FROM s
    """)) { (spark, dir) =>
    val d = Tables.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(floor((sum(graft.ops.Exact.dec2(col("o_totalprice"))) * 100)
        .cast("long") / 100000).cast("long").as("rev"))
    val p = d.alias("a")
      .join(d.alias("b"), col("b.day") === date_add(col("a.day"), 7))
      .select(col("a.rev").as("x"), col("b.rev").as("y"))
    val s = p.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    s.select(lit(7).as("lag_days"), col("n").as("n_pairs"),
      ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
         sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
        .as("autocorr"))
  }

  // ---------------------------------------------------------------------
  // Spearman rank correlation between daily revenue and daily order count
  // — the monotone-association twin of ts_autocorr_lag7's Pearson (rank
  // correlation is what a forecast/mix audit wants when the relationship
  // is monotone but not linear, and it is outlier-immune by construction).
  // Midrank tie handling in pure int64: the DOUBLED midrank
  // 2·mid = 2·rank + |ties| − 1 (the eval_auc_rank doubling trick) keeps
  // every rank integral, so the moment sums n·Σxy − Σx·Σy etc. are exact
  // and the final sqrt/divide chain is the only IEEE step — identical on
  // both engines. Degenerate guard: a constant series has no rank
  // variance; report a deliberate NULL (the eval_auc_rank discipline).
  // Scale shape: one orders aggregate to the calendar-bounded day grain
  // (map-side combinable), two rank windows over that metadata-sized
  // frame, a 1-row moment reduction. Doubled ranks are ≤ 2n, so the
  // binding terms are the rho-numerator products n·sxx and sx·sx, each
  // ≤ 4n⁴ — int64-safe to n ≈ 3.9e4 days (a 107-year daily calendar;
  // past that DuckDB raises BIGINT overflow while Spark wraps, so the
  // day-grain bound is a hard contract, not a nicety).
  private val spearman = Q(
    "ts_spearman_rev_orders",
    Some("""
      WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
            AS rev,
          CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1),
      r AS (SELECT
          CAST(2 * rank() OVER (ORDER BY rev)
            + COUNT(*) OVER (PARTITION BY rev) - 1 AS BIGINT) AS rx2,
          CAST(2 * rank() OVER (ORDER BY n_orders)
            + COUNT(*) OVER (PARTITION BY n_orders) - 1 AS BIGINT) AS ry2
        FROM d),
      s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(rx2) AS BIGINT) AS sx, CAST(SUM(ry2) AS BIGINT) AS sy,
          CAST(SUM(rx2 * ry2) AS BIGINT) AS sxy,
          CAST(SUM(rx2 * rx2) AS BIGINT) AS sxx,
          CAST(SUM(ry2 * ry2) AS BIGINT) AS syy
        FROM r)
      SELECT n AS n_days,
        CASE WHEN n * sxx = sx * sx OR n * syy = sy * sy THEN NULL
          ELSE CAST(n * sxy - sx * sy AS DOUBLE)
            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
               * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        END AS spearman_rho
      FROM s
    """)) { (spark, dir) =>
    val d = Tables.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(graft.ops.Exact.dec2(col("o_totalprice"))) * 100)
        .cast("long").as("rev"),
        count(lit(1)).as("n_orders"))
    val r = d.select(
      (lit(2L) * rank().over(Window.orderBy(col("rev"))) +
        count(lit(1)).over(Window.partitionBy(col("rev"))) - 1)
        .cast("long").as("rx2"),
      (lit(2L) * rank().over(Window.orderBy(col("n_orders"))) +
        count(lit(1)).over(Window.partitionBy(col("n_orders"))) - 1)
        .cast("long").as("ry2"))
    val s = r.agg(count(lit(1)).as("n"),
      sum(col("rx2")).as("sx"), sum(col("ry2")).as("sy"),
      sum(col("rx2") * col("ry2")).as("sxy"),
      sum(col("rx2") * col("rx2")).as("sxx"),
      sum(col("ry2") * col("ry2")).as("syy"))
    s.select(col("n").as("n_days"),
      when(col("n") * col("sxx") === col("sx") * col("sx") ||
           col("n") * col("syy") === col("sy") * col("sy"),
        lit(null).cast("double"))
        .otherwise((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
        .as("spearman_rho"))
  }

  // ---------------------------------------------------------------------
  // Mann-Kendall trend test on daily revenue — the nonparametric "is this
  // metric actually trending" gate a monitoring pipeline runs before it
  // alerts (no distribution assumed, outlier-immune, the standard test on
  // environmental/ops series). S = Σ_{i<j} sign(rev_j − rev_i) over the
  // day-ordered series is an exact int64 pair sum; the tie-corrected
  // variance is carried as 18·Var (pure BIGINT: n(n−1)(2n+5) − Σtₖ(tₖ−1)
  // (2tₖ+5)), and the continuity-corrected Z = (S∓1)/√(Var18/18) is a
  // 3-step IEEE chain (÷18, √, ÷) on identical operands in both engines.
  // NULL when the variance degenerates (all-tied series). Honest z≈1.66
  // (no trend at 5%) on this stationary synthetic revenue.
  //
  // Scale shape: ONE orders aggregate to the calendar-bounded day grain;
  // the i<j pair frame is a broadcast inequality self-join of that
  // metadata-sized series with itself (n≈2.4k days → ~3M in-memory sign
  // evaluations, calendar-bounded FOREVER — day grain does not grow with
  // corpus size), folded map-side to one scalar; tie groups are
  // value-cardinality-bounded.
  private val mannKendall = Q(
    "ts_mann_kendall_trend",
    Some("""
      WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
            AS rev
        FROM orders GROUP BY 1),
      p AS (SELECT CASE WHEN b.rev > a.rev THEN 1 WHEN b.rev < a.rev THEN -1
              ELSE 0 END AS sgn
            FROM d a JOIN d b ON b.day > a.day),
      s AS (SELECT CAST(COALESCE(SUM(sgn), 0) AS BIGINT) AS s_stat FROM p),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
      t AS (SELECT CAST(COALESCE(SUM(c*(c-1)*(2*c+5)), 0) AS BIGINT) AS tie_adj
            FROM (SELECT COUNT(*) AS c FROM d GROUP BY rev
                  HAVING COUNT(*) > 1)),
      f AS (SELECT n.n, s.s_stat, n.n*(n.n-1)*(2*n.n+5) - t.tie_adj AS var18
            FROM n CROSS JOIN s CROSS JOIN t)
      SELECT n AS n_days, s_stat, var18 AS var_s_x18,
        CASE WHEN var18 = 0 THEN NULL
          WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
            / sqrt(CAST(var18 AS DOUBLE) / 18.0)
          WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
            / sqrt(CAST(var18 AS DOUBLE) / 18.0)
          ELSE 0.0 END AS z_score
      FROM f
    """)) { (spark, dir) =>
    val d = Tables.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(graft.ops.Exact.dec2(col("o_totalprice"))) * 100)
        .cast("long").as("rev"))
    val a = d.select(col("day").as("day_a"), col("rev").as("rev_a"))
    val b = d.select(col("day").as("day_b"), col("rev").as("rev_b"))
    val p = a.join(broadcast(b), col("day_b") > col("day_a"))
      .select(when(col("rev_b") > col("rev_a"), 1L)
        .when(col("rev_b") < col("rev_a"), -1L).otherwise(0L).as("sgn"))
    val s = p.agg(coalesce(sum(col("sgn")), lit(0L)).as("s_stat"))
    val n = d.agg(count(lit(1)).as("n"))
    val t = d.groupBy(col("rev")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(coalesce(
        sum(col("c") * (col("c") - 1) * (lit(2L) * col("c") + 5)),
        lit(0L)).as("tie_adj"))
    val var18 = col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) -
      col("tie_adj")
    n.crossJoin(broadcast(s)).crossJoin(broadcast(t))
      .select(col("n"), col("s_stat"), var18.as("var18"))
      .select(col("n").as("n_days"), col("s_stat"),
        col("var18").as("var_s_x18"),
        when(col("var18") === 0, lit(null).cast("double"))
          .when(col("s_stat") > 0, (col("s_stat") - 1).cast("double") /
            sqrt(col("var18").cast("double") / lit(18.0)))
          .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double") /
            sqrt(col("var18").cast("double") / lit(18.0)))
          .otherwise(lit(0.0)).as("z_score"))
  }

  // ---------------------------------------------------------------------
  // CUSUM changepoint on daily revenue — WHERE the level shifted, the
  // question downstream of ts_mann_kendall_trend's "is it shifting at
  // all" (the classic offline CUSUM location estimate: the k maximizing
  // |Σ_{i≤k}(rev_i − mean)|). Kept EXACT by scaling out the division:
  // S_k = n·cum_k − k·T is n times the mean-centered cumulative sum, pure
  // BIGINT (n·cum ≤ days × total-cents ≈ 6.5e13 at sf0.1 — rescale to the
  // autocorr kilodollar dial for corpora within 2⁵³/days of total cents).
  // Ties break to the earliest day, so the answer is unique and
  // engine-independent; no IEEE anywhere in this query.
  // Scale shape: one orders aggregate to the calendar-bounded day grain,
  // one cumsum window + one argmax window over that metadata-sized frame,
  // a 1-row totals broadcast. Honest result on this stationary synthetic:
  // the argmax is genuine but the excursion is random-walk-sized.
  private val cusum = Q(
    "ts_cusum_changepoint",
    Some("""
      WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
            AS rev
        FROM orders GROUP BY 1),
      t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(rev) AS BIGINT) AS tot FROM d),
      c AS (SELECT day, rev,
              CAST(SUM(rev) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum,
              CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k
            FROM d),
      s AS (SELECT c.day, c.k, t.n,
              CAST(t.n * c.cum - c.k * t.tot AS BIGINT) AS s_k
            FROM c CROSS JOIN t),
      r AS (SELECT *, row_number() OVER (ORDER BY abs(s_k) DESC, day) AS rn
            FROM s)
      SELECT n AS n_days, day AS change_day, k AS change_k,
        s_k AS s_scaled, abs(s_k) AS s_abs
      FROM r WHERE rn = 1
    """)) { (spark, dir) =>
    val d = Tables.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(graft.ops.Exact.dec2(col("o_totalprice"))) * 100)
        .cast("long").as("rev"))
    val t = d.agg(count(lit(1)).as("n"), sum(col("rev")).as("tot"))
    val byDay = Window.orderBy(col("day"))
    val c = d.select(col("day"),
      sum(col("rev")).over(
        byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("cum"),
      row_number().over(byDay).cast("long").as("k"))
    val s = c.crossJoin(broadcast(t))
      .select(col("day"), col("k"), col("n"),
        (col("n") * col("cum") - col("k") * col("tot")).as("s_k"))
    s.withColumn("rn", row_number().over(
        Window.orderBy(abs(col("s_k")).desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("n").as("n_days"), col("day").as("change_day"),
        col("k").as("change_k"), col("s_k").as("s_scaled"),
        abs(col("s_k")).as("s_abs"))
  }

  // ---------------------------------------------------------------------
  // STL-style additive decomposition of the daily revenue series:
  // trend (centered 7-day moving average, COMPLETE calendar windows only —
  // the RANGE frame over day numbers is gap-correct), weekly seasonal
  // (per-weekday mean of the detrended series), residual (what anomaly
  // detection actually thresholds — cf. anomaly_daily_revenue, which
  // z-scores the RAW series and so flags every weekend).
  //
  // Exactness: revenue is cents-int64; the detrended series is kept
  // SCALED BY 7 (det7 = 7·cents − sum7, exact int64 — no per-row rational)
  // so every aggregate is an order-independent integer sum; each output is
  // a fixed-order double expression off those integers. Weekday is pure
  // epoch-day arithmetic ((day_n + 3) % 7, 0 = Monday) — no engine
  // calendar functions. Scale shape: one map-side-combinable aggregate to
  // day grain, one window + one 7-row aggregate on the calendar-bounded
  // day table (the same bounded-domain dial as trailing7dQ), 7-row
  // broadcast back.
  private val stlWeekly = Q(
    "ts_stl_weekly",
    Some("""
      WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
          datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_n,
          CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2),
      w AS (
        SELECT day, day_n, cents,
          SUM(cents) OVER (ORDER BY day_n
            RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sum7,
          COUNT(*) OVER (ORDER BY day_n
            RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7,
          (day_n + 3) % 7 AS weekday
        FROM d),
      core AS (SELECT *, 7 * cents - sum7 AS det7 FROM w WHERE n7 = 7),
      seas AS (SELECT weekday, CAST(SUM(det7) AS BIGINT) AS sdet,
                 CAST(COUNT(*) AS BIGINT) AS cnt
               FROM core GROUP BY weekday)
      SELECT c.day, c.weekday,
        CAST(c.cents AS DOUBLE) / 100.0 AS revenue,
        CAST(c.sum7 AS DOUBLE) / 700.0 AS trend,
        CAST(s.sdet AS DOUBLE) / (CAST(s.cnt AS DOUBLE) * 700.0) AS seasonal,
        CAST(c.det7 AS DOUBLE) / 700.0
          - CAST(s.sdet AS DOUBLE) / (CAST(s.cnt AS DOUBLE) * 700.0) AS residual
      FROM core c JOIN seas s USING (weekday)
      ORDER BY c.day
    """)) { (spark, dir) =>
    val day = col("o_orderdate").cast("date")
    val d = Tables.load(spark, dir, "orders")
      .groupBy(day.as("day"),
        datediff(day, to_date(lit("1970-01-01"))).as("day_n"))
      .agg(sum((graft.ops.Exact.dec2(col("o_totalprice")) * 100)
        .cast("long")).as("cents"))
    val fr = Window.orderBy(col("day_n")).rangeBetween(-3, 3)
    val core = d
      .select(col("day"), col("day_n"), col("cents"),
        sum(col("cents")).over(fr).as("sum7"),
        count(lit(1)).over(fr).as("n7"),
        ((col("day_n") + 3) % 7).cast("long").as("weekday"))
      .filter(col("n7") === 7)
      .withColumn("det7", lit(7) * col("cents") - col("sum7"))
    val seas = core.groupBy(col("weekday"))
      .agg(sum(col("det7")).as("sdet"), count(lit(1)).as("cnt"))
    core.join(broadcast(seas), Seq("weekday"))
      .select(col("day"), col("weekday"),
        (col("cents").cast("double") / 100.0).as("revenue"),
        (col("sum7").cast("double") / 700.0).as("trend"),
        (col("sdet").cast("double") / (col("cnt").cast("double") * 700.0))
          .as("seasonal"),
        (col("det7").cast("double") / 700.0 -
          col("sdet").cast("double") / (col("cnt").cast("double") * 700.0))
          .as("residual"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------------
  // Benford first-digit audit: the classic forensic data-quality screen —
  // organically-grown monetary amounts follow log10(1+1/d) first-digit
  // frequencies; synthetic, capped, or fabricated amounts don't. Run over
  // order totals in exact cents (×100 never changes the leading digit),
  // with per-digit observed/expected/deviation all in integer ppm so both
  // engines agree bitwise (the expected shares are IDENTICAL integer
  // literals, not per-engine log10 calls). On TPC-H-shaped uniform prices
  // this HONESTLY flags non-Benford (digits 1-4 each ~22%): exactly the
  // alarm the check exists to raise on synthetic data. Scale shape: one
  // map-side-combinable aggregate to a ≤9-row digit table + a 1-row total
  // broadcast; the per-row work is one decimal→cents cast and a leading-
  // digit extraction.
  private val benford = Q(
    "dq_benford_prices",
    Some("""
      WITH cents AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM orders
      ), counts AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit,
               COUNT(*) AS n
        FROM cents GROUP BY 1
      ), tot AS (SELECT SUM(n) AS total FROM counts),
      expected(digit, expected_ppm) AS (VALUES
        (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
        (6, 66947), (7, 57992), (8, 51153), (9, 45757))
      SELECT c.digit, c.n,
        CAST((1000000 * c.n) // t.total AS BIGINT) AS share_ppm,
        CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
        CAST(abs((1000000 * c.n) // t.total - e.expected_ppm) AS BIGINT)
          AS dev_ppm
      FROM counts c JOIN expected e USING (digit), tot t
      ORDER BY digit
    """)) { (spark, dir) =>
    import spark.implicits._
    val counts = Tables.load(spark, dir, "orders")
      .select((graft.ops.Exact.dec2(col("o_totalprice")) * 100).cast("long")
        .as("c"))
      .groupBy(substring(col("c").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("total"))
    // Benford expectations as integer ppm literals — shared verbatim with
    // the oracle SQL so no engine ever evaluates a log10
    val expected = Seq(1 -> 301030, 2 -> 176091, 3 -> 124939, 4 -> 96910,
      5 -> 79181, 6 -> 66947, 7 -> 57992, 8 -> 51153, 9 -> 45757)
      .toDF("digit", "expected_ppm")
    counts.join(broadcast(expected), Seq("digit"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("(1000000 * n) div total").as("share_ppm"),
        col("expected_ppm").cast("long").as("expected_ppm"),
        abs(expr("(1000000 * n) div total") - col("expected_ppm"))
          .cast("long").as("dev_ppm"))
      .orderBy(col("digit"))
  }

  // ---------------------------------------------------------------------
  // Revenue concentration (Pareto curve points): the share of total
  // revenue held by the top 1/5/10/20/50 % of customers — the "how 80/20
  // is this business" readout pricing and account teams run first, and
  // the concentration complement to profile_source_gini's single-number
  // index. Exact cents throughout; the cumulative share is integer ppm
  // via DECIMAL(38) floor division (operands pass 2^53, so double math
  // would drift and int64×1e6 would overflow past ~9e12 total cents).
  // Scale shape: one orders aggregate to customer grain, then ONE global
  // sort window computing rank and running sum together (same window
  // frame ⇒ one sort pass) — dimension-bounded like train_decile_bins.
  // Past the Prefix.SingleWindowMaxBytes dial the single-partition window
  // swaps for the EXACT two-phase distributed scan (range shuffle +
  // partition-local window + driver prefix offsets) — same rows at any
  // scale; the percentile probes are a 5-row broadcast.
  private val paretoShare = Q(
    "profile_revenue_concentration",
    Some("""
      WITH spend AS (
        SELECT o_custkey,
          SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS cents
        FROM orders GROUP BY o_custkey
      ), ranked AS (
        SELECT cents,
          row_number() OVER (ORDER BY cents DESC, o_custkey) AS rn
        FROM spend
      ), cum AS (
        SELECT rn, SUM(cents) OVER (ORDER BY rn) AS cum_cents FROM ranked
      ), tot AS (SELECT COUNT(*) AS n, SUM(cents) AS total FROM spend)
      SELECT v.pct,
        CAST(max(c.cum_cents) AS BIGINT) AS top_cents,
        CAST((1000000 * CAST(max(c.cum_cents) AS HUGEINT))
             // CAST(max(t.total) AS HUGEINT) AS BIGINT) AS share_ppm
      FROM cum c, tot t, (VALUES (1),(5),(10),(20),(50)) v(pct)
      WHERE c.rn <= GREATEST(1, (t.n * v.pct) // 100)
      GROUP BY v.pct ORDER BY v.pct
    """)) { (spark, dir) =>
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
    val spend = orders
      .groupBy(col("o_custkey"))
      .agg(sum((graft.ops.Exact.dec2(col("o_totalprice")) * 100)
        .cast("long")).as("cents"))
    // rank and running sum share ONE window ordering → one sort pass;
    // past the dial the single-partition window swaps for the two-phase
    // distributed scan (graft.ops.Prefix.globalRankSum) — row-identical,
    // so the oracle sees the same output on either arm
    val cum = graft.ops.Prefix.globalRankSum(spend,
        Seq(col("cents").desc, col("o_custkey")), Some("cents"),
        "rn", "cum_cents",
        distributed = orders.queryExecution.optimizedPlan.stats.sizeInBytes >
          graft.ops.Prefix.SingleWindowMaxBytes)
      .select(col("rn"), col("cum_cents"))
    val tot = spend.agg(count(lit(1)).as("n"), sum(col("cents")).as("total"))
    val pcts = Seq(1, 5, 10, 20, 50).toDF("pct")
    cum.crossJoin(broadcast(tot)).crossJoin(broadcast(pcts))
      .filter(col("rn") <= greatest(lit(1L), expr("(n * pct) div 100")))
      .groupBy(col("pct"))
      .agg(max(col("cum_cents")).as("top_cents"),
        expr("""CAST((1000000 * CAST(max(cum_cents) AS DECIMAL(38,0)))
                DIV CAST(max(total) AS DECIMAL(38,0)) AS BIGINT)""")
          .as("share_ppm"))
      .orderBy(col("pct"))
  }

  override val specs: Seq[Q] =
    Seq(scd2, scd2AsOf, dq, basket, calendarFill, tsInterp, profile,
      weekdaySeasonality, stlWeekly, autocorrLag7, spearman, mannKendall,
      cusum, benford, paretoShare)
}
