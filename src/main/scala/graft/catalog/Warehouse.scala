package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
      .orderBy(col("c_custkey"), col("valid_from"))
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

  override val specs: Seq[Q] = Seq(scd2, dq)
}
