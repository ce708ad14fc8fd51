package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.lake.Tables
import graft.ops.Exact._

/**
 * Relational core: aggregations, star-schema joins, set ops, grouping sets,
 * window functions over the TPC-H-ish testdata (SURVEY.md §2.4-2.6).
 *
 * Scale posture (100 TB): fact tables (`lineitem`, `orders`) are never
 * broadcast or collected; tiny dimensions (`region`, `nation`) are broadcast
 * explicitly; everything else is left to Catalyst + AQE (sort-merge vs
 * broadcast decided from runtime stats). All aggregates are partial-agg
 * friendly (sums/counts over decimals), windows partition by high-cardinality
 * keys (customer/brand), and every filter/projection is pushdown-eligible.
 */
object Relational extends Family {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  // -------------------------------------------------------------------------
  // A3/A4: pricing summary (TPC-H Q1 shape) — groupBy + sum/avg/count.
  // Reference provenance: declared dashboards, README.md:31-33.
  private val q1 = Q(
    "q1_pricing_summary",
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(l_quantity) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(l_extendedprice) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)/COUNT(l_discount) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """)) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        sum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        avgMoney(col("l_quantity")).as("avg_qty"),
        avgMoney(col("l_extendedprice")).as("avg_price"),
        avgMoney(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // -------------------------------------------------------------------------
  // J2 + top-k: shipping priority (TPC-H Q3 shape) — 3-way join, agg, limit.
  private val q3 = Q(
    "q3_shipping_priority",
    Some("""
      SELECT l_orderkey,
        CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10
    """)) { (spark, dir) =>
    val cust = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .select(
        col("l_orderkey"), col("revenue"),
        col("o_orderdate").cast("date").as("order_date"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // -------------------------------------------------------------------------
  // J2 deep star join: regional supplier revenue (TPC-H Q5 shape).
  // region/nation broadcast (bounded dims); supplier join left to AQE.
  private val q5 = Q(
    "q5_regional_revenue",
    Some("""
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name
    """)) { (spark, dir) =>
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val nat = broadcast(t(spark, dir, "nation"))
    val reg = broadcast(t(spark, dir, "region").filter(col("r_name") === "ASIA"))
    t(spark, dir, "lineitem")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // -------------------------------------------------------------------------
  // J2 + conditional share: promo revenue share by ship month (TPC-H Q14
  // shape, monthly instead of one month so the output exercises the
  // group-by too). The share is exact integer ppm: revenue in
  // ten-thousandths (the DECIMAL(18,4) grain ×10000 — lossless int64),
  // the ratio via DECIMAL(38) floor division (a year's revenue ×1e6
  // passes int64). Scale: one fact⋈part equi-join (AQE picks
  // broadcast-vs-shuffle from part's runtime size), map-side-combinable
  // conditional sums, ≤12-row output.
  private val q14Promo = Q(
    "q14_promo_revenue",
    Some("""
      WITH joined AS (
        SELECT date_trunc('month', l_shipdate) AS month,
          CAST(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)) * 10000
               AS BIGINT) AS rev4,
          (p_type LIKE 'PROMO%') AS promo
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      )
      SELECT CAST(month AS DATE) AS month,
        CAST(SUM(CASE WHEN promo THEN rev4 ELSE 0 END) AS BIGINT) AS promo_rev4,
        CAST(SUM(rev4) AS BIGINT) AS total_rev4,
        CAST((1000000 * CAST(SUM(CASE WHEN promo THEN rev4 ELSE 0 END) AS HUGEINT))
             // CAST(SUM(rev4) AS HUGEINT) AS BIGINT) AS promo_ppm
      FROM joined GROUP BY month ORDER BY month
    """)) { (spark, dir) =>
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    li.join(t(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .select(
        date_trunc("month", col("l_shipdate")).cast("date").as("month"),
        (dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) *
          10000).cast("long").as("rev4"),
        col("p_type").startsWith("PROMO").as("promo"))
      .groupBy(col("month"))
      .agg(
        sum(when(col("promo"), col("rev4")).otherwise(0L)).as("promo_rev4"),
        sum(col("rev4")).as("total_rev4"))
      .select(col("month"), col("promo_rev4"), col("total_rev4"),
        expr("""CAST((1000000 * CAST(promo_rev4 AS DECIMAL(38,0)))
                DIV CAST(total_rev4 AS DECIMAL(38,0)) AS BIGINT)""")
          .as("promo_ppm"))
      .orderBy(col("month"))
  }

  // -------------------------------------------------------------------------
  // J4 + correlated condition: orders with a LATE line (TPC-H Q4 shape —
  // EXISTS with a predicate correlating BOTH sides: l_shipdate more than
  // 75 days after ITS order's date). Plans as a LEFT SEMI join whose
  // condition carries the non-equi arm alongside the key equality — the
  // lineitem side never duplicates order rows however many lines are
  // late. Scale: one fact⋈fact semi join on the order key (both sides
  // date-pruned at the scan), ≤5-row output.
  private val q4Late = Q(
    "q4_priority_late_ship",
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n_late
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 75 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """)) { (spark, dir) =>
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    ord.join(t(spark, dir, "lineitem"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 75 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late"))
      .orderBy(col("o_orderpriority"))
  }

  // -------------------------------------------------------------------------
  // J2 + disjunctive residual: discounted revenue under OR'd brand/size/
  // quantity branches (TPC-H Q19 shape). The join key stays a clean
  // equi-join (partkey) with the whole disjunction as a residual filter —
  // the shape that tests an optimizer's ability to NOT fall back to a
  // nested-loop join on OR predicates. Scale: one fact⋈part equi-join;
  // the branches' p_brand IN (...) union could push a coarse scan filter,
  // left to Catalyst.
  private val q19Disjunct = Q(
    "q19_disjunctive_revenue",
    Some("""
      SELECT
        CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 20)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """)) { (spark, dir) =>
    def branch(brand: String, szHi: Int, qLo: Int, qHi: Int): Column =
      col("p_brand") === brand &&
        col("p_size").between(1, szHi) && col("l_quantity").between(qLo, qHi)
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(branch("Brand#12", 15, 1, 20) ||
        branch("Brand#23", 25, 10, 30) || branch("Brand#34", 35, 20, 40))
      .agg(
        sum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  // -------------------------------------------------------------------------
  // A1 + pushdown microcell: forecast revenue change (TPC-H Q6 shape) —
  // the pure scan+filter+1-row-sum cell: no join, no groupBy, every
  // predicate pushdown-eligible. This is the classic scan-throughput
  // microbenchmark — at 100 TB its cost is EXACTLY the column-pruned
  // parquet read of 4 columns, which is why its plan must show all
  // three filters pushed and one partial-agg combine.
  private val q6Forecast = Q(
    "q6_forecast_revenue",
    Some("""
      SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """)) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        sum4(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  // -------------------------------------------------------------------------
  // J2 star + top-k: returned-item revenue by customer (TPC-H Q10 shape) —
  // the "who returned the most" triage list: fact⋈fact join on the order
  // key, broadcast nation, TakeOrderedAndProject for the top-20 cut (never
  // a global sort of customers).
  private val q10Returns = Q(
    "q10_returned_revenue",
    Some("""
      SELECT c_custkey, c_name, n_name,
        CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20
    """)) { (spark, dir) =>
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
    t(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  // -------------------------------------------------------------------------
  // A3 + scalar-subquery filter: top supplier by quarterly revenue WITH
  // ties (TPC-H Q15 shape — the rev view's MAX is a 1-row broadcast, so
  // "equal to the max" never sorts the supplier-grain frame). Revenue in
  // exact int64 ten-thousandths so the tie equality is bitwise in both
  // engines — a double revenue could split a genuine tie.
  private val q15TopSupp = Q(
    "q15_top_supplier",
    Some("""
      WITH rev AS (
        SELECT l_suppkey AS suppkey,
          CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS rev4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
      )
      SELECT s_suppkey, s_name, rev4
      FROM rev JOIN supplier ON suppkey = s_suppkey
      WHERE rev4 = (SELECT MAX(rev4) FROM rev)
      ORDER BY s_suppkey
    """)) { (spark, dir) =>
    val rev = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg((sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        * 10000).cast("long").as("rev4"))
    val top = rev.agg(max(col("rev4")).as("max_rev4"))
    rev.join(broadcast(top), col("rev4") === col("max_rev4"))
      .join(t(spark, dir, "supplier"), col("suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("rev4"))
      .orderBy(col("s_suppkey"))
  }

  // -------------------------------------------------------------------------
  // A-correlated decorrelation: small-quantity order revenue (TPC-H Q17
  // shape — `l_quantity < 0.2 * avg(l_quantity per part)`). The correlated
  // AVG decorrelates into one per-part aggregate joined back; computed on
  // the BRAND-FILTERED lines only, which is value-identical because the
  // part key determines the brand (a whole-lineitem per-part aggregate
  // would shuffle the full fact table for a 1/25th slice). The avg
  // comparison is exact integer cross-multiplication: qty*100*5*n < qty2
  // — zero division, zero doubles.
  private val q17SmallQty = Q(
    "q17_small_qty_revenue",
    Some("""
      WITH pa AS (
        SELECT l_partkey AS pk,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qty2,
          COUNT(*) AS n
        FROM lineitem GROUP BY l_partkey
      )
      SELECT
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS below_avg_cents,
        COUNT(*) AS n_lines
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN pa   ON l_partkey = pk
      WHERE p_brand = 'Brand#23'
        AND CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) * 5 * n < qty2
    """)) { (spark, dir) =>
    val brandLines = t(spark, dir, "lineitem")
      .join(t(spark, dir, "part").filter(col("p_brand") === "Brand#23"),
        col("l_partkey") === col("p_partkey"))
    val pa = brandLines
      .groupBy(col("l_partkey").as("pk"))
      .agg((sum(dec2(col("l_quantity"))) * 100).cast("long").as("qty2"),
        count(lit(1)).as("n"))
    brandLines.join(pa, col("l_partkey") === col("pk"))
      .filter((dec2(col("l_quantity")) * 100).cast("long") * 5 * col("n") <
        col("qty2"))
      .agg(
        (sum(dec2(col("l_extendedprice"))) * 100).cast("long")
          .as("below_avg_cents"),
        count(lit(1)).as("n_lines"))
  }

  // -------------------------------------------------------------------------
  // A-HAVING join: large-volume orders (TPC-H Q18 shape) — the per-order
  // quantity aggregate HAVING-filters to a tiny key set BEFORE joining
  // back to orders and customer, so the join probe side is the filtered
  // aggregate, never raw lineitem. Quantities/totals in exact cents.
  private val q18LargeOrders = Q(
    "q18_large_orders",
    Some("""
      SELECT c_custkey, c_name, o_orderkey,
        CAST(o_orderdate AS DATE) AS order_date,
        CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS total_cents,
        big.sum_qty2
      FROM orders
      JOIN (SELECT l_orderkey,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty2
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) > 21000) big
        ON o_orderkey = big.l_orderkey
      JOIN customer ON c_custkey = o_custkey
      ORDER BY total_cents DESC, o_orderkey LIMIT 25
    """)) { (spark, dir) =>
    // each row's dec2(qty)*100 is an exact integer, so summing LONG cents
    // equals (sum of decimals)*100 exactly — same value, but the aggregate
    // buffer is one 8-byte long instead of decimal128 + isEmpty
    val big = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum((dec2(col("l_quantity")) * 100).cast("long")).as("sum_qty2"))
      .filter(col("sum_qty2") > 21000L)
    t(spark, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t(spark, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        (dec2(col("o_totalprice")) * 100).cast("long").as("total_cents"),
        col("sum_qty2"))
      .orderBy(col("total_cents").desc, col("o_orderkey"))
      .limit(25)
  }

  // -------------------------------------------------------------------------
  // J3: left outer join — per-customer order stats including zero-order rows.
  private val jLeft = Q(
    "join_left_customer_orders",
    Some("""
      SELECT c_custkey, c_name,
        COUNT(o_orderkey) AS n_orders,
        COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name
      ORDER BY c_custkey
    """)) { (spark, dir) =>
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sumMoney(col("o_totalprice")), lit(0.0)).as("total_spend"))
      .orderBy(col("c_custkey"))
  }

  // J4a: left semi — customers having at least one open ('O') order.
  private val jSemi = Q(
    "join_semi_open_orders",
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      ORDER BY c_custkey
    """)) { (spark, dir) =>
    t(spark, dir, "customer")
      .join(
        t(spark, dir, "orders").filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  // J4b: left anti — customers with no orders at all.
  private val jAnti = Q(
    "join_anti_no_orders",
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey
    """)) { (spark, dir) =>
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  // J5: theta/range self-join — order pairs per customer placed <= 7 days apart.
  private val jTheta = Q(
    "join_range_reorders",
    Some("""
      SELECT o1.o_custkey AS custkey, COUNT(*) AS n_reorder_pairs
      FROM orders o1 JOIN orders o2
        ON o1.o_custkey = o2.o_custkey
       AND o2.o_orderkey <> o1.o_orderkey
       AND o2.o_orderdate >= o1.o_orderdate
       AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 7 DAY
       AND (o2.o_orderdate > o1.o_orderdate OR o2.o_orderkey > o1.o_orderkey)
      GROUP BY o1.o_custkey
      ORDER BY custkey
    """)) { (spark, dir) =>
    val o1 = t(spark, dir, "orders").alias("o1")
    val o2 = t(spark, dir, "orders").alias("o2")
    o1.join(o2,
        col("o1.o_custkey") === col("o2.o_custkey") &&
          col("o2.o_orderkey") =!= col("o1.o_orderkey") &&
          col("o2.o_orderdate") >= col("o1.o_orderdate") &&
          col("o2.o_orderdate") <= col("o1.o_orderdate") + expr("INTERVAL 7 DAY") &&
          (col("o2.o_orderdate") > col("o1.o_orderdate") ||
            col("o2.o_orderkey") > col("o1.o_orderkey")))
      .groupBy(col("o1.o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_reorder_pairs"))
      .orderBy(col("custkey"))
  }

  // -------------------------------------------------------------------------
  // J7: set ops — EXCEPT / INTERSECT on customer key sets.
  private val setExcept = Q(
    "setop_except_custkeys",
    Some("""
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY custkey
    """)) { (spark, dir) =>
    val o = t(spark, dir, "orders")
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
      .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))
  }

  private val setIntersect = Q(
    "setop_intersect_custkeys",
    Some("""
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY custkey
    """)) { (spark, dir) =>
    val o = t(spark, dir, "orders")
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
      .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))
  }

  // J6: union of slices (backfill accumulation analog, pipeline.py:174-200).
  private val setUnion = Q(
    "setop_union_priority_slices",
    Some("""
      SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '5-LOW'
      ORDER BY o_orderkey
    """)) { (spark, dir) =>
    val o = t(spark, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
    o.filter(col("o_orderpriority") === "1-URGENT")
      .unionByName(o.filter(col("o_orderpriority") === "5-LOW"))
      .orderBy(col("o_orderkey"))
  }

  // -------------------------------------------------------------------------
  // A6: rollup — region -> nation revenue subtotals with grouping level.
  private val rollupQ = Q(
    "agg_rollup_region_nation",
    Some("""
      SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        GROUPING(r_name, n_name) AS lvl,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY lvl, region, nation
    """)) { (spark, dir) =>
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping_id().as("lvl"),
        count(lit(1)).as("n_orders"),
        sumMoney(col("o_totalprice")).as("revenue"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("lvl"), col("n_orders"), col("revenue"))
      .orderBy(col("lvl"), col("region"), col("nation"))
  }

  // A6: cube on order status x priority.
  private val cubeQ = Q(
    "agg_cube_status_priority",
    Some("""
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        GROUPING(o_orderstatus, o_orderpriority) AS lvl,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY lvl, status, priority
    """)) { (spark, dir) =>
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().as("lvl"),
        count(lit(1)).as("n_orders"),
        sumMoney(col("o_totalprice")).as("revenue"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("lvl"), col("n_orders"), col("revenue"))
      .orderBy(col("lvl"), col("status"), col("priority"))
  }

  // A6: explicit GROUPING SETS — the general form rollup/cube specialize:
  // exactly the (region), (priority), (region, priority) groupings, no
  // grand total. One Expand + one aggregate in Spark (same physical shape
  // as rollup — the row is replicated once per grouping set map-side, so
  // the plan is a single shuffle regardless of how many sets are asked).
  // Join-then-aggregate like its rollup/cube siblings: the one fact-row
  // shuffle is the join's, and the Expand+aggregate combine map-side over
  // ~75 grouping rows. (Round-13 note: this cell briefly carried a
  // pre-agg-below-join form chasing a superlinear sweep point that turned
  // out to be a SWEEP-DATA artifact — replicated-unoffset dimension
  // tables multiplied every dim join's output ×f per join, 39.3e9 rows at
  // x64; the generator is fixed and the canonical plan measures linear.
  // See SCALE.md's round-13 note.)
  private val groupingSetsQ = Q(
    "agg_grouping_sets",
    Some("""
      SELECT COALESCE(r_name, 'ALL') AS region,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        GROUPING(r_name, o_orderpriority) AS lvl,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY GROUPING SETS ((r_name), (o_orderpriority),
                              (r_name, o_orderpriority))
      ORDER BY lvl, region, priority
    """)) { (spark, dir) =>
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name")), Seq(col("o_orderpriority")),
          Seq(col("r_name"), col("o_orderpriority"))),
        col("r_name"), col("o_orderpriority"))
      .agg(
        grouping_id().as("lvl"),
        count(lit(1)).as("n_orders"),
        sumMoney(col("o_totalprice")).as("revenue"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("lvl"), col("n_orders"), col("revenue"))
      .orderBy(col("lvl"), col("region"), col("priority"))
  }

  // A4: distinct counts — exact + HLL sketch (the scale path) per segment.
  // approx_count_distinct is NOT oracle-comparable (sketch internals differ),
  // so the oracle checks the exact column; the approx column is exercised in
  // ScalaTest instead. Here: exact distinct only, two levels.
  private val distinctQ = Q(
    "agg_count_distinct_parts",
    Some("""
      SELECT l_returnflag,
        COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(DISTINCT l_suppkey) AS n_supps,
        COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """)) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  // -------------------------------------------------------------------------
  // W3: ranking — top-3 parts by revenue within each brand.
  private val topkQ = Q(
    "window_topk_parts_per_brand",
    Some("""
      SELECT p_brand, p_partkey, revenue, rn FROM (
        SELECT p_brand, p_partkey,
          CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY
            CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) DESC,
            p_partkey) AS rn
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
      ) WHERE rn <= 3
      ORDER BY p_brand, rn
    """)) { (spark, dir) =>
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("revenue").desc, col("p_partkey"))
    // pre-aggregate revenue by l_partkey BELOW the join (p_partkey is
    // part's key, so per-partkey sums equal per-(brand, partkey) sums
    // exactly — decimal addition is order-free): the broadcast probe and
    // the shuffle then carry part-count rows, not every lineitem
    t(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .join(t(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("p_partkey"), col("revenue"), col("rn"))
      .orderBy(col("p_brand"), col("rn"))
  }

  // W4: running total — cumulative customer spend over order history.
  private val runningQ = Q(
    "window_running_customer_spend",
    Some("""
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      FROM orders
      ORDER BY o_custkey, o_orderkey
    """)) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        sum(dec2(col("o_totalprice"))).over(w).cast("double").as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // W2-adjacent: lag/lead — days since previous order per customer.
  private val lagQ = Q(
    "window_days_between_orders",
    Some("""
      SELECT o_custkey, o_orderkey,
        datediff('day',
          lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
          o_orderdate) AS days_since_prev
      FROM orders
      ORDER BY o_custkey, o_orderkey
    """)) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).as("days_since_prev"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // W4-adjacent: exponentially-weighted moving average of customer spend —
  // the time-decay smoothing a demand model feeds on. Weights are the dyadic
  // 2^-i over an 8-order lookback, so every term is EXACT: dec2 price ×
  // integer 2^(7-i), summed as decimals (order-independent), with ONE double
  // division at the end (IEEE-deterministic on bit-identical operands in any
  // engine — the graft.ops.Exact discipline extended to weighted means).
  // Rows with fewer than 8 predecessors renormalize over the weights
  // actually present. One shuffle on o_custkey; all 8 lags share one window
  // sort.
  private val ewmaQ = Q(
    "window_ewma_spend",
    Some("""
      WITH o AS (SELECT o_custkey, o_orderkey,
          CAST(o_orderdate AS DATE) AS order_date,
          CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders),
      l AS (SELECT o_custkey, o_orderkey, order_date,
          lag(p, 0) OVER w AS x0, lag(p, 1) OVER w AS x1,
          lag(p, 2) OVER w AS x2, lag(p, 3) OVER w AS x3,
          lag(p, 4) OVER w AS x4, lag(p, 5) OVER w AS x5,
          lag(p, 6) OVER w AS x6, lag(p, 7) OVER w AS x7
        FROM o WINDOW w AS (
          PARTITION BY o_custkey ORDER BY order_date, o_orderkey))
      SELECT o_custkey, o_orderkey, order_date,
        CAST(COALESCE(x0*128,0) + COALESCE(x1*64,0) + COALESCE(x2*32,0)
           + COALESCE(x3*16,0) + COALESCE(x4*8,0) + COALESCE(x5*4,0)
           + COALESCE(x6*2,0) + COALESCE(x7*1,0) AS DOUBLE)
        / CAST((CASE WHEN x0 IS NULL THEN 0 ELSE 128 END)
             + (CASE WHEN x1 IS NULL THEN 0 ELSE 64 END)
             + (CASE WHEN x2 IS NULL THEN 0 ELSE 32 END)
             + (CASE WHEN x3 IS NULL THEN 0 ELSE 16 END)
             + (CASE WHEN x4 IS NULL THEN 0 ELSE 8 END)
             + (CASE WHEN x5 IS NULL THEN 0 ELSE 4 END)
             + (CASE WHEN x6 IS NULL THEN 0 ELSE 2 END)
             + (CASE WHEN x7 IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
          AS ewma_spend
      FROM l ORDER BY o_custkey, order_date, o_orderkey
    """)) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("order_date"), col("o_orderkey"))
    val base = t(spark, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      col("o_orderdate").cast("date").as("order_date"),
      dec2(col("o_totalprice")).as("p"))
    val xs = (0 to 7).map(i => lag(col("p"), i).over(w))
    val num = xs.zipWithIndex.map { case (x, i) =>
      coalesce(x * lit(1L << (7 - i)), lit(0).cast("decimal(18,2)"))
    }.reduce(_ + _)
    val den = xs.zipWithIndex.map { case (x, i) =>
      when(x.isNull, lit(0L)).otherwise(lit(1L << (7 - i)))
    }.reduce(_ + _)
    base
      .select(col("o_custkey"), col("o_orderkey"), col("order_date"),
        (num.cast("double") / den.cast("double")).as("ewma_spend"))
      .orderBy(col("o_custkey"), col("order_date"), col("o_orderkey"))
  }

  // -------------------------------------------------------------------------
  // A-group: exact interpolated percentiles per group. Inputs are integral
  // doubles and the probed quantiles are dyadic (0/.25/.5/.75), so the
  // interpolation `lo + (hi-lo)*frac` is exact in IEEE in both engines.
  private val percentilesQ = Q(
    "agg_quantity_percentiles",
    Some("""
      SELECT l_returnflag,
        CAST(min(l_quantity) AS DOUBLE) AS q_min,
        quantile_cont(l_quantity, 0.25) AS q25,
        quantile_cont(l_quantity, 0.50) AS q50,
        quantile_cont(l_quantity, 0.75) AS q75,
        CAST(max(l_quantity) AS DOUBLE) AS q_max
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """)) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        min(col("l_quantity")).cast("double").as("q_min"),
        expr("percentile(l_quantity, 0.25D)").as("q25"),
        expr("percentile(l_quantity, 0.50D)").as("q50"),
        expr("percentile(l_quantity, 0.75D)").as("q75"),
        max(col("l_quantity")).cast("double").as("q_max"))
      .orderBy(col("l_returnflag"))
  }

  // A-group: pivot — order revenue, status columns spread per priority row.
  // Spark side is a genuine RelationalGroupedDataset.pivot with pinned value
  // list (deterministic column order); oracle is conditional aggregation.
  private val pivotQ = Q(
    "agg_pivot_status_revenue",
    Some("""
      SELECT o_orderpriority,
        CAST(SUM(CASE WHEN o_orderstatus = 'O'
          THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
        CAST(SUM(CASE WHEN o_orderstatus = 'F'
          THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
        CAST(SUM(CASE WHEN o_orderstatus = 'P'
          THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "P"
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """)) { (spark, dir) =>
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(sumMoney(col("o_totalprice")))
      .orderBy(col("o_orderpriority"))
  }

  // Array/collect ops: per-order line profile — ordered CSV of quantities
  // (array_sort(collect_list(struct)) keeps the line-number order total).
  private val linesProfileQ = Q(
    "agg_order_lines_profile",
    Some("""
      SELECT l_orderkey, COUNT(*) AS n_lines,
        string_agg(CAST(CAST(l_quantity AS INTEGER) AS VARCHAR), ','
                   ORDER BY l_linenumber, l_quantity) AS qty_csv,
        CAST(max(l_quantity) AS DOUBLE) AS max_qty
      FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
    """)) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("l_linenumber"),
              col("l_quantity").cast("int").as("q")))),
            x => x.getField("q").cast("string")),
          ",").as("qty_csv"),
        max(col("l_quantity")).cast("double").as("max_qty"))
      .orderBy(col("l_orderkey"))
  }

  // F-group scalar-function sweep (F1-F3, SURVEY §2.7): date reformatting,
  // component split, epoch arithmetic, interval add — the reference's
  // YYYY-MM-DD <-> YYYYMMDD threading and year=/month=/day= splitting.
  private val datePartsQ = Q(
    "fn_order_date_parts",
    Some("""
      SELECT o_orderkey,
        strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS yyyymmdd,
        CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS y,
        CAST(month(CAST(o_orderdate AS DATE)) AS INTEGER) AS m,
        CAST(day(CAST(o_orderdate AS DATE)) AS INTEGER) AS d,
        CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS INTEGER) AS epoch_day,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date
      FROM orders ORDER BY o_orderkey
    """)) { (spark, dir) =>
    val d = col("o_orderdate").cast("date")
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        date_format(d, "yyyyMMdd").as("yyyymmdd"),
        year(d).as("y"), month(d).as("m"), dayofmonth(d).as("d"),
        datediff(d, lit("1970-01-01").cast("date")).as("epoch_day"),
        date_add(d, 30).as("due_date"))
      .orderBy(col("o_orderkey"))
  }

  // Unpivot/melt — the inverse of pivotQ: wide per-flag measures to long
  // (measure, value) rows. Spark side is the native Dataset.unpivot
  // (UNPIVOT plan node); oracle is the portable UNION ALL form.
  private val unpivotQ = Q(
    "agg_unpivot_measures",
    Some("""
      WITH w AS (
        SELECT l_returnflag,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
          CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
      UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
      UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM w
      ORDER BY l_returnflag, measure
    """)) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_price"),
        sumMoney(col("l_discount")).as("sum_disc"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "value")
      .orderBy(col("l_returnflag"), col("measure"))
  }

  // W3 breadth: distribution-rank window functions — quartile bucket,
  // percent_rank, cume_dist over each customer's spend history. Ties are
  // impossible (orderkey tiebreak), so the rank family is deterministic.
  private val rankMetricsQ = Q(
    "window_rank_metrics",
    Some("""
      SELECT o_custkey, o_orderkey,
        CAST(ntile(4) OVER w AS INTEGER) AS spend_quartile,
        round(percent_rank() OVER w, 6) AS pct_rank,
        round(cume_dist() OVER w, 6) AS cume,
        CAST(first_value(o_orderkey) OVER w AS BIGINT) AS cheapest_order
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_custkey, o_orderkey
    """)) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("spend_quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first(col("o_orderkey")).over(w).as("cheapest_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // A-group: dispersion + correlation from EXACT power sums — built-in
  // stddev/corr accumulate doubles in partition order (nondeterministic
  // across engines AND partitionings), so both engines compute the moments
  // as exact decimal sums first, then one deterministic double formula.
  // Same single-pass partial-agg shape a 100 TB scan wants.
  private val dispersionQ = Q(
    "agg_dispersion_exact",
    Some("""
      WITH m AS (
        SELECT l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy,
          CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        round(sqrt((n*sxx - sx*sx) / (n*(n-1))), 4) AS qty_stddev,
        round((n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 6)
          AS qty_price_corr
      FROM m ORDER BY l_returnflag
    """)) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sumMoney(col("l_quantity")).as("sx"),
        sumPow4(col("l_quantity") * col("l_quantity")).as("sxx"),
        sumMoney(col("l_extendedprice")).as("sy"),
        sumPow4(col("l_extendedprice") * col("l_extendedprice")).as("syy"),
        sumPow4(col("l_quantity") * col("l_extendedprice")).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        round(sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
          / (col("n") * (col("n") - 1))), 4).as("qty_stddev"),
        round((col("n") * col("sxy") - col("sx") * col("sy"))
          / (sqrt(col("n") * col("sxx") - col("sx") * col("sx"))
            * sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("qty_price_corr"))
      .orderBy(col("l_returnflag"))
  }

  // Hot-key monitoring (graft.ops.Skew.hotKeys) under the oracle gate: the
  // single-pass form — grand total summed FROM the grouped counts, both
  // branches sharing one exchange — must agree with the oracle's plain
  // two-CTE formulation. 0.07% of orders ~ >= 11 orders/customer at sf0.01.
  private val hotKeysQ = Q(
    "skew_hot_custkeys",
    Some("""
      WITH c AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey),
      t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c)
      SELECT c.o_custkey, c.n FROM c, t
      WHERE c.n >= 0.0007 * t.total
      ORDER BY c.n DESC, c.o_custkey
    """)) { (spark, dir) =>
    graft.ops.Skew.hotKeys(
      Tables.load(spark, dir, "orders"), "o_custkey", minShare = 0.0007)
  }

  // -------------------------------------------------------------------------
  // RFM segmentation — the commerce workhorse: per-customer recency/
  // frequency/monetary, quartile-banded. Scale shape: a naive ntile(4)
  // OVER () is a single-reducer global sort; here the three quartile
  // boundary sets come from ONE 1-row exact-percentile aggregate
  // (integral inputs at dyadic fractions — cross-engine exact), broadcast
  // back, and banding is a map-side comparison. Monetary goes through
  // cents-integer decimal accumulation (graft.ops.Exact discipline) so
  // both the sum and its quartile interpolation are exact.
  private val rfmQ = Q(
    "rfm_segments",
    Some("""
      WITH base AS (
        SELECT o_custkey AS custkey,
          CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
            (SELECT CAST(max(o_orderdate) AS DATE) FROM orders)) AS INTEGER)
            AS r_days,
          COUNT(*) AS frequency,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
            AS monetary_cents
        FROM orders GROUP BY o_custkey),
      q AS (SELECT
          quantile_cont(r_days, [0.25, 0.5, 0.75]) AS rq,
          quantile_cont(frequency, [0.25, 0.5, 0.75]) AS fq,
          quantile_cont(monetary_cents, [0.25, 0.5, 0.75]) AS mq
        FROM base),
      banded AS (
        SELECT custkey, r_days, frequency, monetary_cents,
          1 + CAST(r_days > rq[1] AS INTEGER) + CAST(r_days > rq[2] AS INTEGER)
            + CAST(r_days > rq[3] AS INTEGER) AS r_band,
          1 + CAST(frequency > fq[1] AS INTEGER) + CAST(frequency > fq[2] AS INTEGER)
            + CAST(frequency > fq[3] AS INTEGER) AS f_band,
          1 + CAST(monetary_cents > mq[1] AS INTEGER) + CAST(monetary_cents > mq[2] AS INTEGER)
            + CAST(monetary_cents > mq[3] AS INTEGER) AS m_band
        FROM base, q)
      SELECT custkey, r_days, frequency, monetary_cents,
        r_band, f_band, m_band,
        r_band * 100 + f_band * 10 + m_band AS rfm_code
      FROM banded ORDER BY custkey
    """)) { (spark, dir) =>
    val orders = t(spark, dir, "orders")
    val asof = orders.agg(max(to_date(col("o_orderdate"))).as("asof"))
    val base = orders
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_date"),
        count(lit(1)).as("frequency"),
        (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("monetary_cents"))
      .crossJoin(broadcast(asof))
      .select(col("custkey"),
        datediff(col("asof"), col("last_date")).as("r_days"),
        col("frequency"), col("monetary_cents"))
    val qs = base.agg(
      percentile(col("r_days"), array(lit(0.25), lit(0.5), lit(0.75))).as("rq"),
      percentile(col("frequency"), array(lit(0.25), lit(0.5), lit(0.75))).as("fq"),
      percentile(col("monetary_cents"), array(lit(0.25), lit(0.5), lit(0.75))).as("mq"))
    def band(v: Column, qcol: String): Column =
      (lit(1) + (v > element_at(col(qcol), 1)).cast("int")
        + (v > element_at(col(qcol), 2)).cast("int")
        + (v > element_at(col(qcol), 3)).cast("int"))
    base.crossJoin(broadcast(qs))
      .withColumn("r_band", band(col("r_days"), "rq"))
      .withColumn("f_band", band(col("frequency"), "fq"))
      .withColumn("m_band", band(col("monetary_cents"), "mq"))
      .select(col("custkey"), col("r_days"), col("frequency"),
        col("monetary_cents"), col("r_band"), col("f_band"), col("m_band"),
        (col("r_band") * 100 + col("f_band") * 10 + col("m_band")).as("rfm_code"))
      .orderBy(col("custkey"))
  }

  // W4-adjacent: RANGE frame (value-based window) — trailing-7-day revenue
  // per order day. Unlike the ROWS frames above, the frame is bounded by
  // the ORDER-BY VALUE (epoch days), so gap days shrink the window instead
  // of sliding over them — the semantics ROWS frames get wrong on sparse
  // time series. The window is day-grain: its input is the per-day
  // aggregate (calendar-bounded — decades fit one partition as comfortably
  // as a vocabulary does), so the unpartitioned sort is metadata-sized, not
  // corpus-sized; the corpus pass is the one day-keyed hash aggregate
  // below it. Exact decimal sums inside the frame (Exact discipline).
  private val trailing7dQ = Q(
    "window_trailing_7day_revenue",
    Some("""
      WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
          date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_n,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_rev
        FROM orders GROUP BY 1, 2)
      SELECT day, CAST(day_rev AS DOUBLE) AS day_revenue,
        CAST(SUM(day_rev) OVER (ORDER BY day_n
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS trailing_7day_revenue
      FROM d ORDER BY day
    """)) { (spark, dir) =>
    val day = col("o_orderdate").cast("date")
    val d = t(spark, dir, "orders")
      .groupBy(day.as("day"),
        datediff(day, to_date(lit("1970-01-01"))).as("day_n"))
      .agg(sum(dec2(col("o_totalprice"))).as("day_rev"))
    val w = Window.orderBy(col("day_n")).rangeBetween(-6, 0)
    d.select(col("day"), col("day_rev").cast("double").as("day_revenue"),
        sum(col("day_rev")).over(w).cast("double").as("trailing_7day_revenue"))
      .orderBy(col("day"))
  }

  // Equi-width histogram profile of order values — the numeric-distribution
  // complement of profile_tables' null/distinct scan: 10 bins over the
  // cents-integer [min, max] span, bounds reported exactly. One 1-row
  // min/max broadcast, one map-side bin projection, one 10-group aggregate.
  private val histogramQ = Q(
    "profile_price_histogram",
    Some("""
      WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
          AS cents FROM orders),
      m AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM c),
      b AS (SELECT ((cents - lo) * 10) // (hi - lo + 1) AS bin,
              lo, hi FROM c, m)
      SELECT CAST(bin AS BIGINT) AS bin,
        CAST(lo + bin * (hi - lo + 1) // 10 AS BIGINT) AS bin_lo_cents,
        COUNT(*) AS n_orders
      FROM b GROUP BY bin, lo, hi ORDER BY bin
    """)) { (spark, dir) =>
    val c = t(spark, dir, "orders")
      .select((dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
    val m = c.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    // floor(int64/int64 in double) is the exact rational floor here: both
    // operands stay far below 2^53 (cents spans ~6e7, x10 numerator ~6e8)
    c.crossJoin(broadcast(m))
      .select(floor(((col("cents") - col("lo")) * 10)
          / (col("hi") - col("lo") + 1)).as("bin"),
        col("lo"), col("hi"))
      .groupBy(col("bin"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_orders"))
      .select(col("bin").cast("long").as("bin"),
        (col("lo") + floor((col("bin") * (col("hi") - col("lo") + 1)) / 10))
          .cast("long").as("bin_lo_cents"),
        col("n_orders"))
      .orderBy(col("bin"))
  }

  // Mergeable histogram-quantile sketch: per-group p25/p50/p75/p95 estimated
  // from a 128-bin equi-width grid — the one-pass, map-side-combinable shape
  // (bin counts merge by addition across partitions/days/shards) that
  // replaces the corpus sort exact percentiles need. At 100 TB this is the
  // same plan approx_percentile runs, but with an engine-portable
  // deterministic sketch: all bin/cum/threshold math is integer (cum ≥
  // ceil(q·n/100) tested as 100·cum ≥ q·n), the estimate is the bin's upper
  // edge, and the ONLY IEEE op is the final cents→dollars division — so the
  // DuckDB twin matches bit-for-bit, no tolerance. Error is bounded by one
  // bin width of the global [min,max] span (1-row broadcast); the
  // cum/pick stage runs over groups × ≤128 rows — metadata-sized.
  private val quantSketchQ = Q(
    "agg_quantiles_sketch",
    Some("""
      WITH c AS (SELECT l_returnflag AS grp,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM lineitem),
      m AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM c),
      b AS (SELECT grp, ((cents - lo) * 128) // (hi - lo + 1) AS bin, lo, hi
        FROM c, m),
      g AS (SELECT grp, bin, lo, hi, COUNT(*) AS cnt
        FROM b GROUP BY grp, bin, lo, hi),
      cu AS (SELECT grp, bin, lo, hi, cnt,
          SUM(cnt) OVER (PARTITION BY grp ORDER BY bin) AS cum,
          SUM(cnt) OVER (PARTITION BY grp) AS n
        FROM g)
      SELECT grp AS l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
        CAST(lo + ((MIN(CASE WHEN 100 * cum >= 25 * n THEN bin END) + 1)
          * (hi - lo + 1)) // 128 AS DOUBLE) / 100.0 AS p25,
        CAST(lo + ((MIN(CASE WHEN 100 * cum >= 50 * n THEN bin END) + 1)
          * (hi - lo + 1)) // 128 AS DOUBLE) / 100.0 AS p50,
        CAST(lo + ((MIN(CASE WHEN 100 * cum >= 75 * n THEN bin END) + 1)
          * (hi - lo + 1)) // 128 AS DOUBLE) / 100.0 AS p75,
        CAST(lo + ((MIN(CASE WHEN 100 * cum >= 95 * n THEN bin END) + 1)
          * (hi - lo + 1)) // 128 AS DOUBLE) / 100.0 AS p95
      FROM cu GROUP BY grp, lo, hi ORDER BY grp
    """)) { (spark, dir) =>
    val c = t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("grp"),
        (dec2(col("l_extendedprice")) * 100).cast("long").as("cents"))
    val m = c.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    val span = col("hi") - col("lo") + 1
    // floor(int64/int64 in double) is the exact rational floor: operands
    // stay far below 2^53 (cents span ~1e7, ×128 ~1e9)
    val g = c.crossJoin(broadcast(m))
      .select(col("grp"),
        floor(((col("cents") - col("lo")) * 128) / span).cast("long").as("bin"),
        col("lo"), col("hi"))
      .groupBy(col("grp"), col("bin"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("cnt"))
    val cu = g
      .withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col("grp")).orderBy(col("bin"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("grp"))))
    def pq(q: Int) =
      ((col("lo") + floor(((min(when(lit(100) * col("cum") >= lit(q) * col("n"),
        col("bin"))) + 1) * span) / 128)).cast("double") / 100.0).as(s"p$q")
    cu.groupBy(col("grp"), col("lo"), col("hi"))
      .agg(max(col("n")).cast("long").as("n"), pq(25), pq(50), pq(75), pq(95))
      .select(col("grp").as("l_returnflag"), col("n"),
        col("p25"), col("p50"), col("p75"), col("p95"))
      .orderBy(col("l_returnflag"))
  }

  // Count-Min frequency sketch: point count estimates for keys chosen
  // AFTER the pass — the frequency sibling of quantSketchQ (ranks) /
  // freq_heavy_hitters (top-k). One map-side-combinable aggregation builds
  // the 4×1024-counter grid ([[graft.functions.CountMinSketch]]); the
  // probe stage is a 24-row broadcast of the finished sketch. est ≥ exact
  // always (min over the key's cells; over by the collision mass). Hashing
  // is md5-derived in BOTH engines, so the DuckDB twin reproduces the
  // exact cells and collision sums — the estimate column matches
  // bit-for-bit, sketch and all. The exact counts ride along from a
  // partition-pruned probe-key scan for the error readout.
  private val cmsQ = Q(
    "agg_cms_probe_counts",
    Some("""
      WITH c AS (SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM lineitem GROUP BY 1),
      j AS (SELECT unnest(generate_series(0, 3)) AS j),
      cells AS (SELECT j.j,
          CAST(('0x' || substr(md5(j.j || ':' || c.k), 1, 15)) AS BIGINT)
            % 1024 AS cell,
          CAST(SUM(c.cnt) AS BIGINT) AS total
        FROM c CROSS JOIN j GROUP BY 1, 2),
      probes AS (SELECT unnest(generate_series(1, 24)) AS k),
      pc AS (SELECT p.k, j.j,
          CAST(('0x' || substr(md5(j.j || ':' || p.k), 1, 15)) AS BIGINT)
            % 1024 AS cell
        FROM probes p CROSS JOIN j)
      SELECT pc.k AS probe_key, CAST(MIN(cells.total) AS BIGINT) AS est_count,
        CAST(MAX(COALESCE(c.cnt, 0)) AS BIGINT) AS exact_count
      FROM pc JOIN cells ON cells.j = pc.j AND cells.cell = pc.cell
      LEFT JOIN c ON c.k = pc.k
      GROUP BY pc.k ORDER BY pc.k
    """)) { (spark, dir) =>
    import graft.functions.CountMinSketch
    val depth = 4; val width = 1024
    // grid build: key counts first (map-side combinable over the raw
    // scan), then the depth×width cell sums over the DISTINCT-KEY table —
    // the same two-level shape as the oracle; hashing runs once per
    // distinct key, not once per row. (The single-row-sketch formulation
    // — udaf(new CountMinSketch(...)) over per-row cells — is the
    // streaming/merge surface, exercised in CmsSpec; as a batch catalog
    // plan the 4096-group hash aggregate IS the sketch, held as rows.)
    val keyCounts = t(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("cnt"))
    val cells = keyCounts
      .select(posexplode(CountMinSketch.cells(col("k"), depth, width))
        .as(Seq("j", "cell")), col("cnt"))
      .groupBy(col("j"), col("cell")).agg(sum(col("cnt")).as("total"))
    val probes = spark.range(1, 25).select(col("id").as("probe_key"))
    val pc = probes.select(col("probe_key"),
      posexplode(CountMinSketch.cells(col("probe_key"), depth, width))
        .as(Seq("j", "cell")))
    val exact = t(spark, dir, "lineitem")
      .filter(col("l_partkey").between(1, 24)) // pushed to the scan
      .groupBy(col("l_partkey").as("probe_key"))
      .agg(count(lit(1)).as("cnt"))
    pc.join(broadcast(cells), Seq("j", "cell"))
      .groupBy(col("probe_key"))
      .agg(min(col("total")).as("est_count"))
      .join(broadcast(exact), Seq("probe_key"), "left")
      .select(col("probe_key"), col("est_count"),
        coalesce(col("cnt"), lit(0L)).as("exact_count"))
      .orderBy(col("probe_key"))
  }

  override val specs: Seq[Q] = Seq(rfmQ,
    q1, q3, q5, q4Late, q6Forecast, q14Promo, q19Disjunct, q10Returns,
    q15TopSupp, q17SmallQty, q18LargeOrders, jLeft, jSemi, jAnti, jTheta,
    setExcept, setIntersect, setUnion,
    rollupQ, cubeQ, groupingSetsQ, distinctQ, topkQ, runningQ, lagQ, ewmaQ,
    percentilesQ, pivotQ, linesProfileQ, datePartsQ, unpivotQ, rankMetricsQ,
    dispersionQ, hotKeysQ, trailing7dQ, histogramQ, quantSketchQ, cmsQ)
}
