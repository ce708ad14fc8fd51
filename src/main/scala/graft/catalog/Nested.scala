package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.Tables
import graft.ops.Exact

/**
 * Array-of-struct (GA4 `items`-shaped) operators: build per-order item
 * arrays, explode them back out with their ordinal, and aggregate — the
 * shape the reference's declared product analytics need over GA4's nested
 * `items` column (/root/reference/config/queries/extract_events.sql:79,
 * README.md:33 "top products"). The testdata has no struct columns, so the
 * arrays are built from `lineitem` (same array-of-struct layout at the
 * same cardinalities) identically in both engines, making the explode
 * oracle-checkable end to end.
 *
 * Scale posture: the array build is one hash aggregation on l_orderkey
 * (bounded per-order arrays — TPC-H orders have ≤7 lines; GA4 carts are
 * similarly tiny), and the explode is a Generate over it — one shuffle
 * total, then a map-side-partial hash agg on item_id. At 100 TB a real GA4
 * lake SKIPS the build half: `items` is already materialized, so the plan
 * is scan → Generate(inline) → partial agg, no shuffle before the final
 * per-item combine.
 */
object Nested extends Family {

  // Explode with ordinals: per item, how often it appears, total quantity,
  // and how often / how much revenue when it is its order's FIRST line
  // (slot 0) — the ordinal makes the query genuinely depend on the array
  // structure, not just its multiset of elements.
  private val itemsExplode = Q(
    "items_explode_first_slot",
    Some("""
      WITH per_order AS (
        SELECT l_orderkey AS order_id,
          list(struct_pack(line_no := l_linenumber, item_id := l_partkey,
                           quantity := l_quantity, price := l_extendedprice)
               ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice) AS items
        FROM lineitem GROUP BY l_orderkey),
      ex AS (
        SELECT order_id,
          generate_subscripts(items, 1) - 1 AS slot,
          unnest(items) AS item
        FROM per_order)
      SELECT item.item_id AS item_id,
        count(*) AS n_lines,
        CAST(sum(CAST(item.quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_total,
        count(*) FILTER (WHERE slot = 0) AS first_slot_lines,
        CAST(coalesce(
          sum(CAST(item.price AS DECIMAL(18,2))) FILTER (WHERE slot = 0),
          0) AS DOUBLE) AS first_slot_revenue
      FROM ex
      GROUP BY item.item_id
      ORDER BY item_id
    """)) { (spark, dir) =>
    val li = Tables.load(spark, dir, "lineitem")
    // array_sort on structs orders field-by-field — the same total order as
    // the oracle's ORDER BY over the four fields (full tiebreak: synthetic
    // lineitem has duplicate l_linenumber within an order)
    val perOrder = li
      .groupBy(col("l_orderkey").as("order_id"))
      .agg(array_sort(collect_list(struct(
        col("l_linenumber").as("line_no"),
        col("l_partkey").as("item_id"),
        col("l_quantity").as("quantity"),
        col("l_extendedprice").as("price")))).as("items"))
    perOrder
      .select(col("order_id"), posexplode(col("items")).as(Seq("slot", "item")))
      .groupBy(col("item.item_id").as("item_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        Exact.sumMoney(col("item.quantity")).as("qty_total"),
        count(when(col("slot") === 0, lit(1))).as("first_slot_lines"),
        coalesce(
          sum(when(col("slot") === 0, Exact.dec2(col("item.price"))))
            .cast("double"),
          lit(0.0)).as("first_slot_revenue"))
      .orderBy(col("item_id"))
  }

  override val specs: Seq[Q] = Seq(itemsExplode)
}
