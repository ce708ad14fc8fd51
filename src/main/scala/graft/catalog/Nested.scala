package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
 * Scale posture: the build+explode round-trip is algebraically the
 * identity on the row set, so the query runs as one order-keyed window
 * (bounded per-order groups — TPC-H orders have ≤7 lines; GA4 carts are
 * similarly tiny) followed by a map-side-partial hash agg on item_id: one
 * shuffle to order grain, one to item grain. At 100 TB a real GA4 lake
 * skips the first: `items` is already materialized, so the plan is
 * scan → Generate(inline) → partial agg, no shuffle before the final
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
    // The exploded rows ARE the lineitem rows, and slot 0 is the row that
    // ranks FIRST within its order under the array's 4-field sort order
    // (line_no, item_id, quantity, price — the same total order as the
    // oracle's ORDER BY; full tiebreak, since synthetic lineitem has
    // duplicate l_linenumber within an order). So the collect_list →
    // interpreted array_sort comparator → posexplode round-trip collapses
    // to one window row_number: ties on all four fields are field-identical
    // rows, so which one takes rank 1 cannot change any aggregate below.
    // Same two exchanges as the array plan, but codegen sort instead of
    // ObjectHashAggregate + per-comparison interpreted lambda.
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"))
    li
      .select(col("l_partkey").as("item_id"),
        col("l_quantity").as("quantity"),
        col("l_extendedprice").as("price"),
        (row_number().over(w) === 1).as("is_first"))
      .groupBy(col("item_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        Exact.sumMoney(col("quantity")).as("qty_total"),
        count(when(col("is_first"), lit(1))).as("first_slot_lines"),
        coalesce(
          sum(when(col("is_first"), Exact.dec2(col("price"))))
            .cast("double"),
          lit(0.0)).as("first_slot_revenue"))
      .orderBy(col("item_id"))
  }

  override val specs: Seq[Q] = Seq(itemsExplode)
}
