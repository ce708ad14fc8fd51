package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bounded k-core peeling over an undirected edge list (`u`, `v`; one row
 * per edge, u < v convention not required): each round drops every node
 * whose current degree is below `k`, then every edge touching a dropped
 * node. A fixed round budget keeps the operator deterministic-cost and
 * cross-engine expressible (the DuckDB oracle unrolls the same rounds);
 * full-core convergence is just "rounds >= graph diameter" — at 100 TB you
 * run the same plan with a larger budget and stop early when an iteration
 * removes nothing.
 *
 * Scale posture: each round is one degree aggregate (map-side combinable)
 * plus two semi-joins keyed on the node id — no all-pairs stage, no
 * driver-side state; edge volume only ever shrinks.
 */
object KCore {

  /** The surviving edge subgraph after `rounds` peels at threshold `k`. */
  def peelEdges(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    // lineage cut per round: `cur` is consumed three times each round
    // (degree build + two semi-joins) — without the checkpoint every
    // consumer would re-execute all upstream rounds, 3^rounds blowup
    var cur = edges.select(col("u"), col("v")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val deg = cur.select(col("u").as("node"))
        .unionAll(cur.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("node"))
      cur = cur
        .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint()
    }
    cur
  }

  /** Per-node degree inside the peeled subgraph (nodes that kept >=1 edge). */
  def coreDegrees(edges: DataFrame, k: Int, rounds: Int): DataFrame =
    peelEdges(edges, k, rounds)
      .select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
}
