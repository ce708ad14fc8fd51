package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed PageRank over an edge list (`src`, `dst`) — the standard
 * power-iteration formulation with damping and dangling-mass redistribution:
 *
 *   rank'(v) = (1-d)/N + d * ( Σ_{u→v} rank(u)/deg(u)  +  danglingMass/N )
 *
 * Built the same way as [[Components]]: declarative DataFrame joins per
 * round, `localCheckpoint` to cut lineage (plan depth stays O(1) per
 * iteration instead of O(iterations)), driver-side scalars limited to
 * metadata (node count once, dangling mass per round — one 1-row aggregate).
 *
 * Scale shape per iteration: ONE src-keyed join (edges × ranks — both sides
 * hash-partitioned on the same key, so a pre-partitioned edge table makes
 * this exchange-free on the edge side) and ONE dst-keyed aggregate. Total
 * network cost is O(iterations × |E|), the canonical Pregel-equivalent plan;
 * no step depends on |V| fitting anywhere central.
 *
 * Reference provenance: graph analytics is beyond the reference's declared
 * surface (`/root/reference/README.md:23-33` stops at funnels); this extends
 * the driver's mining catalog the same way basket analysis does.
 */
object PageRank {

  /**
   * @param edges  directed edges (`src`, `dst`); parallel edges count once
   *               (dedup upstream if needed)
   * @param iters  fixed power iterations (10-20 converges for web-like
   *               graphs at d=0.85)
   * @return (`node`, `rank`) — ranks sum to 1 over all nodes
   */
  def run(edges: DataFrame, iters: Int, damping: Double = 0.85,
          checkpointEvery: Int = 3): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count() // metadata scalar: |V|, once
    require(n > 0, "empty graph")
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      // dangling nodes (no out-edges) leak their mass — redistribute it
      // uniformly; 1-row aggregate per round, same cost class as
      // Components' convergence probe
      val dangling = ranks
        .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)))
        .first().getDouble(0)
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + lit(dangling / n))).as("rank"))
      if (i % checkpointEvery == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
