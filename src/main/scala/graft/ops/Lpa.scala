package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bounded synchronous label propagation (community detection) over an
 * undirected edge list (`u`, `v`; one row per edge): every node starts with
 * its own id as label, and each round simultaneously adopts the label most
 * frequent among its neighbors, ties broken by the SMALLEST label — the
 * deterministic variant of Raghavan et al. 2007 (random tie-breaks and
 * asynchronous sweeps would be irreproducible across partitionings, so both
 * are pinned down). A fixed round budget keeps the operator
 * deterministic-cost and cross-engine expressible (the DuckDB oracle
 * unrolls identical rounds); at 100 TB the same plan runs with a larger
 * budget and stops early when an iteration flips nothing.
 *
 * Scale posture: each round is one edge-width label join (keyed on the
 * node id) plus two map-side-combinable aggregates — O(rounds x E)
 * network, no all-pairs stage, no driver-side state. The label frame is
 * node-sized. Labels must be non-negative (the argmax encodes "largest
 * count, then smallest label" as max(struct(n, -label))).
 */
object Lpa {

  /** Per-node community labels after `rounds` synchronous updates.
    * Output: (node, label). Isolated nodes don't occur (every node comes
    * from an edge endpoint). */
  def propagate(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1)
    // adjacency is consumed every round; labels are consumed twice per
    // round (join + next seed) — lineage cut keeps round r from
    // re-executing rounds 1..r-1 per consumer
    val adj = edges
      .select(col("u").as("m"), col("v").as("nbr"))
      .unionAll(edges.select(col("v").as("m"), col("u").as("nbr")))
      .localCheckpoint()
    var labels = adj.select(col("m").as("node")).distinct()
      .withColumn("label", col("node").cast("long"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      labels = adj
        .join(labels.select(col("node").as("nbr"), col("label")), Seq("nbr"))
        .groupBy(col("m"), col("label"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("m"))
        .agg(max(struct(col("n"), (-col("label")).as("negl"))).as("s"))
        .select(col("m").as("node"), (-col("s.negl")).as("label"))
        .localCheckpoint()
    }
    labels
  }
}
