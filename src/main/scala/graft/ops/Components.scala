package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed connected components over an edge list — the dedup endgame:
 * near-dup PAIRS (MinHash/hyperplane LSH output) become duplicate CLUSTERS,
 * from which one canonical document per cluster survives. Mirrors the
 * cluster step of large-scale dedup pipelines (the reference's dedup story
 * stops at pair emission; a 100 TB corpus needs the transitive closure —
 * A~B, B~C means A,B,C are one document).
 *
 * Algorithm: iterative hash-min label propagation. Every node starts
 * labeled with itself; each round a node adopts the minimum label among
 * itself and its direct neighbors; fixpoint = every node carries its
 * component's global minimum id. Convergence is O(component diameter)
 * rounds — near-dup clusters are shallow (dups of dups of one original),
 * so 3-4 rounds in practice; `maxIter` bounds the pathological chain.
 *
 * Scale shape: each round is one shuffle join (edges x labels, on dst)
 * plus one hash aggregation (min per src) — both key-partitioned, no
 * driver state; per-round lineage is truncated with an executor-side
 * `localCheckpoint` so the iterative plan can't stack (the convergence
 * `count()` action pays for materializing it). The result is
 * deterministic for any edge order or iteration schedule: min is
 * schedule-invariant.
 */
object Components {

  /**
   * Connected components of the undirected graph given by `edges`
   * (`aCol`, `bCol`). Returns (id, comp) for every node appearing in any
   * edge, where `comp` is the smallest node id in its component.
   */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    require(maxIter > 0)
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("comp")).as("ncomp"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("next"))
        .localCheckpoint(true)
      converged = updated.filter(col("next") < col("comp")).isEmpty
      labels = updated.select(col("id"), col("next").as("comp"))
      iter += 1
    }
    // a silent partial closure would merge/miss clusters undetectably
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        "(component diameter exceeds maxIter); raise maxIter")
    labels
  }
}
