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
 * Algorithm: iterative hash-min label propagation with pointer jumping.
 * Every node starts labeled with itself; each round a node adopts the
 * minimum label among itself and its direct neighbors (propagation), then
 * adopts its label's OWN label (shortcut — labels always name nodes of the
 * same component, so chasing one hop of the label graph is sound and
 * halves the remaining distance to the component minimum). Fixpoint =
 * every node carries its component's global minimum id. The shortcut turns
 * O(diameter) rounds into O(log diameter) — a 1M-link chain (pathological
 * crawl dup-graph) converges in ~20 rounds, not 1M; near-dup clusters are
 * shallow anyway and finish in 2-3.
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

  /** One finished run: final labels plus the per-round relabel counts that
    * diagnose the shape of the dup graph (shallow clusters hit zero in 2-3
    * rounds; a giant component keeps most nodes churning every round). */
  final case class Run(labels: DataFrame, rounds: Int,
                       nNodes: Long, changedPerRound: Seq[Long])

  /**
   * Connected components of the undirected graph given by `edges`
   * (`aCol`, `bCol`). Returns (id, comp) for every node appearing in any
   * edge, where `comp` is the smallest node id in its component.
   */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame =
    run(edges, aCol, bCol, maxIter).labels

  /**
   * Like [[connectedComponents]] but returns convergence statistics, and
   * fails FAST on a pathological dup graph: real near-dup clusters are
   * shallow (diameter 2-3), so if after `giantCheckAfter` rounds — reach
   * 2^giantCheckAfter thanks to pointer jumping — more than `giantFrac` of
   * the nodes are STILL relabeling, the graph almost certainly contains a
   * giant component (an over-permissive LSH band / similarity threshold
   * glued the corpus together). Burning the remaining maxIter rounds would
   * cost a full shuffle join each; better to stop and report the evidence.
   */
  def run(edges: DataFrame, aCol: String, bCol: String,
          maxIter: Int = 20, giantCheckAfter: Int = 10,
          giantFrac: Double = 0.5): Run = {
    require(maxIter > 0 && giantCheckAfter > 0 && giantFrac > 0)
    val symPlan = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
    // ckpt: materialize AND drop inherited size stats. localCheckpoint alone
    // keeps the source plan's stats on its LogicalRDD; each round's joins
    // would then multiply them — by round ~12 the driver stalls for minutes
    // doing BigInteger products in stats estimation. freshFrame re-wraps the
    // same materialized RDD stats-free (no data movement).
    def ckpt(df: DataFrame): DataFrame =
      org.apache.spark.sql.graftbridge.bridge.freshFrame(df.localCheckpoint(true))
    // materialize the edge list once: every round's neighborMin joins it,
    // and an un-checkpointed plan would re-run the whole upstream pipeline
    // (for dedup_components: the full LSH candidate-pair join) per round
    val sym = ckpt(symPlan)
    var labels = ckpt(sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")))
    // one cheap action over checkpointed blocks; the denominator of the
    // giant-component fraction below
    val nNodes = labels.count()
    val changedHistory = Seq.newBuilder[Long]
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("comp")).as("ncomp"))
      // materialized once: hop + updated below read it three times, and an
      // un-checkpointed plan would re-execute the propagate join each time
      val propagated = ckpt(labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("mid")))
      // pointer jump: follow the label graph one hop (comp -> comp's comp)
      val hop = propagated
        .select(col("mid").as("jid"), col("id").as("hid"))
        .join(propagated.select(col("id").as("jid"), col("mid").as("jcomp")),
          Seq("jid"))
        .select(col("hid").as("id"), col("jcomp"))
      val updated = ckpt(propagated.join(hop, Seq("id"), "left")
        .select(col("id"), col("comp"),
          least(col("mid"), coalesce(col("jcomp"), col("mid"))).as("next")))
      // changed-count instead of a bare isEmpty: same materialized scan,
      // and the count is the convergence diagnostic
      val changed = updated.filter(col("next") < col("comp")).count()
      changedHistory += changed
      converged = changed == 0
      labels = updated.select(col("id"), col("next").as("comp"))
      iter += 1
      if (!converged && iter >= giantCheckAfter && changed > giantFrac * nNodes)
        throw new IllegalStateException(
          s"likely giant component: after $iter rounds (reach ~2^$iter via " +
            s"pointer jumping) $changed of $nNodes nodes are still " +
            s"relabeling (> ${(giantFrac * 100).toInt}%). The dup graph has " +
            "a component of diameter >= " + (1L << iter) + " — an " +
            "over-permissive LSH band width or similarity threshold has " +
            "likely glued the corpus into one cluster. Changed-per-round: " +
            changedHistory.result().mkString(", "))
    }
    // a silent partial closure would merge/miss clusters undetectably
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        "(component diameter exceeds maxIter); raise maxIter. " +
        s"Changed-per-round: ${changedHistory.result().mkString(", ")}")
    Run(labels, iter, nNodes, changedHistory.result())
  }
}
