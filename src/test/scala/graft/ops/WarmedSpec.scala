package graft.ops

import graft.{SparkEntry, SparkSpec}

/**
 * The Warmed registry must be invisible to correctness: every consumer of a
 * warmed shared spine returns row-identical results with the cache empty
 * and populated, and clear() restores the standalone (CI-gated) plans.
 */
class WarmedSpec extends SparkSpec {

  private val consumers = Seq(
    "dedup_minhash_lsh_pairs", "dedup_components", "dedup_ngram_jaccard",
    "dedup_levenshtein_pairs", "ann_cosine_topk_brute", "ann_cosine_topk_ivf",
    "ann_cosine_topk_ivf2", "ann_centroid_assign", "dedup_embedding_cosine",
    "ann_recall")

  test("warmed spines serve identical results and actually hit the cache") {
    val before =
      consumers.map(n => n -> SparkEntry.queries(n)(spark, sf001).collect().toSeq).toMap
    try {
      graft.catalog.TextLlm.warmShared(spark, sf001)
      graft.catalog.Vectors.warmShared(spark, sf001)
      consumers.foreach { n =>
        val df = SparkEntry.queries(n)(spark, sf001)
        // components' iterative localCheckpoint erases lineage (LogicalRDD),
        // so the warmed input can't appear in its FINAL plan — row equality
        // below still proves the warmed spine fed the iterations.
        if (n != "dedup_components")
          assert(df.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
            s"$n did not pick up the warmed spine")
        assert(df.collect().toSeq == before(n), s"$n differs when warmed")
      }
    } finally Warmed.clear()
    val df = SparkEntry.queries("dedup_minhash_lsh_pairs")(spark, sf001)
    assert(!df.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
      "clear() must restore the standalone plan")
  }
}
