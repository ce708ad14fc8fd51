package graft.catalog

import graft.{SparkEntry, SparkSpec}

/**
 * Plan-shape regression gate for the flagship queries: the scale-critical
 * invariants PLANS.md records — no sort-merge joins where dims are bounded
 * (broadcast instead), shuffle-exchange budgets, pushed scan filters — fail
 * CI here instead of only drifting in the bench. Counts are asserted as
 * budgets (<=) where AQE may legitimately collapse stages, and as exact
 * facts (SMJ == 0, BHJ counts) where a change means a real plan regression.
 */
class PlanShapeSpec extends SparkSpec {

  private case class Shape(scans: Int, shuffles: Int, bcasts: Int,
                           bhj: Int, smj: Int, pushed: Int)

  /** Executes the query (AQE finalizes) and counts the FINAL plan's ops —
    * the same counting rule as tools/PlanAudit. */
  private def shapeOf(name: String): Shape = {
    val df = SparkEntry.queries(name)(spark, sf01)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    def c(s: String) = plan.sliding(s.length).count(_ == s)
    Shape(
      scans = c("Scan parquet"),
      shuffles = c("Exchange hashpartitioning") + c("Exchange rangepartitioning"),
      bcasts = c("BroadcastExchange"),
      bhj = c("BroadcastHashJoin"),
      smj = c("SortMergeJoin"),
      pushed = c("PushedFilters: [") - c("PushedFilters: []"))
  }

  test("q1_pricing_summary: one scan, pushed date filter, agg + order only") {
    val s = shapeOf("q1_pricing_summary")
    assert(s.scans == 1 && s.pushed == 1, s)
    assert(s.shuffles <= 2, s) // groupBy + determinism ORDER BY
    assert(s.smj == 0, s)
  }

  test("q3_shipping_priority: every dim broadcast, zero SMJ, all filters pushed") {
    val s = shapeOf("q3_shipping_priority")
    assert(s.bhj == 2 && s.smj == 0, s)
    assert(s.pushed == s.scans, s)
    assert(s.shuffles <= 2, s) // agg; top-10 ordering may collapse under AQE
  }

  test("q5_regional_revenue: 5-way star join fully broadcast, zero SMJ") {
    val s = shapeOf("q5_regional_revenue")
    assert(s.bhj == 5 && s.smj == 0, s)
    assert(s.pushed == s.scans, s)
    assert(s.shuffles <= 2, s) // agg + determinism ORDER BY
  }

  test("dedup_minhash_lsh_pairs: map-only signatures, band join is the only big shuffle") {
    val s = shapeOf("dedup_minhash_lsh_pairs")
    assert(s.scans == 1, s) // signature projection reused, not re-scanned
    assert(s.smj == 0, s)
    assert(s.shuffles <= 2, s) // band-join distinct + final ordering
  }

  test("ann_cosine_topk_brute: corpus never shuffled; queries broadcast; salted top-k") {
    val s = shapeOf("ann_cosine_topk_brute")
    assert(s.bcasts == 1, s) // the query side, once
    assert(s.smj == 0, s)
    // post-scoring exchanges touch only top-k survivors, not the corpus:
    // local-window hash, global-window hash, determinism range
    assert(s.shuffles <= 3, s)
  }

  test("dedup_embedding_cosine: LSH candidates joined back without SMJ") {
    val s = shapeOf("dedup_embedding_cosine")
    assert(s.smj == 0, s)
    assert(s.shuffles <= 3, s) // candidate distinct + ordering
  }

  test("decontam_overlap: eval shingles broadcast; the corpus side never shuffles pre-agg") {
    val s = shapeOf("decontam_overlap")
    assert(s.bhj >= 1 && s.smj == 0, s) // membership via broadcast hash join
    assert(s.shuffles <= 3, s) // eval distinct + doc agg + ordering
  }

  test("corpus_mix: one pipeline, broadcast memberships, no single-partition grand total") {
    val df = SparkEntry.queries("corpus_mix")(spark, sf01)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the corpus-share denominator must arrive via broadcast, not a global
    // window: no SinglePartition exchange anywhere in the final plan
    assert(!plan.contains("Exchange SinglePartition")
      || plan.contains("BroadcastExchange"), plan.take(500))
    val s = shapeOf("corpus_mix")
    assert(s.smj == 0, s)
  }

  test("shard_assign: per-shard window shuffles on shard, never a global sort to one task") {
    val df = SparkEntry.queries("shard_assign")(spark, sf01)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange SinglePartition"), "global-sort reducer")
  }

  test("rfm_segments: quartile frame broadcast; banding is map-side, zero SMJ") {
    val s = shapeOf("rfm_segments")
    assert(s.smj == 0, s)
    assert(s.bcasts >= 2, s) // as-of date frame + quantile frame
  }
}
