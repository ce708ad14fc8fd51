package graft.catalog

import graft.{SparkEntry, SparkSpec}

/**
 * Catalog-WIDE plan-shape gate: every `SparkEntry.queries` entry is executed
 * (so AQE finalizes) and its final plan is held to the invariants that
 * decide life or death at 100 TB:
 *
 *  - `CartesianProduct`: NEVER. A non-broadcast cross join is quadratic
 *    network cost; no catalog query needs one.
 *  - `BroadcastNestedLoopJoin`: only where the query deliberately
 *    `crossJoin(broadcast(tiny))`s a provably bounded frame (1-row grand
 *    totals, quantile frames, centroid/query sets) — allowlisted per query
 *    below with the tiny side named. Any NEW BNLJ fails here in CI instead
 *    of surfacing in the next plan audit.
 *  - `Exchange SinglePartition`: only to finalize a 1-row global aggregate
 *    (inherent — the single row IS the data). A data-sized single-partition
 *    exchange (global sort / window without PARTITION BY) is the classic
 *    one-reducer bottleneck and fails for every query not allowlisted.
 *  - `SortMergeJoin`: bounded dims must broadcast; SMJ is allowed only
 *    where both sides are genuinely data-sized (none today) or result-sized
 *    (ann_recall joins two 50-row top-k frames whose stats AQE can't see
 *    until runtime).
 *
 * Budgets are exact counts from PLANS.md (regenerate with
 * `runMain graft.tools.PlanAudit`); they are asserted as upper bounds so
 * AQE collapsing a stage can only tighten them. Raising a budget requires
 * re-justifying it here AND in the query's scaladoc. Pushed-filter and
 * shuffle-count assertions for the selective flagship queries live in
 * [[PlanShapeSpec]]; this gate is the anti-pattern backstop over the whole
 * catalog.
 */
class PlanGateSpec extends SparkSpec {

  /** query -> max BroadcastNestedLoopJoins, each one a
    * crossJoin(broadcast(named tiny frame)). */
  private val bnljAllow: Map[String, Int] = Map(
    "ann_centroid_assign" -> 1,   // broadcast centroid set (k rows)
    "ann_cosine_topk_brute" -> 1, // broadcast query batch
    "ann_int8_topk" -> 1,         // broadcast quantized query batch (5 rows)
    "ann_matryoshka_topk" -> 1,   // broadcast prefix query batch (5 rows)
    "ann_cosine_topk_ivf" -> 1,   // broadcast query batch
    "ann_cosine_topk_ivf2" -> 1,  // broadcast query batch
    "ann_cosine_topk_pq" -> 1,    // broadcast query-id frame (ADC scan)
    "ann_ivf_pq" -> 1,            // broadcast centroid probe (query x
                                  // label-centroid cross, both tiny)
    "ann_pq_score_fixture" -> 1,  // broadcast fixture query batch (5 rows)
    "ann_pq_seeded" -> 1,         // broadcast query batch (5 rows, ADC scan)
    "ann_signrp_topk" -> 1,       // broadcast query batch (5 projected rows)
    "ann_signrp_recall" -> 2,     // brute + sketch arms, one query batch each
    "ann_knn_classify" -> 1,      // brute arm's broadcast query batch
    "lm_kn_bigram_table" -> 1,    // broadcast 1-row bigram-type grand total
    "lm_kn_doc_score" -> 1,       // broadcast 1-row bigram-type grand total
    "ann_recall" -> 2,            // brute + ivf arms, one query batch each
    "agg_quantiles_sketch" -> 1,  // broadcast 1-row min/max span
    "anomaly_daily_revenue" -> 1, // broadcast 1-row moment frame (n, s, sq)
    "basket_part_pairs" -> 1,     // broadcast 1-row total-orders frame
    "calendar_fill_daily_sales" -> 1, // generated day axis x 5-row dim
    "copurchase_rules_lift" -> 1, // broadcast 1-row total-orders frame
    "corpus_mix" -> 1,            // broadcast 1-row corpus grand total
    "drift_event_mix_chi2" -> 2,  // 1-row day span + 1-row half totals
    "dedup_semdedup" -> 1,        // broadcast centroid set (k rows)
    "ts_mann_kendall_trend" -> 3, // i<j inequality self-join of the
                                  // CALENDAR-BOUNDED day series (~2.4k
                                  // rows broadcast; never corpus-sized)
                                  // + two 1-row scalar crossJoins (S,
                                  // tie_adj)
    "ts_cusum_changepoint" -> 1,  // broadcast 1-row (n, tot) totals frame
    "profile_price_histogram" -> 1, // broadcast 1-row min/max span
    "rfm_segments" -> 3,          // as-of date frame + R/F/M quantile frames
    "search_bm25_topk" -> 1,      // broadcast 1-row (A, N) corpus totals
    "search_hybrid_rrf" -> 1,     // broadcast query batch (semantic leg)
    "sample_pps_systematic" -> 1, // broadcast 1-row token grand total
    "sample_temperature_mix" -> 1, // broadcast 1-row pivoted normalizer
    "skew_hot_custkeys" -> 1,     // broadcast 1-row grand total (hotKeys)
    "tfidf_top_terms" -> 1,       // broadcast 1-row n_docs
    "filter_source_quality" -> 1, // broadcast 1-row median-source threshold
    "sample_time_split" -> 1,     // broadcast 1-row day span
    "sample_class_balanced" -> 2, // broadcast 1-row median + class floor
    "window_wau_rolling" -> 1,    // broadcast 1-row max observed day
    "cdc_user_day_diff" -> 1,     // broadcast 1-row first/last-day span
    "eval_auc_rank" -> 1,         // broadcast 1-row label-median frame
    // label median replays once per consumer of the checkpointed user
    // frame (2 consumers) + the metric's own 1-row threshold/span frame
    "eval_confusion_threshold" -> 3,
    "eval_kappa_agreement" -> 3,
    "eval_calibration_bins" -> 3,
    "agg_kmv_distinct_spans" -> 1, // broadcast 1-row exact-distinct arm
    "ts_weekday_seasonality" -> 1, // broadcast 1-row revenue/day totals
    "profile_user_diversity" -> 1, // broadcast 1-row diversity median
    // label median replays per consumer of the labeled frame (stats + main)
    "train_target_encode_loo" -> 2,
    // label median (x2 consumers) + 1-row activity-span frame
    "train_hashed_features" -> 3,
    // |sources|x|sources| inequality pair join, both sides catalog-sized
    "dedup_source_overlap_kmv" -> 1,
    // broadcast 1-row token total (nt) + 1-row bigram total (nb)
    "lm_pmi_bigrams" -> 2,
    "dq_benford_prices" -> 1,     // broadcast 1-row digit grand total
    // broadcast 1-row (n, total) + 5-row percentile-probe frame
    "profile_revenue_concentration" -> 2)

  /** query -> max SinglePartition exchanges, each the final combine of a
    * 1-row global aggregate (metadata-sized by construction). */
  private val singlePartAllow: Map[String, Int] = Map(
    "abtest_conversion_chi2" -> 1,       // 1-row 2x2 contingency readout
    "agg_quantiles_sketch" -> 1,         // 1-row min/max span
    "basket_part_pairs" -> 1,            // 1-row distinct-order total
    "calendar_fill_daily_sales" -> 1,    // 1-row min/max date span
    "copurchase_rules_lift" -> 1,        // 1-row distinct-order total
    "corpus_mix" -> 1,                   // corpus grand total
    "anomaly_daily_revenue" -> 1,        // 1-row day-grain moment aggregate
    "drift_event_mix_chi2" -> 2,         // 1-row day span + 1-row half
                                         // totals (type-table-sized input)
    "dq_checks" -> 5,                    // 5 scalar check aggregates (one
                                         // per table scan / referential
                                         // join), each finalizing ONE row
    "filter_source_quality" -> 1,        // 1-row median over the
                                         // vocabulary-sized source table
    "sample_time_split" -> 1,            // 1-row min/max day span
    "sample_class_balanced" -> 2,        // 1-row median + 1-row class floor
                                         // (both over the user-grain frame)
    "freq_heavy_hitters" -> 1,           // 1-row Misra-Gries candidate array
    "funnel_view_click_purchase" -> 1,   // 1-row funnel output
    "q19_disjunctive_revenue" -> 1,      // 1-row global revenue readout
    "q15_top_supplier" -> 1,             // 1-row max-revenue broadcast
    "q17_small_qty_revenue" -> 1,        // 1-row global revenue readout
    "q6_forecast_revenue" -> 1,          // 1-row global revenue readout
    "lm_kn_bigram_table" -> 1,           // 1-row bigram-type grand total
    "lm_kn_doc_score" -> 1,              // 1-row bigram-type grand total
    "lm_vocab_encode" -> 1,              // vocabulary ranking window —
                                         // Heaps-bounded vocab rows, never
                                         // corpus rows (see Lm scaladoc)
    "profile_price_histogram" -> 1,      // 1-row min/max span
    "profile_tables" -> 3,               // 3 per-table scalar profile aggs
    "reconcile_days_without_errors" -> 1, // scalar reconciliation total
    "rfm_segments" -> 2,                 // quantile + as-of scalar frames
    "sample_pps_systematic" -> 1,        // token grand-total scalar
    "sample_temperature_mix" -> 1,       // 1-row pivoted normalizer
    "search_bm25_topk" -> 1,             // 1-row (A, N) corpus totals
    "skew_hot_custkeys" -> 1,            // grand total
    "tfidf_top_terms" -> 1,              // n_docs count
    "ts_interpolate_linear" -> 3,        // 1-row date span + the two
                                         // calendar-bounded fill windows
                                         // (few-thousand-row frame, same
                                         // posture as trailing_7day)
    "window_trailing_7day_revenue" -> 1, // calendar-bounded day-grain
                                         // window (metadata-sized input,
                                         // see the query's scaladoc)
    "window_wau_rolling" -> 1,           // 1-row max observed day
    "cdc_user_day_diff" -> 1,            // 1-row first/last-day span
    "eval_auc_rank" -> 2,                // 1-row label median + the
                                         // distinct-score rank window
                                         // (metadata-sized, see scaladoc)
    "eval_confusion_threshold" -> 4,     // 2 medians + 1-row cell agg +
                                         // final 1-row readout
    "eval_kappa_agreement" -> 4,         // same shape as confusion
    "eval_calibration_bins" -> 3,        // label median + min/max span +
                                         // ≤10-row bin finalize
    "agg_kmv_distinct_spans" -> 1,       // 1-row exact-distinct finalize
    "profile_source_gini" -> 1,          // rank window over the SOURCE
                                         // table (catalog-sized)
    "ts_weekday_seasonality" -> 1,       // 1-row totals over the 7-row
                                         // weekday frame
    "profile_user_diversity" -> 1,       // 1-row median finalize
    "train_target_encode_loo" -> 1,      // 1-row label-median finalize
    "train_hashed_features" -> 3,        // label median + activity span +
                                         // final 1-row combines
    "ts_autocorr_lag7" -> 1,             // 1-row moment reduction over
                                         // the calendar-bounded pair series
    "ts_spearman_rev_orders" -> 1,       // the two global rank windows over
                                         // the calendar-bounded day frame
                                         // (fused into one exchange; 1-row
                                         // moment reduction rides it)
    "ts_mann_kendall_trend" -> 3,        // 1-row S / n / tie_adj scalar
                                         // finalizes, all over the
                                         // calendar-bounded day frame
    "ts_cusum_changepoint" -> 3,         // cumsum + argmax windows over
                                         // the calendar-bounded day frame
                                         // + 1-row totals finalize
    "lm_pmi_bigrams" -> 2,               // nt + nb 1-row total finalizes
    "ts_stl_weekly" -> 2,                // centered-window pass over the
                                         // calendar-bounded day frame +
                                         // final day ordering
    "train_decile_bins" -> 1,            // NTILE total order over the
                                         // CUSTOMER-grain spend table
                                         // (dimension cardinality; swap in
                                         // agg_quantiles_sketch cutoffs
                                         // past ~1e8 customers — scaladoc)
    "dq_benford_prices" -> 1,            // 1-row digit grand-total finalize
    "profile_revenue_concentration" -> 2) // rank+cumsum window over the
                                         // CUSTOMER-grain spend table (same
                                         // posture + sketch cutoff as
                                         // train_decile_bins) + 1-row
                                         // (n, total) finalize

  /** query -> max SortMergeJoins (both sides result-sized, stats unknown
    * until runtime so AQE keeps the conservative plan). */
  private val smjAllow: Map[String, Int] = Map(
    "ann_recall" -> 1,
    "ann_signrp_recall" -> 1,     // two 50-row top-k frames, stats unknown
    // RRF fusion full-outer-joins two ≤30-row-per-query rank lists: both
    // sides result-sized, and FULL OUTER cannot broadcast-hash anyway
    "search_hybrid_rrf" -> 1)

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"plan gate: $name") {
      val df = SparkEntry.queries(name)(spark, sf01)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      def c(s: String) = plan.sliding(s.length).count(_ == s)

      assert(c("CartesianProduct") == 0,
        s"$name: CartesianProduct in final plan — quadratic at scale")
      assert(c("BroadcastNestedLoopJoin") <= bnljAllow.getOrElse(name, 0),
        s"$name: unexpected BroadcastNestedLoopJoin — only allowlisted " +
          s"crossJoin(broadcast(tiny)) patterns may BNLJ")
      assert(c("Exchange SinglePartition") <= singlePartAllow.getOrElse(name, 0),
        s"$name: data-sized SinglePartition exchange — one-reducer bottleneck")
      assert(c("SortMergeJoin") <= smjAllow.getOrElse(name, 0),
        s"$name: SortMergeJoin where a bounded side should broadcast")
    }
  }
}
