package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.lake.Tables

/**
 * Model-evaluation + training-set-construction operators: the measurement
 * harness that closes the loop the feature store opens. The reference
 * declares the model-facing surface ("dashboards", "customer analytics" —
 * /root/reference/README.md:23-33) without the evaluation step every
 * propensity/quality model needs; these queries supply it over the same
 * user grain as `train_user_features`.
 *
 * The "model" under evaluation is deliberately the simplest deterministic
 * scorer the lake can produce — a user's non-purchase activity count
 * predicting the heavy-purchaser label — because the harness, not the
 * model, is the operator: rank-sum AUC, confusion/precision/recall/F1,
 * reliability (calibration) bins, and Cohen's kappa agreement are the
 * metrics any real scorer would be pushed through, and each is computed in
 * the catalog's exact-arithmetic discipline (integer/decimal operands
 * end-to-end, ONE IEEE division per reported ratio — bit-identical
 * cross-engine, no tolerance).
 *
 * Scale posture: every metric aggregates the corpus to USER grain in one
 * map-side-combinable pass (one user-keyed shuffle); everything after runs
 * on the user frame or on metadata-sized reductions of it (the distinct
 * score table for AUC, 1-row threshold/min-max broadcasts, a ≤10-row bin
 * table). Nothing event-cardinality crosses a second shuffle, and no
 * metric sorts the corpus.
 */
object Eval extends Family {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)

  /** Window: a user's events in time order, event_id as total tiebreak. */
  private val byUserTime = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  /** The evaluation frame: per user, the model score (non-purchase event
    * count — integer, deterministic) and the binary "heavy purchaser"
    * label (purchase count above the corpus median — median-split so both
    * classes are populated at every scale factor; the same exact
    * interpolated-median parity sample_class_balanced relies on). One
    * corpus pass to user grain (map-side combinable, user-keyed shuffle
    * only) + a 1-row median broadcast. The user-grain frame feeds both the
    * label median and (in every metric) a second consumer — localCheckpoint
    * materializes it once (user-cardinality rows, bounded far under the
    * corpus) instead of re-running the event scan per consumer, the
    * sample_class_balanced spine discipline. */
  private def userFrame(spark: SparkSession, dir: String): DataFrame = {
    val u0 = ev(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
          .as("score"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np"))
      .localCheckpoint()
    val m = u0.agg(median(col("np")).as("pmed"))
    u0.crossJoin(broadcast(m))
      .select(col("user_id"), col("score"),
        when(col("np") > col("pmed"), 1L).otherwise(0L).as("pos"))
  }

  private val userFrameSql = """
      u0 AS (
        SELECT user_id,
          CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS score,
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS np
        FROM events GROUP BY user_id),
      um AS (SELECT median(np) AS pmed FROM u0),
      u AS (SELECT user_id, score,
              CAST(CASE WHEN np > pmed THEN 1 ELSE 0 END AS BIGINT) AS pos
            FROM u0 CROSS JOIN um)"""

  // -------------------------------------------------------------------------
  // Rank-sum (Mann-Whitney) AUC, exact: AUC = U / (n1·n0) with midrank tie
  // handling, computed entirely in BIGINT by carrying DOUBLED ranks —
  // 2·R1 = Σ_scores npos·(2·cum_before + cnt + 1), 2·U = 2·R1 − n1·(n1+1) —
  // so the single IEEE division at the end is the only rounding anywhere.
  // This is the corpus-sort-free AUC: the corpus reduces to the DISTINCT
  // SCORE table (bounded by max per-user activity, not user count), the
  // cumulative window runs over that metadata-sized table, and the answer
  // is one row. The usual "sort all predictions" formulation is the plan
  // this replaces at 100 TB.
  private val aucRank = Q(
    "eval_auc_rank",
    Some(s"""
      WITH $userFrameSql,
      g AS (SELECT score, COUNT(*) AS cnt, CAST(SUM(pos) AS BIGINT) AS npos
            FROM u GROUP BY score),
      r AS (SELECT score, cnt, npos,
              CAST(COALESCE(SUM(cnt) OVER (ORDER BY score
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS cumb
            FROM g),
      s AS (SELECT CAST(SUM(npos * (2 * cumb + cnt + 1)) AS BIGINT) AS r2,
              CAST(SUM(npos) AS BIGINT) AS n1,
              CAST(SUM(cnt) AS BIGINT) AS n
            FROM r)
      SELECT n AS n_users, n1 AS n_pos, n - n1 AS n_neg,
        r2 - n1 * (n1 + 1) AS u2,
        CASE WHEN n1 = 0 OR n1 = n THEN NULL
          ELSE CAST(r2 - n1 * (n1 + 1) AS DOUBLE) / (2 * n1 * (n - n1))
        END AS auc
      FROM s
    """)) { (spark, dir) =>
    val g = userFrame(spark, dir)
      .groupBy(col("score"))
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("npos"))
    // unpartitioned window is over DISTINCT scores — metadata-sized
    val r = g.withColumn("cumb",
      coalesce(sum(col("cnt")).over(Window.orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    r.agg(
        sum(col("npos") * (lit(2L) * col("cumb") + col("cnt") + 1)).as("r2"),
        sum(col("npos")).as("n1"),
        sum(col("cnt")).as("n"))
      .select(col("n").as("n_users"), col("n1").as("n_pos"),
        (col("n") - col("n1")).as("n_neg"),
        (col("r2") - col("n1") * (col("n1") + 1)).as("u2"),
        // AUC is undefined with an empty class (the median split CAN leave
        // one empty — e.g. every user shares one purchase count): report a
        // deliberate NULL identically on both engines, never NaN/±Inf
        when(col("n1") === 0 || col("n1") === col("n"),
          lit(null).cast("double"))
          .otherwise((col("r2") - col("n1") * (col("n1") + 1)).cast("double") /
            (lit(2L) * col("n1") * (col("n") - col("n1")))).as("auc"))
  }

  // -------------------------------------------------------------------------
  // Thresholded confusion matrix + precision/recall/F1/accuracy: predict
  // "purchaser" when the score clears the corpus median (the same exact
  // interpolated-median 1-row broadcast discipline as
  // sample_class_balanced). Counts are one conditional aggregate over the
  // user frame; each reported ratio is ONE division of BIGINT operands
  // (F1 via its single-division form 2tp/(2tp+fp+fn)) — correctly rounded,
  // so both engines produce the identical double.
  private val confusion = Q(
    "eval_confusion_threshold",
    Some(s"""
      WITH $userFrameSql,
      m AS (SELECT median(score) AS med FROM u),
      p AS (SELECT pos, CASE WHEN score > med THEN 1 ELSE 0 END AS pred
            FROM u CROSS JOIN m),
      c AS (SELECT
          CAST(SUM(CASE WHEN pred = 1 AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
          CAST(SUM(CASE WHEN pred = 1 AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
          CAST(SUM(CASE WHEN pred = 0 AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
          CAST(SUM(CASE WHEN pred = 0 AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM p)
      SELECT tp, fp, fn, tn,
        CAST(tp AS DOUBLE) / (tp + fp) AS precision_,
        CAST(tp AS DOUBLE) / (tp + fn) AS recall_,
        CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) AS f1,
        CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) AS accuracy
      FROM c
    """)) { (spark, dir) =>
    val u = userFrame(spark, dir)
    val m = u.agg(median(col("score")).as("med"))
    val p = u.crossJoin(broadcast(m))
      .select(col("pos"),
        when(col("score") > col("med"), 1L).otherwise(0L).as("pred"))
    def cell(pred: Int, pos: Int): Column =
      sum(when(col("pred") === pred && col("pos") === pos, 1L).otherwise(0L))
    p.agg(cell(1, 1).as("tp"), cell(1, 0).as("fp"),
        cell(0, 1).as("fn"), cell(0, 0).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        (col("tp").cast("double") / (col("tp") + col("fp"))).as("precision_"),
        (col("tp").cast("double") / (col("tp") + col("fn"))).as("recall_"),
        ((lit(2L) * col("tp")).cast("double") /
          (lit(2L) * col("tp") + col("fp") + col("fn"))).as("f1"),
        ((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("fn") + col("tn"))).as("accuracy"))
  }

  // -------------------------------------------------------------------------
  // Reliability (calibration) bins: 10 equi-width score bins (the
  // profile_price_histogram integer bin rule — exact rational floor, both
  // operands far under 2^53), each reporting volume, positive count, and
  // the empirical positive rate (ONE division). A calibrated scorer shows
  // monotone rates; this is the audit table a propensity model ships with.
  // Scale shape: user frame + 1-row min/max broadcast + ≤10-row output.
  private val calibration = Q(
    "eval_calibration_bins",
    Some(s"""
      WITH $userFrameSql,
      m AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM u),
      b AS (SELECT ((score - lo) * 10) // (hi - lo + 1) AS bin, pos, score
            FROM u, m),
      c AS (SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n_users,
              CAST(SUM(pos) AS BIGINT) AS n_pos,
              CAST(SUM(score) AS BIGINT) AS score_sum
            FROM b GROUP BY bin)
      SELECT bin, n_users, n_pos,
        CAST(n_pos AS DOUBLE) / n_users AS pos_rate,
        CAST(score_sum AS DOUBLE) / n_users AS mean_score
      FROM c ORDER BY bin
    """)) { (spark, dir) =>
    val u = userFrame(spark, dir)
    val m = u.agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
    u.crossJoin(broadcast(m))
      .select(floor(((col("score") - col("lo")) * 10) /
          (col("hi") - col("lo") + 1)).as("bin"),
        col("pos"), col("score"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_users"), sum(col("pos")).as("n_pos"),
        sum(col("score")).as("score_sum"))
      .select(col("bin").cast("long").as("bin"), col("n_users"),
        col("n_pos"),
        (col("n_pos").cast("double") / col("n_users")).as("pos_rate"),
        (col("score_sum").cast("double") / col("n_users")).as("mean_score"))
      .orderBy(col("bin"))
  }

  // -------------------------------------------------------------------------
  // Cohen's kappa between two labelings — the purchase label vs the
  // high-activity prediction (score > median, the same rule the confusion
  // matrix thresholds on): chance-corrected agreement
  // κ = (N·agree − Σ_k r_k·c_k) / (N² − Σ_k r_k·c_k), every operand a
  // BIGINT from one conditional aggregate, ONE division. This is the
  // weak-supervision audit: how much better than chance do the heuristic
  // labeler and the ground label agree (cf. the kNN pseudo-labeling arm,
  // ann_knn_classify).
  private val kappa = Q(
    "eval_kappa_agreement",
    Some(s"""
      WITH $userFrameSql,
      m AS (SELECT median(score) AS med FROM u),
      p AS (SELECT pos, CASE WHEN score > med THEN 1 ELSE 0 END AS pred
            FROM u CROSS JOIN m),
      c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN pos = pred THEN 1 ELSE 0 END) AS BIGINT) AS agree,
          CAST(SUM(pos) AS BIGINT) AS r1,
          CAST(SUM(pred) AS BIGINT) AS c1
        FROM p)
      SELECT n AS n_users, agree AS n_agree, r1 AS n_pos_label,
        c1 AS n_pos_pred,
        CASE WHEN n * n = r1 * c1 + (n - r1) * (n - c1) THEN NULL
          ELSE CAST(n * agree - (r1 * c1 + (n - r1) * (n - c1)) AS DOUBLE)
            / (n * n - (r1 * c1 + (n - r1) * (n - c1)))
        END AS kappa
      FROM c
    """)) { (spark, dir) =>
    val u = userFrame(spark, dir)
    val m = u.agg(median(col("score")).as("med"))
    val p = u.crossJoin(broadcast(m))
      .select(col("pos"),
        when(col("score") > col("med"), 1L).otherwise(0L).as("pred"))
    val c = p.agg(count(lit(1)).as("n"),
      sum(when(col("pos") === col("pred"), 1L).otherwise(0L)).as("agree"),
      sum(col("pos")).as("r1"), sum(col("pred")).as("c1"))
    val chance = col("r1") * col("c1") +
      (col("n") - col("r1")) * (col("n") - col("c1"))
    c.select(col("n").as("n_users"), col("agree").as("n_agree"),
      col("r1").as("n_pos_label"), col("c1").as("n_pos_pred"),
      // κ is undefined when chance agreement is total (both marginals
      // degenerate → n² = Σ r_k·c_k): deliberate NULL on both engines
      when(col("n") * col("n") === chance, lit(null).cast("double"))
        .otherwise((col("n") * col("agree") - chance).cast("double") /
          (col("n") * col("n") - chance)).as("kappa"))
  }

  // -------------------------------------------------------------------------
  // CDC snapshot diff: per-user activity on the FIRST observed day vs the
  // LAST, classified insert / delete / update (unchanged rows dropped) —
  // the change feed a downstream incremental consumer applies. Expressed
  // as ONE conditional aggregate over the two day slices rather than the
  // textbook full-outer join of two materialized snapshots: at 100 TB the
  // two day predicates prune to two partitions of the day-partitioned
  // lake, the aggregate is map-side combinable, and the single user-keyed
  // shuffle carries only users active on those days. The full-outer-join
  // formulation shuffles both snapshots; this plan subsumes it.
  private val cdcDiff = Q(
    "cdc_user_day_diff",
    Some("""
      WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
      span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM e),
      c AS (SELECT user_id,
          CAST(SUM(CASE WHEN d = d0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
          CAST(SUM(CASE WHEN d = d1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        FROM e CROSS JOIN span
        WHERE d = d0 OR d = d1
        GROUP BY user_id)
      SELECT user_id, n_old, n_new,
        CASE WHEN n_old = 0 THEN 'insert'
             WHEN n_new = 0 THEN 'delete'
             ELSE 'update' END AS op
      FROM c WHERE n_old <> n_new
      ORDER BY user_id
    """)) { (spark, dir) =>
    val e = ev(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val span = e.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    e.crossJoin(broadcast(span))
      .filter(col("d") === col("d0") || col("d") === col("d1"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("d") === col("d0"), 1L).otherwise(0L)).as("n_old"),
        sum(when(col("d") === col("d1"), 1L).otherwise(0L)).as("n_new"))
      .filter(col("n_old") =!= col("n_new"))
      .select(col("user_id"), col("n_old"), col("n_new"),
        when(col("n_old") === 0, "insert")
          .when(col("n_new") === 0, "delete")
          .otherwise("update").as("op"))
      .orderBy(col("user_id"))
  }

  // -------------------------------------------------------------------------
  // Next-event training pairs: the (3-event context → next event) table a
  // sequence model trains on — the order-3 extension of the Markov bigram
  // matrix (events_markov_transitions), aggregated to context grain so the
  // output is |types|⁴-bounded however large the corpus. One user-keyed
  // window (lags stay inside each user's partition, event_id total
  // tiebreak), one bounded-cardinality aggregate. At 100 TB: a single
  // corpus-width shuffle on user_id, then metadata.
  private val nextEventPairs = Q(
    "train_next_event_pairs",
    Some("""
      WITH o AS (
        SELECT user_id, event_type,
          lag(event_type, 3) OVER w AS ctx1,
          lag(event_type, 2) OVER w AS ctx2,
          lag(event_type, 1) OVER w AS ctx3
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id))
      SELECT ctx1, ctx2, ctx3, event_type AS next_event, COUNT(*) AS n
      FROM o WHERE ctx1 IS NOT NULL
      GROUP BY ctx1, ctx2, ctx3, next_event
      ORDER BY ctx1, ctx2, ctx3, next_event
    """)) { (spark, dir) =>
    ev(spark, dir)
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 3).over(byUserTime).as("ctx1"),
        lag(col("event_type"), 2).over(byUserTime).as("ctx2"),
        lag(col("event_type"), 1).over(byUserTime).as("ctx3"))
      .filter(col("ctx1").isNotNull)
      .groupBy(col("ctx1"), col("ctx2"), col("ctx3"),
        col("event_type").as("next_event"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("ctx1"), col("ctx2"), col("ctx3"), col("next_event"))
  }

  // -------------------------------------------------------------------------
  // Leave-one-out target encoding: replace the categorical market segment
  // with the mean label of the OTHER members of that segment —
  // (S_c − y_u)/(N_c − 1) — the leakage-aware categorical featurizer
  // (plain target encoding leaks each row's own label into its feature;
  // LOO is the standard fix). Exact BIGINT operands, ONE division per
  // row; a singleton category has no "others" and encodes NULL (the
  // caller's prior-imputation decision, not this operator's). Scale
  // shape: the user frame joins the customer dim user-keyed, the segment
  // stats table is catalog-sized and broadcast back — nothing wider than
  // user grain shuffles.
  private val targetEncodeLoo = Q(
    "train_target_encode_loo",
    Some(s"""
      WITH $userFrameSql,
      j AS (SELECT u.user_id, u.pos AS label,
              COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment
            FROM u LEFT JOIN customer c ON u.user_id = c.c_custkey),
      s AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_seg,
              CAST(SUM(label) AS BIGINT) AS s_seg
            FROM j GROUP BY segment)
      SELECT j.user_id, j.segment, j.label,
        CASE WHEN s.n_seg > 1
             THEN CAST(s.s_seg - j.label AS DOUBLE) / (s.n_seg - 1)
             ELSE NULL END AS te_loo
      FROM j JOIN s USING (segment) ORDER BY j.user_id
    """)) { (spark, dir) =>
    val u = userFrame(spark, dir)
      .select(col("user_id"), col("pos").as("label"))
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val j = u.join(cust, Seq("user_id"), "left")
      .select(col("user_id"), col("label"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
    val s = j.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_seg"), sum(col("label")).as("s_seg"))
    j.join(broadcast(s), Seq("segment"))
      .select(col("user_id"), col("segment"), col("label"),
        when(col("n_seg") > 1,
          (col("s_seg") - col("label")).cast("double") / (col("n_seg") - 1))
          .otherwise(lit(null).cast("double")).as("te_loo"))
      .orderBy(col("user_id"))
  }

  // -------------------------------------------------------------------------
  // Hashing-trick featurizer: map each user's categorical/binned features
  // to sparse column indexes via h32(feature-string) mod 2¹⁸ — the
  // fixed-width, vocabulary-free encoding (Weinberger et al. 2009) that
  // needs NO fitted dictionary, so train and serving paths can't skew.
  // Feature strings are explicit ("seg=HOUSEHOLD", "act_bin=7"), the hash
  // is the catalog's portable md5-prefix rule (identical hex in both
  // engines), and the activity bin reuses eval_calibration_bins' exact
  // integer bin rule. Output is the sparse (user, feature, slot) triple
  // table a trainer pivots into its design matrix. Scale shape: user
  // frame + 1-row span broadcast + dim join, then map-only hashing —
  // nothing wider than user grain × features-per-user.
  private val hashedFeatures = Q(
    "train_hashed_features",
    Some(s"""
      WITH $userFrameSql,
      m AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM u),
      j AS (SELECT u.user_id, u.score, u.pos,
              COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
              ((u.score - m.lo) * 10) // (m.hi - m.lo + 1) AS act_bin
            FROM u CROSS JOIN m
            LEFT JOIN customer c ON u.user_id = c.c_custkey),
      f AS (SELECT user_id, 'seg=' || segment AS feature, pos FROM j
            UNION ALL
            SELECT user_id, 'act_bin=' || CAST(act_bin AS VARCHAR), pos
            FROM j)
      SELECT user_id, feature,
        CAST(('0x' || substr(md5(feature), 1, 8)) AS BIGINT) % 262144
          AS slot,
        CAST(pos AS BIGINT) AS label
      FROM f ORDER BY user_id, feature
    """)) { (spark, dir) =>
    val u = userFrame(spark, dir)
    val m = u.agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val j = u.crossJoin(broadcast(m))
      .join(cust, Seq("user_id"), "left")
      .select(col("user_id"), col("pos"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
        floor(((col("score") - col("lo")) * 10) /
          (col("hi") - col("lo") + 1)).cast("long").as("act_bin"))
    j.select(col("user_id"), col("pos"), explode(array(
        concat(lit("seg="), col("segment")),
        concat(lit("act_bin="), col("act_bin").cast("string")))).as("feature"))
      .select(col("user_id"), col("feature"),
        (conv(substring(md5(col("feature")), 1, 8), 16, 10).cast("long")
          % 262144).as("slot"),
        col("pos").as("label"))
      .orderBy(col("user_id"), col("feature"))
  }

  // ---------------------------------------------------------------------
  // Quantile feature binning: NTILE(10) over exact customer-spend cents —
  // the equal-frequency discretization a feature pipeline emits alongside
  // target encoding (robust to skew where equi-WIDTH bins like
  // profile_price_histogram's collapse on the Zipf head). The bin bounds
  // (lo/hi per decile) are what serving-time bucketizers ship. Total
  // order (cents, custkey) makes NTILE's remainder placement — both
  // engines follow the SQL rule: first buckets take the extra rows —
  // deterministic. Scale shape: one map-side-combinable per-customer
  // aggregate; the NTILE window sorts the CUSTOMER-grain table (dimension
  // cardinality, not fact rows); the decile rollup is 10 groups. Past the
  // Prefix.SingleWindowMaxBytes dial the single-partition NTILE swaps for
  // the EXACT distributed form (range shuffle + partition-local rank +
  // driver prefix offsets + the SQL bucket rule in arithmetic) — same
  // rows at any scale, no sketch tradeoff needed.
  private val decileBins = Q(
    "train_decile_bins",
    Some("""
      WITH s AS (SELECT o_custkey AS custkey,
          CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS cents
        FROM orders GROUP BY 1),
      d AS (SELECT custkey, cents,
          NTILE(10) OVER (ORDER BY cents, custkey) AS decile FROM s)
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
        CAST(MIN(cents) AS DOUBLE) / 100.0 AS lo_spend,
        CAST(MAX(cents) AS DOUBLE) / 100.0 AS hi_spend
      FROM d GROUP BY decile ORDER BY decile
    """)) { (spark, dir) =>
    val orders = Tables.load(spark, dir, "orders")
    val s = orders
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum((graft.ops.Exact.dec2(col("o_totalprice")) * 100)
        .cast("long")).as("cents"))
    // past the dial the single-partition NTILE window swaps for the
    // arithmetic bucket over the two-phase distributed rank
    // (graft.ops.Prefix.globalNtile) — row-identical on either arm
    val d = graft.ops.Prefix.globalNtile(s,
      Seq(col("cents"), col("custkey")), 10, "decile",
      distributed = orders.queryExecution.optimizedPlan.stats.sizeInBytes >
        graft.ops.Prefix.SingleWindowMaxBytes)
    d.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        (min(col("cents")).cast("double") / 100.0).as("lo_spend"),
        (max(col("cents")).cast("double") / 100.0).as("hi_spend"))
      .select(col("decile").cast("long").as("decile"), col("n_customers"),
        col("lo_spend"), col("hi_spend"))
      .orderBy(col("decile"))
  }

  val specs: Seq[Q] = Seq(aucRank, confusion, calibration, kappa,
    cdcDiff, nextEventPairs, targetEncodeLoo, hashedFeatures, decileBins)
}
