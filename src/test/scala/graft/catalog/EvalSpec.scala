package graft.catalog

import graft.{SparkEntry, SparkSpec}
import graft.lake.Tables

/**
 * Closed-form verification of the model-evaluation family: every metric is
 * recomputed brute-force (pairwise AUC, cell-by-cell confusion, literal
 * kappa formula, per-user day counts) on the collected sf0.001 corpus and
 * must agree EXACTLY — the metrics are integer-exact by construction, so
 * no tolerance anywhere.
 */
class EvalSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf001).collect()

  /** Brute-force user frame from the raw events: (score, pos) per user,
    * independently re-derived (collect + Scala fold, no Spark aggregates). */
  private lazy val users: Seq[(Long, Long, Long)] = {
    val evs = Tables.events(spark, sf001)
      .selectExpr("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byUser = evs.groupBy(_._1).toSeq.map { case (uid, es) =>
      val np = es.count(_._2 == "purchase").toLong
      val score = es.size - np
      (uid, score, np)
    }
    val nps = byUser.map(_._3).sorted
    val pmed = // interpolated median, the exact rule both engines use
      if (nps.size % 2 == 1) nps(nps.size / 2).toDouble
      else (nps(nps.size / 2 - 1) + nps(nps.size / 2)) / 2.0
    byUser.map { case (uid, score, np) =>
      (uid, score, if (np > pmed) 1L else 0L)
    }
  }

  test("eval_auc_rank equals the pairwise Mann-Whitney statistic") {
    val row = q("eval_auc_rank").head
    val posS = users.filter(_._3 == 1).map(_._2)
    val negS = users.filter(_._3 == 0).map(_._2)
    // 2U = 2·#(pos>neg) + #(pos==neg), every (pos, neg) pair enumerated
    val u2 = (for (p <- posS; n <- negS) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    assert(row.getAs[Long]("n_users") == users.size)
    assert(row.getAs[Long]("n_pos") == posS.size)
    assert(row.getAs[Long]("n_neg") == negS.size)
    assert(row.getAs[Long]("u2") == u2, "doubled U statistic")
    assert(row.getAs[Double]("auc") ==
      u2.toDouble / (2L * posS.size * negS.size))
  }

  test("eval_confusion_threshold matches brute-force cells and ratios") {
    val row = q("eval_confusion_threshold").head
    val scores = users.map(_._2).sorted
    val med =
      if (scores.size % 2 == 1) scores(scores.size / 2).toDouble
      else (scores(scores.size / 2 - 1) + scores(scores.size / 2)) / 2.0
    val cells = users.groupBy { case (_, s, pos) =>
      (if (s > med) 1 else 0, pos)
    }.view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val (tp, fp, fn, tn) =
      (cells((1, 1L)), cells((1, 0L)), cells((0, 1L)), cells((0, 0L)))
    assert(row.getAs[Long]("tp") == tp && row.getAs[Long]("fp") == fp &&
      row.getAs[Long]("fn") == fn && row.getAs[Long]("tn") == tn)
    assert(tp + fp + fn + tn == users.size.toLong)
    assert(row.getAs[Double]("precision_") == tp.toDouble / (tp + fp))
    assert(row.getAs[Double]("recall_") == tp.toDouble / (tp + fn))
    assert(row.getAs[Double]("f1") == (2 * tp).toDouble / (2 * tp + fp + fn))
    assert(row.getAs[Double]("accuracy") ==
      (tp + tn).toDouble / (tp + fp + fn + tn))
  }

  test("eval_calibration_bins partitions the user frame") {
    val rows = q("eval_calibration_bins")
    assert(rows.map(_.getAs[Long]("n_users")).sum == users.size.toLong)
    assert(rows.map(_.getAs[Long]("n_pos")).sum == users.count(_._3 == 1L))
    assert(rows.forall(r => (0L to 9L).contains(r.getAs[Long]("bin"))))
    // bin rule: exact integer floor over the [lo, hi] span
    val lo = users.map(_._2).min
    val hi = users.map(_._2).max
    val brute = users.groupBy { case (_, s, _) =>
      (s - lo) * 10 / (hi - lo + 1)
    }.view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") == brute(r.getAs[Long]("bin")))
    }
  }

  test("eval_kappa_agreement equals the literal kappa formula") {
    val row = q("eval_kappa_agreement").head
    val scores = users.map(_._2).sorted
    val med =
      if (scores.size % 2 == 1) scores(scores.size / 2).toDouble
      else (scores(scores.size / 2 - 1) + scores(scores.size / 2)) / 2.0
    val n = users.size.toLong
    val agree = users.count { case (_, s, pos) =>
      (if (s > med) 1L else 0L) == pos
    }.toLong
    val r1 = users.count(_._3 == 1L).toLong
    val c1 = users.count(_._2 > med).toLong
    val chance = r1 * c1 + (n - r1) * (n - c1)
    assert(row.getAs[Long]("n_agree") == agree)
    assert(row.getAs[Double]("kappa") ==
      (n * agree - chance).toDouble / (n * n - chance))
  }

  test("cdc_user_day_diff classifies first-vs-last-day changes") {
    val evs = Tables.events(spark, sf001)
      .selectExpr("user_id", "CAST(ts AS DATE) AS d").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString))
    val d0 = evs.map(_._2).min
    val d1 = evs.map(_._2).max
    val cOld = evs.filter(_._2 == d0).groupBy(_._1)
      .view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val cNew = evs.filter(_._2 == d1).groupBy(_._1)
      .view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val expect = (cOld.keySet ++ cNew.keySet).toSeq.sorted.flatMap { u =>
      val (o, n) = (cOld(u), cNew(u))
      if (o == n) None
      else Some((u, o, n,
        if (o == 0) "insert" else if (n == 0) "delete" else "update"))
    }
    val got = q("cdc_user_day_diff").map(r => (r.getAs[Long]("user_id"),
      r.getAs[Long]("n_old"), r.getAs[Long]("n_new"), r.getAs[String]("op")))
    assert(got.toSeq == expect)
  }

  test("train_target_encode_loo: brute recompute + own-label invariance") {
    val rows = q("train_target_encode_loo")
    assert(rows.length == users.size)
    val bySeg = rows.groupBy(_.getAs[String]("segment"))
    for ((_, rs) <- bySeg) {
      val n = rs.length.toLong
      val s = rs.map(_.getAs[Long]("label")).sum
      rs.foreach { r =>
        if (n > 1)
          assert(r.getAs[Double]("te_loo") ==
            (s - r.getAs[Long]("label")).toDouble / (n - 1))
        else assert(r.isNullAt(r.fieldIndex("te_loo")))
        // leakage freedom: flipping a user's own label flips S_c and y_u
        // together, so S_c − y_u (their own encoding numerator) is invariant
        val y = r.getAs[Long]("label")
        assert((s - y) == ((s + (1 - 2 * y)) - (1 - y)))
      }
    }
  }

  test("train_hashed_features: slot = h32(feature) mod 2^18, 2 per user") {
    val rows = q("train_hashed_features")
    assert(rows.length == 2 * users.size)
    rows.foreach { r =>
      val f = r.getAs[String]("feature")
      assert(f.startsWith("seg=") || f.startsWith("act_bin="))
      val h32 = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(f).take(8), 16)
      assert(r.getAs[Long]("slot") == h32 % 262144)
      assert((0L until 262144L).contains(r.getAs[Long]("slot")))
    }
    // the trick's point: slots need no dictionary, yet distinct features
    // land on distinct slots at this cardinality (no collision here)
    val byFeature = rows.groupBy(_.getAs[String]("feature"))
      .view.mapValues(_.map(_.getAs[Long]("slot")).toSet).toMap
    assert(byFeature.values.forall(_.size == 1))
    assert(byFeature.values.flatten.toSet.size == byFeature.size)
  }

  test("train_next_event_pairs counts every order-3 context exactly") {
    val rows = q("train_next_event_pairs")
    val types = Set("view", "click", "purchase", "signup", "error")
    assert(rows.forall(r => types(r.getAs[String]("ctx1")) &&
      types(r.getAs[String]("ctx2")) && types(r.getAs[String]("ctx3")) &&
      types(r.getAs[String]("next_event"))))
    // Σ n == Σ_users max(0, n_events(u) − 3): each user's events beyond
    // their first three contribute exactly one (context → next) pair
    val perUser = Tables.events(spark, sf001)
      .selectExpr("user_id").collect().map(_.getLong(0))
      .groupBy(identity).map(_._2.length.toLong)
    val expected = perUser.map(n => math.max(0L, n - 3)).sum
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
  }
}
