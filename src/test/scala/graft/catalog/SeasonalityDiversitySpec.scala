package graft.catalog

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.lake.Tables

/**
 * Closed-form verification of the weekday-seasonality decomposition and the
 * Gini-Simpson behavioral-diversity score: both recomputed brute-force from
 * the collected sf0.001 tables — exact-integer constructions, so equality
 * is bitwise, no tolerance.
 */
class SeasonalityDiversitySpec extends SparkSpec {

  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf001).collect()

  test("ts_weekday_seasonality equals the brute-force weekday rollup") {
    val orders = Tables.load(spark, sf001, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (graft.ops.Exact.dec2(col("o_totalprice")) * 100).cast("long"))
      .as[(java.sql.Date, Long)].collect()
    val byDow = orders.groupBy { case (d, _) =>
      d.toLocalDate.getDayOfWeek.getValue.toLong // ISO 1=Mon..7=Sun
    }
    val tot = orders.map(_._2).sum
    val totDays = byDow.values.map(_.map(_._1).distinct.size.toLong).sum
    val rows = q("ts_weekday_seasonality")
    assert(rows.map(_.getAs[Long]("weekday")).toSeq == (1L to 7L))
    rows.foreach { r =>
      val wd = r.getAs[Long]("weekday")
      val os = byDow(wd)
      val cents = os.map(_._2).sum
      val nDays = os.map(_._1).distinct.size.toLong
      assert(r.getAs[Long]("revenue_cents") == cents)
      assert(r.getAs[Long]("n_days") == nDays)
      assert(r.getAs[Double]("mean_daily_cents") == cents.toDouble / nDays)
      assert(r.getAs[Double]("seasonal_index") ==
        (cents * totDays).toDouble / (nDays * tot))
    }
    // multiplicative decomposition sanity: day-weighted index mass is n
    val weighted = rows.map(r =>
      r.getAs[Double]("seasonal_index") * r.getAs[Long]("n_days")).sum
    assert(math.abs(weighted - totDays) < 1e-6)
  }

  test("ts_autocorr_lag7 equals the brute-force Pearson r at lag 7") {
    val daily = Tables.load(spark, sf001, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(graft.ops.Exact.dec2(col("o_totalprice"))) * 100)
        .cast("long").as("cents"))
      .as[(java.sql.Date, Long)].collect()
      .map { case (d, c) => d.toLocalDate -> c / 100000 }.toMap
    val pairs = daily.toSeq.flatMap { case (d, x) =>
      daily.get(d.plusDays(7)).map(y => (x, y))
    }
    val n = pairs.size.toLong
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val expect = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble))
    val row = q("ts_autocorr_lag7").head
    assert(row.getAs[Long]("n_pairs") == n)
    assert(row.getAs[Double]("autocorr") == expect)
    assert(math.abs(expect) <= 1.0)
  }

  test("ts_spearman_rev_orders equals brute-force Pearson over midranks") {
    val daily = Tables.load(spark, sf001, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(graft.ops.Exact.dec2(col("o_totalprice"))) * 100)
        .cast("long").as("cents"), count(lit(1)).as("cnt"))
      .as[(java.sql.Date, Long, Long)].collect()
    // doubled midranks, independently: 2·mid = 2·|smaller| + |equal| + 1
    def ranks2(xs: Seq[Long]): Seq[Long] = xs.map { v =>
      2L * xs.count(_ < v) + xs.count(_ == v) + 1
    }
    val rx = ranks2(daily.map(_._2).toSeq)
    val ry = ranks2(daily.map(_._3).toSeq)
    val n = daily.length.toLong
    val sx = rx.sum; val sy = ry.sum
    val sxy = rx.zip(ry).map(p => p._1 * p._2).sum
    val sxx = rx.map(x => x * x).sum; val syy = ry.map(y => y * y).sum
    val expect = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble))
    val row = q("ts_spearman_rev_orders").head
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[Double]("spearman_rho") == expect)
    assert(math.abs(expect) <= 1.0)
  }

  test("ts_mann_kendall_trend equals the brute pairwise statistic") {
    val series = Tables.load(spark, sf001, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(graft.ops.Exact.dec2(col("o_totalprice"))) * 100)
        .cast("long").as("rev"))
      .as[(java.sql.Date, Long)].collect()
      .sortBy(_._1.toLocalDate.toEpochDay).map(_._2)
    val n = series.length.toLong
    var s = 0L
    for (i <- series.indices; j <- (i + 1) until series.length)
      s += java.lang.Long.signum(series(j) - series(i))
    val tieAdj = series.groupBy(identity).values.map(_.length.toLong)
      .filter(_ > 1).map(c => c * (c - 1) * (2 * c + 5)).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tieAdj
    val z =
      if (var18 == 0) null
      else if (s > 0) (s - 1).toDouble / math.sqrt(var18.toDouble / 18.0)
      else if (s < 0) (s + 1).toDouble / math.sqrt(var18.toDouble / 18.0)
      else 0.0
    val row = q("ts_mann_kendall_trend").head
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[Long]("s_stat") == s)
    assert(row.getAs[Long]("var_s_x18") == var18)
    assert(row.getAs[Double]("z_score") == z)
  }

  test("ts_cusum_changepoint equals the brute scaled-CUSUM argmax") {
    val rows = Tables.load(spark, sf001, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(graft.ops.Exact.dec2(col("o_totalprice"))) * 100)
        .cast("long").as("rev"))
      .as[(java.sql.Date, Long)].collect()
      .sortBy(_._1.toLocalDate.toEpochDay)
    val n = rows.length.toLong
    val tot = rows.map(_._2).sum
    var cum = 0L
    var best: (java.sql.Date, Long, Long) = null
    rows.zipWithIndex.foreach { case ((day, rev), i) =>
      cum += rev
      val s = n * cum - (i + 1).toLong * tot
      if (best == null || math.abs(s) > math.abs(best._3))
        best = (day, (i + 1).toLong, s) // strict > = earliest-day tiebreak
    }
    val row = q("ts_cusum_changepoint").head
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[java.sql.Date]("change_day") == best._1)
    assert(row.getAs[Long]("change_k") == best._2)
    assert(row.getAs[Long]("s_scaled") == best._3)
    assert(row.getAs[Long]("s_abs") == math.abs(best._3))
  }

  test("profile_user_diversity equals the literal Gini-Simpson formula") {
    val evs = Tables.events(spark, sf001)
      .selectExpr("user_id", "event_type").as[(Long, String)].collect()
    val byUser = evs.groupBy(_._1).map { case (u, es) =>
      val n = es.size.toLong
      val sq = es.groupBy(_._2).values.map(g => g.size.toLong * g.size).sum
      u -> (n, (n * n - sq).toDouble / (n * n))
    }
    val divs = byUser.values.map(_._2).toSeq.sorted
    val med =
      if (divs.size % 2 == 1) divs(divs.size / 2)
      else (divs(divs.size / 2 - 1) + divs(divs.size / 2)) / 2.0
    val rows = q("profile_user_diversity")
    assert(rows.length == byUser.size)
    rows.foreach { r =>
      val (n, d) = byUser(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Double]("diversity") == d)
      assert(r.getAs[Int]("flag_low_diversity") == (if (d < med) 1 else 0))
    }
    // the median split flags a real (non-empty, non-total) low tail
    val flagged = rows.count(_.getAs[Int]("flag_low_diversity") == 1)
    assert(flagged > 0 && flagged < rows.length)
  }
}
