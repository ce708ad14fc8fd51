package graft.catalog

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.lake.Tables

/**
 * Closed-form verification of the Benford first-digit audit and the
 * revenue-concentration (Pareto) profile: both recomputed brute-force from
 * the collected sf0.001 orders table — integer-ppm constructions, so
 * equality is bitwise, no tolerance.
 */
class DqProfileSpec extends SparkSpec {

  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf001).collect()

  private lazy val centsByCust: Seq[(Long, Long)] =
    Tables.load(spark, sf001, "orders")
      .select(col("o_custkey"),
        (graft.ops.Exact.dec2(col("o_totalprice")) * 100).cast("long"))
      .as[(Long, Long)].collect().toSeq

  test("dq_benford_prices equals the brute first-digit histogram") {
    val expected = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L,
      9 -> 45757L)
    val digits = centsByCust.map(_._2.toString.head.asDigit)
    val total = digits.size.toLong
    val byDigit = digits.groupBy(identity).view.mapValues(_.size.toLong)
    val rows = q("dq_benford_prices")
    assert(rows.map(_.getAs[Int]("digit")).toSeq ==
      byDigit.keys.toSeq.sorted)
    rows.foreach { r =>
      val d = r.getAs[Int]("digit")
      val n = byDigit(d)
      assert(r.getAs[Long]("n") == n)
      val share = 1000000L * n / total
      assert(r.getAs[Long]("share_ppm") == share)
      assert(r.getAs[Long]("expected_ppm") == expected(d))
      assert(r.getAs[Long]("dev_ppm") == math.abs(share - expected(d)))
    }
    // the shares are a partition of ~1e6 (floor division loses < 9 ppm)
    val mass = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(mass <= 1000000L && mass > 1000000L - 9)
  }

  test("profile_revenue_concentration equals the brute Pareto points") {
    val spend = centsByCust.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toSeq
    // rank desc by (cents, custkey) — the query's total order
    val ordered = spend.sortBy { case (k, c) => (-c, k) }.map(_._2)
    val total = ordered.sum
    val nCust = ordered.size.toLong
    val rows = q("profile_revenue_concentration")
    assert(rows.map(_.getAs[Int]("pct")).toSeq == Seq(1, 5, 10, 20, 50))
    rows.foreach { r =>
      val pct = r.getAs[Int]("pct")
      val cut = math.max(1L, nCust * pct / 100).toInt
      val top = ordered.take(cut).sum
      assert(r.getAs[Long]("top_cents") == top)
      assert(r.getAs[Long]("share_ppm") ==
        (BigInt(1000000) * top / total).toLong)
    }
    // concentration is monotone and the 50% point holds a strict majority
    val shares = rows.map(_.getAs[Long]("share_ppm")).toSeq
    assert(shares == shares.sorted)
    assert(shares.last > 500000L)
  }
}
