package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The rank sketch must be EXACT below its capacity (no compaction →
  * the full multiset is retained), hold its documented relative rank
  * error above it, conserve the exact count, and work as a distributed
  * aggregate (map-side partials + merges across partitions). */
class KllSketchSpec extends SparkSpec {

  import spark.implicits._

  /** Run `values` (cents) through the UDAF over `parts` partitions. */
  private def sketch(values: Seq[Long], k: Int, parts: Int): KllQuantiles = {
    val kq = udaf(new KllSketch(k))
    values.toDF("cents").repartition(parts)
      .agg(kq(col("cents")).as("q"))
      .select(col("q.n"), col("q.p25"), col("q.p50"), col("q.p75"), col("q.p95"))
      .collect().map(r => KllQuantiles(r.getLong(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).head
  }

  /** Exact readout per the sketch's own rank rule: smallest value whose
    * cumulative count satisfies 100·cum >= q·n (the HistogramSketch
    * integer test), in dollars. */
  private def exact(values: Seq[Long], q: Int): Double = {
    val s = values.sorted
    val n = s.length.toLong
    s(s.indices.find(i => 100L * (i + 1) >= q * n).get) / 100.0
  }

  test("below capacity the sketch is exact, whatever the partitioning") {
    // 200 values < k=256: no compaction can ever trigger, so the readout
    // equals the exact percentiles regardless of partition/merge order
    val vals = (1 to 200).map(i => (i * 2654435761L) % 100000L)
    for (parts <- Seq(1, 7)) {
      val got = sketch(vals, k = 256, parts = parts)
      assert(got.n == 200L)
      assert(got.p25 == exact(vals, 25))
      assert(got.p50 == exact(vals, 50))
      assert(got.p75 == exact(vals, 75))
      assert(got.p95 == exact(vals, 95))
    }
  }

  test("above capacity: exact n, rank error within the documented bound") {
    // 50k distinct-ish values via a Weyl sequence; at k=256 the compactor
    // depth is ~log2(50000/256) ≈ 8 levels → ε ≈ 8/256 ≈ 3.1% rank error.
    // Assert 5% (slack for the deterministic offset alternation).
    val n = 50000
    val vals = (1 to n).map(i => (i * 2654435761L) % 1000000L)
    val sortedDollars = vals.sorted.map(_ / 100.0)
    def rankOf(v: Double): Int = {
      // rank of the estimate within the true sorted data (first index >= v)
      val i = sortedDollars.indexWhere(_ >= v)
      if (i < 0) n else i
    }
    val got = sketch(vals, k = 256, parts = 8)
    assert(got.n == n.toLong)
    val eps = 0.05
    for ((q, est) <- Seq(25 -> got.p25, 50 -> got.p50, 75 -> got.p75,
        95 -> got.p95)) {
      val r = rankOf(est).toDouble / n
      assert(math.abs(r - q / 100.0) <= eps,
        s"p$q estimate $est sits at rank $r, outside ±$eps")
    }
    // every estimate is a real data value (rank sketches return members,
    // unlike the histogram's bin-edge estimates)
    assert(Seq(got.p25, got.p50, got.p75, got.p95)
      .forall(v => sortedDollars.contains(v)))
  }

  test("skewed and constant distributions stay inside the bound") {
    // constant: every quantile is the constant, exactly
    val const = sketch(Seq.fill(10000)(4200L), k = 64, parts = 4)
    assert(const.n == 10000L && const.p25 == 42.0 && const.p95 == 42.0)
    // zipf-ish: 90% zeros, heavy tail — p25/p50/p75 must stay at 0.0,
    // p95 inside the tail
    val n = 20000
    val zipf = (1 to n).map(i => if (i % 10 == 0) (i % 997) * 100L + 100L else 0L)
    val got = sketch(zipf, k = 256, parts = 8)
    assert(got.n == n.toLong)
    assert(got.p25 == 0.0 && got.p50 == 0.0 && got.p75 == 0.0)
    assert(got.p95 > 0.0)
  }

  test("capacity dial is validated up front") {
    intercept[IllegalArgumentException](new KllSketch(6))   // too small
    intercept[IllegalArgumentException](new KllSketch(255)) // odd
  }
}
