package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("directed cycle converges to the uniform distribution") {
    val cycle = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
    val r = ranksOf(cycle, iters = 20)
    r.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12))
  }

  test("star graph matches the closed form") {
    // leaves 2..5 -> hub 1; hub dangles (mass redistributed uniformly).
    // Fixed point (using exact mass conservation hub + 4*leaf = 1):
    //   leaf = (1-d)/n + (d/n)*hub  =>  leaf = ((1-d)/n + d/n) / (1 + 4d/n)
    // Convergence is geometric at rate d=0.85, so 40 iterations reach
    // ~0.85^40 ≈ 1.5e-3 of the initial gap — assert at 1e-3.
    val star = Seq(2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L)
    val r = ranksOf(star, iters = 40)
    val d = 0.85; val n = 5.0
    val leaf = ((1 - d) / n + d / n) / (1 + 4 * d / n)
    val hub = 1 - 4 * leaf
    assert(math.abs(r(1L) - hub) < 1e-3, s"hub ${r(1L)} vs $hub")
    Seq(2L, 3L, 4L, 5L).foreach(v =>
      assert(math.abs(r(v) - leaf) < 1e-3, s"leaf ${r(v)} vs $leaf"))
  }

  test("probability mass is conserved, with and without dangling nodes") {
    val withDangling = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 4L) // 4 dangles
    for (g <- Seq(withDangling, Seq(1L -> 2L, 2L -> 1L))) {
      val total = ranksOf(g, iters = 15).values.sum
      assert(math.abs(total - 1.0) < 1e-9, s"mass $total")
    }
  }

  test("hub outranks leaves and more iterations refine toward the fixed point") {
    val star = Seq(2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L)
    val r5 = ranksOf(star, 5)
    val r20 = ranksOf(star, 20)
    val r40 = ranksOf(star, 40)
    assert(r5(1L) > r5(2L))
    // contraction: successive iterates approach each other
    assert(math.abs(r40(1L) - r20(1L)) < math.abs(r20(1L) - r5(1L)))
  }

  test("invalid damping or checkpoint cadence is rejected up front") {
    import spark.implicits._
    val e = Seq(1L -> 2L, 2L -> 1L).toDF("src", "dst")
    // i % 0 would throw ArithmeticException mid-iteration; negative would
    // silently disable lineage cuts
    intercept[IllegalArgumentException](PageRank.run(e, 5, checkpointEvery = 0))
    intercept[IllegalArgumentException](PageRank.run(e, 5, checkpointEvery = -1))
    // damping outside (0,1) passes the scale check but yields non-probability
    // ranks
    intercept[IllegalArgumentException](PageRank.run(e, 5, damping = 1.5))
    intercept[IllegalArgumentException](PageRank.run(e, 5, damping = 0.0))
    intercept[IllegalArgumentException](PageRank.run(e, 5, damping = 1.0))
  }

  test("catalog pagerank query returns a full top-20 of distinct parts") {
    val top = graft.SparkEntry.queries("graph_pagerank_parts")(spark, sf001).collect()
    assert(top.length == 20)
    val parts = top.map(_.getLong(0))
    assert(parts.distinct.length == 20)
    val fp = top.map(_.getLong(1))
    assert(fp.sameElements(fp.sorted.reverse))
    val ranks = top.map(_.getDouble(2))
    assert(ranks.forall(v => v > 0 && v < 1))
    // the double column is exactly the fixed-point units over the scale
    fp.zip(ranks).foreach { case (u, r) => assert(r == u / 1e15) }
  }

  // ----- fixed-point variant (the oracle-checkable arithmetic) -----

  private def fpRanks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.runFixedPoint(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("fixed point: directed cycle stays uniform at every iteration") {
    val cycle = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
    // uniform is the exact fixed point of the integer arithmetic too:
    // r = S/4; contrib = r//1 = r; r' = (S*15//100)//4 + (85*r)//100
    val s = 1000000000000000L
    val expected = (s * 15 / 100) / 4 + (85 * (s / 4)) / 100
    val r = fpRanks(cycle, iters = 7)
    r.values.foreach(v => assert(v == expected, s"$v vs $expected"))
  }

  test("fixed point agrees with the decimal variant to ~|V|*iters/scale") {
    val g = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L, 4L -> 1L) // 4 is a leaf source
    val dec = ranksOf(g, iters = 10)
    val fp = fpRanks(g, iters = 10)
    dec.foreach { case (node, d) =>
      assert(math.abs(fp(node) / 1e15 - d) < 1e-12, s"node $node")
    }
  }

  test("fixed point: dangling mass is redistributed (total stays ~1)") {
    val withDangling = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 4L) // 4 dangles
    val total = fpRanks(withDangling, iters = 12).values.sum / 1e15
    // floor division leaks <= 1 unit per node per round: |V|*iters/1e15
    assert(math.abs(total - 1.0) < 1e-10, s"mass $total")
  }

  test("fixed point is bit-identical across reruns and partition widths") {
    val g = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L, 5L -> 2L, 6L -> 2L)
    val a = fpRanks(g, iters = 6)
    val wide = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    val b = try fpRanks(g, iters = 6)
    finally spark.conf.set("spark.sql.shuffle.partitions", wide)
    assert(a == b)
  }

  // ----- weighted variant (the TextRank arithmetic) -----

  private def wRanks(edges: Seq[(Long, Long, Long)],
                     iters: Int): Map[Long, Long] =
    PageRank.runFixedPointWeighted(edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side replay of the exact integer recurrence:
    * r' = base + 85·Σ (r//W_u)·w // 100 (no dangling in these graphs). */
  private def simulate(edges: Seq[(Long, Long, Long)],
                       iters: Int): Map[Long, Long] = {
    val s = 1000000000000000L
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val wdeg = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).sum }
    val base = s * 15 / 100 / nodes.size
    var r = nodes.map(_ -> s / nodes.size).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      edges.foreach { case (u, v, w) =>
        contrib(v) += (r(u) / wdeg(u)) * w
      }
      r = nodes.map(n => n -> (base + 85L * contrib(n) / 100L)).toMap
    }
    r
  }

  test("weighted fixed point replays the integer recurrence exactly") {
    val g = Seq((1L, 2L, 3L), (2L, 1L, 3L), (2L, 3L, 1L), (3L, 2L, 1L),
      (1L, 3L, 5L), (3L, 1L, 5L), (4L, 1L, 2L), (1L, 4L, 2L))
    assert(wRanks(g, iters = 6) == simulate(g, iters = 6))
    // weight matters: the heavy 1<->3 edge pulls 3 above 2
    val r = wRanks(g, iters = 6)
    assert(r(3L) > r(2L))
  }

  test("unit weights reproduce the unweighted fixed point exactly") {
    val g = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L, 5L -> 2L, 6L -> 2L)
    // 5 and 6 dangle-free sources exist; both variants share the dangling
    // handling, so unit weights must be a perfect identity
    val unw = fpRanks(g, iters = 6)
    val w1 = wRanks(g.map { case (a, b) => (a, b, 1L) }, iters = 6)
    assert(w1 == unw)
  }

  test("weighted fixed point is partition-width invariant") {
    val g = Seq((1L, 2L, 7L), (2L, 3L, 2L), (3L, 1L, 4L), (1L, 3L, 1L))
    val a = wRanks(g, iters = 5)
    val wide = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    val b = try wRanks(g, iters = 5)
    finally spark.conf.set("spark.sql.shuffle.partitions", wide)
    assert(a == b)
  }
}
