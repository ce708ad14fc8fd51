package graft.ops

import scala.util.Random

import graft.SparkSpec
import graft.lake.Tables

class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  /** Reference union-find on collected edges. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)], maxIter: Int = 20): Map[Long, Long] =
    Components.connectedComponents(
      edges.toDF("a", "b"), "a", "b", maxIter)
      .as[(Long, Long)].collect().toMap

  test("random graphs match union-find exactly") {
    val rnd = new Random(13)
    (1 to 5).foreach { trial =>
      val n = 100
      val edges = Seq.fill(80)((rnd.nextLong(n).abs, rnd.nextLong(n).abs))
        .filter { case (a, b) => a != b }
      assert(run(edges) == ufComponents(edges), s"trial $trial")
    }
  }

  test("a chain converges to its minimum endpoint (diameter-bound rounds)") {
    val chain = (0L until 15L).sliding(2).map(s => (s(1), s.head)).toSeq
    val comps = run(chain)
    assert(comps.values.toSet == Set(0L))
    assert(comps.size == 15)
  }

  test("diameter past maxIter fails loudly instead of returning a partial closure") {
    val chain = (0L until 30L).sliding(2).map(s => (s(1), s.head)).toSeq
    intercept[IllegalStateException](run(chain, maxIter = 3))
  }

  test("pointer jumping: a 500-link chain converges in O(log d) rounds, not 500") {
    // plain neighbor-min propagation would need ~500 rounds; the label
    // shortcut halves remaining distance per round, so default maxIter=20
    // (~2^20 reach) suffices
    val chain = (0L until 500L).sliding(2).map(s => (s(1), s.head)).toSeq
    val comps = run(chain)
    assert(comps.values.toSet == Set(0L) && comps.size == 500)
  }

  test("disjoint clusters keep distinct min labels; self-loops are harmless") {
    val edges = Seq((5L, 7L), (7L, 9L), (20L, 21L), (30L, 30L))
    val comps = run(edges)
    assert(comps == Map(5L -> 5L, 7L -> 5L, 9L -> 5L,
      20L -> 20L, 21L -> 20L, 30L -> 30L))
  }

  test("run stats: a hub graph (shallow, like real dup clusters) finishes in <=3 rounds") {
    // star: one canonical doc + 100 near-dups, diameter 2 — the shape LSH
    // pairs actually produce
    val star = (1L to 100L).map(leaf => (leaf, 0L))
    val r = Components.run(star.toDF("a", "b"), "a", "b")
    assert(r.nNodes == 101)
    assert(r.rounds <= 3, s"rounds=${r.rounds}")
    assert(r.changedPerRound.last == 0L)
    assert(r.changedPerRound.head == 100L) // every leaf relabels in round 1
    assert(r.labels.as[(Long, Long)].collect().toMap.values.toSet == Set(0L))
  }

  test("giant-component guard: a deep chain fails fast with the diagnostic, not maxIter rounds") {
    // a 300-link chain with reach ~2^4=16 at the check horizon: >30% of
    // nodes still churning -> diagnose instead of burning 16 more joins
    val chain = (0L until 300L).sliding(2).map(s => (s(1), s.head)).toSeq
    val ex = intercept[IllegalStateException](
      Components.run(chain.toDF("a", "b"), "a", "b",
        maxIter = 20, giantCheckAfter = 4, giantFrac = 0.3))
    assert(ex.getMessage.contains("giant component"), ex.getMessage)
    assert(ex.getMessage.contains("Changed-per-round"), ex.getMessage)
  }

  test("default guard horizon does not false-positive on a legitimate 500-link chain") {
    // run() with defaults (giantCheckAfter=10): pointer jumping reaches
    // ~2^10 by the horizon, so the chain converges before the guard binds
    val chain = (0L until 500L).sliding(2).map(s => (s(1), s.head)).toSeq
    val r = Components.run(chain.toDF("a", "b"), "a", "b")
    assert(r.labels.as[(Long, Long)].collect().toMap.values.toSet == Set(0L))
    assert(r.changedPerRound.last == 0L)
  }

  test("documents LSH pairs: every cluster's label is its min member") {
    val pairs = TextOps.candidatePairs(
      TextOps.lshBands(Tables.documents(spark, sf001), "doc_id", "text"),
      "doc_id").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    assert(run(pairs.toSeq) == ufComponents(pairs.toSeq))
  }
}
