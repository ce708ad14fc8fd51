package graft.catalog

import graft.{SparkEntry, SparkSpec}

/**
 * Invariants of ann_matryoshka_topk (32/64-dim prefix scoring + top-100
 * cut + full-vector re-rank): the output is a well-formed descending
 * top-10 per query, every reported cos_sim is the EXACT full-vector
 * cosine (the prefix approximation never leaks into the output), and
 * recall@10 vs brute force is high even though this corpus has NO
 * Matryoshka training (uniform energy across dims — measured 0.86 on
 * sf0.001, 0.88 on sf0.01; the scaladoc documents why a real MRL
 * embedding does better at shorter prefixes).
 */
class MatryoshkaSpec extends SparkSpec {

  import spark.implicits._

  private def run(name: String): Seq[(Long, Long, Double, Int)] =
    SparkEntry.queries(name)(spark, sf001)
      .select($"q_id", $"vec_id", $"cos_sim", $"rn")
      .as[(Long, Long, Double, Int)].collect().toSeq

  private lazy val mat = run("ann_matryoshka_topk")
  private lazy val brute = run("ann_cosine_topk_brute")

  test("well-formed descending top-10 per query") {
    val byQ = mat.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4) == (1 to 10), s"q=$q ranks")
      assert(sorted.sliding(2).forall(p =>
        p.head._3 > p(1)._3 ||
          (p.head._3 == p(1)._3 && p.head._2 < p(1)._2)), s"q=$q order")
    }
  }

  test("reported similarities are the exact full-vector cosine") {
    // any (q, vec) the truncated search shares with brute must carry the
    // IDENTICAL cos_sim — re-rank outputs true cosine, not the prefix score
    val bruteSim = brute.map(r => (r._1, r._2) -> r._3).toMap
    mat.foreach { case (q, v, cs, _) =>
      bruteSim.get((q, v)).foreach(b => assert(b == cs, s"($q,$v)"))
    }
  }

  test("recall@10 vs brute is high despite an untrained (uniform) corpus") {
    val a = mat.map(r => (r._1, r._2)).toSet
    val b = brute.map(r => (r._1, r._2)).toSet
    val recall = a.intersect(b).size.toDouble / b.size
    assert(recall >= 0.8, f"recall@10 $recall%.2f")
  }
}
