package graft.catalog

import graft.{SparkEntry, SparkSpec}

/**
 * Invariants of ann_int8_topk (symmetric int8 scalar quantization +
 * integer-dot candidate cut + exact re-rank): codes stay in [-127, 127],
 * the per-element dequantization error is bounded by 0.5/sc, the reported
 * cos_sim is the EXACT true cosine (never the int8 approximation), and on
 * this corpus the whole result EQUALS brute-force top-10 — recall@10 is
 * 1.0, int8 at 64 dims is near-lossless by construction.
 */
class AnnInt8Spec extends SparkSpec {

  import spark.implicits._

  private def run(name: String): Seq[(Long, Long, Double, Int)] =
    SparkEntry.queries(name)(spark, sf001)
      .select($"q_id", $"vec_id", $"cos_sim", $"rn")
      .as[(Long, Long, Double, Int)].collect().toSeq

  test("int8 result equals brute-force exactly (recall@10 = 1.0 here)") {
    assert(run("ann_int8_topk").sortBy(r => (r._1, r._4))
      == run("ann_cosine_topk_brute").sortBy(r => (r._1, r._4)))
  }

  test("quantization respects the code range and the 0.5/sc error bound") {
    val embs = graft.lake.Tables.embeddings(spark, sf001)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    embs.foreach { case (id, e) =>
      val nrm = math.sqrt(e.map(x => x * x).sum)
      val u = e.map(_ / nrm)
      val sc = 127.0 / u.map(math.abs).max
      val q = u.map(x => math.floor(x * sc + 0.5).toLong)
      assert(q.forall(c => c >= -127L && c <= 127L), s"vec $id code range")
      // the max-|x| element quantizes to exactly +-127
      assert(q.map(math.abs).max == 127L, s"vec $id scale anchoring")
      u.zip(q).foreach { case (x, c) =>
        assert(math.abs(c / sc - x) <= 0.5 / sc + 1e-12,
          s"vec $id dequant error")
      }
    }
  }
}
