package graft.catalog

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.lake.Tables

/**
 * Composition invariants of ann_ivf_pq (IVF pruning × committed-codebook
 * PQ scoring × exact re-rank): every returned candidate lives in the
 * query's probed cluster, the reported cos_sim is the EXACT true cosine
 * (the re-rank stage never leaks an ADC approximation), and per query the
 * list is a descending top-10.
 */
class IvfPqSpec extends SparkSpec {

  import spark.implicits._

  private lazy val rows =
    SparkEntry.queries("ann_ivf_pq")(spark, sf001)
      .select($"q_id", $"vec_id", $"cos_sim", $"rn")
      .as[(Long, Long, Double, Int)].collect().toSeq

  private lazy val corpus: Map[Long, (Int, Array[Double])] =
    Tables.embeddings(spark, sf001)
      .select($"vec_id", $"label",
        $"embedding".cast("array<double>"))
      .as[(Long, Int, Seq[Double])].collect()
      .map { case (id, l, e) => id -> (l, e.toArray) }.toMap

  test("returns a descending top-10 per query") {
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4) == (1 to 10), s"q=$q ranks")
      assert(sorted.sliding(2).forall(p =>
        p.head._3 > p(1)._3 ||
          (p.head._3 == p(1)._3 && p.head._2 < p(1)._2)), s"q=$q order")
    }
  }

  test("every candidate lives in the query's probed cluster") {
    // re-derive the probe: nearest label centroid by rounded raw cosine,
    // ties to the lowest label — the ivf rule the query shares
    val byLabel = corpus.values.groupBy(_._1)
      .map { case (l, es) =>
        val dim = es.head._2.length
        val cent = Array.tabulate(dim)(i =>
          BigDecimal(es.map(_._2(i)).sum / es.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        l -> cent
      }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val probed = (0L to 4L).map { q =>
      val qe = corpus(q)._2
      q -> byLabel.toSeq.map { case (l, c) =>
        (BigDecimal(cos(qe, c)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble, l)
      }.minBy { case (cc, l) => (-cc, l) }._2
    }.toMap
    rows.foreach { case (q, v, _, _) =>
      assert(corpus(v)._1 == probed(q),
        s"q=$q candidate $v in cluster ${corpus(v)._1}, probed ${probed(q)}")
      assert(v != q, "query returned itself")
    }
  }

  test("reported cos_sim is the exact re-ranked cosine, never the ADC approx") {
    def cos4(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    rows.foreach { case (q, v, s, _) =>
      assert(s == cos4(corpus(q)._2, corpus(v)._2), s"q=$q v=$v")
    }
  }
}
