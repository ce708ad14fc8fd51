package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * MisraGries: the mergeable heavy-hitter sketch must (a) retain every term
 * whose true frequency exceeds N/(cap+1) — the MG guarantee, exercised here
 * with cap FAR below the distinct-term count so the decrement and merge-cut
 * paths actually run — and (b) make the two-pass sketch→exact-confirm
 * pattern produce the exact top-k, independent of partitioning. Also pins
 * the guarantee precondition for `freq_heavy_hitters` (cap=512) on the
 * real documents table.
 */
class MisraGriesSpec extends SparkSpec {

  import spark.implicits._

  // Zipf-ish stream: term t_i appears ceil(6000 / i^2) times, i = 1..200 —
  // 200 distinct terms, sketched at cap=8 (non-trivial: decrements happen).
  private def zipf: Seq[String] =
    (1 to 200).flatMap(i => Seq.fill(math.ceil(6000.0 / (i * i)).toInt)(f"t$i%03d"))

  test("every term above N/(cap+1) survives the sketch, any partitioning") {
    val data = zipf
    val n = data.size
    val cap = 8
    val mg = udaf(new MisraGries(cap))
    val heavy = data.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 > n / (cap + 1.0)).keySet
    assert(heavy.nonEmpty && heavy.size < cap,
      s"fixture must exercise the bound: ${heavy.size} heavy of cap $cap")
    for (parts <- Seq(1, 7, 32)) {
      val cands = data.toDF("term").repartition(parts)
        .agg(mg($"term").as("c")).as[Seq[String]].head().toSet
      assert(heavy.subsetOf(cands),
        s"parts=$parts lost heavy terms: ${heavy -- cands}")
      assert(cands.size <= cap * parts) // ≤ cap per merged partial
    }
  }

  test("sketch -> exact-confirm two-pass equals the true top-k") {
    val mg = udaf(new MisraGries(8))
    val toks = zipf.toDF("term").repartition(11)
    val cands = toks.agg(mg($"term").as("c"))
      .select(explode($"c").as("term"))
    val got = toks.join(broadcast(cands), Seq("term"), "left_semi")
      .groupBy($"term").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"term").limit(5)
      .as[(String, Long)].collect().toSeq
    val want = zipf.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, n) => (-n, t) }.take(5)
    assert(got == want)
  }

  test("freq_heavy_hitters precondition: 20th term clears N/513 on documents") {
    val toks = graft.lake.Tables.documents(spark, sf01)
      .select(explode(split(graft.ops.TextOps.normalize($"text"), " ")).as("term"))
      .filter($"term" =!= "")
    val counts = toks.groupBy($"term").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"term").limit(20)
      .as[(String, Long)].collect()
    val n = toks.count()
    assert(counts.length < 20 || counts.last._2 > n / 513.0,
      s"MG(512) bound violated: 20th=${counts.last._2}, N/513=${n / 513.0}")
  }
}
