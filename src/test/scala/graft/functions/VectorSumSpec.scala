package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** VectorSum (elementwise array-sum aggregate) semantics: parity with the
  * explode-and-average formulation it replaced, null handling, and
  * partition-count invariance (the partial/merge tree must not change the
  * result beyond round-absorbed ulps). */
class VectorSumSpec extends SparkSpec {

  import spark.implicits._

  private val vsum = udaf(new VectorSum)

  test("centroid via VectorSum == centroid via posexplode+avg (round 6)") {
    val df = Seq(
      ("a", Array(1.0f, 2.0f, 3.0f)), ("a", Array(3.0f, 0.0f, 1.0f)),
      ("a", Array(2.0f, 1.0f, 2.0f)), ("b", Array(10.0f, -4.0f, 0.5f)))
      .toDF("label", "embedding")
    val viaAgg = df.groupBy($"label")
      .agg(vsum($"embedding".cast("array<double>")).as("vs"),
        count($"embedding").as("cnt"))
      .select($"label", transform($"vs", x => round(x / $"cnt", 6)).as("cemb"))
    val viaExplode = df
      .select($"label", posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"label", $"pos")
      .agg(round(avg($"v".cast("double")), 6).as("cv"))
      .groupBy($"label")
      .agg(transform(array_sort(collect_list(struct($"pos", $"cv"))),
        x => x.getField("cv")).as("cemb"))
    val a = viaAgg.orderBy("label").as[(String, Seq[Double])].collect()
    val b = viaExplode.orderBy("label").as[(String, Seq[Double])].collect()
    assert(a.sameElements(b))
  }

  test("null embeddings are skipped; all-null group yields null sum") {
    val df = Seq(
      ("a", Some(Array(1.0, 2.0))), ("a", None), ("b", None))
      .toDF("label", "v")
    val out = df.groupBy($"label").agg(vsum($"v").as("vs"))
      .orderBy("label").as[(String, Option[Seq[Double]])].collect()
    assert(out(0) == ("a", Some(Seq(1.0, 2.0))))
    assert(out(1) == ("b", None))
  }

  test("result is invariant to partitioning (partial/merge tree)") {
    val rows = (1 to 997).map(i => ("k", Array(i.toDouble, -i * 0.5, 1.0)))
    val one = rows.toDF("label", "v").repartition(1)
      .groupBy($"label").agg(vsum($"v").as("vs"))
      .select(transform($"vs", x => round(x, 6)).as("r"))
      .as[Seq[Double]].head()
    val many = rows.toDF("label", "v").repartition(13)
      .groupBy($"label").agg(vsum($"v").as("vs"))
      .select(transform($"vs", x => round(x, 6)).as("r"))
      .as[Seq[Double]].head()
    assert(one == many)
  }

  test("ragged widths fail fast instead of silently mis-summing") {
    val df = Seq(("a", Array(1.0, 2.0)), ("a", Array(1.0))).toDF("label", "v")
    val e = intercept[Exception](
      df.groupBy($"label").agg(vsum($"v")).collect())
    assert(e.getMessage != null)
  }
}
