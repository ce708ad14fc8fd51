package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * TopKAgg: the bounded-heap per-group top-k aggregate must reproduce the
 * window `row_number <= k` formulation exactly (same total order: score
 * desc, key asc), independent of partitioning, with groups smaller than k
 * kept whole.
 */
class TopKAggSpec extends SparkSpec {

  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"key")
    df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"g", $"key", $"score", $"rn".cast("int").as("rn"))
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val topk = udaf(new TopKAgg(k))
    df.groupBy($"g")
      .agg(topk($"score", $"key").as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "e")))
      .select($"g", $"e.key".as("key"), $"e.score".as("score"),
        ($"pos" + 1).cast("int").as("rn"))
  }

  // deterministic pseudo-random rows: 7 groups, scores with deliberate ties
  private def rows(n: Int): Seq[(String, Long, Double)] =
    (1 to n).map { i =>
      val g = s"g${i % 7}"
      val key = (i * 31L) % 1000
      val score = ((i * 2654435761L) % 97).toDouble / 4.0 // many ties
      (g, key, score)
    }

  test("agg top-3 == window top-3 on tied, multi-group data") {
    // distinct keys per group: ties in score break by key, so dedupe keys
    val df = rows(2000).toDF("g", "key", "score")
      .groupBy($"g", $"key").agg(max($"score").as("score"))
    val got = aggTopK(df, 3).orderBy($"g", $"rn").collect()
    val want = windowTopK(df, 3).orderBy($"g", $"rn").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("result is invariant to input partitioning") {
    val df = rows(500).toDF("g", "key", "score")
      .groupBy($"g", $"key").agg(max($"score").as("score"))
    val one = aggTopK(df.coalesce(1), 5).orderBy($"g", $"rn").collect()
    val many = aggTopK(df.repartition(13), 5).orderBy($"g", $"rn").collect()
    assert(one.toSeq == many.toSeq)
  }

  test("groups smaller than k are kept whole, in order") {
    val df = Seq(("a", 1L, 2.0), ("a", 2L, 9.0), ("b", 3L, 4.0))
      .toDF("g", "key", "score")
    val got = aggTopK(df, 10).orderBy($"g", $"rn")
      .as[(String, Long, Double, Int)].collect().toSeq
    assert(got == Seq(("a", 2L, 9.0, 1), ("a", 1L, 2.0, 2), ("b", 3L, 4.0, 1)))
  }
}
