package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Tables

class VectorOpsSpec extends SparkSpec {

  import spark.implicits._

  test("dot/norm/cosine on known vectors") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 0.0f, 0.0f)))
      .toDF("a", "b")
    val row = df.select(
      VectorOps.dot($"a", $"b").as("dot"),
      VectorOps.norm($"a").as("na"),
      VectorOps.norm($"b").as("nb"),
      VectorOps.cosine($"a", $"b").as("cos")).head()
    assert(row.getDouble(0) == 2.0)
    assert(row.getDouble(1) == 3.0)
    assert(row.getDouble(2) == 2.0)
    assert(row.getDouble(3) == math.floor(2.0 / 6.0 * 1e4 + 0.5) / 1e4)
  }

  test("cosinePre over projected norms is bit-equal to the naive cosine") {
    // the production form (norms computed once per row below the join) must
    // never diverge from the 3-dot-product reference, down to the last bit —
    // topK rankings hash into the oracle and a single ulp could reorder them
    val e = Tables.embeddings(spark, sf001)
      .withColumn("nrm", VectorOps.norm($"embedding"))
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
    val both = e.crossJoin(broadcast(q))
      .select(
        VectorOps.cosinePre($"q_emb", $"embedding", $"q_nrm", $"nrm").as("pre"),
        VectorOps.cosine($"q_emb", $"embedding").as("ref"))
    assert(both.filter($"pre" =!= $"ref").isEmpty)
  }

  test("salted topK == plain global window top-k (exactness of the 2-stage)") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val scored = e.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        VectorOps.cosine($"q_emb", $"embedding").as("cos_sim"))
    val viaSalt = VectorOps.topK(scored, "q_id", "vec_id", "cos_sim", k = 7)
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id")
    val viaPlain = scored.withColumn("rn", row_number().over(w)).filter($"rn" <= 7)
    assert(viaSalt.exceptAll(viaPlain).isEmpty && viaPlain.exceptAll(viaSalt).isEmpty)
  }

  test("hyperplane_bands kernel matches an independent Scala recompute") {
    import graft.functions.HyperplaneLsh
    val rows = Tables.embeddings(spark, sf001).limit(50)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val kernelSigs = Tables.embeddings(spark, sf001).limit(50)
      .select($"vec_id", graft.functions.hyperplane_bands($"embedding").as("s"))
      .as[(Long, Array[Long])].collect().toMap
    rows.foreach { case (id, emb) =>
      val expected = new Array[Long](HyperplaneLsh.Bands)
      for (h <- 0 until HyperplaneLsh.Bands * HyperplaneLsh.BitsPerBand) {
        var acc = 0.0
        for (i <- 0 until math.min(emb.length, HyperplaneLsh.Dim))
          acc += emb(i).toDouble * HyperplaneLsh.signs(h)(i)
        if (acc >= 0)
          expected(h / HyperplaneLsh.BitsPerBand) |= 1L << (h % HyperplaneLsh.BitsPerBand)
      }
      assert(kernelSigs(id).sameElements(expected), s"vec $id")
    }
  }

  test("LSH bucketing keeps a hot population sub-quadratic vs label blocking") {
    // the label-blocking failure mode: m mutually-dissimilar vectors sharing
    // one coarse label forced C(m,2) comparisons; hyperplane buckets spread
    // them, so candidate volume tracks similarity, not population skew
    val m = 200
    val rnd = new scala.util.Random(7)
    val hot = (0 until m).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat), "hot")
    }.toDF("vec_id", "embedding", "label")
    val full = m.toLong * (m - 1) / 2 // what label blocking would compare
    val cand = VectorOps.lshCandidatePairs(
      VectorOps.lshBuckets(hot, "vec_id", "embedding"), "vec_id").count()
    assert(cand < full / 4, s"LSH candidates $cand not sub-quadratic vs $full")
  }

  test("bitsPerBand is the scale dial: more bits, strictly fewer random candidates") {
    // random-pair collision per band is 2^-bits — candidate volume at fixed
    // corpus must drop as bits rise (how a bigger corpus holds the LSH join
    // near-linear); exact duplicates still collide at ANY parameterization
    val rnd = new scala.util.Random(23)
    val df = (0 until 300).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    val counts = Seq(4, 8, 12).map { bits =>
      VectorOps.lshCandidatePairs(
        VectorOps.lshBuckets(df, "vec_id", "embedding", bands = 12,
          bitsPerBand = bits), "vec_id").count()
    }
    assert(counts == counts.sorted.reverse && counts.distinct == counts,
      s"candidates must strictly fall as bits rise: $counts")
  }

  test("LSH recall: exact duplicates collide in every band and survive confirm") {
    val rnd = new scala.util.Random(11)
    val base = (0 until 20).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)))
    // 20 originals + an exact copy of each under id+1000
    val dupes = base ++ base.map { case (id, e) => (id + 1000, e.clone()) }
    val df = dupes.toDF("vec_id", "embedding")
    val cand = VectorOps.lshCandidatePairs(
      VectorOps.lshBuckets(df, "vec_id", "embedding"), "vec_id")
    val dupPairs = cand.filter($"vec_b" - $"vec_a" === 1000).count()
    assert(dupPairs == 20L, s"expected all 20 duplicate pairs, got $dupPairs")
  }

  test("approx_percentile sketch tracks the exact interpolated percentile") {
    // the quantile-sketch scale path for agg_quantity_percentiles (sketch
    // internals are engine-private, so spec-checked rather than oracle'd)
    val li = Tables.load(spark, sf001, "lineitem")
    val row = li.agg(
      expr("percentile(l_quantity, 0.5D)"),
      expr("approx_percentile(l_quantity, 0.5D, 1000)")).head()
    assert(math.abs(row.getDouble(0) - row.getDouble(1)) <= 1.0)
  }

  test("approx_count_distinct tracks exact distinct within its error bound") {
    // the HLL scale path for A4 (not oracle-comparable, so tested here)
    val li = Tables.load(spark, sf001, "lineitem")
    val Array(exact, approx) = li.agg(
      countDistinct($"l_partkey").cast("double"),
      approx_count_distinct($"l_partkey", 0.02).cast("double"))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(approx - exact) / exact < 0.1)
  }
}
