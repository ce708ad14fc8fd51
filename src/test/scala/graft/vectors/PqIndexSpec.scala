package graft.vectors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.VectorOps

class PqIndexSpec extends SparkSpec {

  private def unitEmb(dir: String): DataFrame =
    graft.lake.Tables.embeddings(spark, dir)
      .withColumn("nrm", VectorOps.norm(col("embedding")))
      .withColumn("emb_d",
        transform(col("embedding").cast("array<double>"), x => x / col("nrm")))
      .select(col("vec_id"), col("emb_d"))

  test("training is deterministic: two builds yield identical codebooks") {
    val e = unitEmb(sf001)
    val cb1 = PqIndex.train(e, "vec_id", "emb_d", dim = 64)
    val cb2 = PqIndex.train(e, "vec_id", "emb_d", dim = 64)
    assert(cb1.cents.flatten.flatten.toSeq == cb2.cents.flatten.flatten.toSeq)
  }

  test("codes are M per vector, each within [0, K)") {
    val e = unitEmb(sf001)
    val cb = PqIndex.train(e, "vec_id", "emb_d", dim = 64, m = 4, k = 16)
    val enc = PqIndex.encode(e, "vec_id", "emb_d", cb)
    val bad = enc.filter(size(col("codes")) =!= 4 ||
      exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad == 0)
    // compression bookkeeping: 4 sub-byte codes vs 64 float32 lanes
    assert(cb.m * 1 < 64 * 4, "codes must be smaller than the raw vector")
  }

  test("empty clusters (K > corpus) keep their seed codeword instead of crashing") {
    import spark.implicits._
    val tiny = unitEmb(sf001).limit(20).as[(Long, Seq[Double])].collect().toSeq
      .toDF("vec_id", "emb_d")
    val cb = PqIndex.train(tiny, "vec_id", "emb_d", dim = 64, m = 4, k = 16)
    assert(cb.cents.flatten.length == 64) // 4 subspaces x 16 codewords survive
  }

  test("ADC + exact re-rank recall@10 vs brute force clears the PQ bar") {
    val e = unitEmb(sf01)
    val cb = PqIndex.train(e, "vec_id", "emb_d", dim = 64)
    val enc = PqIndex.encode(e, "vec_id", "emb_d", cb)
    val queries = e.filter(col("vec_id") < 5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val eR = e.withColumn("nrm", lit(1.0))
    val pq = PqIndex.search(enc, eR, "vec_id", "emb_d", cb, queries,
      topK = 10, rerank = 200)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute-force ground truth on the same unit vectors
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("emb_d").as("q_emb"))
    val truth = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        VectorOps.dot(col("q_emb"), col("emb_d")).as("s"))
    val top = VectorOps.topK(truth, "q_id", "vec_id", "s", k = 10)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // deterministic training on fixed testdata -> exactly reproducible
    // recall; measured 0.86 at these dials, asserted with headroom
    val recall = (pq intersect top).size.toDouble / top.size
    assert(recall >= 0.8, s"PQ recall@10 too low: $recall")
    assert(pq.size == top.size, "both arms must return 10 rows per query")
  }
}
