package graft.vectors

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/**
 * Product quantization (PQ) for embedding compression + approximate
 * scoring — the memory side of a 100 TB ANN deployment (IVF prunes WHAT to
 * scan; PQ shrinks WHAT each scanned row costs): split the D-dim unit
 * vector into M contiguous subspaces, k-means each subspace to K codewords,
 * and store each vector as M small codes (M bytes at K<=256 vs 4·D bytes
 * raw — 32x for D=64, M=8). Queries score candidates with an
 * asymmetric-distance lookup table (LUT): cos(q, v) ≈ Σ_m <q_m, c_m[code_m(v)]>,
 * M adds per candidate instead of D multiply-adds, then an exact re-rank
 * over the short list restores true-cosine ordering.
 *
 * Scale/determinism posture:
 *  - Training is mini-batch-free Lloyd over the full corpus, but FUSED
 *    across subspaces: ONE scan per iteration computes all M argmins per
 *    row (codes UDF over broadcast codebooks), then one hash aggregate of
 *    (m, code) → [[graft.functions.VectorSum]] partial sums. Codebooks are
 *    M·K·(D/M) doubles — kilobytes — the only driver-side state.
 *  - Seeding is hash-deterministic (lowest md5(vec_id) rows), so
 *    build → encode → search is bit-reproducible run to run; no
 *    rand()/Date dependence anywhere.
 *  - Search broadcasts the per-query LUT (M·K doubles per query); the
 *    encoded corpus is scanned map-side, top-candidates reduced via the
 *    salted [[VectorOps.topK]], and only `rerank` rows per query pay the
 *    exact D-dim dot product.
 *
 * The synthetic 64-dim corpus quantizes with M=8/K=32 test dials
 * (measured recall@10 at rerank=200: 1.00 on sf0.01, 0.86 on sf0.1);
 * production PQ runs M=8..64, K=256 — same plan shapes.
 */
object PqIndex {

  final case class Codebooks(m: Int, k: Int, dim: Int,
                             cents: Array[Array[Array[Double]]]) {
    require(dim % m == 0, s"dim $dim not divisible by M $m")
    val subDim: Int = dim / m
  }

  /** Nearest-codeword id per subspace for one vector (L2 argmin — on unit
    * vectors subspace-L2 and subspace-dot orderings agree up to the
    * codeword's own norm, and L2 is the standard PQ training objective). */
  private def codesOf(cb: Codebooks, emb: Seq[Double]): Array[Int] = {
    val out = new Array[Int](cb.m)
    var m = 0
    while (m < cb.m) {
      var best = 0; var bestD = Double.MaxValue
      var k = 0
      while (k < cb.k) {
        val c = cb.cents(m)(k)
        var d = 0.0; var i = 0
        while (i < cb.subDim) {
          val diff = emb(m * cb.subDim + i) - c(i); d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      out(m) = best; m += 1
    }
    out
  }

  /** Train codebooks: deterministic hash-seeded init + `iters` fused Lloyd
    * iterations. `emb` must carry (`idCol`, `embCol`: array<double>). */
  def train(emb: DataFrame, idCol: String, embCol: String,
            dim: Int, m: Int = 8, k: Int = 32, iters: Int = 2): Codebooks = {
    val spark = emb.sparkSession
    val subDim = dim / m
    // Seeds: the K corpus vectors with the lowest md5(id) — deterministic,
    // uncorrelated with id locality, and a K-row collect (metadata-sized).
    val seeds = emb
      .select(col(embCol).as("e"), md5(col(idCol).cast("string")).as("h"))
      .orderBy(col("h")).limit(k)
      .collect().map(_.getSeq[Double](0).toArray)
    require(seeds.length == k, s"corpus smaller than K=$k")
    var cb = Codebooks(m, k, dim,
      Array.tabulate(m, k)((mi, ki) => seeds(ki).slice(mi * subDim, (mi + 1) * subDim)))

    val vsum = udaf(new graft.functions.VectorSum)
    (1 to iters).foreach { _ =>
      val cbB = spark.sparkContext.broadcast(cb)
      val codesUdf = udf((e: Seq[Double]) => codesOf(cbB.value, e))
      // One scan: M (m, code, subvec) rows per vector into one hash agg
      // with map-side VectorSum partials — shuffle is (M·K × subDim)
      // partials per partition, never data-sized.
      val sums = emb
        .select(col(embCol).as("e"), posexplode(codesUdf(col(embCol))).as(Seq("m", "code")))
        .select(col("m"), col("code"),
          slice(col("e"), col("m") * subDim + 1, lit(subDim)).as("sub"))
        .groupBy(col("m"), col("code"))
        .agg(vsum(col("sub")).as("vs"), count(lit(1)).as("cnt"))
        .collect()
      val next = Array.tabulate(m, k)((mi, ki) => cb.cents(mi)(ki)) // empty groups keep old
      sums.foreach { r =>
        val mi = r.getInt(0); val ki = r.getInt(1)
        val s = r.getSeq[Double](2); val n = r.getLong(3).toDouble
        next(mi)(ki) = s.map(_ / n).toArray
      }
      cb = Codebooks(m, k, dim, next)
    }
    cb
  }

  /** Encode: (`idCol`, codes array<int>[M]) — the compressed corpus. */
  def encode(emb: DataFrame, idCol: String, embCol: String,
             cb: Codebooks): DataFrame = {
    val cbB = emb.sparkSession.sparkContext.broadcast(cb)
    val codesUdf = udf((e: Seq[Double]) => codesOf(cbB.value, e))
    emb.select(col(idCol), codesUdf(col(embCol)).as("codes"))
  }

  /**
   * ADC search: score every encoded vector against each query via its LUT,
   * keep `rerank` candidates per query (salted top-k), then re-rank those
   * few exactly against the raw embeddings and keep `topK`.
   * `queries`: (q_id, q_emb array<double>) — collected driver-side to build
   * LUTs (query batches are the small side; a huge batch would chunk).
   * `emb` must carry (`idCol`, `embCol`, `nrm`) for the exact re-rank.
   */
  def search(encoded: DataFrame, emb: DataFrame, idCol: String, embCol: String,
             cb: Codebooks, queries: Array[(Long, Array[Double])],
             topK: Int = 10, rerank: Int = 200): DataFrame = {
    val spark = encoded.sparkSession
    // LUT per query: lut[m*K + k] = <q_m, c_m[k]> ; approx cos = Σ_m lut[codes]
    val luts: Map[Long, Array[Double]] = queries.map { case (qid, q) =>
      val lut = new Array[Double](cb.m * cb.k)
      var m = 0
      while (m < cb.m) {
        var k = 0
        while (k < cb.k) {
          var d = 0.0; var i = 0
          while (i < cb.subDim) { d += q(m * cb.subDim + i) * cb.cents(m)(k)(i); i += 1 }
          lut(m * cb.k + k) = d; k += 1
        }
        m += 1
      }
      qid -> lut
    }.toMap
    val lutsB = spark.sparkContext.broadcast(luts)
    val kk = cb.k
    val approxUdf = udf((qid: Long, codes: Seq[Int]) => {
      val lut = lutsB.value(qid)
      var s = 0.0; var m = 0
      while (m < codes.length) { s += lut(m * kk + codes(m)); m += 1 }
      s
    })
    import spark.implicits._
    val qDf = broadcast(queries.map(_._1).toSeq.toDF("q_id"))
    val scored = encoded.crossJoin(qDf)
      .filter(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol),
        approxUdf(col("q_id"), col("codes")).as("approx"))
    val cands = VectorOps.topK(scored, "q_id", idCol, "approx", k = rerank)
      .select(col("q_id"), col(idCol))
    // Exact re-rank: only rerank×|queries| rows touch the raw vectors.
    val qEmb = broadcast(queries.toSeq.toDF("q_id", "q_emb")
      .withColumn("q_nrm", VectorOps.norm(col("q_emb"))))
    val exact = cands
      .join(emb.select(col(idCol), col(embCol), col("nrm")), Seq(idCol))
      .join(qEmb, Seq("q_id"))
      .select(col("q_id"), col(idCol),
        VectorOps.cosinePre(col(embCol), col("q_emb"), col("nrm"), col("q_nrm"))
          .as("cos_sim"))
    VectorOps.topK(exact, "q_id", idCol, "cos_sim", k = topK)
  }
}
