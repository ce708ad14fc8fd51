package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Embedding-vector primitives over `array<float>` columns, built on Spark's
 * codegen'd higher-order functions (zip_with/aggregate) — no UDFs, so the
 * whole similarity pipeline stays inside WholeStageCodegen.
 *
 * All arithmetic is promoted to double *before* accumulating (float
 * accumulation would diverge across engines and lose ~1e-5 precision), and
 * accumulation is sequential in array order — deterministic for the oracle.
 */
object VectorOps {

  /** Sequential-order dot product of two float/double array columns —
    * the codegen kernel ([[graft.functions.VectorDot]]); [[dotHof]] is the
    * pure-SQL formulation it must (and is spec-checked to) agree with. */
  def dot(a: Column, b: Column): Column = graft.functions.vector_dot(a, b)

  /** Higher-order-function formulation of [[dot]] (interpreted lambdas;
    * kept as the cross-engine semantic reference). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, rounded to `scale` decimals so last-ulp accumulation
    * differences can never reorder a top-k ranking across engines/partitions.
    *
    * SCALE WARNING: inside a join this recomputes BOTH norms per scored
    * pair (3 dot products instead of 1). Every catalog/index cosine join
    * projects a per-row `nrm` on each side *below* the join and uses
    * [[cosinePre]] instead — this form is for one-shot scoring and as the
    * semantic reference [[cosinePre]] is spec-checked against. */
  def cosine(a: Column, b: Column, scale: Int = 4): Column =
    round(dot(a, b) / (norm(a) * norm(b)), scale)

  /** Cosine with precomputed side norms: 1 dot product per pair. `nrmA`/
    * `nrmB` must be [[norm]] of `a`/`b` projected below the join (a Project
    * under a Join is a real barrier — Catalyst's CollapseProject cannot pull
    * it through, so each norm is evaluated once per input row, not once per
    * pair). Identical arithmetic to [[cosine]]: same dots, same sqrt, same
    * rounding — bit-equal results. */
  def cosinePre(a: Column, b: Column, nrmA: Column, nrmB: Column,
                scale: Int = 4): Column =
    round(dot(a, b) / (nrmA * nrmB), scale)

  /**
   * Exact global top-k per query key, scale-safe: a low-query-cardinality
   * window (`partitionBy(qCol)` with a handful of query ids) would funnel the
   * whole scored corpus into that many reducers. Stage 1 pre-reduces per
   * (query, salt) bucket — `nSalts`× the parallelism, keeping only k rows per
   * bucket — so the stage-2 global window sorts at most `nSalts*k` rows per
   * query. The salt comes from the candidate id, so stage 1 is deterministic
   * and, because every global top-k row survives its bucket's local top-k,
   * the result is exactly the unsalted top-k (rn included).
   *
   * `scored` must carry (qCol, idCol, simCol); ties break by ascending id.
   */
  def topK(scored: DataFrame, qCol: String, idCol: String, simCol: String,
           k: Int, nSalts: Int = 32): DataFrame =
    topKBy(scored, qCol, idCol, Seq(col(simCol).desc), k, nSalts)

  /** [[topK]] with a caller-supplied ordering prefix (e.g. a composite
    * lexical key): same two-stage salted exactness argument — every global
    * top-k row survives its bucket's local top-k for ANY total order. The
    * ascending-id tiebreak is appended to keep determinism. */
  def topKBy(scored: DataFrame, qCol: String, idCol: String,
             ordering: Seq[Column], k: Int, nSalts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = ordering :+ col(idCol).asc
    val localW = Window.partitionBy(col(qCol), col("_salt")).orderBy(order: _*)
    val globalW = Window.partitionBy(col(qCol)).orderBy(order: _*)
    scored
      .withColumn("_salt", pmod(hash(col(idCol)), lit(nSalts)))
      .withColumn("_lrn", row_number().over(localW))
      .filter(col("_lrn") <= k)
      .drop("_salt", "_lrn")
      .withColumn("rn", row_number().over(globalW))
      .filter(col("rn") <= k)
  }

  /**
   * Random-hyperplane LSH bucket rows (id, band, sig), one per band per
   * vector: the whole [[graft.functions.HyperplaneLsh]] sketch is ONE
   * codegen'd expression per row — map-only, no shuffle of embeddings.
   *
   * Scale shape: each band has 2^BitsPerBand sub-buckets, so a hot
   * *population* (many dissimilar vectors that share a coarse attribute —
   * the failure mode of label blocking) spreads across buckets and the
   * candidate join stays sub-quadratic; a hot *bucket* that remains is a
   * genuine duplicate cluster, for which pair output is inherently
   * quadratic — at corpus scale route those to a cluster-representative
   * (connected-components) dedup instead of pair emission.
   */
  def lshBuckets(df: DataFrame, idCol: String, embCol: String,
                 bands: Int = graft.functions.HyperplaneLsh.Bands,
                 bitsPerBand: Int = graft.functions.HyperplaneLsh.BitsPerBand): DataFrame =
    df.select(col(idCol),
      posexplode(graft.functions.hyperplane_bands(col(embCol), bands, bitsPerBand))
        .as(Seq("band", "sig")))

  /** Candidate near-dup pairs (a < b) colliding on any (band, sig) bucket —
    * the same bucket-collision pairing as the text side, delegated so a
    * future salt/skew fix lands in exactly one place. */
  def lshCandidatePairs(buckets: DataFrame, idCol: String): DataFrame =
    TextOps.candidatePairs(buckets, idCol)
      .withColumnRenamed("doc_a", "vec_a")
      .withColumnRenamed("doc_b", "vec_b")

  /** DuckDB twin of [[lshBuckets]]+[[lshCandidatePairs]] as WITH-clause
    * members; expects a CTE `e(vec_id, emb DOUBLE[])`, yields
    * `cand(vec_a, vec_b)`. The plane rows embed the SAME sign matrix the
    * JVM kernel uses (fixed seed), so signatures agree bit-for-bit. */
  val duckLshCtes: String = {
    import graft.functions.HyperplaneLsh.{signs, BitsPerBand}
    val rows = signs.zipWithIndex.map { case (s, h) =>
      val lits = s.map(v => if (v > 0) "1" else "-1").mkString(",")
      s"($h, CAST([$lits] AS DOUBLE[]))"
    }.mkString(",\n        ")
    s"""
      planes(h, s) AS (VALUES
        $rows),
      lsh AS (
        SELECT e.vec_id, p.h // $BitsPerBand AS band,
          SUM(CASE WHEN list_dot_product(e.emb, p.s) >= 0
                THEN CAST(1 AS BIGINT) << (p.h % $BitsPerBand) ELSE 0 END) AS sig
        FROM e CROSS JOIN planes p
        GROUP BY e.vec_id, p.h // $BitsPerBand),
      cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM lsh a JOIN lsh b ON a.band = b.band AND a.sig = b.sig
         AND a.vec_id < b.vec_id)"""
  }

  /** ceil(log2(n)) clamped to [minBits, maxBits] — the production LSH dial:
    * random-pair collision per band is 2^-bits, so bits ~ log2(n) holds
    * total random-candidate volume near-linear in n. Integer-exact (no
    * float log2 boundary risk at powers of two); mirrored by the SQL in
    * [[duckLshCtesScaled]]. */
  def scaledBits(n: Long, minBits: Int = 8, maxBits: Int = 16): Int =
    math.max(minBits, math.min(maxBits,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1))))

  /** [[duckLshCtes]] with the PRODUCTION dial: bitsPerBand computed from
    * the corpus count inside the SQL (min x with 2^x >= n — the same
    * integer-exact ceil-log2 as [[scaledBits]]), planes embedded up to
    * `maxBits` per band. The fixed-seed plane stream is append-only (the
    * first k planes are identical for every parameterization), so both
    * engines slice the same prefix whatever the dial resolves to. */
  def duckLshCtesScaled(minBits: Int = 8, maxBits: Int = 16): String = {
    import graft.functions.HyperplaneLsh.{signsFor, Bands}
    val rows = signsFor(Bands * maxBits).zipWithIndex.map { case (s, h) =>
      val lits = s.map(v => if (v > 0) "1" else "-1").mkString(",")
      s"($h, CAST([$lits] AS DOUBLE[]))"
    }.mkString(",\n        ")
    s"""
      nstat AS (SELECT COUNT(*) AS n FROM e),
      bits AS (SELECT GREATEST($minBits, LEAST($maxBits,
          (SELECT MIN(x) FROM generate_series(1, 62) t(x)
           WHERE (CAST(1 AS BIGINT) << x) >= (SELECT n FROM nstat)))) AS b),
      planes(h, s) AS (VALUES
        $rows),
      lsh AS (
        SELECT e.vec_id, p.h // b.b AS band,
          SUM(CASE WHEN list_dot_product(e.emb, p.s) >= 0
                THEN CAST(1 AS BIGINT) << (p.h % b.b) ELSE 0 END) AS sig
        FROM e CROSS JOIN bits b CROSS JOIN planes p
        WHERE p.h < $Bands * b.b
        GROUP BY e.vec_id, p.h // b.b),
      cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM lsh a JOIN lsh b ON a.band = b.band AND a.sig = b.sig
         AND a.vec_id < b.vec_id)"""
  }
}
