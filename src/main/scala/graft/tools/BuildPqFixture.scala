package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.Tables
import graft.ops.VectorOps
import graft.vectors.PqIndex

/**
 * One-shot builder for the committed PQ index fixture
 * (`fixtures/pq/{codebooks,codes,queries}` parquet) consumed by the
 * `ann_pq_score_fixture` catalog query and its DuckDB oracle.
 *
 * Rationale: PQ *training* (k-means) is iterative float argmin and cannot
 * cross engines, so `ann_cosine_topk_pq` stays rows-only. But *scoring* a
 * shipped index — the stage a deployment runs per query batch — is
 * deterministic given fixed artifacts. This tool trains once on the sf0.01
 * corpus (same dials as the catalog query: dim=64, M=8, K=32, 2 Lloyd
 * iterations, hash-seeded) and persists the artifacts both engines then
 * read bit-identically:
 *
 *   codebooks: (m INT, code INT, sub DOUBLE[subDim])  — M*K rows
 *   codes:     (vec_id BIGINT, m INT, code INT)       — long-format codes
 *   queries:   (q_id BIGINT, q_emb DOUBLE[dim])       — unit-normalized
 *
 * Usage: runMain graft.tools.BuildPqFixture [sfDir] [outDir]
 */
object BuildPqFixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.drop(1).headOption.getOrElse("fixtures/pq")
    val spark = graft.Conf.local(SparkSession.builder(), 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val e = Tables.embeddings(spark, sfDir)
      .withColumn("nrm", VectorOps.norm(col("embedding")))
      .withColumn("emb_d",
        transform(col("embedding").cast("array<double>"), x => x / col("nrm")))
    val cb = PqIndex.train(e, "vec_id", "emb_d", dim = 64)

    val cbRows = for {
      m <- 0 until cb.m
      k <- 0 until cb.k
    } yield (m, k, cb.cents(m)(k).toSeq)
    cbRows.toDF("m", "code", "sub")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/codebooks")

    PqIndex.encode(e, "vec_id", "emb_d", cb)
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("m", "code")))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/codes")

    e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("emb_d").as("q_emb"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/queries")

    println(s"[pq-fixture] wrote $outDir from $sfDir " +
      s"(M=${cb.m}, K=${cb.k}, dim=${cb.dim})")
    spark.stop()
  }
}
