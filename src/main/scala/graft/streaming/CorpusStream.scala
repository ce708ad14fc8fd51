package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/**
 * Continuous corpus ingestion — the streaming twin of the batch
 * `corpus_mix` pipeline's cleaning stages: documents arrive as a stream,
 * exact-normalized duplicates are dropped within a watermark horizon, and
 * a quality gate (token floor + Gopher-style repetition ceiling) filters
 * before the stream reaches a sink.
 *
 * Scale/state posture: dedup state is keyed by the 128-bit normalized
 * hash, NOT the document text — bounded rows of fixed width — and the
 * watermark evicts keys older than the horizon, so state is
 * O(throughput × horizon), never O(corpus). Both gates are stateless
 * codegen kernels (NormalizeText, TopBigramCount); the only stateful
 * operator is the dedup itself.
 */
object CorpusStream {

  /**
   * Clean a streaming `docs` frame (must carry `ts` for the watermark,
   * `text`): normalized-dedup + quality gate. Emits the FIRST arrival of
   * each normalized text; duplicates arriving within `watermark` are
   * dropped, later ones are the upstream replayer's contract to avoid.
   */
  def clean(docs: DataFrame, minTokens: Int = 20,
            maxTopBigramFrac: Double = 0.2,
            watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("norm_hash", md5(TextOps.normalize(col("text"))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("norm_hash")
      .withColumn("n_toks", size(TextOps.tokens(col("text"))))
      .filter(col("n_toks") >= minTokens)
      .filter(graft.functions.top_bigram_count(col("text")).cast("double")
        / greatest(col("n_toks") - 1, lit(1)) <= maxTopBigramFrac)
      .drop("n_toks")
}
