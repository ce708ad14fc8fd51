package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/**
 * Windowed trending terms over a document stream — the continuous twin of
 * the batch `freq_heavy_hitters` query, with the same two-tier design
 * split across state budgets:
 *
 *   - [[termCounts]]: exact per-window term counts. State per open window
 *     is one row per DISTINCT term — vocabulary-bounded (Heaps' law), which
 *     a capacity-planned deployment can afford when it wants exact ranks.
 *   - [[sketchCandidates]]: one mergeable Misra-Gries sketch per window
 *     ([[graft.functions.MisraGries]]) — state is `cap` counters per window
 *     REGARDLESS of vocabulary, the fixed-memory mode for unbounded-vocab
 *     streams (every term with window frequency > N/(cap+1) is guaranteed
 *     present in the candidate array; rank/exactness is the batch confirm
 *     pass's job downstream).
 *
 * Both are append-mode with a watermark: a window's row is emitted once,
 * when the watermark passes its end — the streaming contract the lake's
 * idempotent upsert sink (graft.streaming.Enrich.kpisToLake) expects.
 */
object Trending {

  private def terms(docs: DataFrame, watermark: String): DataFrame =
    docs.select(col("ts"), explode(TextOps.tokens(col("text"))).as("term"))
      .withWatermark("ts", watermark)

  /** Exact per-window term counts (state: one row per distinct term per
    * open window). `docs` must carry (`ts`, `text`). */
  def termCounts(docs: DataFrame, windowDur: String = "10 minutes",
                 watermark: String = "20 minutes"): DataFrame =
    terms(docs, watermark)
      .groupBy(window(col("ts"), windowDur), col("term"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("term"), col("n"))

  /** Fixed-memory per-window heavy-hitter candidates (state: `cap`
    * counters per open window). Output: one row per closed window with the
    * surviving candidate terms, sorted for deterministic assertion. */
  def sketchCandidates(docs: DataFrame, windowDur: String = "10 minutes",
                       watermark: String = "20 minutes", cap: Int = 8): DataFrame = {
    val mg = udaf(new graft.functions.MisraGries(cap))
    terms(docs, watermark)
      .groupBy(window(col("ts"), windowDur))
      .agg(mg(col("term")).as("cands"))
      .select(col("window.start").as("win_start"),
        sort_array(col("cands")).as("candidates"))
  }
}
