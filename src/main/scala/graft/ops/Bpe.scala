package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding merge learning (Sennrich et al. 2016) — tokenizer
 * TRAINING, the artifact-building step upstream of [[graft.catalog.Lm]]'s
 * vocabulary encode: learn the `nMerges` highest-count adjacent symbol
 * merges from a word-frequency table.
 *
 * Scale shape: the corpus is scanned ONCE (by the caller, to build the
 * (word, n) frequency table — Heaps-law bounded, metadata-sized next to a
 * 100 TB corpus). Every merge round then runs on that vocab-sized frame:
 * one explode of adjacent pairs weighted by word frequency, one pair-keyed
 * aggregate, one orderBy(1).collect() that moves a SINGLE row to the
 * driver. The merge apply is a map-only projection (broadcast of one merge
 * rule via literal); lineage is cut every `checkpointEvery` rounds so plan
 * depth stays O(1) per round — the [[Components]]/[[PageRank]] iterative
 * discipline.
 *
 * The greedy left-to-right pair substitution inside one word is inherently
 * a stateful sequential scan (a merged occurrence consumes its right
 * neighbour, shifting every later candidate), so it runs as a Scala UDF on
 * the symbol array — vocab-sized input, never corpus-sized, and the same
 * justified-kernel class as the codegen text expressions.
 *
 * Determinism: pair counts are exact int64 sums; ties break
 * lexicographically on (left, right) — reruns and partitionings cannot
 * reorder the learned merge table.
 *
 * Word-internal merges only (no end-of-word marker): the catalog's
 * whitespace tokens are already word-bounded, and the marker variant is the
 * same loop with one extra seed symbol.
 */
object Bpe {

  /** One learned merge: `left`+`right` fused after `pairCount` weighted
    * occurrences, at 1-based `rank` in learn order. */
  final case class Merge(rank: Int, left: String, right: String,
                         pairCount: Long)

  /** Greedy left-to-right substitution of one (l, r) pair in a symbol
    * sequence — the textbook BPE apply step. */
  private[ops] def mergeOnce(syms: Seq[String], l: String,
                             r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /**
   * @param words   (`wordCol`: String, `freqCol`: Long) word-frequency
   *                table — one row per distinct word
   * @param nMerges merge rules to learn (stops early if no pair is left)
   * @param maxLocalVocab vocabularies at or under this row count — AND
   *                under `maxLocalSyms` total symbols — learn on the
   *                DRIVER after one collect (production tokenizer
   *                trainers all work this way: the corpus-scale work is the
   *                word COUNT, already done by the caller; 20 merge rounds
   *                over a bounded word table need no cluster round-trips —
   *                measured 2.4 s -> ~0.1 s on the catalog corpus, where
   *                each Spark round cost ~120 ms of pure scheduling).
   *                Larger vocabularies keep the distributed per-round loop.
   *                The two paths are pair-count and tie-break identical
   *                (spec-asserted, including non-ASCII tie-breaks).
   * @param maxLocalSyms cap on TOTAL collected symbols, not just rows —
   *                boxed per-character strings cost ~50 bytes each on the
   *                driver heap, so a row gate alone would let 2M long words
   *                collect multiple GB (the round-10 advisory); 20M symbols
   *                ≈ ~1 GB worst case on a default driver
   */
  def learn(words: DataFrame, wordCol: String, freqCol: String, nMerges: Int,
            checkpointEvery: Int = 4, maxLocalVocab: Long = 500000L,
            maxLocalSyms: Long = 20000000L): Seq[Merge] = {
    require(nMerges >= 1, "nMerges must be >= 1")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1: $checkpointEvery")
    // array_remove: Spark's split(str, "") keeps a trailing "" element
    // (limit -1 semantics) that must not become a symbol. Words merged down
    // to ONE symbol can never pair again and are pruned each round — this
    // also keeps the pair transform's sequence(0, size-2) well-formed.
    var vocab = words
      .select(array_remove(split(col(wordCol), ""), "").as("syms"),
        col(freqCol).cast("long").as("n"))
      .filter(size(col("syms")) >= 2)
      .localCheckpoint()
    val stats = vocab
      .agg(count(lit(1)), coalesce(sum(size(col("syms"))), lit(0L)))
      .collect()(0)
    val (vRows, vSyms) = (stats.getLong(0), stats.getLong(1))
    if (vRows <= maxLocalVocab && vSyms <= maxLocalSyms) {
      val spark0 = words.sparkSession
      import spark0.implicits._
      return learnLocal(
        vocab.as[(Seq[String], Long)].collect(), nMerges)
    }
    // Partitions track VOCAB size (the [[PageRank]] discipline): every
    // merge round re-scans this frame, so a small vocabulary should not
    // pay conf-many near-empty tasks × rounds; a 100M-word vocabulary
    // keeps the session's full parallelism. coalesce = no shuffle; the
    // count reads the materialized checkpoint.
    val spark = words.sparkSession
    val vParts = math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      vRows / 500000L + 1)).toInt
    if (vParts < vocab.rdd.getNumPartitions)
      vocab = vocab.coalesce(vParts).localCheckpoint()
    val applyMerge = (syms: Seq[String], l: String, r: String) => mergeOnce(syms, l, r)
    val mergeUdf = udf(applyMerge)
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val best = vocab
        .select(col("n"), explode(transform(
          sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("l"),
            element_at(col("syms"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect() // exactly ONE row: the winning pair of this round
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, cnt)
        vocab = vocab.select(
            mergeUdf(col("syms"), lit(l), lit(r)).as("syms"), col("n"))
          .filter(size(col("syms")) >= 2)
        if (rank % checkpointEvery == 0 && rank < nMerges)
          vocab = vocab.localCheckpoint()
        rank += 1
      }
    }
    merges.result()
  }

  /** Unsigned lexicographic UTF-8 byte comparison — `UTF8String`'s order,
    * which the distributed loop's `orderBy(l, r)` compares by. Scala's
    * default String ordering compares UTF-16 code units instead, and the
    * two DISAGREE outside the BMP: a surrogate pair (0xD800-0xDFFF code
    * units) sorts below e.g. U+FB00 in UTF-16, but its 4-byte 0xF4-…
    * UTF-8 encoding sorts above that 3-byte 0xEF-… sequence. Tie-breaks
    * in [[learnLocal]] must use THIS order or the two paths can learn
    * different merge tables on supplementary-plane symbols. */
  private[ops] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Driver-local merge learning over a bounded word-frequency table —
    * semantically identical to the distributed loop: same overlapping
    * adjacent-pair counts weighted by word frequency, same
    * (count desc, left, right) winner selection (ties compared in UTF-8
    * byte order via [[utf8Compare]], exactly as UTF8String sorts), same
    * greedy [[mergeOnce]] apply and single-symbol pruning per round. */
  private def learnLocal(vocab0: Array[(Seq[String], Long)],
                         nMerges: Int): Seq[Merge] = {
    var vocab = vocab0.collect {
      case (syms, n) if syms.length >= 2 => (syms.toArray, n)
    }
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max count, ties to the UTF-8-byte-smallest (l, r) — the
        // distributed loop's orderBy(cnt desc, l, r) over UTF8Strings
        var bl: String = null; var br: String = null; var bc = Long.MinValue
        counts.foreach { case ((l0, r0), c) =>
          val better = c > bc || (c == bc && {
            val cl = utf8Compare(l0, bl)
            cl < 0 || (cl == 0 && utf8Compare(r0, br) < 0)
          })
          if (better) { bl = l0; br = r0; bc = c }
        }
        val (l, r, cnt) = (bl, br, bc)
        merges += Merge(rank, l, r, cnt)
        vocab = vocab.flatMap { case (syms, n) =>
          val merged = mergeOnce(syms.toSeq, l, r)
          if (merged.length >= 2) Some((merged.toArray, n)) else None
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Tokenize one word with a learned merge table (rank order — BPE apply
    * is order-sensitive). Driver-side helper for specs/tools. */
  def encodeWord(word: String, merges: Seq[Merge]): Seq[String] =
    merges.sortBy(_.rank).foldLeft(word.split("").toSeq) { (syms, m) =>
      mergeOnce(syms, m.left, m.right)
    }
}
