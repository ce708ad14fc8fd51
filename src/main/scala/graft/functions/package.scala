package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.bridge

/** Column-API wrappers for graft's custom Catalyst expressions. */
package object functions {

  /** Packed LSH band signatures of a text column's MinHash sketch;
    * NULL for documents with no trigram shingles. */
  def minhash_bands(text: Column, numHashes: Int = 8, rowsPerBand: Int = 2): Column =
    bridge.toColumn(MinHashBands(bridge.toExpression(text), numHashes, rowsPerBand))

  /** h32 base hash of each trigram shingle of a text column, in order. */
  def trigram_hashes(text: Column): Column =
    bridge.toColumn(TrigramHashes(bridge.toExpression(text)))

  /** Single-pass lowercase/strip/collapse normalization (dedup keying). */
  def normalize_text(text: Column): Column =
    bridge.toColumn(NormalizeText(bridge.toExpression(text)))

  /** 31-ary rolling document fingerprint mod 1e9+7. */
  def rolling_fingerprint(text: Column): Column =
    bridge.toColumn(RollingFingerprint(bridge.toExpression(text)))

  /** 60-bit majority-vote SimHash over distinct tokens. */
  def simhash60(text: Column): Column =
    bridge.toColumn(SimHash60(bridge.toExpression(text)))

  /** Occurrences of the most-repeated adjacent token bigram. */
  def top_bigram_count(text: Column): Column =
    bridge.toColumn(TopBigramCount(bridge.toExpression(text)))

  /** Distinct md5-hex hashes of every 8-token span (exact-span dedup
    * grain); empty array below 8 tokens. */
  def span_hashes8(text: Column): Column =
    bridge.toColumn(SpanHashes8(bridge.toExpression(text)))

  /** 1-based positions of exact adjacent-token phrase matches. */
  def phrase_positions(text: Column, first: String, second: String): Column =
    bridge.toColumn(PhrasePositions(bridge.toExpression(text), first, second))

  /** Space-joined adjacent token bigrams in document order, duplicates
    * kept; empty array below 2 tokens. */
  def adjacent_bigrams(text: Column): Column =
    bridge.toColumn(AdjacentBigrams(bridge.toExpression(text)))

  /** Jaro-Winkler similarity in [0,1] of two string columns (linkage
    * scoring; bit-compatible with DuckDB's jaro_winkler_similarity on
    * ASCII inputs). */
  def jaro_winkler(a: Column, b: Column): Column =
    bridge.toColumn(JaroWinkler(bridge.toExpression(a), bridge.toExpression(b)))

  /** Sequential double dot product of two float/double array columns. */
  def vector_dot(a: Column, b: Column): Column =
    bridge.toColumn(VectorDot(bridge.toExpression(a), bridge.toExpression(b)))

  /** Packed random-hyperplane LSH band signatures of an embedding column.
    * `bitsPerBand` scales ~log2(corpus size) to hold the candidate-join
    * volume near-linear; `bands` buys recall. */
  def hyperplane_bands(emb: Column,
                       bands: Int = HyperplaneLsh.Bands,
                       bitsPerBand: Int = HyperplaneLsh.BitsPerBand): Column =
    bridge.toColumn(HyperplaneBands(bridge.toExpression(emb), bands, bitsPerBand))

  /** Sign-random-projection of an embedding column through the frozen
    * MD5-rule ±1 matrix: `srcDims` → `rpDims` double coordinates, computed
    * in the fixed left-to-right order the DuckDB oracle replays. */
  def sign_rp_project(emb: Column, rpDims: Int, srcDims: Int = 64): Column =
    bridge.toColumn(SignRpProject(bridge.toExpression(emb), rpDims, srcDims))

  /** PQ reconstruction of a unit embedding against plan-baked codebooks
    * (`cents(m)(k)(subDim)`): per-subspace L2-argmin, winning codewords
    * concatenated — the zero-shuffle encode+recon kernel. */
  def pq_recon(emb: Column, cents: Array[Array[Array[Double]]]): Column =
    bridge.toColumn(PqRecon(bridge.toExpression(emb), cents))
}
