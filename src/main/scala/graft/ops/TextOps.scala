package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text / dedup primitives for LLM-data pipelines, designed to be
 * (a) fully distributed — per-document map work with a single shuffle on the
 * LSH band signature, no driver state — and
 * (b) engine-portable for the oracle: base hashing goes through md5 hex
 * (identical bytes-in/hex-out in any engine); the MinHash permutation family
 * is exact int64 arithmetic `(a*h + b) mod p` on a 32-bit base hash, so every
 * signature is bit-identical in Spark and DuckDB.
 *
 * Scale shape: MinHash signatures are computed in ONE narrow projection per
 * document (no explode, no pre-join shuffle) — at 100 TB the only shuffles
 * are the band-signature self-join (bounded by near-duplicate density) and
 * the final ordering. md5 runs once per shingle; the k permutations are
 * multiply-mod on the cached base hash.
 */
object TextOps {

  /** Whitespace tokens; the lake's documents are space-separated text. */
  def tokens(text: Column): Column = split(text, " ")

  /** Adjacent token pairs of a token array, as array<struct<wa,wb>> —
    * arrays_zip over two slices instead of a `transform` lambda: the
    * higher-order function is interpreted per element (~µs/element — a
    * corpus-width pair build paid seconds for it), arrays_zip + slice stay
    * in codegen. Empty/1-token arrays yield an empty pair array. */
  def adjacentPairs(tk: Column): Column = {
    val n = greatest(size(tk) - 1, lit(0))
    arrays_zip(slice(tk, lit(1), n).as("wa"), slice(tk, lit(2), n).as("wb"))
  }

  /** Aggressive normalization for near-exact dedup: lowercase, strip
    * non-alphanumerics, collapse whitespace — the single-pass codegen kernel
    * ([[graft.functions.NormalizeText]]); [[normalizeSql]] is the regex
    * formulation it is spec-pinned to (and the oracle's shape). */
  def normalize(text: Column): Column = graft.functions.normalize_text(text)

  /** Regex-chain formulation of [[normalize]] (cross-engine reference). */
  def normalizeSql(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Word n-gram shingles (n=3) as space-joined strings; empty array when the
    * document is shorter than one shingle. */
  def shingles(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  // MinHash permutation family: h_i(x) = (A(i)*x + B(i)) mod P over a 32-bit
  // base hash. P prime > 2^30; A(i)*x <= 167 * 2^32 < 2^63 — no overflow.
  // Kernel constants live in graft.functions.TextHashing (the codegen side).
  val P: Long = graft.functions.TextHashing.P
  val A: IndexedSeq[Long] = graft.functions.TextHashing.A.toIndexedSeq
  val B: IndexedSeq[Long] = graft.functions.TextHashing.B.toIndexedSeq

  /** 32-bit base hash of a string: first 8 hex nibbles of md5, as int64.
    * DuckDB twin: `CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)`.
    * (Column-expression form; the hot path uses TextHashing's JVM kernel.) */
  def h32(s: Column): Column = conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /**
   * LSH band rows, (docId, band, sig), `numHashes/rowsPerBand` per document:
   * the per-document MinHash sketch packed pairwise into int64 band
   * signatures `mh_{2j}*P + mh_{2j+1}` (< 1.1e18, fits int64).
   *
   * The whole sketch is ONE codegen'd expression per document
   * ([[graft.functions.MinHashBands]]) evaluated once inside the Generate —
   * map-only, no shuffle of raw text, no interpreted higher-order lambdas,
   * no CollapseProject re-evaluation. The only shuffles downstream are the
   * band-signature self-join and the final ordering: the 100 TB shape.
   * Documents with no shingles return NULL and drop out at the explode.
   */
  def lshBands(docs: DataFrame, docId: String, textCol: String,
               numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame =
    docs.select(col(docId),
      posexplode(graft.functions.minhash_bands(col(textCol), numHashes, rowsPerBand))
        .as(Seq("band", "sig")))

  /** Candidate near-duplicate pairs (a < b) from shared LSH band signatures. */
  def candidatePairs(bands: DataFrame, docId: String): DataFrame = {
    val a = bands.select(col(docId).as("doc_a"), col("band"), col("sig"))
    val b = bands.select(col(docId).as("doc_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** DuckDB twin of [[lshBands]]+[[candidatePairs]] as a WITH-clause body;
    * expects a `documents(doc_id, text)` view, yields CTE `pairs(doc_a, doc_b)`
    * plus `sh(doc_id, shs)` with the raw shingle lists for reuse. */
  val duckPairsCtes: String = {
    val mins = (0 until 8).map { i =>
      s"list_min(list_transform(hs, h -> (h*${A(i)} + ${B(i)}) % $P)) AS mh$i"
    }.mkString(",\n          ")
    val bands = (0 until 4).map { j =>
      s"SELECT doc_id, $j AS band, mh${2 * j}*$P + mh${2 * j + 1} AS sig FROM mh"
    }.mkString("\n        UNION ALL ")
    s"""
      tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (
        SELECT doc_id, CASE WHEN len(t) >= 3
          THEN list_transform(generate_series(1, len(t)-2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
          ELSE [] END AS shs
        FROM tok),
      hs AS (SELECT doc_id,
        list_transform(shs, s -> CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)) AS hs
        FROM sh),
      mh AS (
        SELECT doc_id,
          $mins
        FROM hs),
      bands AS (
        $bands),
      pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
         AND a.doc_id < b.doc_id)"""
  }
}
