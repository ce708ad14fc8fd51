package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text / dedup primitives for LLM-data pipelines, designed to be
 * (a) fully distributed — explode/groupBy shapes, no driver state — and
 * (b) engine-portable for the oracle: all hashing goes through md5 hex
 * strings (identical bytes-in/hex-out in any engine) rather than
 * engine-private hash functions like xxhash64.
 *
 * Scale: every op here is a map + shuffle-on-doc_id (or shuffle-on-signature
 * for LSH); nothing is quadratic in corpus size except the *candidate* pair
 * join, which LSH banding bounds to near-duplicates.
 */
object TextOps {

  /** Whitespace tokens; the lake's documents are space-separated text. */
  def tokens(text: Column): Column = split(text, " ")

  /** Aggressive normalization for near-exact dedup: lowercase, strip
    * non-alphanumerics, collapse whitespace. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Word n-gram shingles (n=3) as space-joined strings; empty array when the
    * document is shorter than one shingle. */
  def shingles(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  /**
   * (doc_id, seed, mh) MinHash rows: per seed, the lexicographic min of
   * md5("<seed>:<shingle>") over the document's shingles. String-min of a
   * uniform hex hash is a valid min-hash and is bit-identical across engines.
   */
  def minhash(docs: DataFrame, docId: String, textCol: String, numHashes: Int): DataFrame = {
    val seeds = array((0 until numHashes).map(lit): _*)
    docs
      .select(col(docId), explode(shingles(tokens(col(textCol)))).as("sh"))
      .select(col(docId), explode(seeds).as("seed"), col("sh"))
      .groupBy(col(docId), col("seed"))
      .agg(min(md5(concat(col("seed").cast("string"), lit(":"), col("sh")))).as("mh"))
  }

  /**
   * LSH banding: group `rowsPerBand` consecutive min-hashes into one band
   * signature. Docs sharing any (band, signature) are near-dup candidates.
   */
  def lshBands(mh: DataFrame, docId: String, rowsPerBand: Int): DataFrame =
    mh.groupBy(col(docId), floor(col("seed") / rowsPerBand).cast("int").as("band"))
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct(col("seed"), col("mh")))),
          x => x.getField("mh")),
        "|")).as("sig"))

  /** Candidate near-duplicate pairs (a < b) from shared LSH band signatures. */
  def candidatePairs(bands: DataFrame, docId: String): DataFrame = {
    val a = bands.select(col(docId).as("doc_a"), col("band"), col("sig"))
    val b = bands.select(col(docId).as("doc_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }
}
