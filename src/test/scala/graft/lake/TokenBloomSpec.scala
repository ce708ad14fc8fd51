package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Token Bloom sidecars ([[TokenBloom]]): a conjunctive keyword search
 * reads only admitted files yet equals the full scan bitwise (no false
 * negatives, spec-pinned on the REAL documents corpus); a rare token
 * combination prunes most files; probe normalization matches the index;
 * missing sidecars admit (advisory).
 */
class TokenBloomSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-tokbloom").toString

  // the real documents corpus, hash-spread across 16 files so tokens
  // cluster nowhere (worst case for skipping, honest for correctness)
  private lazy val docsDir: String = {
    val d = s"$root/docs"
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .repartition(16, col("doc_id"))
      .write.parquet(d)
    TokenBloom.index(spark, d, "text")
    d
  }

  private def brute(tokens: Seq[String]): Seq[Long] =
    spark.read.parquet(docsDir)
      .filter(tokens.map(t =>
        array_contains(TokenBloom.tokensOf(col("text")), t)).reduce(_ && _))
      .select($"doc_id").as[Long].collect().sorted.toSeq

  private def viaIndex(tokens: Seq[String]): Seq[Long] =
    TokenBloom.search(spark, docsDir, "text", tokens)
      .select($"doc_id").as[Long].collect().sorted.toSeq

  // the most- and least-frequent length>=4 tokens, found from the corpus
  // itself so the test never goes stale against regenerated testdata
  private lazy val (commonTok, rareTok) = {
    val freq = spark.read.parquet(docsDir)
      .select(explode(TokenBloom.tokensOf($"text")).as("t"))
      .groupBy($"t").count()
      .filter(length($"t") >= 4)
    val common = freq.orderBy($"count".desc, $"t")
      .select($"t").as[String].head()
    val rare = freq.orderBy($"count".asc, $"t")
      .select($"t").as[String].head()
    (common, rare)
  }

  test("pruned search equals the full scan; rare tokens prune files") {
    assert(viaIndex(Seq(commonTok)) == brute(Seq(commonTok)))
    assert(viaIndex(Seq(rareTok)) == brute(Seq(rareTok)))
    // the rare token truly lives in this many files — admission may add
    // only Bloom false positives on top (fpp=1% over 16 files: a few)
    val trueFiles = spark.read.parquet(docsDir)
      .filter(array_contains(TokenBloom.tokensOf($"text"), rareTok))
      .select(input_file_name()).distinct().count().toInt
    val cand = TokenBloom.candidateFiles(spark, docsDir, Seq(rareTok)).size
    assert(cand >= trueFiles, "a Bloom can never exclude a true file")
    assert(cand <= trueFiles + 3,
      s"rare token ($trueFiles true files) admitted $cand of 16")
    // conjunction prunes at least as hard as its rarest member
    val both = TokenBloom.candidateFiles(spark, docsDir,
      Seq(commonTok, rareTok)).size
    assert(both <= cand)
    assert(viaIndex(Seq(commonTok, rareTok)) ==
      brute(Seq(commonTok, rareTok)))
  }

  test("a token absent from the corpus reads schema-stable empty") {
    val none = TokenBloom.search(spark, docsDir, "text",
      Seq("zzzzunseentokenzzzz"))
    assert(none.columns.contains("doc_id"))
    assert(none.count() == 0)
  }

  test("probe normalization matches the index (case/punct drift)") {
    // query the UPPER-CASED spelling: normalizeProbe must fold it to the
    // indexed form, or the Bloom probe would miss every file
    assert(viaIndex(Seq(commonTok.toUpperCase)) == brute(Seq(commonTok)))
  }

  test("missing sidecars admit: the index is advisory") {
    val d = s"$root/noindex"
    Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
      .repartition(2).write.parquet(d)
    // no index built — candidateFiles keeps every file, search still exact
    val cand = TokenBloom.candidateFiles(spark, d, Seq("alpha"))
    assert(cand.size == 2)
    assert(TokenBloom.search(spark, d, "text", Seq("alpha"))
      .select($"doc_id").as[Long].collect().toSeq == Seq(1L))
  }
}
