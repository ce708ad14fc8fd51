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

  test("the index rides layout maintenance: compact, z-order, merge") {
    val table = s"$root/vdocs"
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    Forget.publishIndexed(docs.repartition(16, col("doc_id")), table, 16,
      "doc_id", stats = true)
    TokenBloom.index(spark,
      Versioned.dataDir(spark, table, 1), "text")

    def liveDir = Versioned.dataDir(spark, table,
      Versioned.currentVersion(spark, table).get)
    def parts(dir: String): Int =
      spark.read.parquet(dir).select(input_file_name())
        .distinct().count().toInt
    def bruteAt(dir: String, tokens: Seq[String]): Seq[Long] =
      spark.read.parquet(dir)
        .filter(tokens.map(t =>
          array_contains(TokenBloom.tokensOf(col("text")), t)).reduce(_ && _))
        .select($"doc_id").as[Long].collect().sorted.toSeq
    def viaAt(dir: String, tokens: Seq[String]): Seq[Long] =
      TokenBloom.search(spark, dir, "text", tokens)
        .select($"doc_id").as[Long].collect().sorted.toSeq

    // compaction rebuilds the index from the carried _meta recipe: the
    // keyword search still prunes (bounded by true files + Bloom fpp) and
    // still equals the full scan bitwise
    Compact.compactVersion(spark, table, "doc_id", targetBytes = 24L * 1024)
    val d2 = liveDir
    val n2 = parts(d2)
    assert(n2 > 1, s"compaction should leave several files, got $n2")
    assert(viaAt(d2, Seq(rareTok)) == bruteAt(d2, Seq(rareTok)))
    val true2 = spark.read.parquet(d2)
      .filter(array_contains(TokenBloom.tokensOf($"text"), rareTok))
      .select(input_file_name()).distinct().count().toInt
    val cand2 = TokenBloom.candidateFiles(spark, d2, Seq(rareTok)).size
    assert(cand2 >= true2 && cand2 <= true2 + 3,
      s"post-compact: $cand2 admitted of $n2 ($true2 true)")

    // z-order rebuilds it too
    ZOrder.cluster(spark, table, Seq("doc_id", "n_chars"), "doc_id",
      targetBytes = 24L * 1024)
    val d3 = liveDir
    assert(viaAt(d3, Seq(rareTok)) == bruteAt(d3, Seq(rareTok)))
    val true3 = spark.read.parquet(d3)
      .filter(array_contains(TokenBloom.tokensOf($"text"), rareTok))
      .select(input_file_name()).distinct().count().toInt
    val cand3 = TokenBloom.candidateFiles(spark, d3, Seq(rareTok)).size
    assert(cand3 >= true3 && cand3 <= true3 + 3,
      s"post-cluster: $cand3 admitted of ${parts(d3)} ($true3 true)")

    // a file-targeted merge re-indexes ONLY the rewritten files (untouched
    // sidecars ride along as byte copies): a sentinel token that exists
    // only in the merged row is findable and admits few files
    val victim = docs.orderBy($"doc_id").limit(1)
      .withColumn("text", concat($"text", lit(" zzzmergesentinel")))
    Upsert.merge(spark, table, "doc_id", victim)
    val d4 = liveDir
    assert(viaAt(d4, Seq("zzzmergesentinel")) ==
      bruteAt(d4, Seq("zzzmergesentinel")))
    assert(viaAt(d4, Seq("zzzmergesentinel")).size == 1)
    val cand4 =
      TokenBloom.candidateFiles(spark, d4, Seq("zzzmergesentinel")).size
    assert(cand4 >= 1 && cand4 <= 4,
      s"sentinel token admitted $cand4 of ${parts(d4)} files")
    // and the ordinary search still matches the full scan post-merge
    assert(viaAt(d4, Seq(rareTok)) == bruteAt(d4, Seq(rareTok)))
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
