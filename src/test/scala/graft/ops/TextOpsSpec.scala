package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{minhash_bands, trigram_hashes, TextHashing}

/** Text/dedup kernels: the codegen expressions must agree bit-for-bit with
  * the portable column formulation (md5-hex first-8-nibble base hash +
  * arithmetic permutations) that the DuckDB oracle mirrors. */
class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text with other words inside"),
    (4L, "short doc"), // < 3 tokens -> no shingles
    (5L, "the quick brown fox jumps over the lazy dog") // dup of 1
  ).toDF("doc_id", "text")

  test("h32 column form == TextHashing kernel, and matches a known md5") {
    val strings = Seq("a", "hello world", "the quick brown", "", "ü nicode").toDF("s")
    val viaCol = strings.select(TextOps.h32(col("s")).as("h")).as[Long].collect()
    val viaKernel = strings.as[String].collect().map { s =>
      // kernel path: first 4 md5 bytes big-endian unsigned
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    assert(viaCol.sameElements(viaKernel))
    // md5("hello") = 5d41402a... -> 0x5d41402a = 1564557354 (DuckDB-checked)
    assert(Seq("hello").toDF("s").select(TextOps.h32(col("s"))).as[Long].head()
      == 1564557354L)
  }

  test("trigram_hashes matches h32 over the shingle column formulation") {
    val viaExpr = docs.select(col("doc_id"), explode(trigram_hashes(col("text"))).as("h"))
    val viaCols = docs.select(col("doc_id"),
        explode(TextOps.shingles(TextOps.tokens(col("text")))).as("sh"))
      .select(col("doc_id"), TextOps.h32(col("sh")).as("h"))
    assert(viaExpr.exceptAll(viaCols).isEmpty && viaCols.exceptAll(viaExpr).isEmpty)
    // doc 4 has no trigrams -> empty array, not null
    assert(docs.filter($"doc_id" === 4)
      .select(size(trigram_hashes($"text"))).as[Int].head() == 0)
  }

  test("minhash_bands: identical docs share all bands; short docs are null") {
    val bands = TextOps.lshBands(docs, "doc_id", "text")
    val byDoc = bands.groupBy("doc_id")
      .agg(sort_array(collect_list(struct($"band", $"sig"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(byDoc(1L) == byDoc(5L))          // exact dup -> same signature
    assert(byDoc(1L) != byDoc(3L))          // unrelated -> different
    assert(!byDoc.contains(4L))             // no shingles -> dropped
    assert(byDoc(1L).size == 4)             // 8 hashes / 2 rows per band
    // permutation values stay in [0, P): packed sigs bounded by P*P
    val maxSig = bands.agg(max($"sig")).as[Long].head()
    assert(maxSig < TextHashing.P * (TextHashing.P + 1))
  }

  test("candidatePairs finds the near-dup and exact-dup pairs, a < b") {
    val pairs = TextOps.candidatePairs(
      TextOps.lshBands(docs, "doc_id", "text"), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L)))          // identical
    assert(pairs.forall { case (a, b) => a < b })
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L }) // unrelated doc
  }

  test("simhash60 / rolling_fingerprint kernels match the HOF formulations") {
    val d = graft.lake.Tables.documents(spark, sf001).limit(200)
    val viaKernel = d.select(col("doc_id"),
      graft.functions.simhash60(col("text")).as("sh"),
      graft.functions.rolling_fingerprint(col("text")).as("fp"))
    val viaHof = d
      .select(col("doc_id"),
        transform(array_distinct(TextOps.tokens(col("text"))), t => md5(t)).as("hs"),
        col("text"))
      .select(col("doc_id"),
        expr("""aggregate(sequence(0, 59), cast(0 as bigint), (acc, bit) ->
          acc + if(aggregate(hs, 0, (a, h) ->
              a + 2 * ((shiftright(instr('0123456789abcdef',
                          substring(h, cast(1 + bit div 4 as int), 1)) - 1,
                        cast(3 - bit % 4 as int))) & 1) - 1) > 0,
            shiftleft(cast(1 as bigint), bit), cast(0 as bigint)))""").as("sh"),
        expr("""aggregate(
          transform(split(text, ' '), t ->
            cast((instr('0123456789abcdef', substring(md5(t), 1, 1)) - 1) * 4096
               + (instr('0123456789abcdef', substring(md5(t), 2, 1)) - 1) * 256
               + (instr('0123456789abcdef', substring(md5(t), 3, 1)) - 1) * 16
               + (instr('0123456789abcdef', substring(md5(t), 4, 1)) - 1) as bigint)),
          cast(0 as bigint),
          (acc, x) -> (acc * 31 + x) % 1000000007)""").as("fp"))
    assert(viaKernel.exceptAll(viaHof).isEmpty && viaHof.exceptAll(viaKernel).isEmpty)
  }

  test("vector_dot kernel matches the zip_with/aggregate formulation") {
    val e = graft.lake.Tables.embeddings(spark, sf001).limit(100)
    val q = e.select(col("embedding").as("b")).limit(5)
    val pairs = e.crossJoin(q)
    val diff = pairs.select(
      graft.ops.VectorOps.dot(col("embedding"), col("b")).as("k"),
      graft.ops.VectorOps.dotHof(col("embedding"), col("b")).as("h"))
      .filter(col("k") =!= col("h"))
    assert(diff.isEmpty)
  }

  test("normalize collapses case/punct/whitespace") {
    val out = Seq("  The QUICK,   brown-fox!  ").toDF("t")
      .select(TextOps.normalize($"t")).as[String].head()
    assert(out == "the quick brownfox")
  }

  test("normalize kernel == regex chain on corpus + crafted edges") {
    val edges = Seq("", " ", "a ! b", "a!b", "A\tB", "ü über ID-9 ",
      "  x  ", "1,2;3", "MiXeD   CaSe!!", "trailing space ").toDF("text")
    val corpus = graft.lake.Tables.documents(spark, sf001).select("text")
    Seq(edges, corpus).foreach { df =>
      val diff = df.select(
        TextOps.normalize(col("text")).as("k"),
        TextOps.normalizeSql(col("text")).as("r"))
        .filter(col("k") =!= col("r"))
      assert(diff.isEmpty, diff.collect().take(3).mkString("; "))
    }
  }
}
