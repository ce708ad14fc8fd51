package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class CorpusStreamSpec extends SparkSpec {

  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private val goodA = "the quick brown fox jumps over the lazy sleeping dog"
  // same normalized form as goodA: case + punctuation differences only
  private val goodADup = "The quick, brown FOX jumps over the lazy sleeping dog!"
  private val goodB = "colorless green ideas sleep furiously under a bright red moon"

  test("normalized duplicates within the watermark are dropped, first arrival wins") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDF().toDF("ts", "text")
    val q = CorpusStream.clean(docs, minTokens = 5, maxTopBigramFrac = 0.5)
      .writeStream.format("memory").queryName("corpus_out")
      .outputMode("append").start()
    try {
      input.addData((t(0), goodA), (t(1), goodADup), (t(2), goodB))
      q.processAllAvailable()
      val texts = spark.table("corpus_out").select("text").as[String].collect()
      // goodADup normalizes to goodA's hash and is dropped; both survivors pass gates
      assert(texts.sorted.toSeq == Seq(goodA, goodB).sorted)
    } finally q.stop()
  }

  test("quality gates drop short and repetition-heavy documents") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDF().toDF("ts", "text")
    // 10 tokens, 9 bigrams, top bigram ("spam spam") appears 8 times -> frac 8/9
    val repetitive = Seq.fill(9)("spam").mkString(" ") + " end"
    val short = "too few tokens"
    val q = CorpusStream.clean(docs, minTokens = 5, maxTopBigramFrac = 0.5)
      .writeStream.format("memory").queryName("corpus_gate_out")
      .outputMode("append").start()
    try {
      input.addData((t(0), goodA), (t(1), repetitive), (t(2), short))
      q.processAllAvailable()
      val texts = spark.table("corpus_gate_out").select("text").as[String].collect()
      assert(texts.toSeq == Seq(goodA))
    } finally q.stop()
  }

  test("stream == batch: cleaning the documents table through MemoryStream " +
    "matches the batch dedup+gate twin row-for-row") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.ops.TextOps

    implicit val sqlCtx = spark.sqlContext

    // sf0.001 documents plus injected normalized-duplicate variants (case +
    // punctuation changes only) so the stateful dedup path is exercised —
    // the raw table has no normalized duplicates at this SF.
    val base = graft.lake.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text"))
    val variants = base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(upper(col("text")), lit("!!")).as("text"))
    val all = base.unionAll(variants)

    // Arrival order = duplicate rank (1 = lowest doc_id per normalized hash).
    // Feeding one micro-batch per rank makes "first arrival wins" identical
    // to the batch twin's min-doc_id winner: within a batch every key is
    // unique, and later ranks arrive in strictly later batches.
    val ranked = all
      .withColumn("nh", md5(TextOps.normalize(col("text"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("nh")).orderBy(col("doc_id"))))
      .select(col("doc_id"), col("text"), col("rk"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val maxRank = ranked.map(_._3).max
    assert(maxRank >= 2, "duplicate injection failed — dedup path not exercised")

    val minTokens = 20
    val maxFrac = 0.2

    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val q = CorpusStream.clean(docs, minTokens = minTokens, maxTopBigramFrac = maxFrac)
      .writeStream.format("memory").queryName("corpus_equiv_out")
      .outputMode("append").start()
    try {
      (1 to maxRank).foreach { rk =>
        input.addData(ranked.filter(_._3 == rk).map { case (id, tx, _) =>
          (t(rk), id, tx)
        }.toSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("corpus_equiv_out")
        .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)

      // Batch twin: the corpus_mix cleaning stages — first doc per normalized
      // hash survives, then the same token floor and repetition ceiling.
      val batch = all
        .withColumn("nh", md5(TextOps.normalize(col("text"))))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("nh")).orderBy(col("doc_id"))))
        .filter(col("rk") === 1)
        .withColumn("n_toks", size(TextOps.tokens(col("text"))))
        .filter(col("n_toks") >= minTokens)
        .filter(graft.functions.top_bigram_count(col("text")).cast("double")
          / greatest(col("n_toks") - 1, lit(1)) <= maxFrac)
        .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)

      assert(batch.nonEmpty, "batch twin produced no rows — gates misconfigured")
      assert(streamed.toSeq == batch.toSeq,
        s"stream/batch mismatch: stream=${streamed.length} batch=${batch.length}")
    } finally q.stop()
  }

  test("output schema carries the dedup key and original columns") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDF().toDF("ts", "text")
    val cleaned = CorpusStream.clean(docs)
    assert(cleaned.columns.toSeq == Seq("ts", "text", "norm_hash"))
    assert(cleaned.isStreaming)
  }
}
