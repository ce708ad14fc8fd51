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

  test("output schema carries the dedup key and original columns") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDF().toDF("ts", "text")
    val cleaned = CorpusStream.clean(docs)
    assert(cleaned.columns.toSeq == Seq("ts", "text", "norm_hash"))
    assert(cleaned.isStreaming)
  }
}
