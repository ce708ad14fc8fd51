package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.{Forget, MatView, Upsert, Versioned}

/**
 * Streaming incremental view maintenance ([[CdcSink.intoWithView]] /
 * [[CdcSink.applyBatchWithView]]): the view tracks a full groupBy
 * recompute across micro-batches; the source-tag + view-watermark pair
 * makes replay exactly-once WITHOUT a cross-table transaction — including
 * a crash landing between the source publish and the view refresh.
 */
class ViewSinkSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-viewsink").toString

  private def fresh(name: String): (String, String) = {
    val t = s"$root/$name"
    val rows = (0L until 1000L)
      .map(k => (k, s"g${k % 5}", (k % 37).toInt)).toDF("k", "grp", "x")
    Forget.publishIndexed(rows, t, nFiles = 4, keyCol = "k", stats = true)
    val view = s"$root/${name}_view"
    MatView.create(spark, t, "k", view, Seq("grp"), Seq("x"))
    (t, view)
  }

  private def recompute(src: String): Seq[(String, Long, Long)] =
    Versioned.read(spark, src).groupBy($"grp")
      .agg(count(lit(1)), sum($"x".cast("long")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)

  private def viewRows(view: String): Seq[(String, Long, Long)] =
    Versioned.read(spark, view).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("n_rows"),
        r.getAs[java.math.BigDecimal]("sum_x").longValueExact()))
      .toSeq.sortBy(_._1)

  test("the view tracks the recompute across micro-batches") {
    val (t, view) = fresh("track")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String, Int)]
    val q = CdcSink.intoWithView(
        input.toDF().toDF("op", "k", "grp", "x"), t, "k", view)
      .option("checkpointLocation", s"$root/ckpt-track").start()
    try {
      input.addData(("U", 10L, "g0", 99), ("I", 5000L, "h1", 7),
        ("D", 20L, null, 0))
      q.processAllAvailable()
      assert(viewRows(view) == recompute(t))
      input.addData(("D", 5000L, null, 0), ("U", 11L, "h2", 1))
      q.processAllAvailable()
      assert(viewRows(view) == recompute(t))
    } finally q.stop()
    // h1 appeared then emptied out; h2 exists
    assert(!viewRows(view).exists(_._1 == "h1"))
    assert(viewRows(view).exists(_._1 == "h2"))
  }

  test("replay is exactly-once for BOTH tables; mid-pair crash heals") {
    val (t, view) = fresh("replay")
    val batch = Seq(("U", 1L, "g4", 1000), ("D", 2L, null, 0))
      .toDF("op", "k", "grp", "x")
      .withColumn("x", when($"op" === "D", lit(null: String).cast("int"))
        .otherwise($"x"))
    CdcSink.applyBatchWithView(spark, t, "k", view, batch, batchId = 7L)
    val srcV = Versioned.currentVersion(spark, t).get
    val viewV = Versioned.currentVersion(spark, view).get
    val snap = viewRows(view)
    assert(snap == recompute(t))
    // full replay (same id): both halves no-op
    CdcSink.applyBatchWithView(spark, t, "k", view, batch, batchId = 7L)
    assert(Versioned.currentVersion(spark, t).contains(srcV))
    assert(Versioned.currentVersion(spark, view).contains(viewV))
    assert(viewRows(view) == snap)
    // crash BETWEEN source publish and view refresh: source applies batch
    // 8 alone (the crash), then the replay runs the full pair — source
    // skips on its tag, the view catches up on its watermark
    val batch8 = Seq(("I", 9001L, "g0", 5)).toDF("op", "k", "grp", "x")
    CdcSink.applyBatch(spark, t, "k", batch8, batchId = 8L)
    assert(viewRows(view) == snap) // view is now one version behind
    CdcSink.applyBatchWithView(spark, t, "k", view, batch8, batchId = 8L)
    assert(Versioned.currentVersion(spark, t).contains(srcV + 1))
    assert(viewRows(view) == recompute(t))
    assert(MatView.spec(spark, view).synced == srcV + 1)
  }

  test("seqCol churn reduces before BOTH the merge and the view delta") {
    val (t, view) = fresh("churn")
    val batch = Seq(
      ("I", 7777L, "g1", 1, 1L), ("U", 7777L, "g2", 50, 2L),
      ("U", 3L, "g3", 9, 1L), ("D", 3L, null, 0, 2L))
      .toDF("op", "k", "grp", "x", "seq")
      .withColumn("x", when($"op" === "D", lit(null: String).cast("int"))
        .otherwise($"x"))
    CdcSink.applyBatchWithView(spark, t, "k", view, batch, batchId = 1L,
      seqCol = Some("seq"))
    assert(viewRows(view) == recompute(t))
    val live = Versioned.read(spark, t)
    assert(live.filter($"k" === 7777L).select($"grp").as[String].head()
      == "g2")
    assert(live.filter($"k" === 3L).isEmpty)
  }
}
