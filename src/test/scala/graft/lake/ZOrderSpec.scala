package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout must actually enable MULTI-column skipping. Vanilla Spark
  * prunes parquet at ROW-GROUP granularity during the read (footer min/max
  * vs pushed filters) — the scan's `numOutputRows` counts rows surviving
  * that skip, so it is the honest skipping metric (`numFiles` reflects only
  * planning-time partition pruning and stays constant here). Each small
  * output file holds one row group, so row-group skipping == file-content
  * skipping for this layout. */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  private def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute THIS plan so its scan metrics populate
    df.queryExecution.executedPlan.collectLeaves().head
      .metrics("numOutputRows").value
  }

  test("morton interleaves bits as documented") {
    val r = spark.range(1).select(
      ZOrder.morton(lit(0b101L), lit(0b011L), 3).as("z")).head().getLong(0)
    // a=101, b=011 -> z bits (b2 a2 b1 a1 b0 a0) = 0 1 1 0 1 1 = 27
    assert(r == 27L)
  }

  test("box and single-dimension predicates skip z-clustered row groups") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    val n = 256L * 256L
    val grid = spark.range(n)
      .select((col("id") / 256L).cast("long").as("a"),
        (col("id") % 256L).cast("long").as("b"))
      .coalesce(4)
    ZOrder.writeZClustered(grid, s"$dir/z", nFiles = 16, col("a"), col("b"),
      bits = 8)
    Cluster.writeClustered(grid, s"$dir/lin", 16, col("a"))

    val z = spark.read.parquet(s"$dir/z")
    val lin = spark.read.parquet(s"$dir/lin")
    assert(z.count() == n)

    // corner box, 1/64 of the space: z locality confines it to ~2 of 16
    // row groups (observed 8240 of 65536 rows scanned)
    val box = (d: org.apache.spark.sql.DataFrame) =>
      d.filter(col("a") < 32 && col("b") < 32)
    assert(box(z).count() == 1024)
    val zBox = scannedRows(box(z))
    assert(zBox <= n / 4, s"z-order box scanned $zBox of $n rows")

    // predicate on b ONLY: the a-clustered layout is blind (every row
    // group spans all of b — full scan), z-order still skips
    val bOnly = (d: org.apache.spark.sql.DataFrame) => d.filter(col("b") < 16)
    val linB = scannedRows(bOnly(lin))
    val zB = scannedRows(bOnly(z))
    assert(linB == n, s"a-clustered layout unexpectedly skipped on b: $linB")
    assert(zB <= n / 2, s"z-order b-only scanned $zB of $n rows")

    // row content survives the layout change
    assert(z.exceptAll(grid).isEmpty && grid.exceptAll(z).isEmpty)
  }

  test("a key span too wide for the bucket multiplier fails fast") {
    val dir = Files.createTempDirectory("graft_zorder_guard").toString
    // span > 2^(63-12): the scaling multiply would overflow int64 and
    // silently mis-bucket — must raise instead
    val wide = Seq((0L, 0L), (Long.MaxValue / 2, 1L)).toDF("a", "b")
    val e = intercept[Exception] {
      ZOrder.writeZClustered(wide, s"$dir/z", nFiles = 2, col("a"), col("b"))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("ZOrder: a span")), s"got: $e")
    // same data with few enough bits for the span buckets fine
    ZOrder.writeZClustered(wide, s"$dir/ok", nFiles = 2, col("a"), col("b"),
      bits = 1)
    assert(spark.read.parquet(s"$dir/ok").count() == 2)
    // mixed-sign span >= 2^63: hi - lo itself overflows int64. Must STILL
    // fail fast — either via our guard (try_subtract null-routes to
    // raise_error) or via ANSI's arithmetic overflow on the row-side
    // subtraction, whichever the engine hits first. Never a silent wrap.
    val wrapped = Seq((-(1L << 62) - 10L, 0L), ((1L << 62) + 10L, 1L))
      .toDF("a", "b")
    val e2 = intercept[Exception] {
      ZOrder.writeZClustered(wrapped, s"$dir/wrap", nFiles = 2, col("a"), col("b"))
    }
    assert(messages(e2).exists(m =>
      m.contains("ZOrder: a span") || m.contains("ARITHMETIC_OVERFLOW")),
      s"got: $e2")
  }
}
