package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The clustered layout must actually enable skipping: every data file
  * covers a disjoint key range (parquet min/max prune whole files), and a
  * narrow range predicate reads fewer files than a full scan. */
class ClusterSpec extends SparkSpec {

  import spark.implicits._

  test("writeClustered produces files with pairwise-disjoint key ranges") {
    val dir = Files.createTempDirectory("graft_cluster").toString + "/t"
    val orders = Tables.load(spark, sf001, "orders")
    Cluster.writeClustered(orders, dir, nFiles = 6, col("o_custkey"))

    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isFile).map(_.getPath.toString)
      .filter(p => p.endsWith(".parquet"))
    assert(files.length == 6, s"expected 6 clustered files, got ${files.length}")

    val ranges = files.map { p =>
      val r = spark.read.parquet(p)
        .agg(min($"o_custkey"), max($"o_custkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"overlapping file ranges: $aMax vs $bMin")
      case _ =>
    }
    // content survives clustering
    assert(spark.read.parquet(dir).count() == orders.count())
  }

  test("a selective range scan prunes files via footer stats") {
    val dir = Files.createTempDirectory("graft_cluster2").toString + "/t"
    (1L to 60000L).map(i => (i, s"row$i")).toDF("k", "v")
      .coalesce(1) // deterministic input before range partitioning
      .transform { d => Cluster.writeClustered(d, dir, 10, col("k")); d }
    val narrow = spark.read.parquet(dir).filter($"k" >= 100 && $"k" <= 200)
    // collect() executes THIS plan, so its scan metrics populate (count()
    // re-plans and would leave them at zero — a vacuous assertion).
    // Vanilla Spark skips at ROW-GROUP granularity during the read:
    // `numOutputRows` on the scan counts rows surviving footer min/max
    // pruning; with one row group per file, <=2 of 10 groups may straddle
    // the 101-key range -> <=12000 of 60000 rows scanned.
    assert(narrow.collect().length == 101)
    val scan = narrow.queryExecution.executedPlan.collectLeaves().head
    val scanned = scan.metrics("numOutputRows").value
    assert(scanned <= 12000,
      s"expected <=2 of 10 row groups after min/max pruning, scanned $scanned rows")
  }
}
