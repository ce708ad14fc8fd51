package graft.lake

import java.nio.file.Files

import graft.{SparkSpec, Sql, SqlDml}

/**
 * ANALYZE-fed cold-plan broadcast ([[TableStats]] + `Sql.registerTable`):
 * a DV-heavy dimension whose parquet FOOTPRINT exceeds the broadcast
 * threshold — and whose read plan's DV anti-join hides its true size
 * from Spark's estimation — flips the join side to broadcast purely
 * from the registered stats; without the ANALYZE (or with stale stats)
 * the plan stays un-hinted; the stats themselves count LOGICAL rows.
 */
class TableStatsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-tstats").toString

  private def plans(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("a join flips to broadcast purely from registered stats") {
    val dim = s"$root/dim"; val fact = s"$root/fact"
    // dimension: 20k physical rows, then a DV purge leaves 10 logical —
    // the files stay large, the content is tiny
    Forget.publishIndexed(
      (0L until 20000L).map(k => (k, s"name-$k")).toDF("k", "dname"),
      dim, 2, "k", stats = true)
    Dv.purge(spark, dim, "k", (10L until 20000L))
    Forget.publishIndexed(
      (0L until 20000L).map(i => (i, i % 10, i * 2L))
        .toDF("id", "k", "amt"),
      fact, 2, "id", stats = true)

    // threshold far below BOTH sides' physical footprints (tens of KB
    // each — sanity-checked below): Spark's own file-size estimate
    // cannot justify broadcasting either side — but far above the dim's
    // LOGICAL size, so only the stats can flip it
    val threshold = 8192L
    def physBytes(dir: String) = Versioned.dataFilePaths(spark, dir)
      .map(p => new java.io.File(p.stripPrefix("file:")).length).sum
    assert(physBytes(s"$dim/v=1") > threshold * 8 &&
      physBytes(s"$fact/v=1") > threshold * 8,
      "setup: both physical footprints must exceed the threshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      threshold.toString)
    try {
      SqlDml.register(spark, "ts_dim", dim, "k")
      SqlDml.register(spark, "ts_fact", fact, "id")
      val q = "SELECT f.id, d.dname FROM ts_fact f " +
        "JOIN ts_dim d ON f.k = d.k"
      // cold, un-analyzed: the fact-dim join stays a sort-merge (the
      // dim's DV anti-join is itself a broadcast join, so the probe is
      // SMJ presence, not BHJ absence); AQE could flip it at RUNTIME —
      // disable to isolate the cold plan
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      assert(plans(Sql.sql(spark, q)).contains("SortMergeJoin"),
        "setup: the un-analyzed cold plan must sort-merge the join")

      // ANALYZE records logical stats and re-arms the registration
      Sql.execute(spark, "ANALYZE TABLE ts_dim COMPUTE STATISTICS")
      val st = TableStats.read(spark, dim).get
      assert(st.rows == 10L, s"logical rows: $st")
      assert(st.bytes < threshold,
        s"logical bytes must undercut the threshold: $st vs $threshold")
      val hinted = Sql.sql(spark, q)
      assert(!plans(hinted).contains("SortMergeJoin"),
        s"stats did not flip the join:\n${plans(hinted)}")
      assert(hinted.count() == 20000L)

      // stale stats (the dim moves) drop the hint at the next re-bind
      Sql.execute(spark, "DELETE FROM ts_dim WHERE k = 0")
      assert(plans(Sql.sql(spark, q)).contains("SortMergeJoin"),
        "stale stats must not keep hinting")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
