package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.Conf
import graft.lake.{BloomIndex, Forget, StatsIndex, TokenBloom,
  Versioned, ZOrder}

/**
 * One-shot builder for the committed DATA-SKIPPING fixtures consumed by
 * the `lake_skip_*` catalog queries and their DuckDB oracles — the
 * hash-gate leg for file skipping, the same pattern
 * [[BuildLakeFixture]] established for the DML machinery: the Spark arm
 * reads THROUGH the pruned path (and `require`s the plan opened few
 * files), while the oracle computes the answer from ALL the raw parquet
 * with no graft code in the loop — one green row proves pruned == full
 * AND that pruning fired.
 *
 * Three committed layouts (all from the driver's sf0.01 testdata):
 *
 *   fixtures/lake/orders_rc   orders range-clustered on o_orderkey into
 *                             16 files + `_stats` manifest + `_bloom`
 *                             sidecars — [[StatsIndex.readRange]] (range
 *                             probe) and [[BloomIndex.lookup]] (point
 *                             probe) both prune against it.
 *   fixtures/lake/orders_z    orders z-ordered on (o_custkey,
 *                             o_totalprice) with the `_boxstats`
 *                             manifest — [[ZOrder.readBox]] box probes.
 *   fixtures/lake/parts_tb    part projection clustered by p_name with
 *                             per-file token-Bloom sidecars — the
 *                             name-clustered catalog where
 *                             [[TokenBloom.search]]'s conjunctive
 *                             keyword probe prunes to the files whose
 *                             name range carries the adjective.
 *
 * Reference behavior this gates: the reference prunes reads on exactly
 * one dimension — the day-partition directory layout its loader writes
 * (/root/reference/src/pipeline/loaders/s3_loader.py:23-58). These
 * fixtures are the within-partition skipping a 100 TB lake needs on top:
 * range manifests, multi-column boxes, and token sidecars.
 *
 *   fixtures/lake/orders_sd   orders range-clustered + `_stats` (v1),
 *                             then ONE zero-copy CDC merge (v2 = `_ref`
 *                             + DV'd old rows + appended fresh rows +
 *                             landing-minted `_stats` over the appends)
 *                             — the overlay layout [[graft.lake
 *                             .SkipScan.readVersionAuto]] must keep
 *                             pruning through.
 *
 * Usage: runMain graft.tools.BuildSkipFixture [sfDir] [fixturesDir] [only...]
 * (`only` = fixture dir names to rebuild; default all — name one to
 * leave the other committed layouts byte-identical)
 */
object BuildSkipFixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val base = args.drop(1).headOption.getOrElse(
      new java.io.File("fixtures/lake").getAbsolutePath)
    val only = args.drop(2).toSet
    def wanted(name: String) = only.isEmpty || only.contains(name)
    val spark = Conf.local(SparkSession.builder(), 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = spark.sparkContext.hadoopConfiguration

    def clear(dir: String): Unit = {
      val f = new Path(dir).getFileSystem(conf)
      require(!f.exists(new Path(dir)) || f.delete(new Path(dir), true),
        s"could not clear $dir")
    }

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")

    // 1. range-clustered + _stats + _bloom (point AND range probes)
    if (wanted("orders_rc")) {
      val rc = s"$base/orders_rc"
      clear(rc)
      Forget.publishClustered(orders, rc, nFiles = 16, keyCol = "o_orderkey",
        stats = true)
      BloomIndex.indexExisting(spark, s"$rc/v=1", "o_orderkey")
      println(s"[skip-fixture] $rc: " +
        s"${Versioned.dataFilePaths(spark, s"$rc/v=1").size} files, " +
        s"stats=${StatsIndex.exists(spark, s"$rc/v=1")}")
    }

    // 2. z-ordered on (o_custkey, o_totalprice) + _boxstats
    if (wanted("orders_z")) {
      val z = s"$base/orders_z"
      clear(z)
      Versioned.publish(orders, z) // v1: layout-free seed
      ZOrder.cluster(spark, z, Seq("o_custkey", "o_totalprice"),
        keyCol = "o_orderkey", targetBytes = 24L * 1024) // ~16 files sf0.01
      println(s"[skip-fixture] $z: " +
        s"${Versioned.dataFilePaths(spark, s"$z/v=2").size} files (v2)")
    }

    // 3. p_name-clustered parts + token-Bloom sidecars
    if (wanted("parts_tb")) {
      val tb = s"$base/parts_tb"
      clear(tb)
      val parts = spark.read.parquet(s"$sfDir/part.parquet")
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_retailprice")
      // name-clustered layout through the public publish (the clustering
      // survives the write: publish writes the frame's own partitioning),
      // then the token sidecars over the landed files
      Versioned.publish(
        parts.repartitionByRange(16, col("p_name"))
          .sortWithinPartitions(col("p_name")), tb)
      TokenBloom.index(spark, s"$tb/v=1", "p_name")
      // string min/max manifest: the name-clustered layout's planner leg
      // (equality / LIKE-prefix predicates prune through SkipScan)
      graft.lake.StrStats.build(spark, s"$tb/v=1", Seq("p_name", "p_brand"))
      println(s"[skip-fixture] $tb: " +
        s"${Versioned.dataFilePaths(spark, s"$tb/v=1").size} files, " +
        s"tokmeta=${TokenBloom.meta(spark, s"$tb/v=1")}")
    }

    // 4b. HASH-distributed + `_bloom` sidecars ONLY (no useful
    //     intervals): the layout where min/max admits every file and
    //     the Bloom sidecar is the one skipping dimension — point
    //     predicates through plain registered-table SQL must prune via
    //     SkipScan's Bloom admission (lake_skip_bloom_sql).
    if (wanted("orders_hb")) {
      val hb = s"$base/orders_hb"
      clear(hb)
      Forget.publishIndexed(orders, hb, nFiles = 16, keyCol = "o_orderkey")
      println(s"[skip-fixture] $hb: " +
        s"${Versioned.dataFilePaths(spark, s"$hb/v=1").size} files, " +
        s"bloomKey=${BloomIndex.keyOf(spark, s"$hb/v=1")}")
    }

    // 4. OVERLAY: range-clustered v1, then ONE zero-copy CDC merge — v2
    //    is `_ref` + deletion vector (the updated keys' old rows + the
    //    deleted keys) + appended fresh rows + landing-minted `_stats`
    //    over the appends. The layout a production table is actually in
    //    after its first DV delete / landing; lake_skip_overlay proves
    //    plan-time pruning survives it.
    if (wanted("orders_sd")) {
      val sd = s"$base/orders_sd"
      clear(sd)
      Forget.publishClustered(orders, sd, nFiles = 16,
        keyCol = "o_orderkey", stats = true)
      import org.apache.spark.sql.functions.lit
      val ups = orders
        .filter(col("o_orderkey").isin(5100L, 5200L))
        .withColumn("o_orderpriority", lit("9-UPDATED"))
        .withColumn("op", lit("U"))
      val dels = orders
        .filter(col("o_orderkey").isin(5150L, 5250L))
        .withColumn("op", lit("D"))
      graft.lake.Dv.applyCdc(spark, sd, "o_orderkey",
        ups.unionByName(dels), opCol = "op")
      val own = Versioned.dataFilePaths(spark, s"$sd/v=2").size
      println(s"[skip-fixture] $sd: v2 = ref + " +
        s"${graft.lake.Dv.deletedRows(spark, sd, 2)} DV rows + " +
        s"$own appended file(s), ownStats=" +
        s"${StatsIndex.exists(spark, s"$sd/v=2")}")
    }

    // 5. HIVE-PARTITIONED tree (the reference loader's own bronze shape,
    //    year-grained here) with WITHIN-partition key clustering + the
    //    partition-relative `_stats` manifest: lake_skip_partitioned
    //    proves directory pruning and manifest skipping compose in one
    //    plan (a year + key-range predicate reads ~1 file of ~50).
    if (wanted("orders_pt")) {
      val pt = s"$base/orders_pt"
      clear(pt)
      // o_orderdate stays as a DATA column beside the derived oy dir —
      // the DuckDB oracle answers from raw bytes via year(o_orderdate),
      // proving the partition projection without trusting dir names
      val o2 = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderpriority"), col("o_orderdate"),
          org.apache.spark.sql.functions.date_format(col("o_orderdate"),
            "yyyy").as("oy"))
      // (oy, key)-major range layout: each partition dir's files cover
      // contiguous key sub-ranges — the within-partition clustering the
      // manifest then describes
      o2.repartitionByRange(48, col("oy"), col("o_orderkey"))
        .sortWithinPartitions(col("oy"), col("o_orderkey"))
        .write.partitionBy("oy").parquet(pt)
      StatsIndex.buildPartitionedTree(spark, pt, "o_orderkey")
      val nf = graft.lake.SkipScan.scanPartitioned(spark, pt)
        .inputFiles.length
      println(s"[skip-fixture] $pt: $nf files across " +
        s"${new java.io.File(pt).list().count(_.startsWith("oy="))} " +
        s"partitions, stats=${StatsIndex.exists(spark, pt)}")
    }

    // 6. date-bearing versioned table + an EXPRESSION-KEY materialized
    //    view (GROUP BY year(o_orderdate)) — the MV rewrite's bucket-
    //    grain leg (lake_mv_rewrite_expr_key): the reference's declared
    //    dashboards are month/day grain, and this is the committed MV
    //    that answers them without touching the base.
    if (wanted("orders_dt")) {
      val dt = s"$base/orders_dt"
      val dtMv = s"$base/orders_dt_mv"
      clear(dt); clear(dtMv)
      val od = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_orderpriority", "o_orderdate")
      Forget.publishClustered(od, dt, nFiles = 8, keyCol = "o_orderkey",
        stats = true)
      graft.SqlDml.register(spark, "odt_fixture", dt, "o_orderkey")
      graft.Sql.execute(spark,
        s"""CREATE MATERIALIZED VIEW odt_fixture_mv LOCATION '$dtMv' AS
           |SELECT year(o_orderdate), count(*), sum(o_custkey)
           |FROM odt_fixture GROUP BY year(o_orderdate)""".stripMargin)
      println(s"[skip-fixture] $dt + $dtMv: mv rows = " +
        s"${Versioned.read(spark, dtMv).count()}")
    }

    // 7. JDBC fixture: a deterministic 200-key orders slice as ONE
    //    parquet file — the committed bytes BOTH sides of
    //    jdbc_pushdown_extract share (the Spark arm loads them into an
    //    embedded Derby table and reads back over JDBC; the oracle
    //    reads the parquet directly, no JDBC code in its loop).
    if (wanted("orders_jdbc")) {
      val jd = s"${new java.io.File(base).getParent}/jdbc"
      clear(s"$jd/orders_jdbc.parquet")
      spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice",
          "o_orderpriority")
        .filter(col("o_orderkey") < 200L)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$jd/orders_jdbc.parquet")
      println(s"[skip-fixture] $jd/orders_jdbc.parquet written")
    }

    // 8. tiny parquet-backed year dimension over the SAME year span as
    //    orders_pt (derived from the orders bytes, one 'focus' year):
    //    the build side of lake_skip_dpp — its runtime-only filter
    //    (`tag = 'focus'`) is what dynamic partition pruning turns into
    //    an executed-time partition filter on the fact tree. A
    //    LocalRelation dim would be constant-folded before the DPP rule
    //    sees the join; a file-backed dim is also the honest shape (a
    //    calendar/dim table at 100 TB is a table, not a literal).
    if (wanted("years_dim")) {
      val yd = s"$base/years_dim"
      clear(yd)
      import org.apache.spark.sql.functions.{date_format, when, lit}
      spark.read.parquet(s"$sfDir/orders.parquet")
        .select(date_format(col("o_orderdate"), "yyyy").as("oy"))
        .distinct()
        .withColumn("tag",
          when(col("oy") === "1997", lit("focus")).otherwise(lit("other")))
        .coalesce(1)
        .write.parquet(yd)
      println(s"[skip-fixture] $yd: " +
        s"${spark.read.parquet(yd).count()} year rows")
    }

    // 9. fact + dim + an fk-grained MV — the JOIN leg of the MV
    //    rewrite (lake_mv_rewrite_join): revenue-by-segment is the
    //    reference's declared dashboard shape, and the rollup answers
    //    from the customer-grained MV joined to the dim instead of
    //    scanning the fact. Build with an ABSOLUTE fixtures path so
    //    the MV spec's source pointer resolves from any cwd.
    if (wanted("orders_cd")) {
      val cd = s"$base/orders_cd"
      val cm = s"$base/cust_dim"
      val cdMv = s"$base/orders_cd_mv"
      clear(cd); clear(cm); clear(cdMv)
      val of = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice",
          "o_orderpriority", "o_orderdate")
      Forget.publishClustered(of, cd, nFiles = 8, keyCol = "o_orderkey",
        stats = true)
      val cdim = spark.read.parquet(s"$sfDir/customer.parquet")
        .select("c_custkey", "c_mktsegment", "c_nationkey")
      Forget.publishClustered(cdim, cm, nFiles = 2,
        keyCol = "c_custkey", stats = true)
      // the snowflake hop: customer -> nation (lake_mv_rewrite_snowflake)
      val nd = s"$base/nation_dim"
      clear(nd)
      Forget.publishClustered(
        spark.read.parquet(s"$sfDir/nation.parquet")
          .select("n_nationkey", "n_name", "n_regionkey"),
        nd, nFiles = 1, keyCol = "n_nationkey", stats = true)
      graft.SqlDml.register(spark, "ocd_fixture", cd, "o_orderkey")
      // customer × year grain — one MV answers both the segment rollup
      // and the segment × year dashboard slice. SUM/AVG legs on the
      // integral o_orderkey (o_totalprice is a DOUBLE in the
      // testdata — the rewrite's exactness gate refuses double sums by
      // design); min/max carry the double fine
      graft.Sql.execute(spark,
        s"""CREATE MATERIALIZED VIEW ocd_fixture_mv LOCATION '$cdMv' AS
           |SELECT o_custkey, year(o_orderdate), count(*),
           |sum(o_orderkey), min(o_totalprice), max(o_totalprice)
           |FROM ocd_fixture
           |GROUP BY o_custkey, year(o_orderdate)""".stripMargin)
      println(s"[skip-fixture] $cd + $cm + $cdMv: mv rows = " +
        s"${Versioned.read(spark, cdMv).count()}")
    }

    spark.stop()
  }
}
