package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.lake.{BloomIndex, StatsIndex, TokenBloom, ZOrder}

/**
 * DATA-SKIPPING reads over the committed clustered + indexed fixtures
 * (`fixtures/lake/{orders_rc,orders_z,parts_tb}`, built once by
 * [[graft.tools.BuildSkipFixture]]) — the cross-engine hash gate for
 * file pruning itself. Each Spark arm answers a selective predicate
 * through one pruned read path and `require`s the plan opened AT MOST a
 * handful of the fixture's files (`df.inputFiles` — a silent fallback to
 * the full scan would still match values, the require makes the green
 * row prove pruning FIRED); the DuckDB oracle computes the same answer
 * from ALL the raw parquet with no graft code in the loop, so one green
 * row certifies pruned == full from first principles.
 *
 * Reference behavior this generalizes: the reference's only pruning is
 * the day-partition directory layout its loader writes
 * (/root/reference/src/pipeline/loaders/s3_loader.py:23-58) — one
 * dimension, directory-grained. At 100 TB these are the within-partition
 * levers: a range probe on a clustered key reads ~2 files instead of the
 * partition (`_stats` manifest — one metadata read plans the scan, no
 * footer opens); a point probe reads ~1 (`_bloom` sidecars); a 2-column
 * box probe reads the files whose bounding box intersects (`_boxstats`,
 * the z-order manifest); a conjunctive keyword probe over a
 * name-clustered catalog reads the files whose token Blooms admit every
 * term. All four fall back to the full scan + filter on a stale or
 * missing manifest — advisory indexes degrade to slow, never to wrong.
 */
object LakeSkipping extends Family {

  // committed fixture table paths — ABSOLUTE, the form the oracle SQL
  // embeds (same contract as LakeCatalog.fix())
  private def rc(): String = Fixtures.abs("fixtures/lake/orders_rc") + "/v=1"
  private def zf(): String = Fixtures.abs("fixtures/lake/orders_z") + "/v=2"
  private def tb(): String = Fixtures.abs("fixtures/lake/parts_tb") + "/v=1"

  private val ocols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderpriority")
  private val ocolsSql = ocols.mkString(", ")

  private def pruned(df: DataFrame, atMost: Int, total: Int,
                     what: String): DataFrame = {
    val n = df.inputFiles.length
    require(n <= atMost && n < total,
      s"$what did not prune: plan reads $n of $total fixture files " +
        s"(expected <= $atMost) — ${df.inputFiles.toSeq}")
    df
  }

  // ------------------------------------------------------------------
  // RANGE probe through the `_stats` manifest on the range-clustered
  // layout: 500 of 15000 keys -> 2 of 16 files, planned from ONE
  // metadata-sized manifest read (no data-file footer opens).
  private val statsRange = Q(
    "lake_skip_stats_range",
    Some(s"""
      SELECT $ocolsSql
      FROM read_parquet('${rc()}/part-*.parquet', hive_partitioning=false)
      WHERE o_orderkey BETWEEN 5000 AND 5500
      ORDER BY o_orderkey
    """)) { (spark, _) =>
    pruned(StatsIndex.readRange(spark, rc(), "o_orderkey", 5000L, 5500L),
      atMost = 2, total = 16, what = "StatsIndex.readRange")
      .select(ocols.map(col): _*).orderBy(col("o_orderkey"))
  }

  // ------------------------------------------------------------------
  // POINT probe through the per-file `_bloom` sidecars on the same
  // layout: 1 admitted file (+ false-positive slack at fpp 0.01).
  private val bloomPoint = Q(
    "lake_skip_bloom_point",
    Some(s"""
      SELECT $ocolsSql
      FROM read_parquet('${rc()}/part-*.parquet', hive_partitioning=false)
      WHERE o_orderkey = 7777
      ORDER BY o_orderkey
    """)) { (spark, _) =>
    pruned(BloomIndex.lookup(spark, rc(), "o_orderkey", 7777L),
      atMost = 3, total = 16, what = "BloomIndex.lookup")
      .select(ocols.map(col): _*).orderBy(col("o_orderkey"))
  }

  // ------------------------------------------------------------------
  // BOX probe through the `_boxstats` manifest on the z-ordered layout:
  // a ~1/5 x ~1/5 box over (o_custkey, o_totalprice) intersects 2 of the
  // 8 files' bounding boxes — the multi-column skipping one-key range
  // clustering cannot give (a second-column predicate there admits
  // every file).
  private val zorderBox = Q(
    "lake_skip_zorder_box",
    Some(s"""
      SELECT $ocolsSql
      FROM read_parquet('${zf()}/part-*.parquet', hive_partitioning=false)
      WHERE o_custkey BETWEEN 1100 AND 1400
        AND o_totalprice BETWEEN 50000 AND 150000
      ORDER BY o_orderkey
    """)) { (spark, _) =>
    pruned(ZOrder.readBox(spark, zf(),
        Seq(("o_custkey", 1100L, 1400L), ("o_totalprice", 50000L, 150000L))),
      atMost = 3, total = 8, what = "ZOrder.readBox")
      .select(ocols.map(col): _*).orderBy(col("o_orderkey"))
  }

  // ------------------------------------------------------------------
  // CONJUNCTIVE KEYWORD probe through the `_tokbloom` sidecars on the
  // name-clustered parts catalog: only the files whose name range
  // carries BOTH terms admit (2 of 16 exactly; fpp slack to 4). The
  // residual re-applies exact token membership, so pruned == full
  // bitwise — which is precisely what the oracle checks from raw bytes.
  private val tokenBloom = Q(
    "lake_skip_token_bloom",
    Some(s"""
      SELECT p_partkey, p_name, p_brand, p_type, p_retailprice
      FROM read_parquet('${tb()}/part-*.parquet', hive_partitioning=false)
      WHERE list_contains(string_split(trim(regexp_replace(regexp_replace(
              lower(p_name), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' '),
            'red')
        AND list_contains(string_split(trim(regexp_replace(regexp_replace(
              lower(p_name), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' '),
            'widget')
      ORDER BY p_partkey
    """)) { (spark, _) =>
    pruned(TokenBloom.search(spark, tb(), "p_name", Seq("red", "widget")),
      atMost = 4, total = 16, what = "TokenBloom.search")
      .select(Seq("p_partkey", "p_name", "p_brand", "p_type",
        "p_retailprice").map(col): _*)
      .orderBy(col("p_partkey"))
  }

  // a PLANNER-pruned frame: materialize (populates the scan's numFiles
  // metric), require the plan opened few files, hand it back
  private def plannerPruned(df: DataFrame, atMost: Long, total: Long,
                            what: String): DataFrame = {
    // persist so the probe materialization ALSO serves the harness's own
    // consumption of the returned frame (hash dump / bench) — without it
    // every planner-pruned cell would execute twice and the bench cell
    // would time double the real query. Fixture-sized: a few hundred rows
    // stay cached for the session.
    df.persist()
    df.collect()
    val n = graft.lake.SkipScan.scannedFileCount(df)
    require(n <= atMost && n < total,
      s"$what did not prune at planning: scan read $n of $total files " +
        s"(expected <= $atMost)")
    df
  }

  // ------------------------------------------------------------------
  // PLAN-TIME skipping (SkipScan.scan — the manifest-backed FileIndex):
  // the query is a PLAIN filter, no special read API; the relation's
  // FileIndex evaluates Catalyst's own pushed-down data filters against
  // the `_stats` manifest (self-named via `_stats/_key`) and admits 2 of
  // 16 files. df.inputFiles reports the pre-pruning listing, so the
  // require reads the executed scan's numFiles metric instead.
  private val plannerRange = Q(
    "lake_skip_planner_range",
    Some(s"""
      SELECT $ocolsSql
      FROM read_parquet('${rc()}/part-*.parquet', hive_partitioning=false)
      WHERE o_orderkey BETWEEN 9100 AND 9700
      ORDER BY o_orderkey
    """)) { (spark, _) =>
    import org.apache.spark.sql.functions.col
    plannerPruned(
      graft.lake.SkipScan.scan(spark, rc())
        .filter(col("o_orderkey") >= 9100L && col("o_orderkey") <= 9700L)
        .select(ocols.map(col): _*).orderBy(col("o_orderkey")),
      atMost = 2, total = 16, what = "SkipScan range")
  }

  // ------------------------------------------------------------------
  // PLAN-TIME 2-column box over the z-ordered layout: the `_boxstats`
  // manifest is self-describing, so the scan needs no column hints at
  // all — the plain conjunctive filter admits 3 of 8 files.
  private val plannerBox = Q(
    "lake_skip_planner_box",
    Some(s"""
      SELECT $ocolsSql
      FROM read_parquet('${zf()}/part-*.parquet', hive_partitioning=false)
      WHERE o_custkey BETWEEN 200 AND 500
        AND o_totalprice BETWEEN 300000 AND 360000
      ORDER BY o_orderkey
    """)) { (spark, _) =>
    import org.apache.spark.sql.functions.col
    plannerPruned(
      graft.lake.SkipScan.scan(spark, zf())
        .filter(col("o_custkey") >= 200L && col("o_custkey") <= 500L &&
          col("o_totalprice") >= 300000L && col("o_totalprice") <= 360000L)
        .select(ocols.map(col): _*).orderBy(col("o_orderkey")),
      atMost = 4, total = 8, what = "SkipScan box")
  }

  // ------------------------------------------------------------------
  // The WIRED surface end-to-end: a registered lake table + plain
  // ad-hoc SQL — Sql.registerTable binds the qualifying live version
  // through the manifest FileIndex, so the user's WHERE prunes with no
  // graft API in the query text at all. This is the full production
  // path a 100 TB dashboard query takes.
  private val sqlPushdown = Q(
    "lake_skip_sql_pushdown",
    Some(s"""
      SELECT $ocolsSql
      FROM read_parquet('${rc()}/part-*.parquet', hive_partitioning=false)
      WHERE o_orderkey BETWEEN 2000 AND 2400
      ORDER BY o_orderkey
    """)) { (spark, _) =>
    graft.Sql.registerTable(spark, "olk_skip_sql",
      Fixtures.abs("fixtures/lake/orders_rc"))
    plannerPruned(
      spark.sql("SELECT " + ocolsSql + " FROM olk_skip_sql " +
        "WHERE o_orderkey BETWEEN 2000 AND 2400 ORDER BY o_orderkey"),
      atMost = 2, total = 16, what = "registered-table SQL pushdown")
  }

  // ------------------------------------------------------------------
  // STRING skipping through the wired path: the `_strstats` per-file
  // min/max manifest turns a plain LIKE-prefix over the name-clustered
  // catalog into a 3-of-16-file read (the `LIKE 'red %'` interval
  // [“red ”, “red!”) in UTF8-binary order intersects only the files
  // whose name range covers “red”) — the registered table + ad-hoc SQL
  // again, no graft API in the query text.
  private val stringPrefix = Q(
    "lake_skip_string_prefix",
    Some(s"""
      SELECT p_partkey, p_name, p_brand, p_type, p_retailprice
      FROM read_parquet('${tb()}/part-*.parquet', hive_partitioning=false)
      WHERE p_name LIKE 'red %'
      ORDER BY p_partkey
    """)) { (spark, _) =>
    graft.Sql.registerTable(spark, "parts_skip_str",
      Fixtures.abs("fixtures/lake/parts_tb"))
    plannerPruned(
      spark.sql("SELECT p_partkey, p_name, p_brand, p_type, " +
        "p_retailprice FROM parts_skip_str WHERE p_name LIKE 'red %' " +
        "ORDER BY p_partkey"),
      atMost = 3, total = 16, what = "string-prefix pushdown")
  }

  // ------------------------------------------------------------------
  // OVERLAY skipping end-to-end: the registered live version of
  // orders_sd is a zero-copy CDC merge — `_ref` to the clustered base +
  // a deletion vector (updated keys' old rows + deleted keys) + one
  // appended file carrying the fresh rows under a landing-minted
  // `_stats`. The normal state of a production table after its first
  // DV delete/landing — and exactly where pruning used to silently
  // degrade to a full scan. The plain SQL range must (a) read the ONE
  // admitted base file + the append + the deletion-sized vector, (b)
  // hide the deleted keys, (c) show the updated rows once, post-update.
  // The oracle replays ref + anti-join + union from raw bytes.
  private def sd(): String = Fixtures.abs("fixtures/lake/orders_sd")

  private val overlay = Q(
    "lake_skip_overlay",
    Some(s"""
      WITH base AS (
        SELECT $ocolsSql, parse_filename(filename) AS f,
               file_row_number AS ri
        FROM read_parquet('${sd()}/v=1/part-*.parquet', filename=true,
                          file_row_number=true, hive_partitioning=false)),
      dv AS (
        SELECT file, row_index
        FROM read_parquet('${sd()}/v=2/_dv/*.parquet',
                          hive_partitioning=false)),
      kept AS (
        SELECT $ocolsSql
        FROM base ANTI JOIN dv
          ON base.f = dv.file AND base.ri = dv.row_index),
      app AS (
        SELECT $ocolsSql
        FROM read_parquet('${sd()}/v=2/part-*.parquet',
                          hive_partitioning=false)),
      snap AS (SELECT * FROM kept UNION ALL SELECT * FROM app)
      SELECT $ocolsSql FROM snap
      WHERE o_orderkey BETWEEN 5000 AND 5600
      ORDER BY o_orderkey
    """)) { (spark, _) =>
    graft.Sql.registerTable(spark, "olk_skip_ovl", sd())
    // 17 data files on disk (16 base + 1 append); the admitted set is 1
    // base file + the append, plus the deletion-sized `_dv` read the
    // anti-join costs — which IS the overlay's scale argument
    plannerPruned(
      spark.sql("SELECT " + ocolsSql + " FROM olk_skip_ovl " +
        "WHERE o_orderkey BETWEEN 5000 AND 5600 ORDER BY o_orderkey"),
      atMost = 4, total = 17, what = "overlay-version SQL pushdown")
  }

  // ------------------------------------------------------------------
  // BLOOM point admission through the wired path: orders_hb is
  // HASH-distributed on o_orderkey with `_bloom` sidecars and NO
  // interval manifest — min/max would admit every file (each spans the
  // full key domain), which is exactly the layout the per-file Bloom
  // exists for. A plain registered-table IN-probe must read only the
  // sidecar-admitted files (2 exact + fpp-0.01 slack) of 16.
  private def hb(): String = Fixtures.abs("fixtures/lake/orders_hb") + "/v=1"

  private val bloomSql = Q(
    "lake_skip_bloom_sql",
    Some(s"""
      SELECT $ocolsSql
      FROM read_parquet('${hb()}/part-*.parquet', hive_partitioning=false)
      WHERE o_orderkey IN (7777, 12345)
      ORDER BY o_orderkey
    """)) { (spark, _) =>
    graft.Sql.registerTable(spark, "olk_skip_hb",
      Fixtures.abs("fixtures/lake/orders_hb"))
    plannerPruned(
      spark.sql("SELECT " + ocolsSql + " FROM olk_skip_hb " +
        "WHERE o_orderkey IN (7777, 12345) ORDER BY o_orderkey"),
      atMost = 4, total = 16, what = "Bloom point pushdown")
  }

  // ------------------------------------------------------------------
  // PARTITION pruning × manifest skipping in ONE plan: orders_pt is the
  // reference loader's own bronze shape (Hive `oy=` year dirs) with
  // within-partition key clustering and a partition-relative `_stats`
  // manifest. The year + key-range predicate over the registered view
  // must read ~1 of ~50 files: the directory eliminates 6 of 7 years,
  // the manifest eliminates the year's other files. The oracle computes
  // the same answer from ALL raw parquet via the equivalent
  // year(o_orderdate) predicate (`oy` IS that projection by build).
  private def pt(): String = Fixtures.abs("fixtures/lake/orders_pt")

  private val partitioned = Q(
    "lake_skip_partitioned",
    Some(s"""
      SELECT $ocolsSql
      FROM read_parquet('${pt()}/oy=*/part-*.parquet',
                        hive_partitioning=false)
      WHERE year(o_orderdate) = 1997
        AND o_orderkey BETWEEN 8000 AND 8400
      ORDER BY o_orderkey
    """)) { (spark, _) =>
    graft.lake.SkipScan.scanPartitioned(spark, pt())
      .createOrReplaceTempView("olk_skip_pt")
    plannerPruned(
      spark.sql("SELECT " + ocolsSql + " FROM olk_skip_pt " +
        "WHERE oy = '1997' AND o_orderkey BETWEEN 8000 AND 8400 " +
        "ORDER BY o_orderkey"),
      atMost = 3, total = 54, what = "partition+manifest pushdown")
  }

  // ------------------------------------------------------------------
  // DYNAMIC partition pruning through the partitioned FileIndex: the
  // year slice is NOT in the query text — it lives in a parquet-backed
  // dim's rows (`tag = 'focus'`), so no static partition filter exists
  // at planning. Spark's DPP turns the broadcast dim into an
  // executed-time partition filter on the fact's PartitionDirectory
  // rows, and the manifest's per-file admission (the key range) has
  // already cut within each dir — the two prunings multiply at RUNTIME:
  // 1 fact file + the 1-file dim of the tree's 54. The reference's
  // bronze-shape analog: day-partitioned events joined to a small
  // calendar slice. DuckDB recomputes the join from ALL raw parquet.
  private def yd(): String = Fixtures.abs("fixtures/lake/years_dim")

  private val dpp = Q(
    "lake_skip_dpp",
    Some(s"""
      SELECT ${ocols.map("o." + _).mkString(", ")}
      FROM read_parquet('${pt()}/oy=*/part-*.parquet',
                        hive_partitioning=false) o
      JOIN read_parquet('${yd()}/part-*.parquet') d
        ON CAST(year(o.o_orderdate) AS VARCHAR) = d.oy
      WHERE d.tag = 'focus'
        AND o.o_orderkey BETWEEN 8000 AND 8400
      ORDER BY o.o_orderkey
    """)) { (spark, _) =>
    graft.lake.SkipScan.scanPartitioned(spark, pt())
      .createOrReplaceTempView("olk_dpp_fact")
    spark.read.parquet(yd()).createOrReplaceTempView("olk_dpp_dim")
    plannerPruned(
      spark.sql("SELECT " + ocols.map("f." + _).mkString(", ") +
        " FROM olk_dpp_fact f JOIN olk_dpp_dim d ON f.oy = d.oy " +
        "WHERE d.tag = 'focus' AND f.o_orderkey BETWEEN 8000 AND 8400 " +
        "ORDER BY f.o_orderkey"),
      atMost = 3, total = 55, what = "dynamic partition pruning")
  }

  def specs: Seq[Q] =
    Seq(statsRange, bloomPoint, zorderBox, tokenBloom, plannerRange,
      plannerBox, sqlPushdown, stringPrefix, overlay, bloomSql,
      partitioned, dpp)
}
