package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.{Cdf, Versioned}

/**
 * Versioned-lake READ paths over the committed DML fixture
 * (`fixtures/lake/orders_lk`, built once by
 * [[graft.tools.BuildLakeFixture]] through the SQL surface: CTAS → MERGE
 * → zero-copy DELETE → metadata-only ADD COLUMNS → DV UPDATE → RENAME
 * COLUMN via column mapping → DV UPDATE through the renamed schema →
 * RESTORE)
 * — the cross-engine hash gate for the lake machinery itself. The
 * reference's loader rewrites whole day partitions in place
 * (/root/reference/src/pipeline/loaders/s3_loader.py:23-58, a
 * put-overwrite model with no history); this lake keeps every version
 * readable, and these queries prove the LAYOUT is engine-open: each
 * Spark arm exercises one lake read mechanism (restore-ref resolution,
 * deletion-vector anti-join, schema-overlay null-fill + append union,
 * column-mapping rename resolution, change-feed assembly) while its
 * DuckDB oracle reconstructs the same
 * snapshot from the RAW committed bytes — plain parquet plus the `_dv`
 * and `_changes` sidecars — with no graft code in the loop.
 *
 * Scale posture: all four reads are metadata-bounded on top of the data
 * scan. The restore/live read is one pointer resolve + one parquet scan;
 * the DV read adds ONE broadcast anti-join on (file_name, row_index) —
 * the vector is deletion-sized, never table-sized; the overlay read is
 * the same scan under an explicit schema (null-fill happens at the
 * parquet reader, no compute); the feed read scans only changeset-sized
 * sidecars. None of them rewrites or shuffles the table — which is the
 * whole argument for DV deletes and metadata-only evolution at 100 TB.
 */
object LakeCatalog extends Family {

  /** The committed fixture table path — ABSOLUTE, because the fixture's
    * `_ref` pointers (written by its one-shot build) are absolute and the
    * oracle SQL must name the same location regardless of cwd. */
  private def fix(): String = Fixtures.abs("fixtures/lake/orders_lk")

  private val cols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderpriority")
  private val colsSql = cols.mkString(", ")

  private def ordered(df: DataFrame, extra: String*): DataFrame =
    df.select((cols ++ extra).map(col): _*).orderBy(col("o_orderkey"))

  // ------------------------------------------------------------------
  // LIVE read through a zero-copy RESTORE: the live version (v6) is a
  // `_ref` to v2's data dir — the reader resolves the pointer and scans
  // the shared files. The oracle reads v2's parquet directly: if the
  // ref resolution is right, the bytes are THE SAME FILES.
  private val live = Q(
    "lake_live_restored",
    Some(s"""
      SELECT $colsSql
      FROM read_parquet('${fix()}/v=2/*.parquet', hive_partitioning=false)
      ORDER BY o_orderkey
    """)) { (spark, _) =>
    ordered(Versioned.read(spark, fix()))
  }

  // ------------------------------------------------------------------
  // TIME TRAVEL to the deletion-vector version (v3): v2's files minus
  // the `_dv` (file, row_index) pairs, applied as a broadcast anti-join
  // on the parquet metadata columns — no file was rewritten by the
  // DELETE. The oracle replays the exact same subtraction from the raw
  // sidecar: parse_filename + file_row_number ANTI JOIN the vector.
  private val asofDv = Q(
    "lake_time_travel_dv",
    Some(s"""
      WITH base AS (
        SELECT $colsSql, parse_filename(filename) AS f,
               file_row_number AS ri
        FROM read_parquet('${fix()}/v=2/*.parquet', filename=true,
                          file_row_number=true, hive_partitioning=false)),
      dv AS (
        SELECT file, row_index
        FROM read_parquet('${fix()}/v=3/_dv/*.parquet',
                          hive_partitioning=false))
      SELECT $colsSql
      FROM base ANTI JOIN dv ON base.f = dv.file AND base.ri = dv.row_index
      ORDER BY o_orderkey
    """)) { (spark, _) =>
    ordered(Versioned.readVersion(spark, fix(), 3))
  }

  // ------------------------------------------------------------------
  // TIME TRAVEL to the evolved + DV-merged version (v5): the overlay
  // schema adds o_note (null-filled on base rows by parquet
  // schema-on-read), the UPDATE's rows live as appends INSIDE v=5, and
  // the accumulated vector tombstones both the v3 deletes and the
  // updated rows' old copies. The oracle rebuilds all three mechanisms
  // from raw bytes: NULL-cast column + anti-join + UNION ALL.
  private val asofEvolved = Q(
    "lake_time_travel_evolved",
    Some(s"""
      WITH base AS (
        SELECT $colsSql, CAST(NULL AS VARCHAR) AS o_note,
               parse_filename(filename) AS f, file_row_number AS ri
        FROM read_parquet('${fix()}/v=2/*.parquet', filename=true,
                          file_row_number=true, hive_partitioning=false)),
      dv AS (
        SELECT file, row_index
        FROM read_parquet('${fix()}/v=5/_dv/*.parquet',
                          hive_partitioning=false)),
      kept AS (
        SELECT $colsSql, o_note
        FROM base ANTI JOIN dv
          ON base.f = dv.file AND base.ri = dv.row_index),
      app AS (
        SELECT $colsSql, o_note
        FROM read_parquet('${fix()}/v=5/part-*.parquet',
                          hive_partitioning=false))
      SELECT * FROM kept UNION ALL SELECT * FROM app
      ORDER BY o_orderkey
    """)) { (spark, _) =>
    ordered(Versioned.readVersion(spark, fix(), 5), "o_note")
  }

  // ------------------------------------------------------------------
  // TIME TRAVEL through a COLUMN-MAPPING rename (v7): the marker spells
  // the logical schema (o_priority), the mapping resolves it to the
  // untouched PHYSICAL name (o_orderpriority) in every file — base AND
  // the post-rename DV-merge appends alike — on top of the accumulated
  // vector and the o_note overlay. The oracle reads the raw bytes under
  // the physical name and applies the rename as a plain alias: if the
  // mapping resolution is right, the two are the same projection.
  private val asofRenamed = Q(
    "lake_time_travel_renamed",
    Some(s"""
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderpriority AS o_priority,
               CAST(NULL AS VARCHAR) AS o_note,
               parse_filename(filename) AS f, file_row_number AS ri
        FROM read_parquet('${fix()}/v=2/*.parquet', filename=true,
                          file_row_number=true, hive_partitioning=false)),
      dv AS (
        SELECT file, row_index
        FROM read_parquet('${fix()}/v=7/_dv/*.parquet',
                          hive_partitioning=false)),
      kept AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_priority, o_note
        FROM base ANTI JOIN dv
          ON base.f = dv.file AND base.ri = dv.row_index),
      app AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderpriority AS o_priority, o_note
        FROM read_parquet('${fix()}/v=7/part-*.parquet',
                          hive_partitioning=false))
      SELECT * FROM kept UNION ALL SELECT * FROM app
      ORDER BY o_orderkey
    """)) { (spark, _) =>
    Versioned.readVersion(spark, fix(), 7)
      .select(Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_priority", "o_note").map(col): _*)
      .orderBy(col("o_orderkey"))
  }

  // ------------------------------------------------------------------
  // CHANGE FEED assembly across the DML span (versions 2..5): the MERGE's
  // U rows, the DELETE's key-only D rows, the evolution's feed entry
  // bridging to zero rows (its S poison is streaming-only metadata), and
  // the DV UPDATE's U rows — pre-evolution rows null-fill o_note via
  // unionByName. The oracle unions the raw `_changes` sidecars BY NAME
  // and applies the same S filter.
  private val changes = Q(
    "lake_changes_feed",
    Some(s"""
      WITH ch AS (
        SELECT *, CAST(2 AS BIGINT) AS _version
        FROM read_parquet('${fix()}/v=2/_changes/*.parquet',
                          hive_partitioning=false)
        UNION ALL BY NAME
        SELECT *, CAST(3 AS BIGINT) AS _version
        FROM read_parquet('${fix()}/v=3/_changes/*.parquet',
                          hive_partitioning=false)
        UNION ALL BY NAME
        SELECT *, CAST(4 AS BIGINT) AS _version
        FROM read_parquet('${fix()}/v=4/_changes/*.parquet',
                          hive_partitioning=false)
        UNION ALL BY NAME
        SELECT *, CAST(5 AS BIGINT) AS _version
        FROM read_parquet('${fix()}/v=5/_changes/*.parquet',
                          hive_partitioning=false))
      SELECT $colsSql, o_note, _op, _version
      FROM ch WHERE _op <> 'S'
      ORDER BY _version, _op, o_orderkey
    """)) { (spark, _) =>
    Cdf.changesSince(spark, fix(), sinceV = 1, untilV = Some(5))
      .select((cols ++ Seq("o_note", "_op", "_version")).map(col): _*)
      .orderBy(col("_version"), col("_op"), col("o_orderkey"))
  }

  // ------------------------------------------------------------------
  // AUTOMATIC MV REWRITE, hash-gated end-to-end: the query registers
  // the fixture table + the COMMITTED materialized view, runs a plain
  // grouped SELECT through the SQL surface, and REQUIRES that the plan
  // scanned the MV's bytes (a silent fallback to the base would still
  // produce matching values — the require makes the CORRECTNESS row
  // prove the rewrite itself fired). The oracle recomputes the same
  // aggregates from the RAW live snapshot (v2, what the restore points
  // at), so one green row certifies MV build + rewrite mapping +
  // re-typing against first principles, cross-engine.
  private val mvRewrite = Q(
    "lake_mv_rewrite",
    Some(s"""
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(o_custkey) AS BIGINT) AS ck,
             min(o_totalprice) AS lo, max(o_totalprice) AS hi
      FROM read_parquet('${fix()}/v=2/*.parquet', hive_partitioning=false)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """)) { (spark, _) =>
    graft.SqlDml.register(spark, "olk_rw", fix(), "o_orderkey")
    graft.SqlDml.registerMv(spark, "olk_rw_mv",
      Fixtures.abs("fixtures/lake/orders_mv"))
    val df = graft.Sql.sql(spark,
      "SELECT o_orderstatus, count(*) AS n, sum(o_custkey) AS ck, " +
        "min(o_totalprice) AS lo, max(o_totalprice) AS hi " +
        "FROM olk_rw GROUP BY o_orderstatus ORDER BY o_orderstatus")
    require(df.inputFiles.nonEmpty &&
      df.inputFiles.forall(_.contains("orders_mv")),
      s"the MV rewrite did not fire: ${df.inputFiles.toSeq}")
    df
  }

  // ------------------------------------------------------------------
  // MV rewrite with a WHERE on a group column + AVG: the filter commutes
  // with the group grain (a group column is materialized verbatim), and
  // AVG derives as sum_c / cnt_c — the view's maintained NON-NULL count,
  // not n_rows, so a NULL-bearing column averages correctly. The require
  // again proves the rewrite FIRED; the oracle filters and averages the
  // raw live snapshot from first principles.
  private val mvRewriteWhere = Q(
    "lake_mv_rewrite_where",
    Some(s"""
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(o_custkey) AS BIGINT) AS ck,
             avg(o_custkey) AS avg_ck
      FROM read_parquet('${fix()}/v=2/*.parquet', hive_partitioning=false)
      WHERE o_orderstatus IN ('F', 'O')
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """)) { (spark, _) =>
    graft.SqlDml.register(spark, "olk_rww", fix(), "o_orderkey")
    graft.SqlDml.registerMv(spark, "olk_rww_mv",
      Fixtures.abs("fixtures/lake/orders_mv"))
    val df = graft.Sql.sql(spark,
      "SELECT o_orderstatus, count(*) AS n, sum(o_custkey) AS ck, " +
        "avg(o_custkey) AS avg_ck " +
        "FROM olk_rww WHERE o_orderstatus IN ('F', 'O') " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus")
    require(df.inputFiles.nonEmpty &&
      df.inputFiles.forall(_.contains("orders_mv")),
      s"the filtered MV rewrite did not fire: ${df.inputFiles.toSeq}")
    df
  }

  // ------------------------------------------------------------------
  // MV rewrite with HAVING over rewritable aggregates: the group filter
  // maps onto the MV's derived form (count(*) → sum(n_rows)) with
  // base-equal values by the exactness gates, so the kept-group set is
  // identical — here it drops the 'F' slice (4,933 orders < the 4,950
  // threshold). The require proves the rewrite FIRED; the oracle
  // filters groups from the raw live snapshot.
  private val mvRewriteHaving = Q(
    "lake_mv_rewrite_having",
    Some(s"""
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(o_custkey) AS BIGINT) AS ck
      FROM read_parquet('${fix()}/v=2/*.parquet', hive_partitioning=false)
      GROUP BY o_orderstatus
      HAVING count(*) > 4950
      ORDER BY o_orderstatus
    """)) { (spark, _) =>
    graft.SqlDml.register(spark, "olk_rwh", fix(), "o_orderkey")
    graft.SqlDml.registerMv(spark, "olk_rwh_mv",
      Fixtures.abs("fixtures/lake/orders_mv"))
    val df = graft.Sql.sql(spark,
      "SELECT o_orderstatus, count(*) AS n, sum(o_custkey) AS ck " +
        "FROM olk_rwh GROUP BY o_orderstatus HAVING count(*) > 4950 " +
        "ORDER BY o_orderstatus")
    require(df.inputFiles.nonEmpty &&
      df.inputFiles.forall(_.contains("orders_mv")),
      s"the HAVING MV rewrite did not fire: ${df.inputFiles.toSeq}")
    df
  }

  // ------------------------------------------------------------------
  // MV rewrite through an EXPRESSION group key: the committed
  // orders_dt_mv groups by year(o_orderdate) (the derived bucket
  // column the maintenance algebra materializes), and a plain
  // year()-grained SQL — the reference's declared dashboard grain —
  // answers from the year-count-sized MV instead of the base table.
  // The oracle recomputes the buckets from the raw committed parquet.
  private def dt(): String = Fixtures.abs("fixtures/lake/orders_dt")

  private val mvRewriteExprKey = Q(
    "lake_mv_rewrite_expr_key",
    Some(s"""
      SELECT year(o_orderdate) AS oy, count(*) AS n,
             CAST(sum(o_custkey) AS BIGINT) AS ck
      FROM read_parquet('${dt()}/v=1/part-*.parquet',
                        hive_partitioning=false)
      GROUP BY year(o_orderdate)
      ORDER BY oy
    """)) { (spark, _) =>
    graft.SqlDml.register(spark, "olk_dt", dt(), "o_orderkey")
    graft.SqlDml.registerMv(spark, "olk_dt_mv",
      Fixtures.abs("fixtures/lake/orders_dt_mv"))
    val df = graft.Sql.sql(spark,
      "SELECT year(o_orderdate) AS oy, count(*) AS n, " +
        "sum(o_custkey) AS ck FROM olk_dt " +
        "GROUP BY year(o_orderdate) ORDER BY oy")
    require(df.inputFiles.nonEmpty &&
      df.inputFiles.forall(_.contains("orders_dt_mv")),
      s"the expr-key MV rewrite did not fire: ${df.inputFiles.toSeq}")
    df
  }

  // ------------------------------------------------------------------
  // The dashboard slice: WHERE on the bucket EXPRESSION itself — the
  // filter maps onto the MV's derived storage column (a group column
  // like any other, so it commutes with the grain) and the one-year
  // answer comes from the 7-row MV, never the base. Oracle recomputes
  // the slice from raw committed bytes.
  private val mvRewriteExprWhere = Q(
    "lake_mv_rewrite_expr_where",
    Some(s"""
      SELECT year(o_orderdate) AS oy, count(*) AS n,
             CAST(sum(o_custkey) AS BIGINT) AS ck
      FROM read_parquet('${dt()}/v=1/part-*.parquet',
                        hive_partitioning=false)
      WHERE year(o_orderdate) = 1997
      GROUP BY year(o_orderdate)
      ORDER BY oy
    """)) { (spark, _) =>
    graft.SqlDml.register(spark, "olk_dtw", dt(), "o_orderkey")
    graft.SqlDml.registerMv(spark, "olk_dtw_mv",
      Fixtures.abs("fixtures/lake/orders_dt_mv"))
    val df = graft.Sql.sql(spark,
      "SELECT year(o_orderdate) AS oy, count(*) AS n, " +
        "sum(o_custkey) AS ck FROM olk_dtw " +
        "WHERE year(o_orderdate) = 1997 " +
        "GROUP BY year(o_orderdate) ORDER BY oy")
    require(df.inputFiles.nonEmpty &&
      df.inputFiles.forall(_.contains("orders_dt_mv")),
      s"the expr-WHERE MV rewrite did not fire: ${df.inputFiles.toSeq}")
    df
  }

  // ------------------------------------------------------------------
  // The JOIN leg: revenue-by-segment — the reference's declared
  // dashboard shape — rolled up through the fact⋈dim equi-join from
  // the customer-grained MV. The rewritten plan joins the 1000-row MV
  // to the 2-file dim; the require proves the FACT's bytes were never
  // opened. DuckDB recomputes the join + aggregation from ALL raw
  // parquet on both sides.
  private def cdf(): String = Fixtures.abs("fixtures/lake/orders_cd")
  private def cdm(): String = Fixtures.abs("fixtures/lake/cust_dim")

  private val mvRewriteJoin = Q(
    "lake_mv_rewrite_join",
    Some(s"""
      SELECT c_mktsegment, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS sk,
             avg(o_orderkey) AS ak,
             min(o_totalprice) AS lo, max(o_totalprice) AS hi
      FROM read_parquet('${cdf()}/v=1/part-*.parquet',
                        hive_partitioning=false) o
      JOIN read_parquet('${cdm()}/v=1/part-*.parquet',
                        hive_partitioning=false) c
        ON o.o_custkey = c.c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment
    """)) { (spark, _) =>
    graft.SqlDml.register(spark, "olk_cdj", cdf(), "o_orderkey")
    graft.SqlDml.register(spark, "olk_cdim", cdm(), "c_custkey")
    graft.SqlDml.registerMv(spark, "olk_cdj_mv",
      Fixtures.abs("fixtures/lake/orders_cd_mv"))
    val df = graft.Sql.sql(spark,
      "SELECT c_mktsegment, count(*) AS n, sum(o_orderkey) AS sk, " +
        "avg(o_orderkey) AS ak, min(o_totalprice) AS lo, " +
        "max(o_totalprice) AS hi " +
        "FROM olk_cdj JOIN olk_cdim ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment")
    require(df.inputFiles.nonEmpty &&
      !df.inputFiles.exists(_.contains("orders_cd/v=")) &&
      df.inputFiles.exists(_.contains("orders_cd_mv")),
      s"the join MV rewrite did not fire: ${df.inputFiles.toSeq}")
    df
  }

  // ------------------------------------------------------------------
  // ROLLUP through the rewrite: the dashboard's totals row — leaves +
  // grand total re-aggregate the SAME MV partials per grain, so the
  // wrapper carries through and the 7-row view answers the whole
  // hierarchy. Spark sorts NULLS FIRST by default; the oracle spells
  // it so row order agrees.
  private val mvRewriteRollup = Q(
    "lake_mv_rewrite_rollup",
    Some(s"""
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(o_custkey) AS BIGINT) AS ck
      FROM read_parquet('${fix()}/v=2/*.parquet', hive_partitioning=false)
      GROUP BY ROLLUP(o_orderstatus)
      ORDER BY o_orderstatus NULLS FIRST
    """)) { (spark, _) =>
    graft.SqlDml.register(spark, "olk_rwru", fix(), "o_orderkey")
    graft.SqlDml.registerMv(spark, "olk_rwru_mv",
      Fixtures.abs("fixtures/lake/orders_mv"))
    val df = graft.Sql.sql(spark,
      "SELECT o_orderstatus, count(*) AS n, sum(o_custkey) AS ck " +
        "FROM olk_rwru GROUP BY ROLLUP(o_orderstatus) " +
        "ORDER BY o_orderstatus")
    require(df.inputFiles.nonEmpty &&
      df.inputFiles.forall(_.contains("orders_mv")),
      s"the ROLLUP rewrite did not fire: ${df.inputFiles.toSeq}")
    df
  }

  // ------------------------------------------------------------------
  // The full dashboard grain: segment × year, sliced to two years in
  // WHERE — bucket-expression keys compose with the join rollup (the
  // MV's customer × year grain re-aggregates to segment × year through
  // the dim join; the year filter lands on the MV's derived storage
  // column). Still never the fact's bytes.
  private val mvRewriteJoinGrain = Q(
    "lake_mv_rewrite_join_grain",
    Some(s"""
      SELECT c_mktsegment, year(o_orderdate) AS oy, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS sk
      FROM read_parquet('${cdf()}/v=1/part-*.parquet',
                        hive_partitioning=false) o
      JOIN read_parquet('${cdm()}/v=1/part-*.parquet',
                        hive_partitioning=false) c
        ON o.o_custkey = c.c_custkey
      WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY c_mktsegment, year(o_orderdate)
      ORDER BY c_mktsegment, oy
    """)) { (spark, _) =>
    graft.SqlDml.register(spark, "olk_cdj", cdf(), "o_orderkey")
    graft.SqlDml.register(spark, "olk_cdim", cdm(), "c_custkey")
    graft.SqlDml.registerMv(spark, "olk_cdj_mv",
      Fixtures.abs("fixtures/lake/orders_cd_mv"))
    val df = graft.Sql.sql(spark,
      "SELECT c_mktsegment, year(o_orderdate) AS oy, count(*) AS n, " +
        "sum(o_orderkey) AS sk " +
        "FROM olk_cdj JOIN olk_cdim ON o_custkey = c_custkey " +
        "WHERE year(o_orderdate) IN (1996, 1997) " +
        "GROUP BY c_mktsegment, year(o_orderdate) " +
        "ORDER BY c_mktsegment, oy")
    require(df.inputFiles.nonEmpty &&
      !df.inputFiles.exists(_.contains("orders_cd/v=")) &&
      df.inputFiles.exists(_.contains("orders_cd_mv")),
      s"the grain join rewrite did not fire: ${df.inputFiles.toSeq}")
    df
  }

  // ------------------------------------------------------------------
  // The SNOWFLAKE chain: orders ⋈ customer ⋈ nation rolled up to
  // nation grain — the dim-to-dim hop joins at dimension scale either
  // way, and the commutation holds N-ary because every ON touches the
  // fact only through MV group columns. The require again proves the
  // fact's bytes stayed closed.
  private def ndm(): String = Fixtures.abs("fixtures/lake/nation_dim")

  private val mvRewriteSnowflake = Q(
    "lake_mv_rewrite_snowflake",
    Some(s"""
      SELECT n_name, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS sk
      FROM read_parquet('${cdf()}/v=1/part-*.parquet',
                        hive_partitioning=false) o
      JOIN read_parquet('${cdm()}/v=1/part-*.parquet',
                        hive_partitioning=false) c
        ON o.o_custkey = c.c_custkey
      JOIN read_parquet('${ndm()}/v=1/part-*.parquet',
                        hive_partitioning=false) nt
        ON c.c_nationkey = nt.n_nationkey
      GROUP BY n_name
      ORDER BY n_name
    """)) { (spark, _) =>
    graft.SqlDml.register(spark, "olk_cdj", cdf(), "o_orderkey")
    graft.SqlDml.register(spark, "olk_cdim", cdm(), "c_custkey")
    graft.SqlDml.register(spark, "olk_nd", ndm(), "n_nationkey")
    graft.SqlDml.registerMv(spark, "olk_cdj_mv",
      Fixtures.abs("fixtures/lake/orders_cd_mv"))
    val df = graft.Sql.sql(spark,
      "SELECT n_name, count(*) AS n, sum(o_orderkey) AS sk " +
        "FROM olk_cdj JOIN olk_cdim ON o_custkey = c_custkey " +
        "JOIN olk_nd ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name")
    require(df.inputFiles.nonEmpty &&
      !df.inputFiles.exists(_.contains("orders_cd/v=")) &&
      df.inputFiles.exists(_.contains("orders_cd_mv")),
      s"the snowflake rewrite did not fire: ${df.inputFiles.toSeq}")
    df
  }

  def specs: Seq[Q] =
    Seq(live, asofDv, asofEvolved, asofRenamed, changes, mvRewrite,
      mvRewriteWhere, mvRewriteHaving, mvRewriteExprKey,
      mvRewriteExprWhere, mvRewriteRollup, mvRewriteJoin,
      mvRewriteJoinGrain, mvRewriteSnowflake)
}
