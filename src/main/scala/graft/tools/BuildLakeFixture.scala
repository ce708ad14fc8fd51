package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.{Conf, Sql}

/**
 * One-shot builder for the committed LAKE DML fixture
 * (`fixtures/lake/orders_lk` — a [[graft.lake.Versioned]] table directory)
 * consumed by the `lake_*` catalog queries and their DuckDB oracles.
 *
 * Rationale: the lake's DML machinery (OCC claim-commit, deletion
 * vectors, metadata-only schema evolution, zero-copy RESTORE, the change
 * feed) is spec-checked in ScalaTest, but the repo's correctness
 * discipline is the cross-engine hash gate — so the artifacts those
 * mechanisms produce must ALSO be readable by another engine from the raw
 * committed bytes. This tool builds one versioned table through the SQL
 * surface ([[Sql.executeScript]]) and the version dirs are committed;
 * the catalog queries then replay the lake READ paths (live restore-ref,
 * DV anti-join, schema-overlay null-fill, feed assembly) while the DuckDB
 * oracles reconstruct the same snapshots from the raw parquet + `_dv` +
 * `_changes` sidecars — proving the layout is engine-open, not private.
 *
 * Version history built (all statements via one SQL script, absolute
 * LOCATION so `_ref` pointers resolve from any working directory):
 *
 *   v1  CTAS               — full `orders` projection (feed: break)
 *   v2  MERGE              — +10% o_totalprice on o_orderkey % 100 = 7
 *                            (rewriting merge: v2 is a REAL data dir)
 *   v3  DELETE (zero-copy) — o_orderkey % 100 = 13 → `_ref` + `_dv`
 *   v4  ADD COLUMNS        — o_note STRING (metadata-only overlay)
 *   v5  UPDATE             — o_note on urgent %10=1 keys (DV merge:
 *                            appends + accumulated `_dv`)
 *   v6  RENAME COLUMN      — o_orderpriority → o_priority (column
 *                            mapping: `_column_mapping` overlay)
 *   v7  UPDATE             — o_note through the RENAMED schema (DV
 *                            merge: appends under PHYSICAL names)
 *   v8  RESTORE AS OF 2    — zero-copy rewind (live reads v2's dir)
 *
 * Usage: runMain graft.tools.BuildLakeFixture [sfDir] [outDir]
 */
object BuildLakeFixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.drop(1).headOption.getOrElse(
      new java.io.File("fixtures/lake/orders_lk").getAbsolutePath)
    val spark = Conf.local(SparkSession.builder(), 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val f = new Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!f.exists(new Path(outDir)) || f.delete(new Path(outDir), true),
      s"could not clear $outDir")

    Sql.register(spark, sfDir) // orders & friends as temp views
    val vs = Sql.executeScript(spark,
      s"""CREATE TABLE olk KEY o_orderkey LOCATION '$outDir' AS
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderpriority
         |  FROM orders;
         |MERGE INTO olk USING (
         |    SELECT o_orderkey,
         |           round(o_totalprice * 1.1, 2) AS new_price
         |    FROM orders WHERE o_orderkey % 100 = 7) s
         |  ON olk.o_orderkey = s.o_orderkey
         |  WHEN MATCHED THEN UPDATE SET o_totalprice = s.new_price;
         |DELETE FROM olk WHERE o_orderkey % 100 = 13;
         |ALTER TABLE olk ADD COLUMNS (o_note STRING);
         |UPDATE olk SET o_note = 'urgent-sample'
         |  WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 10 = 1;
         |ALTER TABLE olk RENAME COLUMN o_orderpriority TO o_priority;
         |UPDATE olk SET o_note = 'renamed-high'
         |  WHERE o_priority = '2-HIGH' AND o_orderkey % 10 = 3;
         |RESTORE TABLE olk TO VERSION AS OF 2
         |""".stripMargin,
      zeroCopyDelete = true)
    // a committed MATERIALIZED VIEW over the restored live snapshot
    // (synced at the live version by construction) — the automatic MV
    // rewrite's hash-gate leg: `lake_mv_rewrite` binds it and proves a
    // grouped SELECT is answered from THESE committed bytes
    val mvDir = new java.io.File(
      new java.io.File(outDir).getParentFile, "orders_mv").getAbsolutePath
    require(!f.exists(new Path(mvDir)) || f.delete(new Path(mvDir), true),
      s"could not clear $mvDir")
    Sql.execute(spark,
      s"""CREATE MATERIALIZED VIEW olk_mv LOCATION '$mvDir' AS
         |SELECT o_orderstatus, count(*), sum(o_custkey),
         |       min(o_totalprice), max(o_totalprice)
         |FROM olk GROUP BY o_orderstatus""".stripMargin)
    println(s"[lake-fixture] wrote $outDir (+$mvDir) from $sfDir; " +
      s"versions: $vs")
    spark.stop()
  }
}
