package graft

import java.nio.file.Files

import graft.lake.{Clone, CopyInto, Dv, Expect, Forget, Upsert, Versioned}

/**
 * The round-15 SQL DDL statements: `CREATE [OR REPLACE] TABLE ... AS`
 * (CTAS), `CREATE TABLE ... SHALLOW CLONE` (incl. `VERSION AS OF`),
 * `INSERT OVERWRITE`, `COPY INTO` (idempotent file-grain ingest), and
 * `OPTIMIZE ... ZORDER BY`. Each statement routes to the same lake
 * primitive its DataFrame twin uses — these specs pin the equivalences
 * and the loud rejects.
 */
class SqlDdlSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-sqlddl").toString

  private def seed(n: Int) =
    (0 until n).map(k => (k.toLong, s"v$k", k.toLong)).toDF("k", "v", "n")

  test("CTAS publishes v1, registers for DML; plain CREATE rejects a " +
      "second time; OR REPLACE restates") {
    val t = s"$root/ctas"
    seed(30).createOrReplaceTempView("ctas_src")
    val v = Sql.execute(spark,
      s"CREATE TABLE ctas_t KEY k LOCATION '$t' AS " +
        "SELECT k, v, n FROM ctas_src WHERE k < 20")
    assert(v == 1L)
    assert(spark.sql("SELECT count(*) FROM ctas_t").head().getLong(0) == 20L)
    // DML-addressable immediately
    Sql.execute(spark, "UPDATE ctas_t SET v = 'upd' WHERE k = 1")
    assert(spark.sql("SELECT v FROM ctas_t WHERE k = 1").head()
      .getString(0) == "upd")
    // plain CREATE on an existing table rejects
    val e = intercept[IllegalArgumentException] {
      Sql.execute(spark,
        s"CREATE TABLE ctas_t KEY k LOCATION '$t' AS SELECT * FROM ctas_src")
    }
    assert(e.getMessage.contains("already exists"))
    // OR REPLACE restates (wholesale replace; a new version, not v1)
    val v3 = Sql.execute(spark,
      s"CREATE OR REPLACE TABLE ctas_t KEY k LOCATION '$t' AS " +
        "SELECT k, v, n FROM ctas_src")
    assert(v3 == 3L)
    assert(spark.sql("SELECT count(*) FROM ctas_t").head().getLong(0) == 30L)
    // time travel across the replace still works
    assert(Versioned.readVersion(spark, t, 1L).count() == 20L)
  }

  test("CTAS KEY contract: duplicate and NULL keys reject, nothing " +
      "published") {
    val t = s"$root/ctas_dup"
    Seq((1L, "a"), (1L, "b")).toDF("k", "v")
      .createOrReplaceTempView("ctas_dup_src")
    val e = intercept[IllegalArgumentException] {
      Sql.execute(spark,
        s"CREATE TABLE ctas_dup LOCATION '$t' KEY k AS " +
          "SELECT * FROM ctas_dup_src")
    }
    // (KEY must precede LOCATION in the grammar — this also pins the
    // reject for the swapped order)
    assert(e.getMessage.contains("unsupported SQL DML"))
    val e2 = intercept[IllegalArgumentException] {
      Sql.execute(spark,
        s"CREATE TABLE ctas_dup KEY k LOCATION '$t' AS " +
          "SELECT * FROM ctas_dup_src")
    }
    assert(e2.getMessage.contains("duplicate"))
    assert(Versioned.currentVersion(spark, t).isEmpty)
  }

  test("SHALLOW CLONE via SQL: zero-copy, DML-ready, VERSION AS OF") {
    val t = s"$root/clone_src"
    Forget.publishIndexed(seed(50), t, 4, "k", stats = true)
    SqlDml.register(spark, "clsrc", t, "k")
    Sql.execute(spark, "UPDATE clsrc SET v = 'v2' WHERE k = 0") // v2
    val d1 = s"$root/clone_live"
    val d2 = s"$root/clone_v1"
    Sql.execute(spark,
      s"CREATE TABLE cl_live SHALLOW CLONE clsrc LOCATION '$d1'")
    Sql.execute(spark,
      s"CREATE TABLE cl_v1 SHALLOW CLONE clsrc VERSION AS OF 1 " +
        s"LOCATION '$d2'")
    assert(Versioned.isShallowRef(spark, d1, 1L))
    assert(Versioned.isShallowRef(spark, d2, 1L))
    assert(spark.sql("SELECT v FROM cl_live WHERE k = 0").head()
      .getString(0) == "v2")
    assert(spark.sql("SELECT v FROM cl_v1 WHERE k = 0").head()
      .getString(0) == "v0")
    // the clone inherits the source's key and is DML-addressable —
    // writes auto-route zero-copy (ref base), source untouched
    Sql.execute(spark, "DELETE FROM cl_live WHERE k = 1")
    assert(spark.sql("SELECT count(*) FROM cl_live").head()
      .getLong(0) == 49L)
    assert(spark.sql("SELECT count(*) FROM clsrc").head()
      .getLong(0) == 50L)
  }

  test("INSERT OVERWRITE == a gated full publish: restates content, " +
      "records the feed break, enforces key identity") {
    val t = s"$root/overwrite"
    Forget.publishIndexed(seed(20), t, 2, "k", stats = true)
    SqlDml.register(spark, "ow_t", t, "k")
    val v = Sql.execute(spark,
      "INSERT OVERWRITE ow_t VALUES (100, 'a', 1), (101, 'b', 2)")
    assert(v == 2L)
    assert(spark.sql("SELECT count(*) FROM ow_t").head().getLong(0) == 2L)
    assert(Versioned.readVersion(spark, t, 1L).count() == 20L) // history
    // the feed rejects across the replace (wholesale contract)
    val e = intercept[IllegalStateException] {
      graft.lake.Cdf.changesSince(spark, t, 1L).collect()
    }
    assert(e.getMessage.contains("resync"))
    // key identity enforced
    val dup = intercept[IllegalArgumentException] {
      Sql.execute(spark,
        "INSERT OVERWRITE ow_t VALUES (1, 'a', 1), (1, 'b', 2)")
    }
    assert(dup.getMessage.contains("duplicate"))
    // subquery form with missing columns null-filled (ANSI), like INSERT
    Sql.execute(spark,
      "INSERT OVERWRITE ow_t (k, v) VALUES (7, 'seven')")
    assert(spark.sql("SELECT n FROM ow_t WHERE k = 7").head().isNullAt(0))
  }

  test("COPY INTO loads each landing file exactly once across reruns") {
    val t = s"$root/copy_t"
    val land = s"$root/landing"
    // two landing files
    seed(10).coalesce(1).write.parquet(s"$land/batch1")
    (10 until 20).map(k => (k.toLong, s"v$k", k.toLong))
      .toDF("k", "v", "n").coalesce(1).write.parquet(s"$land/batch2")
    val flat = s"$root/landing_flat"
    val fs = new org.apache.hadoop.fs.Path(land).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(flat))
    def moveParts(sub: String): Unit =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$land/$sub")).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .foreach(s => fs.rename(s.getPath,
          new org.apache.hadoop.fs.Path(s"$flat/${s.getPath.getName}")))
    moveParts("batch1")

    SqlDml.register(spark, "copy_t", t, "k", allowMissing = true)
    // bootstrap: COPY INTO an empty table seeds v1
    val v1 = Sql.execute(spark, s"COPY INTO copy_t FROM '$flat'")
    assert(v1 == 1L)
    assert(spark.sql("SELECT count(*) FROM copy_t").head().getLong(0) == 10L)
    // rerun: nothing new — idempotent no-op, version unchanged
    val v1b = Sql.execute(spark, s"COPY INTO copy_t FROM '$flat'")
    assert(v1b == 1L)
    // land batch2: only the new file loads
    moveParts("batch2")
    val v2 = Sql.execute(spark, s"COPY INTO copy_t FROM '$flat'")
    assert(v2 == 2L)
    assert(spark.sql("SELECT count(*) FROM copy_t").head().getLong(0) == 20L)
    // rerun again: still idempotent
    assert(Sql.execute(spark, s"COPY INTO copy_t FROM '$flat'") == 2L)
    // ledger carries both commits' file names
    assert(CopyInto.loadedFiles(spark, t).size == 2)
    // non-parquet format rejects loudly
    val e = intercept[IllegalArgumentException] {
      Sql.execute(spark, s"COPY INTO copy_t FROM '$flat' FILEFORMAT = CSV")
    }
    assert(e.getMessage.contains("PARQUET"))
  }

  test("COPY INTO crash replay (ledger lost after commit) is content-" +
      "idempotent: same rows, one extra version") {
    val t = s"$root/copy_crash"
    val land = s"$root/landing_crash"
    seed(5).coalesce(1).write.parquet(s"$land/b")
    val flat = s"$root/landing_crash_flat"
    val fs = new org.apache.hadoop.fs.Path(land).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(flat))
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$land/b")).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .foreach(s => fs.rename(s.getPath,
        new org.apache.hadoop.fs.Path(s"$flat/${s.getPath.getName}")))
    SqlDml.register(spark, "copy_crash", t, "k", allowMissing = true)
    Sql.execute(spark, s"COPY INTO copy_crash FROM '$flat'")
    val rows = spark.sql("SELECT * FROM copy_crash").collect().toSet
    // simulate the crash window: commit landed, ledger entry lost
    fs.delete(new org.apache.hadoop.fs.Path(s"$t/_copy_into"), true)
    val v2 = Sql.execute(spark, s"COPY INTO copy_crash FROM '$flat'")
    assert(v2 == 2L) // one extra version ...
    assert(spark.sql("SELECT * FROM copy_crash").collect().toSet == rows)
  } // ... same content: the replay is a key-idempotent upsert

  test("COPY INTO a zero-copy (shallow-ref) base routes through the Dv " +
      "family — no materialize between a DV delete and the next landing") {
    val t = s"$root/copy_ref"
    Forget.publishIndexed(seed(10), t, 2, "k", stats = true)
    SqlDml.register(spark, "copy_ref", t, "k")
    Sql.execute(spark, "DELETE FROM copy_ref WHERE k = 9",
      zeroCopyDelete = true) // live is now a ref
    val land = s"$root/landing_ref"
    val flat = s"$root/landing_ref_flat"
    (20 until 25).map(k => (k.toLong, s"v$k", k.toLong))
      .toDF("k", "v", "n").coalesce(1).write.parquet(land)
    val fs = new org.apache.hadoop.fs.Path(land).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(flat))
    fs.listStatus(new org.apache.hadoop.fs.Path(land)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .foreach(s => fs.rename(s.getPath,
        new org.apache.hadoop.fs.Path(s"$flat/${s.getPath.getName}")))
    val v = Sql.execute(spark, s"COPY INTO copy_ref FROM '$flat'")
    assert(v == 3L)
    // still zero-copy: the landing appended beside the ref
    assert(Versioned.isShallowRef(spark, t, 3L))
    assert(spark.sql("SELECT count(*) FROM copy_ref").head()
      .getLong(0) == 14L) // 10 - 1 deleted + 5 landed
  }

  test("wholesale replaces clear the COPY INTO ledger: a restore or " +
      "restatement re-considers every landing file") {
    val t = s"$root/ledger_clear"
    val land = s"$root/ledger_clear_land"
    seed(6).coalesce(1).write.parquet(s"$land/b")
    val flat = s"$root/ledger_clear_flat"
    val fs = new org.apache.hadoop.fs.Path(land).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(flat))
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$land/b")).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .foreach(s => fs.rename(s.getPath,
        new org.apache.hadoop.fs.Path(s"$flat/${s.getPath.getName}")))
    SqlDml.register(spark, "lc_t", t, "k", allowMissing = true)
    Sql.execute(spark, s"COPY INTO lc_t FROM '$flat'") // v1: 6 rows
    assert(CopyInto.loadedFiles(spark, t).nonEmpty)
    // a restore rewinds content — here to the same v1, but the ledger
    // must clear regardless (content lineage restated)
    Sql.execute(spark, "INSERT OVERWRITE lc_t VALUES (100, 'x', 1)") // v2
    assert(CopyInto.loadedFiles(spark, t).isEmpty) // replace cleared it
    // re-copy re-lands the file into the restated table
    Sql.execute(spark, s"COPY INTO lc_t FROM '$flat'") // v3
    assert(spark.sql("SELECT count(*) FROM lc_t").head().getLong(0) == 7L)
    // RESTORE clears too
    Sql.execute(spark, "RESTORE TABLE lc_t TO VERSION AS OF 2")
    assert(CopyInto.loadedFiles(spark, t).isEmpty)
  }

  test("an over-budget landing on a zero-copy base rejects with the " +
      "remedy (compact first), not a dead-end chain") {
    val t = s"$root/copy_wedge"
    Forget.publishIndexed(seed(10), t, 2, "k", stats = true)
    SqlDml.register(spark, "wedge_t", t, "k")
    Sql.execute(spark, "DELETE FROM wedge_t WHERE k = 9",
      zeroCopyDelete = true) // live is a ref
    val flat = s"$root/copy_wedge_flat"
    import org.apache.spark.sql.functions.{col, concat, lit}
    spark.range(1000L, 1000L + Upsert.MaxDriverKeysDefault + 1)
      .select(col("id").as("k"), concat(lit("w"), col("id")).as("v"),
        col("id").as("n"))
      .coalesce(1).write.parquet(flat)
    val e = intercept[IllegalStateException] {
      Sql.execute(spark, s"COPY INTO wedge_t FROM '$flat'")
    }
    assert(e.getMessage.contains("compact first"))
    // the remedy unwedges: compact, then the same landing goes through
    graft.lake.Maintain.auto(spark, t, "k", materializeRefs = true)
    Sql.execute(spark, s"COPY INTO wedge_t FROM '$flat'")
    assert(spark.sql("SELECT count(*) FROM wedge_t").head().getLong(0)
      == 9L + Upsert.MaxDriverKeysDefault + 1)
  }

  test("TABLE_CHANGES(t, a[, b]) in SELECT text == Cdf.changesSince, " +
      "start version included; RENAME COLUMN routes to column mapping") {
    val t = s"$root/tc"
    Forget.publishIndexed(seed(10), t, 2, "k", stats = true)
    SqlDml.register(spark, "tc_t", t, "k")
    Sql.execute(spark, "UPDATE tc_t SET v = 'v2' WHERE k = 1") // v2
    Sql.execute(spark, "UPDATE tc_t SET v = 'v3' WHERE k = 2") // v3
    Sql.execute(spark, "DELETE FROM tc_t WHERE k = 3")         // v4
    val got = Sql.sql(spark,
      "SELECT _op, k, _version FROM TABLE_CHANGES(tc_t, 2, 3) ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("U", 1L, 2L), ("U", 2L, 3L)))
    // open-ended form reaches the live version
    assert(Sql.sql(spark,
      "SELECT count(*) AS n FROM TABLE_CHANGES(tc_t, 4)").head()
      .getLong(0) == 1L) // the delete
    // a travel-shaped phrase inside a string literal is data
    assert(Sql.sql(spark,
      "SELECT 'TABLE_CHANGES(tc_t, 2)' AS s").head().getString(0)
      == "TABLE_CHANGES(tc_t, 2)")
    // RENAME COLUMN is metadata-only via column mapping (the files keep
    // their physical names; full contract in RenameColumnSpec) — here:
    // the statement routes and the view re-binds under the new name
    val v5 = Sql.execute(spark, "ALTER TABLE tc_t RENAME COLUMN v TO w")
    assert(v5 == 5L)
    assert(spark.sql("SELECT w FROM tc_t WHERE k = 1").head()
      .getString(0) == "v2")
  }

  test("executeScript runs a statement FILE: comments stripped, " +
      "quote-aware splits, sequential commits, loud mid-script stop") {
    val t = s"$root/script"
    Forget.publishIndexed(seed(10), t, 2, "k", stats = true)
    SqlDml.register(spark, "script_t", t, "k")
    val vs = Sql.executeScript(spark,
      """-- nightly fixups (the reference ships statement files)
        |UPDATE script_t SET v = 'one;two' WHERE k = 1; -- literal ; kept
        |DELETE FROM script_t WHERE k = 2;
        |
        |INSERT INTO script_t VALUES (500, 'five-hundred', 5)""".stripMargin)
    assert(vs == Seq(2L, 3L, 4L))
    assert(spark.sql("SELECT v FROM script_t WHERE k = 1").head()
      .getString(0) == "one;two")
    assert(spark.sql("SELECT count(*) FROM script_t").head()
      .getLong(0) == 10L) // 10 - 1 + 1
    // a failing middle statement stops the script; prior commits stand
    val e = intercept[Exception] {
      Sql.executeScript(spark,
        """UPDATE script_t SET v = 'v5' WHERE k = 5;
          |FROBNICATE script_t;
          |UPDATE script_t SET v = 'never' WHERE k = 6""".stripMargin)
    }
    assert(e.getMessage.contains("FROBNICATE"))
    assert(spark.sql("SELECT v FROM script_t WHERE k = 5").head()
      .getString(0) == "v5") // statement 1 committed
    assert(spark.sql("SELECT count(*) FROM script_t WHERE v = 'never'")
      .head().getLong(0) == 0L) // statement 3 never ran
  }

  test("register without allowMissing fails fast on an unpublished path") {
    val e = intercept[IllegalArgumentException] {
      SqlDml.register(spark, "typo_t", s"$root/no_such_table", "k")
    }
    assert(e.getMessage.contains("no published version"))
  }

  test("RESTORE TO TIMESTAMP AS OF resolves through versionAsOf") {
    val t = s"$root/restore_ts"
    Forget.publishIndexed(seed(10), t, 2, "k", stats = true)
    SqlDml.register(spark, "rts", t, "k")
    Sql.execute(spark, "UPDATE rts SET v = 'v2' WHERE k = 0") // v2
    val ts1 = Versioned.commitTimes(spark, t).toMap.apply(1L)
    val v = Sql.execute(spark,
      s"RESTORE TABLE rts TO TIMESTAMP AS OF " +
        s"'${new java.sql.Timestamp(ts1)}'")
    assert(v == 3L)
    assert(spark.sql("SELECT v FROM rts WHERE k = 0").head()
      .getString(0) == "v0") // v1 content — the newest commit at/before ts1
  }

  test("VACUUM DRY RUN lists without reclaiming; SHOW TABLES lists the " +
      "registry; both reject through execute()") {
    val t = s"$root/dryrun"
    Forget.publishIndexed(seed(10), t, 2, "k", stats = true)
    SqlDml.register(spark, "dry_t", t, "k")
    Sql.execute(spark, "UPDATE dry_t SET v = 'v2' WHERE k = 1") // v2
    Sql.execute(spark, "UPDATE dry_t SET v = 'v3' WHERE k = 2") // v3
    val plan = Sql.describe(spark, "VACUUM dry_t DRY RUN").collect()
    assert(plan.map(_.getLong(0)).toSet == Set(1L))
    assert(plan.head.getLong(2) > 0L) // v1 owns real files
    // nothing reclaimed by the dry run
    assert(Versioned.versions(spark, t) == Seq(1L, 2L, 3L))
    // RETAIN widens the keep window
    assert(Sql.describe(spark,
      "VACUUM dry_t RETAIN 5 VERSIONS DRY RUN").count() == 0L)
    // the real vacuum drops exactly the plan
    Sql.execute(spark, "VACUUM dry_t")
    assert(Versioned.versions(spark, t) == Seq(2L, 3L))
    // SHOW TABLES carries the registration
    val st = Sql.describe(spark, "SHOW TABLES").collect()
      .map(r => r.getString(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(st("dry_t") == (("k", 3L)))
    // frame-returning statements reject through execute, loudly
    val e = intercept[IllegalArgumentException] {
      Sql.execute(spark, "VACUUM dry_t DRY RUN")
    }
    assert(e.getMessage.contains("describe"))
    val e2 = intercept[IllegalArgumentException] {
      Sql.execute(spark, "SHOW TABLES")
    }
    assert(e2.getMessage.contains("describe"))
  }

  test("DESCRIBE / SHOW CREATE TABLE resolve READ-ONLY (key-less) " +
      "bindings too") {
    Sql.execute(spark,
      s"CREATE TABLE ro_t LOCATION '$root/ro_t' AS " +
        "SELECT CAST(id AS BIGINT) AS k, CAST(id AS STRING) AS v " +
        "FROM range(3)")
    val d = Sql.describe(spark, "DESCRIBE TABLE ro_t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d == Map("k" -> "bigint", "v" -> "string"))
    val c = Sql.describe(spark, "SHOW CREATE TABLE ro_t").head()
    assert(c.getString(2) == "-") // no DML key
    assert(!c.getString(3).contains(" KEY "))
    // and a key-less binding can be DROPped (unbind) too
    Sql.execute(spark, "DROP TABLE ro_t")
    intercept[IllegalArgumentException] {
      Sql.describe(spark, "DESCRIBE TABLE ro_t")
    }
  }

  test("OPTIMIZE ZORDER BY routes to the z-order re-layout") {
    val t = s"$root/zorder"
    Forget.publishIndexed(
      (0L until 2000L).map(k => (k, k % 97, k / 97, s"p$k"))
        .toDF("k", "a", "b", "v"),
      t, 8, "k", stats = true)
    SqlDml.register(spark, "zo_t", t, "k")
    val before = spark.sql("SELECT * FROM zo_t").collect().toSet
    val v = Sql.execute(spark, "OPTIMIZE zo_t ZORDER BY (a, b)")
    assert(v == 2L)
    assert(spark.sql("SELECT * FROM zo_t").collect().toSet == before)
    // z-order wrote box stats for pruned range reads
    assert(new java.io.File(s"$t/v=2/_boxstats").exists())
    // 1 column rejects toward plain OPTIMIZE (z-order interleaves 2-4)
    val e = intercept[IllegalArgumentException] {
      Sql.execute(spark, "OPTIMIZE zo_t ZORDER BY (a)")
    }
    assert(e.getMessage.contains("2-4"))
  }

  test("ANALYZE TABLE births skipping indexes; SHOW MATERIALIZED VIEWS " +
      "lists the session's bindings") {
    val t = s"$root/analyze"
    // publish WITHOUT indexes (plain publish — no Bloom, no stats)
    Versioned.publish(seed(2000).repartition(4), t)
    SqlDml.register(spark, "an_t", t, "k")
    val dir = s"$t/v=${Versioned.currentVersion(spark, t).get}"
    assert(!graft.lake.StatsIndex.exists(spark, dir))
    val live = Sql.execute(spark,
      "ANALYZE TABLE an_t COMPUTE STATISTICS FOR BLOOM")
    assert(live == 1L)
    assert(graft.lake.StatsIndex.exists(spark, dir))
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$dir/_bloom")))
    // the indexes are live: a targeted purge byte-carries non-admitted
    // files instead of rewriting everything
    Sql.execute(spark, "DELETE FROM an_t WHERE k = 7")
    assert(spark.sql("SELECT count(*) FROM an_t").head().getLong(0)
      == 1999L)
    val bad = intercept[IllegalArgumentException] {
      Sql.execute(spark, "ANALYZE TABLE an_t COMPUTE NONSENSE")
    }
    assert(bad.getMessage.contains("ANALYZE TABLE"))

    // SHOW MATERIALIZED VIEWS reflects the session's MV registry
    val mv = s"$root/analyze_mv"
    Sql.execute(spark,
      s"CREATE MATERIALIZED VIEW an_mv LOCATION '$mv' AS " +
        "SELECT v, count(*), sum(n) FROM an_t GROUP BY v")
    val rows = Sql.describe(spark, "SHOW MATERIALIZED VIEWS")
      .filter("name = 'an_mv'").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("location") == mv)
    assert(r.getAs[String]("source") == t)
    assert(r.getAs[String]("group_cols") == "v")
    assert(r.getAs[String]("sum_cols") == "n")
    assert(r.getAs[Long]("live_version") == 1L)
  }

  test("DROP TABLE / DROP MATERIALIZED VIEW unbind the session; data " +
      "dirs stay") {
    val t = s"$root/droptest"
    Forget.publishIndexed(seed(5), t, 1, "k", stats = true)
    SqlDml.register(spark, "drop_t", t, "k")
    val mv = s"$root/droptest_mv"
    Sql.execute(spark,
      s"CREATE MATERIALIZED VIEW drop_mv LOCATION '$mv' AS " +
        "SELECT v, count(*) FROM drop_t GROUP BY v")
    assert(Sql.execute(spark, "DROP MATERIALIZED VIEW drop_mv") == 1L)
    assert(!spark.catalog.tableExists("drop_mv"))
    assert(Sql.execute(spark, "DROP TABLE drop_t") == 1L)
    assert(!spark.catalog.tableExists("drop_t"))
    val gone = intercept[IllegalArgumentException] {
      Sql.execute(spark, "UPDATE drop_t SET v = 'x' WHERE k = 1")
    }
    assert(gone.getMessage.contains("not a registered lake table"))
    // the dirs survive: re-register and keep working (external-table
    // semantics — the statement unbinds, it does not delete)
    SqlDml.register(spark, "drop_t", t, "k")
    assert(spark.sql("SELECT count(*) FROM drop_t").head().getLong(0) == 5L)
  }
}
