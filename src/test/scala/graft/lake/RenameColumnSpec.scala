package graft.lake

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.{SparkSpec, Sql, SqlDml}

/**
 * RENAME COLUMN via column mapping ([[Evolve.renameColumn]]): the rename
 * is metadata-only (files keep their physical names forever); readers
 * resolve logical→physical at scan; time travel shows each version's own
 * names; the zero-copy DML family keeps working on the renamed table
 * (appends written under physical names); re-ADDING the old name cannot
 * resurrect the physically-present bytes; RESTORE rewinds the mapping
 * with the content; OPTIMIZE bakes the rename into real files and drops
 * the mapping; and the key-column / constraint guards reject loudly.
 */
class RenameColumnSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-rename").toString
  private def hfs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def seed(n: Int) =
    (0 until n).map(k => (k.toLong, s"v$k", k.toLong)).toDF("k", "v", "n")

  test("rename is metadata-only: new name live, old name in time travel, " +
      "files untouched") {
    val t = s"$root/basic"
    Forget.publishIndexed(seed(6), t, 2, "k", stats = true)
    val before = Versioned.dataFilePaths(spark, s"$t/v=1").sorted
    val v = Evolve.renameColumn(spark, t, "v", "label", "k")
    assert(v == 2L)
    // live read: new logical name, same values
    val live = Versioned.read(spark, t)
    assert(live.columns.toSeq == Seq("k", "label", "n"))
    assert(live.filter($"k" === 3L).head().getString(1) == "v3")
    // time travel: v1 still reads the OLD name
    assert(Versioned.readVersion(spark, t, 1).columns.toSeq
      == Seq("k", "v", "n"))
    // nothing rewritten: v1's files are byte-identical and v2 owns none
    assert(Versioned.dataFilePaths(spark, s"$t/v=1").sorted == before)
    assert(Versioned.dataFilePaths(spark, s"$t/v=2").isEmpty)
    // the physical footer still spells 'v' — the mapping resolves it
    assert(spark.read.parquet(s"$t/v=1").columns.contains("v"))
  }

  test("zero-copy DML keeps working after a rename (appends under " +
      "physical names); chained renames compose") {
    val t = s"$root/dml"
    Forget.publishIndexed(seed(6), t, 2, "k", stats = true)
    Evolve.renameColumn(spark, t, "v", "label", "k")                // v2
    Dv.merge(spark, t, "k",
      Seq((1L, "patched", 100L), (10L, "fresh", 10L))
        .toDF("k", "label", "n"))                                   // v3
    val after = Versioned.read(spark, t).orderBy($"k").collect()
    assert(after.map(_.getLong(0)).toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L, 5L, 10L))
    assert(after(1).getString(1) == "patched")
    assert(after(6).getString(1) == "fresh")
    // the appended file spells the PHYSICAL name (v), not the logical
    val appendCols = spark.read
      .parquet(Versioned.dataFilePaths(spark, s"$t/v=3"): _*).columns.toSeq
    assert(appendCols.contains("v") && !appendCols.contains("label"))
    // DV delete keeps the mapping; chained rename re-points it
    Dv.purge(spark, t, "k", Seq(0L))                                // v4
    Evolve.renameColumn(spark, t, "label", "tag", "k")              // v5
    val live = Versioned.read(spark, t).orderBy($"k")
    assert(live.columns.toSeq == Seq("k", "tag", "n"))
    assert(live.head().getString(1) == "patched") // k=1 (k=0 deleted)
    // the mapping still targets the ORIGINAL physical name
    assert(Versioned.readColumnMapping(hfs(t), s"$t/v=5")
      .contains(Map("tag" -> "v")))
  }

  test("re-ADDING the renamed-away name reads NULL, never the old bytes") {
    val t = s"$root/reAdd"
    Forget.publishIndexed(seed(4), t, 1, "k", stats = true)
    Evolve.renameColumn(spark, t, "v", "label", "k")                // v2
    // 'v' is physically present in every file; with a mapping the new
    // column gets a FRESH physical name instead of rejecting
    Evolve.addColumns(spark, t,
      org.apache.spark.sql.types.StructType.fromDDL("v STRING"))    // v3
    val live = Versioned.read(spark, t).orderBy($"k")
    assert(live.columns.toSeq == Seq("k", "label", "n", "v"))
    val r = live.head()
    assert(r.getString(1) == "v0") // the bytes live under 'label'
    assert(r.isNullAt(3), "re-added column resurrected the old bytes")
  }

  test("RESTORE rewinds the mapping; OPTIMIZE bakes the rename in") {
    val t = s"$root/bake"
    Forget.publishIndexed(seed(5), t, 2, "k", stats = true)
    SqlDml.register(spark, "rn_t", t, "k")
    Sql.execute(spark, "ALTER TABLE rn_t RENAME COLUMN v TO label") // v2
    Sql.execute(spark,
      "UPDATE rn_t SET label = 'x' WHERE k = 1")                    // v3
    Sql.execute(spark, "RESTORE TABLE rn_t TO VERSION AS OF 1")     // v4
    assert(spark.table("rn_t").columns.toSeq == Seq("k", "v", "n"))
    Sql.execute(spark, "RESTORE TABLE rn_t TO VERSION AS OF 3")     // v5
    assert(spark.table("rn_t").columns.toSeq == Seq("k", "label", "n"))
    assert(spark.sql("SELECT label FROM rn_t WHERE k = 1").head()
      .getString(0) == "x")
    // OPTIMIZE materializes: real files under LOGICAL names, mapping gone
    val v6 = Sql.execute(spark, "OPTIMIZE rn_t")
    val liveV = Versioned.currentVersion(spark, t).get
    assert(liveV >= 6L && v6 == liveV)
    assert(Versioned.readColumnMapping(hfs(t), s"$t/v=$liveV").isEmpty)
    assert(!Versioned.isShallowRef(spark, t, liveV))
    val footer = spark.read
      .parquet(Versioned.dataFilePaths(spark, s"$t/v=$liveV"): _*)
    assert(footer.columns.contains("label") && !footer.columns.contains("v"))
    assert(spark.sql("SELECT label FROM rn_t WHERE k = 1").head()
      .getString(0) == "x")
  }

  test("DESCRIBE TABLE shows the logical/physical mapping; SHOW CREATE " +
      "TABLE carries the binding") {
    val t = s"$root/desc"
    Forget.publishIndexed(seed(4), t, 1, "k", stats = true)
    SqlDml.register(spark, "dsc_t", t, "k")
    Sql.execute(spark, "ALTER TABLE dsc_t RENAME COLUMN v TO label")
    val d = Sql.describe(spark, "DESCRIBE TABLE dsc_t").collect()
      .map(r => (r.getString(0), r.getString(3))).toMap
    assert(d == Map("k" -> "k", "label" -> "v", "n" -> "n"))
    val types = Sql.describe(spark, "DESCRIBE dsc_t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(types("k") == "bigint" && types("label") == "string")
    val c = Sql.describe(spark, "SHOW CREATE TABLE dsc_t").head()
    assert(c.getString(0) == "dsc_t" && c.getString(1) == t &&
      c.getString(2) == "k")
    assert(c.getString(3).contains(s"LOCATION '$t'"))
    assert(c.getString(3).contains("label STRING"))
  }

  test("guards: key column, missing/colliding names, constraints") {
    val t = s"$root/guards"
    Forget.publishIndexed(seed(3), t, 1, "k", stats = true)
    SqlDml.register(spark, "rg_t", t, "k")
    val key = intercept[IllegalArgumentException] {
      Sql.execute(spark, "ALTER TABLE rg_t RENAME COLUMN k TO id")
    }
    assert(key.getMessage.contains("key column"))
    val missing = intercept[IllegalArgumentException] {
      Evolve.renameColumn(spark, t, "nope", "x", "k")
    }
    assert(missing.getMessage.contains("does not exist"))
    val clash = intercept[IllegalArgumentException] {
      Evolve.renameColumn(spark, t, "v", "n", "k")
    }
    assert(clash.getMessage.contains("already exists"))
    Sql.execute(spark,
      "ALTER TABLE rg_t ADD CONSTRAINT pos CHECK (n >= 0)")
    val cons = intercept[IllegalArgumentException] {
      Evolve.renameColumn(spark, t, "n", "amount", "k")
    }
    assert(cons.getMessage.contains("DROP CONSTRAINT first"))
    // nothing published by any reject
    assert(Versioned.currentVersion(spark, t).contains(1L))
  }

  test("change feed bridges the rename; post-rename changes carry the " +
      "new name; a shallow clone reads the new name") {
    val t = s"$root/feed"
    Forget.publishIndexed(seed(4), t, 1, "k", stats = true)
    SqlDml.register(spark, "rf_t", t, "k")
    Sql.execute(spark, "UPDATE rf_t SET n = 100 WHERE k = 1")       // v2
    Sql.execute(spark, "ALTER TABLE rf_t RENAME COLUMN n TO amt")   // v3
    Sql.execute(spark, "UPDATE rf_t SET amt = 200 WHERE k = 2")     // v4
    val ch = Cdf.changesSince(spark, t, 1)
    // the until-version's column mapping re-unifies the span: pre-rename
    // frames (written under the physical name n) come back under the
    // LIVE logical name amt — ONE column, never a null-filled split —
    // and the rename version itself bridges to zero rows (its S poison
    // is streaming-only)
    assert(ch.filter($"_version" === 3L).isEmpty)
    val cols = ch.columns.toSet
    assert(cols.contains("amt") && !cols.contains("n"))
    assert(ch.filter($"_version" === 2L && $"k" === 1L).head()
      .getAs[Long]("amt") == 100L)
    assert(ch.filter($"_version" === 4L && $"k" === 2L).head()
      .getAs[Long]("amt") == 200L)
    // a shallow clone of the renamed table resolves the mapping too
    val c = s"$root/feed-clone"
    Sql.execute(spark,
      s"CREATE TABLE rf_c SHALLOW CLONE rf_t VERSION AS OF 3 " +
        s"LOCATION '$c'")
    assert(spark.table("rf_c").columns.toSeq == Seq("k", "v", "amt"))
    assert(spark.sql("SELECT amt FROM rf_c WHERE k = 1").head()
      .getLong(0) == 100L)
  }

  test("a span crossing TWO renames of one column re-unifies: the " +
      "intermediate frame remaps under ITS OWN version's mapping, so " +
      "every change lands in ONE live column") {
    val t = s"$root/feed2x"
    Forget.publishIndexed(seed(4), t, 1, "k", stats = true)
    SqlDml.register(spark, "r2x_t", t, "k")
    Sql.execute(spark, "UPDATE r2x_t SET n = 100 WHERE k = 1")         // v2
    Sql.execute(spark, "ALTER TABLE r2x_t RENAME COLUMN n TO amt")     // v3
    Sql.execute(spark, "UPDATE r2x_t SET amt = 200 WHERE k = 2")       // v4
    Sql.execute(spark, "ALTER TABLE r2x_t RENAME COLUMN amt TO amount") // v5
    Sql.execute(spark, "UPDATE r2x_t SET amount = 300 WHERE k = 3")    // v6
    // the v4 frame was written under the INTERMEDIATE name amt — its own
    // version's mapping witnesses amt -> n (physical), and the live
    // mapping takes n -> amount: one honest column across the whole span
    val ch = Cdf.changesSince(spark, t, 1)
    val cols = ch.columns.toSet
    assert(cols.contains("amount") && !cols.contains("amt") &&
      !cols.contains("n"), cols.toString)
    assert(ch.filter($"_version" === 2L && $"k" === 1L).head()
      .getAs[Long]("amount") == 100L)
    assert(ch.filter($"_version" === 4L && $"k" === 2L).head()
      .getAs[Long]("amount") == 200L)
    assert(ch.filter($"_version" === 6L && $"k" === 3L).head()
      .getAs[Long]("amount") == 300L)
    // sub-spans keep their own until-version's names
    val left = Cdf.changesSince(spark, t, 1, untilV = Some(4))
    assert(left.columns.contains("amt") && !left.columns.contains("n"))
    assert(left.filter($"_version" === 2L && $"k" === 1L).head()
      .getAs[Long]("amt") == 100L)
  }

  test("a rename chain that REUSES a freed name keeps post-rename " +
      "frames' columns apart: live y stays y, never relabeled to z") {
    val t = s"$root/feedreuse"
    Forget.publishIndexed(seed(4), t, 1, "k", stats = true)
    SqlDml.register(spark, "rru_t", t, "k")
    Sql.execute(spark, "UPDATE rru_t SET n = 100 WHERE k = 1")        // v2
    // free the name n, then reuse it for v: live logical n IS physical v
    Sql.execute(spark, "ALTER TABLE rru_t RENAME COLUMN n TO amt")    // v3
    Sql.execute(spark, "ALTER TABLE rru_t RENAME COLUMN v TO n")      // v4
    Sql.execute(spark, "UPDATE rru_t SET amt = 200 WHERE k = 2")      // v5
    // a flat physical->live remap would relabel the v5 frame's live
    // column n (physical v) to amt's spelling chain and corrupt the
    // feed with duplicate columns; the per-version remap round-trips it
    val ch = Cdf.changesSince(spark, t, 1)
    assert(ch.columns.count(_ == "amt") == 1 &&
      ch.columns.count(_ == "n") == 1, ch.columns.toSeq.toString)
    assert(ch.filter($"_version" === 2L && $"k" === 1L).head()
      .getAs[Long]("amt") == 100L)
    assert(ch.filter($"_version" === 5L && $"k" === 2L).head()
      .getAs[Long]("amt") == 200L)
    // live n (the renamed v) carries v's string content in U rows
    assert(ch.filter($"_version" === 5L && $"k" === 2L).head()
      .getAs[String]("n") == "v2")
  }
}
