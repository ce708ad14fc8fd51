package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/**
 * [[Evolve.addColumns]]: METADATA-ONLY `ALTER TABLE ADD COLUMNS`. The
 * overlay version holds no data files of its own (a pinned `_ref` + an
 * extended `_table_schema` marker), every reader null-fills the new
 * columns, time travel keeps the old schema at old versions, the
 * zero-copy DML family composes with the overlay (and carries it
 * forward), clone/restore/materialize all preserve the extended schema,
 * and the rejects are loud (collision, dup, empty).
 */
class EvolveSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-evolve").toString

  private def mk(name: String): String = {
    val t = s"$root/$name"
    Forget.publishIndexed(
      (0L until 100L).map(k => (k, s"p-$k")).toDF("k", "v"),
      t, nFiles = 4, keyCol = "k")
    t
  }

  private def parts(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles())
      .map(_.filter(f => f.isFile && f.getName.startsWith("part-"))
        .map(_.getName).toSeq).getOrElse(Seq.empty)

  test("addColumns is metadata-only: no data files, extended schema, " +
      "null-filled rows, old versions keep the old schema") {
    val t = mk("meta_only")
    val v2 = Evolve.addColumns(spark, t,
      StructType.fromDDL("score DOUBLE, tag STRING"))
    assert(v2 == 2L)
    // zero data files of its own; a pinned ref to v=1
    assert(parts(s"$t/v=2").isEmpty)
    assert(Versioned.isShallowRef(spark, t, 2L))
    assert(Versioned.dataDir(spark, t, 2L) == s"$t/v=1")
    // live schema extended, rows null-filled
    val live = Versioned.read(spark, t)
    assert(live.columns.toSeq == Seq("k", "v", "score", "tag"))
    assert(live.count() == 100L)
    assert(live.filter("score IS NOT NULL OR tag IS NOT NULL").count() == 0L)
    // time travel: v1 keeps the pre-evolution schema
    assert(Versioned.readVersion(spark, t, 1L).columns.toSeq ==
      Seq("k", "v"))
    // history calls it out as a schema change, not maintenance
    val ops = History.frame(spark, t)
      .select("version", "operation").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops(2L) == "schema")
  }

  test("zero-copy merge composes with the overlay and carries it forward") {
    val t = mk("zc_merge")
    Evolve.addColumns(spark, t, StructType.fromDDL("score DOUBLE")) // v2
    // changeset must carry the new column (whole-row replacement)
    val e = intercept[IllegalArgumentException] {
      Dv.merge(spark, t, "k", Seq((5L, "nope")).toDF("k", "v"))
    }
    assert(e.getMessage.contains("score"))
    val v3 = Dv.merge(spark, t, "k",
      Seq((5L, "v3-5", 0.9), (200L, "v3-new", 0.1))
        .toDF("k", "v", "score"))
    assert(v3 == 3L)
    val live = Versioned.read(spark, t)
    assert(live.count() == 101L)
    assert(live.filter("k = 5 AND v = 'v3-5' AND score = 0.9").count() == 1L)
    assert(live.filter("k = 7 AND score IS NULL").count() == 1L)
    // the merge's ref version carries the overlay marker forward
    assert(new java.io.File(s"$t/v=3/_table_schema").exists())
    // and a zero-copy DELETE after that still reads the wide schema
    Dv.purge(spark, t, "k", Seq(5L)) // v4
    val after = Versioned.read(spark, t)
    assert(after.columns.toSeq == Seq("k", "v", "score"))
    assert(after.filter("k = 5").count() == 0L)
    assert(after.count() == 100L)
  }

  test("overlay on a DV'd live version carries vector and appends") {
    val t = mk("dv_carry")
    Dv.merge(spark, t, "k",
      Seq((3L, "zc-3"), (300L, "zc-new")).toDF("k", "v")) // v2: appends
    Dv.purge(spark, t, "k", Seq(9L)) // v3: vector
    val before = Versioned.read(spark, t).as[(Long, String)].collect().toSet
    val v4 = Evolve.addColumns(spark, t, StructType.fromDDL("w INT"))
    assert(v4 == 4L)
    val live = Versioned.read(spark, t)
    assert(live.columns.toSeq == Seq("k", "v", "w"))
    // content identical modulo the null-filled new column
    assert(live.select("k", "v").as[(Long, String)].collect().toSet
      == before)
    assert(live.filter("k = 9").count() == 0L) // vector traveled
    assert(live.filter("k = 300 AND v = 'zc-new'").count() == 1L) // appends
  }

  test("materialize bakes the evolved schema into real files; rewriting " +
      "DML then proceeds") {
    val t = mk("materialize")
    Evolve.addColumns(spark, t, StructType.fromDDL("score DOUBLE")) // v2
    // rewriting merge rejects on the overlay (shallow-ref contract) ...
    val e = intercept[Exception] {
      Upsert.merge(spark, t, "k", Seq((1L, "x", 1.0)).toDF("k", "v", "score"))
    }
    assert(e.getMessage.contains("materialize"))
    // ... and materialize unlocks it with the evolved schema
    val v3 = Clone.materialize(spark, t)
    assert(v3 == 3L)
    assert(parts(s"$t/v=3").nonEmpty)
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k", "v", "score"))
    val v4 = Upsert.merge(spark, t, "k",
      Seq((1L, "x", 1.0)).toDF("k", "v", "score"))
    assert(v4 == 4L)
    assert(Versioned.read(spark, t)
      .filter("k = 1 AND score = 1.0").count() == 1L)
  }

  test("clone and restore preserve the extended schema") {
    val t = mk("clone_restore")
    Evolve.addColumns(spark, t, StructType.fromDDL("score DOUBLE")) // v2
    val c = s"$root/clone_restore_dst"
    Clone.shallow(spark, t, c)
    assert(Versioned.read(spark, c).columns.toSeq == Seq("k", "v", "score"))
    // restore BACK to the overlay version after a narrowing restore
    Restore.restore(spark, t, 1L) // v3: pre-evolution content
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k", "v"))
    Restore.restore(spark, t, 2L) // v4: the overlay again
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k", "v", "score"))
  }

  test("SQL surface: ALTER TABLE ADD COLUMNS evolves and rebinds the view") {
    val t = mk("sql_alter")
    graft.SqlDml.register(spark, "evolve_sql_t", t, "k")
    val v = graft.SqlDml.execute(spark,
      "ALTER TABLE evolve_sql_t ADD COLUMNS (score DOUBLE, tag STRING)")
    assert(v == 2L)
    val out = spark.sql(
      "SELECT count(*) AS n FROM evolve_sql_t WHERE score IS NULL").head()
    assert(out.getLong(0) == 100L)
    // single-column form
    graft.SqlDml.execute(spark,
      "ALTER TABLE evolve_sql_t ADD COLUMN extra INT")
    assert(spark.table("evolve_sql_t").columns.toSeq ==
      Seq("k", "v", "score", "tag", "extra"))
  }

  test("rejects: collision (case-insensitive), duplicate new names, empty") {
    val t = mk("rejects")
    val c = intercept[IllegalArgumentException] {
      Evolve.addColumns(spark, t, StructType.fromDDL("V INT"))
    }
    assert(c.getMessage.contains("already exist"))
    val d = intercept[IllegalArgumentException] {
      Evolve.addColumns(spark, t, StructType.fromDDL("a INT, A STRING"))
    }
    assert(d.getMessage.contains("duplicate"))
    intercept[IllegalArgumentException] {
      Evolve.addColumns(spark, t, new StructType())
    }
    // nothing published by any reject
    assert(Versioned.currentVersion(spark, t).contains(1L))
  }

  test("dropColumns is metadata-only: column vanishes live, survives " +
      "time travel, bytes stay until materialize") {
    val t = mk("drop_meta")
    val v2 = Evolve.dropColumns(spark, t, Seq("v"), keyCol = "k")
    assert(v2 == 2L)
    assert(parts(s"$t/v=2").isEmpty) // no data files of its own
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k"))
    // pre-drop version still reads the wide schema (and the values)
    val old = Versioned.readVersion(spark, t, 1L)
    assert(old.columns.toSeq == Seq("k", "v"))
    assert(old.filter("v = 'p-5'").count() == 1L)
    // the bytes are still in the shared files (logical-until-rewrite)
    assert(spark.read.parquet(s"$t/v=1").columns.contains("v"))
    // zero-copy merge after the drop speaks the NARROW schema
    val e = intercept[IllegalArgumentException] {
      Dv.merge(spark, t, "k", Seq((1L, "x")).toDF("k", "v"))
    }
    assert(e.getMessage.contains("adds column"))
    Dv.merge(spark, t, "k", Seq(Tuple1(500L)).toDF("k")) // v3
    assert(Versioned.read(spark, t).count() == 101L)
  }

  test("dropColumns rejects: key column, constraint-referenced column, " +
      "unknown column, dropping everything") {
    val t = mk("drop_rejects")
    val k = intercept[IllegalArgumentException] {
      Evolve.dropColumns(spark, t, Seq("k"), keyCol = "k")
    }
    assert(k.getMessage.contains("key column"))
    Constraints.add(spark, t, "v_nonempty", "v IS NOT NULL")
    val c = intercept[IllegalArgumentException] {
      Evolve.dropColumns(spark, t, Seq("v"), keyCol = "k")
    }
    assert(c.getMessage.contains("v_nonempty"))
    Constraints.drop(spark, t, "v_nonempty")
    val u = intercept[IllegalArgumentException] {
      Evolve.dropColumns(spark, t, Seq("nope"), keyCol = "k")
    }
    assert(u.getMessage.contains("do not exist"))
    val all = intercept[IllegalArgumentException] {
      Evolve.dropColumns(spark, t, Seq("v", "k"), keyCol = "x")
    }
    assert(all.getMessage.contains("at least one"))
    assert(Versioned.currentVersion(spark, t).contains(1L))
  }

  test("re-adding a dropped column rejects until materialize rewrites " +
      "the files (the resurrect guard)") {
    val t = mk("resurrect")
    Evolve.dropColumns(spark, t, Seq("v"), keyCol = "k") // v2
    val g = intercept[IllegalArgumentException] {
      Evolve.addColumns(spark, t, StructType.fromDDL("v STRING"))
    }
    assert(g.getMessage.contains("resurrect"))
    Clone.materialize(spark, t) // v3: files physically narrowed
    val v4 = Evolve.addColumns(spark, t, StructType.fromDDL("v STRING"))
    assert(v4 == 4L)
    // the re-added column reads NULL — never the old values
    assert(Versioned.read(spark, t).filter("v IS NOT NULL").count() == 0L)
  }

  test("the resurrect guard sees MIXED footers: a narrow append after " +
      "the drop must not hide the ghost column") {
    val t = mk("resurrect_mixed")
    Evolve.dropColumns(spark, t, Seq("v"), keyCol = "k") // v2 overlay
    // a zero-copy merge under the NARROW schema appends a file that
    // physically lacks v — a single sampled footer could land on it
    Dv.merge(spark, t, "k", Seq(Tuple1(900L)).toDF("k")) // v3
    val g = intercept[IllegalArgumentException] {
      Evolve.addColumns(spark, t, StructType.fromDDL("v STRING"))
    }
    assert(g.getMessage.contains("resurrect"))
  }

  test("constraint names inside string literals do not block a drop") {
    val t = mk("drop_literal")
    Constraints.add(spark, t, "status_ok", "k >= 0 AND v != 'score'")
    Evolve.addColumns(spark, t, StructType.fromDDL("score DOUBLE"))
    // 'score' appears only inside the predicate's string literal
    val v = Evolve.dropColumns(spark, t, Seq("score"), keyCol = "k")
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k", "v"))
    assert(v == 3L)
    Constraints.drop(spark, t, "status_ok")
  }

  test("SQL surface: ALTER TABLE DROP COLUMN / DROP COLUMNS") {
    val t = mk("sql_drop")
    graft.SqlDml.register(spark, "evolve_drop_t", t, "k")
    graft.SqlDml.execute(spark,
      "ALTER TABLE evolve_drop_t ADD COLUMNS (a INT, b INT)") // v2
    val v3 = graft.SqlDml.execute(spark,
      "ALTER TABLE evolve_drop_t DROP COLUMNS (a, b)")
    assert(v3 == 3L)
    assert(spark.table("evolve_drop_t").columns.toSeq == Seq("k", "v"))
    graft.SqlDml.execute(spark,
      "ALTER TABLE evolve_drop_t DROP COLUMN v")
    assert(spark.table("evolve_drop_t").columns.toSeq == Seq("k"))
    // DROP CONSTRAINT still parses (grammar ordering)
    val e = intercept[Exception] {
      graft.SqlDml.execute(spark,
        "ALTER TABLE evolve_drop_t DROP CONSTRAINT nope")
    }
    assert(e.getMessage.contains("no constraint"))
  }

  test("an overlay racing a rewriting merge: the overlay always commits " +
      "(OCC re-derive); the merge commits or fails loudly with the " +
      "materialize remedy — never a silent outcome") {
    val t = mk("race")
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    import scala.concurrent._
    import scala.concurrent.duration._
    implicit val ec: ExecutionContextExecutorService =
      ExecutionContext.fromExecutorService(pool)
    try {
      val fe = Future {
        barrier.await()
        scala.util.Try(Evolve.addColumns(spark, t,
          StructType.fromDDL("x INT")))
      }
      val fm = Future {
        barrier.await()
        scala.util.Try(Upsert.merge(spark, t, "k",
          Seq((1L, "m1")).toDF("k", "v")))
      }
      val (re, rm) = Await.result(fe.zip(fm), 2.minutes)
      assert(re.isSuccess, s"the overlay must re-derive and commit: $re")
      rm match {
        case scala.util.Success(_) => // merge won a claim before the
          assert(Versioned.read(spark, t) // overlay (or retried past it)
            .filter("k = 1 AND v = 'm1'").count() == 1L)
        case scala.util.Failure(e) => // overlay won: rewriting DML on a
          assert(e.getMessage.contains("materialize"), // ref rejects
            s"loser must name the remedy: ${e.getMessage}") // loudly
      }
      val live = Versioned.read(spark, t)
      assert(live.columns.contains("x"))
      assert(live.count() == 100L)
    } finally { pool.shutdown(); () }
  }

  test("change feed bridges the overlay (no break): changesSince spans it") {
    val t = mk("feed")
    Upsert.merge(spark, t, "k", Seq((1L, "v2-1")).toDF("k", "v")) // v2
    Evolve.addColumns(spark, t, StructType.fromDDL("score DOUBLE")) // v3
    Dv.merge(spark, t, "k",
      Seq((2L, "v4-2", 0.5)).toDF("k", "v", "score")) // v4
    val ch = Cdf.changesSince(spark, t, 1L)
    val ks = ch.select("k").as[Long].collect().toSet
    assert(ks == Set(1L, 2L))
  }

  test("change feed REJECTS a span crossing a DROP COLUMN: the dropped " +
      "column cannot assemble as one frame") {
    val t = mk("feed_drop")
    Upsert.merge(spark, t, "k", Seq((1L, "pre-drop")).toDF("k", "v")) // v2
    Evolve.dropColumns(spark, t, Seq("v"), "k")                       // v3
    Dv.merge(spark, t, "k", Seq(Tuple1(2L)).toDF("k"))                // v4
    // sub-spans on either side of the drop still bridge
    assert(Cdf.changesSince(spark, t, 1L, untilV = Some(2L))
      .select("k").as[Long].collect().toSet == Set(1L))
    assert(Cdf.changesSince(spark, t, 3L)
      .select("k").as[Long].collect().toSet == Set(2L))
    // the crossing span rejects loudly toward resync/sub-spans: pre-drop
    // U rows carry v, post-drop rows cannot — a null-filled union would
    // silently present dropped values as the live column's history
    val e = intercept[IllegalStateException] {
      Cdf.changesSince(spark, t, 1L)
    }
    assert(e.getMessage.contains("resolve to nothing"), e.getMessage)
  }
}
