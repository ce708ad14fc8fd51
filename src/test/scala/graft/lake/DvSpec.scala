package graft.lake

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import graft.SparkSpec

/**
 * Deletion vectors ([[Dv]]): a zero-copy purge equals the rewriting purge
 * through every [[Versioned]] reader while writing NO data file (the
 * shared dir stays byte-identical); vectors accumulate across re-purges;
 * time travel shows each version's own snapshot; DML rejects toward
 * materialize, which physically applies the vector; the change feed and
 * replica sync see DV deletes like rewriting ones; vacuum cannot reclaim
 * the shared dir while a vector version references it.
 */
class DvSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-dv").toString

  private def md5s(dir: String): Map[String, String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(f => f.getName -> MessageDigest.getInstance("MD5")
        .digest(Files.readAllBytes(Paths.get(f.getPath)))
        .map("%02x".format(_)).mkString).toMap

  private def mk(name: String): String = {
    val t = s"$root/$name"
    val rows = ((0L until 3000L).map(k => (Some(k), s"p-$k"))
      :+ ((None: Option[Long], "null-key-row"))).toDF("k", "v")
    Forget.publishIndexed(rows, t, nFiles = 8, keyCol = "k", stats = true)
    t
  }

  private def snap(t: String): Set[(Option[Long], String)] =
    Versioned.read(spark, t).as[(Option[Long], String)].collect().toSet

  test("DV purge == rewriting purge, with zero data files written") {
    val dv = mk("zero")
    val rw = mk("zero_rw")
    val keys = (100L until 160L) ++ Seq(2999L)
    val before = md5s(s"$dv/v=1")

    assert(Dv.purge(spark, dv, "k", keys) == 2L)
    Forget.purge(spark, rw, "k", keys)
    assert(snap(dv) == snap(rw))
    assert(Versioned.read(spark, dv).count() == 3001L - 61L)
    // the NULL-key row is unnameable and survives
    assert(Versioned.read(spark, dv).filter($"k".isNull).count() == 1L)

    // zero copy: the v=2 dir holds NO data files, v=1's bytes untouched
    assert(md5s(s"$dv/v=1") == before)
    val v2Files = new java.io.File(s"$dv/v=2").listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
    assert(v2Files.isEmpty, s"expected no data files, got ${v2Files.toSeq}")
    assert(Versioned.isShallowRef(spark, dv, 2L))
    assert(Dv.deletedRows(spark, dv, 2L) == 61L)

    // time travel: the pre-purge version still shows everything
    assert(Versioned.readVersion(spark, dv, 1L).count() == 3001L)

    // idempotent: re-purging the same keys publishes nothing
    assert(Dv.purge(spark, dv, "k", keys) == 2L)
    // absent keys: no-op too
    assert(Dv.purge(spark, dv, "k", Seq(999999L)) == 2L)
  }

  test("vectors accumulate; chained purges stay one-hop and travel") {
    val t = mk("chain")
    Dv.purge(spark, t, "k", Seq(1L, 2L, 3L))
    assert(Dv.purge(spark, t, "k", Seq(3L, 4L)) == 3L)
    assert(Versioned.read(spark, t).count() == 3001L - 4L) // 1,2,3,4
    assert(Dv.deletedRows(spark, t, 3L) == 4L) // cumulative, deduped
    // each version reads its OWN snapshot off the one shared dir
    assert(Versioned.readVersion(spark, t, 2L).count() == 3001L - 3L)
    assert(Versioned.dataDir(spark, t, 2L) ==
      Versioned.dataDir(spark, t, 3L), "refs must not chain")
    // key-range scans still answer correctly through the reader
    assert(Versioned.read(spark, t)
      .filter($"k" >= 1L && $"k" <= 5L).count() == 1L) // only k=5 left
  }

  test("DML rejects toward materialize; materialize applies the vector") {
    val t = mk("mat")
    Dv.purge(spark, t, "k", Seq(10L, 11L))
    val e = intercept[IllegalArgumentException] {
      Upsert.merge(spark, t, "k", Seq((5L, "UPD")).toDF("k", "v"))
    }
    assert(e.getMessage.contains("materialize"))
    intercept[IllegalArgumentException] {
      Forget.purge(spark, t, "k", Seq(5L))
    }
    intercept[IllegalArgumentException] {
      Clone.shallow(spark, t, s"$root/mat_clone")
    }
    // materialize = the DV compactor: real files, deleted rows gone
    val v3 = Clone.materialize(spark, t)
    assert(v3 == 3L && !Versioned.isShallowRef(spark, t, 3L))
    assert(Versioned.read(spark, t).count() == 2999L)
    assert(Versioned.read(spark, t)
      .filter($"k".isin(10L, 11L)).count() == 0L)
    // and DML flows again
    Upsert.merge(spark, t, "k", Seq((Some(5L), "UPD")).toDF("k", "v"))
    assert(Versioned.read(spark, t)
      .filter($"k" === 5L).select($"v").as[String].head() == "UPD")
  }

  test("the change feed records DV deletes; a replica physically applies them") {
    val t = mk("feed")
    val rep = s"$root/feed_rep"
    // seed BEFORE the purge, then sync the DV delete across
    Upsert.applyCdc(spark, t, "k",
      Seq(("U", 7L, "u7")).toDF("op", "k", "v")) // v2, so the feed exists
    Cdf.seed(spark, t, rep)
    Dv.purge(spark, t, "k", Seq(20L, 21L, 22L)) // v3, zero-copy
    Cdf.sync(spark, t, rep, "k")
    assert(snap(rep) == snap(t))
    assert(Versioned.read(spark, rep).filter($"k".isin(20L, 21L, 22L))
      .count() == 0L)
  }

  test("DV purge on an EVOLVED table: marker-pinned read minus the vector") {
    val t = mk("evolved")
    Upsert.merge(spark, t, "k",
      Seq((Some(1L), "E1", "w1")).toDF("k", "v", "w"), evolveSchema = true)
    assert(Dv.purge(spark, t, "k", Seq(2L)) == 3L)
    val live = Versioned.read(spark, t)
    assert(live.columns.toSeq == Seq("k", "v", "w"))
    assert(live.count() == 3000L)
    assert(live.filter($"k" === 1L).select($"w").as[String].head() == "w1")
    assert(live.filter($"k" === 2L).count() == 0L)
    assert(live.filter($"k".isNull).count() == 1L)
  }

  test("MatView refresh over a DV'd source does not double-subtract") {
    import org.apache.spark.sql.functions._
    val src = s"$root/mv_src"
    val df = Seq((1L, "a", BigDecimal(1)), (2L, "a", BigDecimal(2)),
      (3L, "a", BigDecimal(3)), (4L, "b", BigDecimal(4)))
      .toDF("k", "grp", "amount")
    Forget.publishIndexed(df, src, nFiles = 2, keyCol = "k", stats = true)
    val view = s"$root/mv_view"
    MatView.create(spark, src, "k", view, Seq("grp"), Seq("amount"))
    def batchD(keys: Seq[Long]) = keys.toDF("k")
      .withColumn("grp", lit(null: String))
      .withColumn("amount", lit(null: String).cast("decimal(38,18)"))
      .withColumn("op", lit("D"))
    def viewMap(): Map[String, (Long, BigDecimal)] =
      Versioned.read(spark, view).collect().map(r =>
        r.getAs[String]("grp") -> ((r.getAs[Long]("n_rows"),
          BigDecimal(r.getAs[java.math.BigDecimal]("sum_amount"))
            .setScale(6)))).toMap

    Dv.purge(spark, src, "k", Seq(1L))
    MatView.refresh(spark, view, batchD(Seq(1L)))
    assert(viewMap()("a") == ((2L, BigDecimal(5).setScale(6))))
    // the second purge re-names the already-vector-deleted key 1: its
    // physically-present row must NOT be subtracted again (the minus side
    // reads the pre-batch version MINUS its vector)
    Dv.purge(spark, src, "k", Seq(1L, 2L))
    MatView.refresh(spark, view, batchD(Seq(1L, 2L)))
    assert(viewMap()("a") == ((1L, BigDecimal(3).setScale(6))),
      "group a must keep key 3 — double-subtraction would empty it")
    assert(viewMap()("b") == ((1L, BigDecimal(4).setScale(6))))
  }

  test("a stale self-pin (lost purge race) is GC'd by vacuum") {
    val t = mk("stalepin")
    // what a Dv.purge that lost its OCC race leaves behind: a self-pin on
    // a version dir that no version ever came to reference
    Clone.pin(spark, s"$t/v=1", t)
    Versioned.publish(Seq((1L, "fresh")).toDF("k", "v"), t) // v2, real
    val dropped = Versioned.vacuum(spark, t, keep = 0)
    assert(dropped == Seq(1L), s"stale pin blocked the reclaim: $dropped")
    assert(Versioned.versions(spark, t) == Seq(2L))
    val clones = new java.io.File(s"$t/_clones")
    assert(!clones.exists() || clones.listFiles().isEmpty)
    // whereas a LIVE vector version's pin survives the GC (covered again
    // here with the GC active): purge, vacuum, still readable
    Dv.purge(spark, t, "k", Seq(1L))
    Versioned.vacuum(spark, t, keep = 0)
    assert(Versioned.read(spark, t).count() == 0L) // the one row deleted
    assert(Versioned.versions(spark, t).contains(2L),
      "the referenced data version must survive")
  }

  test("vacuum keeps the shared dir alive under a vector version") {
    val t = mk("vac")
    Dv.purge(spark, t, "k", Seq(0L))
    // live = 2 (ref to v=1's dir). keep=0 would drop v=1 — but it's pinned
    val dropped = Versioned.vacuum(spark, t, keep = 0)
    assert(!dropped.contains(1L), s"vacuum dropped the referenced dir")
    assert(Versioned.read(spark, t).count() == 3000L) // still readable
    // materialize, then ONE vacuum fully reclaims (the fixpoint sweep:
    // dropping the ref version releases its pin, unlocking the data
    // version in the same run — the compliance-window sequence)
    Clone.materialize(spark, t)
    Versioned.vacuum(spark, t, keep = 0)
    assert(Versioned.versions(spark, t) == Seq(3L))
    assert(Versioned.read(spark, t).count() == 3000L)
  }
}
