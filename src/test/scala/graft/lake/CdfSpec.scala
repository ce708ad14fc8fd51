package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Change Data Feed ([[Cdf]]): every DML version carries its changeset;
 * [[Cdf.changesSince]] replays them at changeset cost; layout-only
 * maintenance asserts "no row changes" rather than being ambiguous; a
 * full publish breaks the feed loudly; [[Cdf.sync]] keeps a seeded
 * replica snapshot-equal to the source across multi-version churn with
 * replay-safe watermarks.
 */
class CdfSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-cdf").toString

  private def fresh(name: String, n: Long = 2000L): String = {
    val t = s"$root/$name"
    val rows = (0L until n).map(k => (k, s"payload-$k")).toDF("k", "v")
    Forget.publishIndexed(rows, t, nFiles = 4, keyCol = "k", stats = true)
    t
  }

  private def snapshot(t: String): Seq[(Long, String)] =
    Versioned.read(spark, t).as[(Long, String)].collect().sorted.toSeq

  test("merge/purge record their changesets; changesSince replays them") {
    val t = fresh("feed")
    Upsert.applyCdc(spark, t, "k", Seq(
      (10L, "TEN", "U"), (5000L, "NEW", "I"), (20L, null, "D"))
      .toDF("k", "v", "op"))                                   // v2
    Forget.purge(spark, t, "k", Seq(30L, 31L))                 // v3
    val ch = Cdf.changesSince(spark, t, 1L)
      .select($"_version", $"_op", $"k", $"v")
      .as[(Long, String, Long, Option[String])].collect().sorted.toSeq
    assert(ch == Seq(
      (2L, "D", 20L, None),
      (2L, "U", 10L, Some("TEN")), (2L, "U", 5000L, Some("NEW")),
      (3L, "D", 30L, None), (3L, "D", 31L, None)))
    // empty range is schema-stable empty
    assert(Cdf.changesSince(spark, t, 3L).count() == 0)
  }

  test("layout-only maintenance is an explicit no-change record") {
    val t = s"$root/maint"
    val rows = (0L until 2000L).map(k => (k, (k * 7) % 100, s"p-$k"))
      .toDF("k", "x", "v")
    Forget.publishIndexed(rows, t, nFiles = 4, keyCol = "k", stats = true)
    Upsert.merge(spark, t, "k",
      Seq((1L, 5L, "X")).toDF("k", "x", "v"))                  // v2
    Compact.compactVersion(spark, t, "k", targetBytes = 1L)    // v3 (maybe)
    ZOrder.cluster(spark, t, Seq("k", "x"), keyCol = "k")      // +1 version
    val live = Versioned.currentVersion(spark, t).get
    // the feed bridges every maintenance version without complaint and
    // carries exactly the one real change
    val ch = Cdf.changesSince(spark, t, 1L)
    assert(ch.count() == 1)
    assert(ch.select($"k").as[Long].head() == 1L)
    assert(live >= 3L)
  }

  test("a full publish breaks the feed loudly") {
    val t = fresh("wholesale")
    Versioned.publish(Seq((1L, "REPLACED")).toDF("k", "v"), t) // v2, no feed
    val e = intercept[IllegalStateException] {
      Cdf.changesSince(spark, t, 1L)
    }
    assert(e.getMessage.contains("no change record"))
  }

  test("sync keeps a seeded replica snapshot-equal across churn") {
    val t = fresh("src")
    val r = s"$root/replica"
    Cdf.seed(spark, t, r)
    assert(Cdf.syncedVersion(spark, r).contains(1L))
    assert(snapshot(r) == snapshot(t))
    val rnd = new scala.util.Random(7)
    var nextKey = 2000L
    for (round <- 1 to 4) {
      // multi-version churn between syncs, including key churn ACROSS
      // versions (updated then deleted etc.) and a maintenance publish
      for (_ <- 1 to 2) {
        val live = Versioned.read(spark, t).select($"k").as[Long]
          .collect().toSeq
        val dels = rnd.shuffle(live).take(30).toSet
        val upds = rnd.shuffle(live.filterNot(dels)).take(40)
        val batch =
          dels.toSeq.map(k => (k, null.asInstanceOf[String], "D")) ++
            upds.map(k => (k, s"r$round-$k", "U")) ++
            (0 until 20).map { _ =>
              nextKey += 1; (nextKey, s"new-$nextKey", "I")
            }
        Upsert.applyCdc(spark, t, "k",
          rnd.shuffle(batch).toDF("k", "v", "op"))
      }
      Compact.compactVersion(spark, t, "k", targetBytes = 1L)
      Cdf.sync(spark, t, r, "k")
      assert(snapshot(r) == snapshot(t), s"replica diverged in round $round")
      assert(Cdf.syncedVersion(spark, r)
        .contains(Versioned.currentVersion(spark, t).get))
    }
    // replayed sync (nothing pending): no-op, same version
    val rv = Versioned.currentVersion(spark, r).get
    assert(Cdf.sync(spark, t, r, "k") == rv)
  }

  test("sync survives schema evolution in the feed") {
    val t = fresh("evolve", 100L)
    val r = s"$root/evolve_replica"
    Cdf.seed(spark, t, r)
    Upsert.applyCdc(spark, t, "k",
      Seq((5L, "FIVE", 9, "U")).toDF("k", "v", "score", "op"),
      evolveSchema = true)
    Cdf.sync(spark, t, r, "k")
    val rep = Versioned.read(spark, r)
    assert(rep.columns.toSeq == Seq("k", "v", "score"))
    assert(rep.filter($"k" === 5L).select($"score").as[Int].head() == 9)
    assert(rep.filter($"score".isNull).count() == 99L)
  }

  test("sync rejects a NARROWING schema change (rename/drop) toward " +
      "reseed instead of silently diverging") {
    val t = fresh("narrow", 20L)
    val r = s"$root/narrow_replica"
    Cdf.seed(spark, t, r)
    // source renames v via column mapping, then changes a row: the feed
    // rows now carry 'label' and LACK 'v' — an evolveSchema apply would
    // keep v on the replica (stale on old rows) while the source no
    // longer has it at all
    Evolve.renameColumn(spark, t, "v", "label", "k")
    Dv.merge(spark, t, "k", Seq((3L, "renamed-3")).toDF("k", "label"))
    val e = intercept[IllegalArgumentException] {
      Cdf.sync(spark, t, r, "k")
    }
    assert(e.getMessage.contains("reseed"))
    // the replica is untouched by the reject; a reseed converges it
    assert(Versioned.read(spark, r).columns.toSeq == Seq("k", "v"))
    Cdf.seed(spark, t, r)
    val rep = Versioned.read(spark, r)
    assert(rep.columns.toSeq == Seq("k", "label"))
    assert(rep.filter($"k" === 3L).select($"label").as[String].head()
      == "renamed-3")
  }
}
