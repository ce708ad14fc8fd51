package graft.lake

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import graft.SparkSpec

/**
 * Zero-copy MERGE ([[Dv.applyCdc]]/[[Dv.merge]]): deletion vectors
 * extended from deletes to the full CDC triad — the base data dir stays
 * byte-identical while updates vector out the old row and append the new
 * one. Equal to the rewriting [[Upsert.applyCdc]] through EVERY reader
 * (live, time travel, diff, views, change feed, replica sync);
 * [[Clone.materialize]] compacts appends + vector back to real files;
 * chained zero-copy merges and purges compose.
 */
class DvMergeSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-dvm").toString

  private def md5s(dir: String): Map[String, String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(f => f.getName -> MessageDigest.getInstance("MD5")
        .digest(Files.readAllBytes(Paths.get(f.getPath)))
        .map("%02x".format(_)).mkString).toMap

  private def mk(name: String): String = {
    val t = s"$root/$name"
    Forget.publishIndexed(
      (0L until 2000L).map(k => (k, s"p-$k", k % 7)).toDF("k", "v", "n"),
      t, nFiles = 8, keyCol = "k", stats = true)
    t
  }

  private def snap(t: String): Set[(Long, String, Long)] =
    Versioned.read(spark, t).as[(Long, String, Long)].collect().toSet

  private val batch = Seq(
    ("U", 5L, "updated-5", 500L), ("U", 1234L, "updated-1234", 99L),
    ("I", 5000L, "fresh-5000", 1L), ("D", 7L, null, 0L))

  test("DV merge == rewriting merge through every reader; zero data rewrite") {
    val tDv = mk("dv")
    val tRw = mk("rw")
    val before = md5s(s"$tDv/v=1")

    assert(Dv.applyCdc(spark, tDv, "k", batch.toDF("op", "k", "v", "n")) == 2L)
    assert(Upsert.applyCdc(spark, tRw, "k", batch.toDF("op", "k", "v", "n")) == 2L)

    // the base dir is BYTE-IDENTICAL — nothing was rewritten
    assert(md5s(s"$tDv/v=1") == before)
    assert(Versioned.isShallowRef(spark, tDv, 2L))
    assert(Dv.deletedRows(spark, tDv, 2L) == 3L) // 2 updated + 1 deleted olds

    // live reads equal
    assert(snap(tDv) == snap(tRw))
    assert(Versioned.read(spark, tDv).count() == 2000L) // -1 del +1 ins
    // time travel: v1 still the seed on both
    assert(Versioned.readVersion(spark, tDv, 1L).count() == 2000L)
    assert(Versioned.readVersion(spark, tDv, 1L)
      .filter($"k" === 5L).select($"v").as[String].head() == "p-5")
    // diff between v1 and v2 equals the rewriting table's
    val dDv = Upsert.diff(spark, tDv, 1L, 2L, "k")
      .orderBy("k").collect().toSeq
    val dRw = Upsert.diff(spark, tRw, 1L, 2L, "k")
      .orderBy("k").collect().toSeq
    assert(dDv == dRw)
    // change feed identical
    val fDv = Cdf.changesSince(spark, tDv, 1L).orderBy("_op", "k")
      .collect().toSeq
    val fRw = Cdf.changesSince(spark, tRw, 1L).orderBy("_op", "k")
      .collect().toSeq
    assert(fDv == fRw)
  }

  test("chained zero-copy merges + purge compose; _ref never chains") {
    val t = mk("chain")
    val twin = mk("chainTwin")
    def applyBoth(b: Seq[(String, Long, String, Long)]): Unit = {
      Dv.applyCdc(spark, t, "k", b.toDF("op", "k", "v", "n"))
      Upsert.applyCdc(spark, twin, "k", b.toDF("op", "k", "v", "n"))
      ()
    }
    applyBoth(batch) // v2
    // second zero-copy merge RE-touches a key updated by the first (its
    // old row now lives in v2's APPENDS) and inserts another
    applyBoth(Seq(("U", 5L, "updated-again-5", 501L),
      ("I", 6000L, "fresh-6000", 2L))) // v3
    // zero-copy purge on top — victims in base AND in carried appends
    Dv.purge(spark, t, "k", Seq(1234L, 6000L)) // v4
    Forget.purge(spark, twin, "k", Seq(1234L, 6000L)) // v4
    assert(snap(t) == snap(twin))
    // _ref is one hop: every DV version points at the ORIGINAL base dir
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (2L to 4L).foreach { v =>
      assert(Versioned.readSmallFile(f,
        new org.apache.hadoop.fs.Path(s"$t/v=$v/_ref"))
        .contains(s"$t/v=1"))
    }
    // each version's snapshot is self-describing (time travel intact)
    assert(Versioned.readVersion(spark, t, 2L)
      .filter($"k" === 5L).select($"v").as[String].head() == "updated-5")
    assert(Versioned.readVersion(spark, t, 3L)
      .filter($"k" === 5L).select($"v").as[String].head()
      == "updated-again-5")
    assert(Versioned.readVersion(spark, t, 4L)
      .filter($"k" === 6000L).isEmpty)
    // feed bridges the whole chain equally on both tables
    assert(Cdf.changesSince(spark, t, 1L).orderBy("_version", "_op", "k")
      .collect().toSeq ==
      Cdf.changesSince(spark, twin, 1L).orderBy("_version", "_op", "k")
        .collect().toSeq)
  }

  test("materialize compacts appends + vector; DML rejects until then") {
    val t = mk("mat")
    Dv.applyCdc(spark, t, "k", batch.toDF("op", "k", "v", "n"))
    val liveSnap = snap(t)
    // file-targeted DML rejects the ref version loudly
    val e = intercept[IllegalArgumentException] {
      Upsert.merge(spark, t, "k", Seq((1L, "x", 1L)).toDF("k", "v", "n"))
    }
    assert(e.getMessage.contains("materialize"))
    // materialize = the DV compactor: real files, same rows
    val v = Clone.materialize(spark, t)
    assert(!Versioned.isShallowRef(spark, t, v))
    assert(snap(t) == liveSnap)
    // and DML flows again
    assert(Upsert.merge(spark, t, "k",
      Seq((1L, "post-mat", 1L)).toDF("k", "v", "n")) == v + 1)
    assert(Versioned.read(spark, t).filter($"k" === 1L)
      .select($"v").as[String].head() == "post-mat")
  }

  test("replica sync through the feed reproduces a zero-copy merge") {
    val t = mk("sync")
    val replica = s"$root/syncReplica"
    Cdf.seed(spark, t, replica)
    Dv.applyCdc(spark, t, "k", batch.toDF("op", "k", "v", "n"))
    Cdf.sync(spark, t, replica, "k")
    assert(snap(t) == Versioned.read(spark, replica)
      .as[(Long, String, Long)].collect().toSet)
  }

  test("contract rejects: evolution, oversized batches, empty changesets") {
    val t = mk("rej")
    val e1 = intercept[IllegalArgumentException] {
      Dv.applyCdc(spark, t, "k",
        Seq(("U", 1L, "x", 1L, "EXTRA")).toDF("op", "k", "v", "n", "zz"))
    }
    assert(e1.getMessage.contains("evolve"))
    val e2 = intercept[IllegalArgumentException] {
      Dv.merge(spark, t, "k",
        spark.range(0).selectExpr("id as k", "'x' as v", "id as n"))
    }
    assert(e2.getMessage.contains("empty"))
    // duplicate keys reject through the shared validation
    intercept[IllegalArgumentException] {
      Dv.applyCdc(spark, t, "k",
        Seq(("U", 1L, "a", 1L), ("D", 1L, null, 0L))
          .toDF("op", "k", "v", "n"))
    }
    assert(Versioned.currentVersion(spark, t).contains(1L))
  }
}
