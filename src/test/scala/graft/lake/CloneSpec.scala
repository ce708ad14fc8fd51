package graft.lake

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/**
 * Shallow clone + timestamp travel ([[Clone]], [[Versioned.readAsOf]]):
 * a clone is one pointer file (zero data movement), reads the pinned
 * snapshot through source republishes, refuses file-targeted DML until
 * materialized, and never chains refs; commit timestamps resolve
 * as-of reads to the newest version at or before the asked instant.
 */
class CloneSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-clone").toString

  private def publish(name: String, n: Long): String = {
    val t = s"$root/$name"
    val rows = (0L until n).map(k => (k, s"payload-$k")).toDF("k", "v")
    Forget.publishIndexed(rows, t, nFiles = 4, keyCol = "k")
    t
  }

  test("shallow clone: zero-copy, identical read, pinned through source DML") {
    val src = publish("src", 1000L)
    val dst = s"$root/dst"
    assert(Clone.shallow(spark, src, dst) == 1L)
    // zero data movement: the clone's version dir holds no part- files
    val cloneFiles = new java.io.File(s"$dst/v=1").listFiles().map(_.getName)
    assert(!cloneFiles.exists(_.startsWith("part-")), cloneFiles.mkString(","))
    assert(Files.exists(Paths.get(s"$dst/v=1/_ref")))
    assert(Versioned.read(spark, dst).count() == 1000L)
    // the clone pins the SNAPSHOT: a source merge publishes source v2,
    // the clone still reads the v1 files it references
    Upsert.merge(spark, src, "k",
      Seq((1L, "SOURCE-CHANGED")).toDF("k", "v"))
    assert(Versioned.read(spark, src)
      .filter($"k" === 1L).select($"v").as[String].head() == "SOURCE-CHANGED")
    assert(Versioned.read(spark, dst)
      .filter($"k" === 1L).select($"v").as[String].head() == "payload-1")
  }

  test("DML on a ref version is rejected; materialize unlocks it") {
    val src = publish("dmlsrc", 200L)
    val dst = s"$root/dmldst"
    Clone.shallow(spark, src, dst)
    val changes = Seq((7L, "CLONE-CHANGED")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.merge(spark, dst, "k", changes)
    }
    assert(e.getMessage.contains("materialize"))
    val e2 = intercept[IllegalArgumentException] {
      Forget.purge(spark, dst, "k", Seq(7L))
    }
    assert(e2.getMessage.contains("materialize"))
    // copy-on-write escalation: materialize, then DML applies to the
    // clone and the source never sees it
    val mv = Clone.materialize(spark, dst)
    assert(mv == 2L)
    assert(Clone.materialize(spark, dst) == mv) // idempotent no-op
    Upsert.merge(spark, dst, "k", changes)
    assert(Versioned.read(spark, dst)
      .filter($"k" === 7L).select($"v").as[String].head() == "CLONE-CHANGED")
    assert(Versioned.read(spark, src)
      .filter($"k" === 7L).select($"v").as[String].head() == "payload-7")
  }

  test("clone of a clone points at real data — refs never chain") {
    val src = publish("chainsrc", 100L)
    val a = s"$root/chain-a"
    val b = s"$root/chain-b"
    Clone.shallow(spark, src, a)
    Clone.shallow(spark, a, b)
    val srcDir = Versioned.dataDir(spark, src,
      Versioned.currentVersion(spark, src).get)
    assert(Versioned.dataDir(spark, b, 1L) == srcDir)
    assert(Versioned.read(spark, b).count() == 100L)
  }

  test("a clone pins its version against source vacuum until released") {
    val src = publish("vacsrc", 500L)                      // v1
    Upsert.merge(spark, src, "k", Seq((1L, "V2")).toDF("k", "v")) // v2
    val dst = s"$root/vacdst"
    Clone.shallow(spark, src, dst)                         // pins src v2
    Upsert.merge(spark, src, "k", Seq((2L, "V3")).toDF("k", "v")) // v3
    Upsert.merge(spark, src, "k", Seq((3L, "V4")).toDF("k", "v")) // v4
    // keep=0 would drop v1-v3; the pin must save exactly v2
    val dropped = Versioned.vacuum(spark, src, keep = 0)
    assert(dropped == Seq(1L, 3L), s"dropped $dropped")
    assert(Versioned.versions(spark, src) == Seq(2L, 4L))
    // the clone still reads its pinned snapshot
    assert(Versioned.read(spark, dst)
      .filter($"k" === 1L).select($"v").as[String].head() == "V2")
    assert(Versioned.read(spark, dst)
      .filter($"k" === 2L).select($"v").as[String].head() == "payload-2")
    // materialize does NOT release the pin: the clone's v1 ref is still
    // time-travel readable and must stay vacuum-safe
    Clone.materialize(spark, dst)
    assert(Versioned.vacuum(spark, src, keep = 0).isEmpty)
    assert(Versioned.readVersion(spark, dst, 1L)
      .filter($"k" === 1L).select($"v").as[String].head() == "V2")
    // the pin releases when the CLONE vacuums its ref version away
    assert(Versioned.vacuum(spark, dst, keep = 0) == Seq(1L))
    assert(Versioned.vacuum(spark, src, keep = 0) == Seq(2L))
    assert(Versioned.read(spark, dst)
      .filter($"k" === 1L).select($"v").as[String].head() == "V2")
  }

  test("pin matching is path-normalized: a spelling drift cannot unpin") {
    val src = publish("spellsrc", 100L)                    // v1
    val dst = s"$root/spelldst"
    // clone FROM a trailing-slash spelling: the recorded pin target then
    // reads ".../spellsrc//v=1"; vacuum below uses the clean spelling —
    // raw string comparison would unpin and delete v1 under the clone
    Clone.shallow(spark, src + "/", dst)
    Upsert.merge(spark, src, "k", Seq((1L, "V2")).toDF("k", "v")) // v2
    assert(Versioned.vacuum(spark, src, keep = 0).isEmpty) // v1 stays pinned
    assert(Versioned.read(spark, dst).count() == 100L)
    // content-matched detach finds the pin despite the drift
    Clone.detach(spark, src, dst)
    assert(Versioned.vacuum(spark, src, keep = 0) == Seq(1L))
  }

  test("clone-of-clone pins at the OWNER; pins live per referenced dir") {
    val a = publish("ownersrc", 100L)                      // the real data
    val b = s"$root/owner-b"
    val c = s"$root/owner-c"
    // count pin FILES only — the local checksum FS adds .crc sidecars
    def pins(table: String): Int = {
      val fl = new java.io.File(s"$table/_clones").listFiles()
      if (fl == null) 0 else fl.count(!_.getName.startsWith("."))
    }
    Clone.shallow(spark, a, b)
    Clone.shallow(spark, b, c) // C's pin must land at A, not B
    assert(pins(a) == 2)
    assert(!new java.io.File(s"$b/_clones").exists())
    // re-cloning C from a DIFFERENT source KEEPS the old pin at A — C's
    // v1 still refs A's data and stays time-travel readable
    val a2 = publish("ownersrc2", 50L)
    Clone.shallow(spark, a2, c)
    assert(pins(a) == 2)
    assert(pins(a2) == 1)
    assert(Versioned.read(spark, c).count() == 50L)
    assert(Versioned.readVersion(spark, c, 1L).count() == 100L)
    // vacuuming C's old ref version is what releases its pin at A;
    // B's pin (still live) survives
    assert(Versioned.vacuum(spark, c, keep = 0) == Seq(1L))
    assert(pins(a) == 1)
    assert(pins(a2) == 1)
  }

  test("vacuum's ref cancellation is path-qualified: spelling drift " +
       "cannot release a surviving version's pin") {
    val src = publish("qualsrc", 100L)                     // v1
    val dst = s"$root/qualdst"
    // clone TWICE from different spellings of the same source AND the
    // same source version: two pins (different names), two clone
    // versions whose _ref strings differ only in spelling
    Clone.shallow(spark, src + "/", dst)                   // dst v1
    Clone.shallow(spark, src, dst)                         // dst v2
    // vacuum the clone: v1 drops; its ref target equals v2's ref target
    // after qualification, so NO pin may release (v2 still needs it)
    assert(Versioned.vacuum(spark, dst, keep = 0) == Seq(1L))
    Upsert.merge(spark, src, "k", Seq((1L, "V2")).toDF("k", "v")) // src v2
    assert(Versioned.vacuum(spark, src, keep = 0).isEmpty) // v1 stays pinned
    assert(Versioned.read(spark, dst).count() == 100L)     // clone reads
  }

  test("detach releases a hand-deleted clone's leaked pin") {
    val src = publish("leaksrc", 200L)                     // v1
    val dst = s"$root/leakdst"
    Clone.shallow(spark, src, dst)                         // pins v1
    Upsert.merge(spark, src, "k", Seq((1L, "V2")).toDF("k", "v")) // v2
    // simulate `rm -rf` of the clone: the pin leaks and blocks reclaim
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dst))
    assert(Versioned.vacuum(spark, src, keep = 0).isEmpty) // v1 pinned
    Clone.detach(spark, src, dst)
    assert(Versioned.vacuum(spark, src, keep = 0) == Seq(1L))
  }

  test("readAsOf resolves the newest version at or before the instant") {
    val t = publish("asof", 100L)
    Thread.sleep(5)
    val mid = System.currentTimeMillis()
    Thread.sleep(5)
    Upsert.merge(spark, t, "k", Seq((1L, "V2")).toDF("k", "v"))
    // at `mid` only v1 existed
    assert(Versioned.readAsOf(spark, t, mid)
      .filter($"k" === 1L).select($"v").as[String].head() == "payload-1")
    assert(Versioned.readAsOf(spark, t, System.currentTimeMillis())
      .filter($"k" === 1L).select($"v").as[String].head() == "V2")
    val times = Versioned.commitTimes(spark, t)
    assert(times.map(_._1) == Seq(1L, 2L))
    assert(times.map(_._2).sorted == times.map(_._2)) // monotone commits
    val e = intercept[IllegalArgumentException] {
      Versioned.readAsOf(spark, t, times.head._2 - 1000L)
    }
    assert(e.getMessage.contains("no version"))
  }
}
