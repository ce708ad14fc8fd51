package graft.lake

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import graft.SparkSpec

/**
 * MERGE contract ([[Upsert]]): updates replace, inserts add, deletes
 * remove — in one file-targeted pass that byte-copies every file the
 * changed keys cannot touch; the pre-merge version stays readable; a
 * re-applied changeset is a data fixed point; NULL-key table rows survive
 * and NULL-key changeset rows are rejected.
 */
class UpsertSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-upsert").toString

  private def md5(path: String): String =
    MessageDigest.getInstance("MD5")
      .digest(Files.readAllBytes(Paths.get(path)))
      .map("%02x".format(_)).mkString

  private def partSums(dir: String): Map[String, String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(f => f.getName -> md5(f.getPath)).toMap

  private def freshTable(name: String, n: Long = 10000L): String = {
    val t = s"$root/$name"
    val rows = (0L until n).map(k => (k, s"payload-$k")).toDF("k", "v")
    assert(Forget.publishIndexed(rows, t, nFiles = 8, keyCol = "k") == 1L)
    t
  }

  test("updates replace, inserts add; every other row survives") {
    val t = freshTable("basic")
    val changes = Seq((42L, "UPDATED-42"), (4242L, "UPDATED-4242"),
      (20000L, "INSERTED-20000")).toDF("k", "v")
    assert(Upsert.merge(spark, t, "k", changes) == 2L)
    val after = Versioned.read(spark, t)
    assert(after.count() == 10000L + 1)
    assert(after.filter($"k" === 42L).select($"v").as[String].head()
      == "UPDATED-42")
    assert(after.filter($"k" === 20000L).select($"v").as[String].head()
      == "INSERTED-20000")
    // an update leaves exactly one row for its key — never a duplicate
    assert(after.filter($"k" === 4242L).count() == 1L)
    assert(after.filter($"k" === 41L).select($"v").as[String].head()
      == "payload-41")
  }

  test("untouched files are byte-identical; rewrite is file-targeted") {
    val t = freshTable("targeted")
    val before = partSums(s"$t/v=1")
    Upsert.merge(spark, t, "k", Seq((7L, "UPDATED-7")).toDF("k", "v"))
    val after = partSums(s"$t/v=2")
    val carried = after.keySet.intersect(before.keySet)
    assert(carried.nonEmpty, "one changed key rewrote all 8 files")
    carried.foreach(n => assert(after(n) == before(n), s"$n changed bytes"))
    assert(after.keySet.diff(before.keySet).size < 8)
    carried.foreach { n =>
      assert(Files.exists(Paths.get(s"$t/v=2/_bloom/$n.bloom")))
    }
  }

  test("pre-merge version stays readable (time travel)") {
    val t = freshTable("travel")
    Upsert.merge(spark, t, "k", Seq((42L, "UPDATED-42")).toDF("k", "v"))
    val old = Versioned.readVersion(spark, t, 1L)
    assert(old.filter($"k" === 42L).select($"v").as[String].head()
      == "payload-42")
    assert(Versioned.read(spark, t)
      .filter($"k" === 42L).select($"v").as[String].head() == "UPDATED-42")
  }

  test("applyCdc handles inserts, updates, and deletes in one pass") {
    val t = freshTable("cdc")
    val batch = Seq(
      ("U", 5L, "UPDATED-5"),
      ("I", 30000L, "INSERTED-30000"),
      ("D", 6L, null.asInstanceOf[String]),
      ("D", 7L, null.asInstanceOf[String])).toDF("op", "k", "v")
    assert(Upsert.applyCdc(spark, t, "k", batch) == 2L)
    val after = Versioned.read(spark, t)
    assert(after.count() == 10000L + 1 - 2)
    assert(after.filter($"k" === 5L).select($"v").as[String].head()
      == "UPDATED-5")
    assert(after.filter($"k".isin(6L, 7L)).isEmpty)
    assert(after.filter($"k" === 30000L).count() == 1L)
  }

  test("a pure-insert batch publishes even when no file admits its keys") {
    val t = freshTable("inserts", n = 1000L)
    val before = partSums(s"$t/v=1")
    Upsert.merge(spark, t, "k",
      Seq((50000L, "NEW-A"), (50001L, "NEW-B")).toDF("k", "v"))
    val after = Versioned.read(spark, t)
    assert(after.count() == 1002L)
    assert(after.filter($"k" >= 50000L).count() == 2L)
    // whatever was not admitted carried byte-identically (fpp may admit
    // a file spuriously; the copy set is still non-empty at 2 keys / 8 files)
    val carried = partSums(s"$t/v=2").keySet.intersect(before.keySet)
    assert(carried.nonEmpty)
    carried.foreach(n => assert(partSums(s"$t/v=2")(n) == before(n)))
  }

  test("NULL-key table rows survive; NULL-key changeset rows are rejected") {
    val t = s"$root/nullable"
    val rows = ((0L until 200L).map(k => (Some(k), s"payload-$k"))
      ++ (0 until 5).map(i => (None: Option[Long], s"anon-$i")))
      .toDF("k", "v")
    Forget.publishIndexed(rows, t, nFiles = 4, keyCol = "k")
    Upsert.merge(spark, t, "k", Seq((3L, "UPDATED-3")).toDF("k", "v"))
    val after = Versioned.read(spark, t)
    assert(after.filter($"k".isNull).count() == 5L)
    assert(after.count() == 205L)
    val bad = Seq((Some(9L), "x"), (None: Option[Long], "y")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.merge(spark, t, "k", bad)
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("re-applying the same changeset is a data fixed point") {
    val t = freshTable("idem", n = 1000L)
    val changes = Seq((10L, "UPDATED-10"), (9000L, "INSERTED")).toDF("k", "v")
    Upsert.merge(spark, t, "k", changes)
    val v2 = Versioned.read(spark, t).orderBy($"k").collect().toSeq
    Upsert.merge(spark, t, "k", changes)
    val v3 = Versioned.read(spark, t).orderBy($"k").collect().toSeq
    assert(v3 == v2)
  }

  test("diff between versions emits the exact I/U/D changeset") {
    val t = s"$root/diffsrc"
    val v1rows = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")),
      (4L, None: Option[String])).toDF("k", "v")
    Forget.publishIndexed(v1rows, t, nFiles = 2, keyCol = "k")
    // v2: 1 unchanged, 2 updated, 3 deleted, 4 NULL->value, 5 inserted
    Upsert.applyCdc(spark, t, "k", Seq(
      ("U", 2L, Some("B")), ("D", 3L, None: Option[String]),
      ("U", 4L, Some("now-set")), ("I", 5L, Some("e")))
      .toDF("op", "k", "v"))
    val d = Upsert.diff(spark, t, 1L, 2L, "k")
      .orderBy($"k").as[(String, Long, Option[String])].collect().toSeq
    assert(d == Seq(("U", 2L, Some("B")), ("D", 3L, None),
      ("U", 4L, Some("now-set")), ("I", 5L, Some("e"))))
  }

  test("applyCdc(diff(v1, v2)) syncs a replica from v1 to v2") {
    val t = freshTable("diffmain", n = 500L)
    // replica starts at v1 of the main table
    val r = s"$root/diffreplica"
    Forget.publishIndexed(Versioned.readVersion(spark, t, 1L), r,
      nFiles = 4, keyCol = "k")
    // main advances: mixed churn
    Upsert.applyCdc(spark, t, "k", Seq(
      ("U", 17L, "UPDATED-17"), ("D", 99L, null.asInstanceOf[String]),
      ("I", 7777L, "INSERTED")).toDF("op", "k", "v"))
    // mirror the delta
    Upsert.applyCdc(spark, r, "k", Upsert.diff(spark, t, 1L, 2L, "k"))
    val main = Versioned.read(spark, t).orderBy($"k").collect().toSeq
    val replica = Versioned.read(spark, r).orderBy($"k").collect().toSeq
    assert(replica == main)
  }

  test("randomized CHURN feeds through lastPerKey + applyCdc agree with the model") {
    // the full production stack: an unreduced feed with intra-batch churn
    // and a sequence column, reduced by lastPerKey, applied by applyCdc —
    // vs a model that folds ops in sequence order
    val t = s"$root/churnrandom"
    val rnd = new scala.util.Random(424242L)
    var model = (0L until 200L).map(k => k -> s"payload-$k").toMap
    Forget.publishIndexed(
      model.toSeq.toDF("k", "v"), t, nFiles = 4, keyCol = "k")
    var seq = 0L
    for (round <- 1 to 4) {
      val feed = (0 until 40).map { _ =>
        seq += 1
        val k = rnd.nextInt(250).toLong
        rnd.nextInt(3) match {
          case 0 => ("U", k, s"u$seq", seq)
          case 1 => ("I", k, s"i$seq", seq)
          case _ => ("D", k, null.asInstanceOf[String], seq)
        }
      }
      // model folds in SEQUENCE order — exactly what lastPerKey must pick
      feed.sortBy(_._4).foreach {
        case ("D", k, _, _) => model -= k
        case (_, k, v, _) => model += (k -> v)
      }
      Upsert.applyCdc(spark, t, "k",
        Upsert.lastPerKey(feed.toDF("op", "k", "v", "seq"), "k", "seq"))
      val got = Versioned.read(spark, t).as[(Long, String)].collect().toMap
      assert(got == model, s"diverged from model at round $round")
    }
  }

  test("randomized CDC sequences agree with an in-memory model") {
    val t = s"$root/random"
    val rnd = new scala.util.Random(20260814L)
    var model = (0L until 300L).map(k => k -> s"payload-$k").toMap
    Forget.publishIndexed(
      model.toSeq.toDF("k", "v"), t, nFiles = 4, keyCol = "k")
    for (round <- 1 to 6) {
      // random batch over a key space that forces I/U/D collisions
      val ops = (0 until 20).map { _ =>
        val k = rnd.nextInt(400).toLong
        rnd.nextInt(3) match {
          case 0 => ("U", k, s"u$round-$k") // upsert semantics either way
          case 1 => ("I", k, s"i$round-$k")
          case _ => ("D", k, null.asInstanceOf[String])
        }
      }
      // within one batch, keep the LAST op per key (the contract a CDC
      // producer provides; duplicate keys in one changeset are undefined)
      val lastPerKey = ops.groupBy(_._2).map(_._2.last).toSeq
      lastPerKey.foreach {
        case ("D", k, _) => model -= k
        case (_, k, v) => model += (k -> v)
      }
      Upsert.applyCdc(spark, t, "k", lastPerKey.toDF("op", "k", "v"))
      val got = Versioned.read(spark, t).as[(Long, String)]
        .collect().toMap
      assert(got == model, s"diverged from model at round $round")
    }
  }

  test("duplicate keys in one batch are rejected, not silently applied") {
    val t = freshTable("dupes", n = 100L)
    // I then D for one key: unordered in a DataFrame, so applying both is
    // undefined — the old behavior silently resurrected the deleted row
    val churn = Seq(("I", 7L, "created"), ("D", 7L, null.asInstanceOf[String]))
      .toDF("op", "k", "v")
    val e1 = intercept[IllegalArgumentException] {
      Upsert.applyCdc(spark, t, "k", churn)
    }
    assert(e1.getMessage.contains("duplicate"))
    // two upserts for one key through merge(): would insert both rows
    val e2 = intercept[IllegalArgumentException] {
      Upsert.merge(spark, t, "k", Seq((5L, "a"), (5L, "b")).toDF("k", "v"))
    }
    assert(e2.getMessage.contains("duplicate"))
    // and a D row with a NULL key gets the friendly rejection too
    val e3 = intercept[IllegalArgumentException] {
      Upsert.applyCdc(spark, t, "k",
        Seq(("D", Option.empty[Long], Option.empty[String]))
          .toDF("op", "k", "v"))
    }
    assert(e3.getMessage.contains("NULL"))
  }

  test("NULL ops and sequence collisions are rejected, never silently dropped") {
    val t = freshTable("nullop", n = 100L)
    // a NULL op would be dropped by BOTH the ===\"D\" and =!=\"D\" filters —
    // the change would silently vanish; reject instead
    val e1 = intercept[IllegalArgumentException] {
      Upsert.applyCdc(spark, t, "k",
        Seq((Option.empty[String], 9L, Some("x"))).toDF("op", "k", "v"))
    }
    assert(e1.getMessage.contains("NULL op"))
    // two ops for one key at the SAME sequence: the winner would be
    // arbitrary — the producer's ordering is broken, refuse
    val e2 = intercept[IllegalArgumentException] {
      Upsert.lastPerKey(
        Seq(("U", 5L, "a", 10L), ("U", 5L, "b", 10L))
          .toDF("op", "k", "v", "seq"), "k", "seq")
    }
    assert(e2.getMessage.contains("collision"))
    // an unsequenced row cannot be ordered either
    val e3 = intercept[IllegalArgumentException] {
      Upsert.lastPerKey(
        Seq(("U", 5L, "a", Option.empty[Long]))
          .toDF("op", "k", "v", "seq"), "k", "seq")
    }
    assert(e3.getMessage.contains("NULL seq"))
  }

  test("lastPerKey reduces intra-batch churn by sequence; applyCdc accepts it") {
    val t = freshTable("churn", n = 100L)
    val feed = Seq(
      ("I", 7L, "created", 1L), ("U", 7L, "updated", 2L),
      ("D", 7L, null.asInstanceOf[String], 3L),   // net: delete 7
      ("U", 9L, "first", 10L), ("U", 9L, "last", 11L)) // net: 9 -> last
      .toDF("op", "k", "v", "seq")
    val reduced = Upsert.lastPerKey(feed, "k", "seq")
    assert(reduced.count() == 2L)
    Upsert.applyCdc(spark, t, "k", reduced)
    val after = Versioned.read(spark, t)
    assert(after.filter($"k" === 7L).isEmpty)
    assert(after.filter($"k" === 9L).select($"v").as[String].head() == "last")
    assert(after.count() == 99L)
  }

  test("a vacuous delete-only batch is a no-op, not a full-table copy") {
    val t = freshTable("vacuous", n = 1000L)
    val before = Versioned.currentVersion(spark, t).get
    // keys the table never held and (overwhelmingly likely) no Bloom
    // false positive admits; the old behavior byte-copied all 8 files
    // into a fresh version
    val v = Upsert.applyCdc(spark, t, "k",
      Seq(("D", 999999901L, null.asInstanceOf[String]),
        ("D", 999999902L, null.asInstanceOf[String])).toDF("op", "k", "v"))
    assert(v == before || v == before + 1) // fpp may legitimately admit one
    if (v == before)
      assert(Versioned.versions(spark, t).max == before) // nothing published
  }

  test("diff rejects an opCol that collides with a table column") {
    val t = s"$root/opclash"
    Forget.publishIndexed(Seq((1L, "x")).toDF("k", "op"), t, 2, "k")
    Upsert.merge(spark, t, "k", Seq((2L, "y")).toDF("k", "op"))
    val e = intercept[IllegalArgumentException] {
      Upsert.diff(spark, t, 1L, 2L, "k") // default opCol = "op" collides
    }
    assert(e.getMessage.contains("op"))
    // a non-colliding opCol works
    assert(Upsert.diff(spark, t, 1L, 2L, "k", opCol = "cdc_op").count() == 1L)
  }

  test("schema-mismatched changesets are rejected") {
    val t = freshTable("schema", n = 100L)
    val e = intercept[IllegalArgumentException] {
      Upsert.merge(spark, t, "k", Seq((1L, "x", 0)).toDF("k", "v", "extra"))
    }
    assert(e.getMessage.contains("schema"))
  }

  test("a long batchTag (> one read buffer) round-trips untruncated") {
    val t = freshTable("longtag", n = 100L)
    // longer than any fixed read buffer — a truncated tag would never
    // match on replay, silently re-applying the batch
    val tag = Seq.fill(500)("segment").mkString("-")
    Upsert.applyCdc(spark, t, "k",
      Seq(("U", 1L, "UPDATED-1")).toDF("op", "k", "v"),
      batchTag = Some(tag))
    assert(Upsert.lastBatchTag(spark, t).contains(tag))
    assert(Upsert.recentBatchTags(spark, t).contains(tag))
  }

  test("a pure-insert batch is sized from the batch, not the affected set") {
    val t = s"$root/pureinsert"
    val rows = (0L until 10000L).map(k => (k, s"payload-$k")).toDF("k", "v")
    Forget.publishIndexed(rows, t, nFiles = 8, keyCol = "k", stats = true)
    // 5000 brand-new keys outside every file's [kmin, kmax]: zero files
    // admitted, so this is the pure-insert path. The live table averages
    // 1250 rows/file — the batch must land in 4 fresh files, never ONE
    // oversized skew-prone file
    val inserts = (20000L until 25000L).map(k => (k, s"new-$k")).toDF("k", "v")
    assert(Upsert.merge(spark, t, "k", inserts) == 2L)
    val before = partSums(s"$t/v=1").keySet
    val after = partSums(s"$t/v=2").keySet
    assert(before.subsetOf(after), "originals must byte-copy over")
    val freshFiles = after.diff(before)
    assert(freshFiles.size == 4,
      s"expected 4 insert files sized from the batch, got ${freshFiles.size}")
    assert(Versioned.read(spark, t).count() == 15000L)
  }

  test("past the driver-key budget the distributed path gives identical results") {
    // two identical tables (one with a NULL-key row, which no changeset can
    // name), the same I/U/D batch: the driver path and the distributed path
    // (forced by a tiny budget) must agree on table rows, change feed, and
    // vacuous-replay behavior
    def mk(name: String): String = {
      val t = s"$root/$name"
      val rows = ((0L until 2000L).map(k => (Some(k), s"payload-$k"))
        :+ ((None: Option[Long], "null-key-row"))).toDF("k", "v")
      Forget.publishIndexed(rows, t, nFiles = 8, keyCol = "k", stats = true)
      t
    }
    val a = mk("budget-driver")
    val b = mk("budget-dist")
    val batch = (
      (0L until 300L by 3).map(k => ("U", Some(k), s"UPD-$k")) ++
        (3000L until 3050L).map(k => ("I", Some(k), s"INS-$k")) ++
        (1000L until 1040L).map(k => ("D", Some(k), null: String)))
      .toDF("op", "k", "v")
    assert(Upsert.applyCdc(spark, a, "k", batch) == 2L)
    assert(Upsert.applyCdc(spark, b, "k", batch, maxDriverKeys = 8) == 2L)

    def snap(t: String): Set[(Option[Long], String)] =
      Versioned.read(spark, t).as[(Option[Long], String)].collect().toSet
    assert(snap(a) == snap(b))
    assert(Versioned.read(spark, b).filter($"k".isNull).count() == 1L,
      "the NULL-key row must survive the anti-join survivor filter")

    // the recorded change feeds agree (deletes came from the frame)
    def feed(t: String): Set[(String, Option[Long], Option[String])] =
      Cdf.changesSince(spark, t, 1L).select($"_op", $"k", $"v")
        .as[(String, Option[Long], Option[String])].collect().toSet
    assert(feed(a) == feed(b))

    // a vacuous delete-only replay still no-ops on the distributed path
    val delOnly = Seq(("D", 999999L, null: String)).toDF("op", "k", "v")
    assert(Upsert.applyCdc(spark, b, "k", delOnly, maxDriverKeys = 0) == 2L)

    // additive schema evolution works distributed too
    val evolved = Seq((1L, "EVOLVED-1", "extra")).toDF("k", "v", "w")
    assert(Upsert.merge(spark, b, "k", evolved, evolveSchema = true,
      maxDriverKeys = 0) == 3L)
    val after = Versioned.read(spark, b)
    assert(after.columns.toSeq == Seq("k", "v", "w"))
    assert(after.filter($"k" === 1L).select($"w").as[String].head()
      == "extra")
    assert(after.filter($"k" === 2L).select($"w".isNull).as[Boolean].head())
  }
}
