package graft.lake

import java.nio.file.Files

import graft.SparkSpec

/**
 * [[Restore]]: zero-copy RESTORE TABLE TO VERSION AS OF. Content equals
 * the target version through every reader, nothing is copied for a plain
 * target (one `_ref` + pin), DV/zero-copy-merge targets travel exactly,
 * history is preserved (a new version commits; time travel across the
 * restored-away window still works), vacuum cannot reclaim the
 * referenced dir, the change feed rejects across the restore, and the
 * CDC replay watermark rewinds with the content.
 */
class RestoreSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-restore").toString

  private def mk(name: String): String = {
    val t = s"$root/$name"
    Forget.publishIndexed(
      (0L until 1000L).map(k => (k, s"p-$k")).toDF("k", "v"),
      t, nFiles = 4, keyCol = "k")
    t
  }

  private def snap(t: String): Set[(Long, String)] =
    Versioned.read(spark, t).as[(Long, String)].collect().toSet

  private def snapAt(t: String, v: Long): Set[(Long, String)] =
    Versioned.readVersion(spark, t, v).as[(Long, String)].collect().toSet

  private def parts(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles())
      .map(_.filter(f => f.isFile && f.getName.startsWith("part-"))
        .map(_.getName).toSeq).getOrElse(Seq.empty)

  test("restore to a plain version: exact content, zero data copies, " +
      "history preserved") {
    val t = mk("plain")
    Upsert.merge(spark, t, "k", Seq((5L, "v2-5"), (2000L, "v2-new"))
      .toDF("k", "v")) // v2
    Forget.purge(spark, t, "k", Seq(7L, 8L)) // v3
    val v1Content = snapAt(t, 1L)
    val v3Content = snapAt(t, 3L)

    val v4 = Restore.restore(spark, t, 1L)
    assert(v4 == 4L)
    assert(snap(t) == v1Content) // live == target
    // zero-copy: the restore version holds NO data files of its own
    assert(parts(s"$t/v=4").isEmpty)
    assert(Versioned.isShallowRef(spark, t, 4L))
    assert(Versioned.dataDir(spark, t, 4L) == s"$t/v=1")
    // history preserved: the restored-away content is still addressable
    assert(snapAt(t, 3L) == v3Content)
    // restore FORWARD works too (undo the undo)
    val v5 = Restore.restore(spark, t, 3L)
    assert(v5 == 5L && snap(t) == v3Content)
  }

  test("no-op at the live version; nonexistent target rejects") {
    val t = mk("edges")
    assert(Restore.restore(spark, t, 1L) == 1L)
    val e = intercept[IllegalArgumentException](
      Restore.restore(spark, t, 42L))
    assert(e.getMessage.contains("does not exist"))
  }

  test("vacuum cannot reclaim a restore-referenced dir; materialize " +
      "detaches and later DML works") {
    val t = mk("vac")
    Upsert.merge(spark, t, "k", Seq((1L, "v2-1")).toDF("k", "v")) // v2
    Restore.restore(spark, t, 1L) // v3 -> ref v1
    // keep=0 would drop v1 and v2; v1 must survive (pinned by v3's ref)
    val dropped = Versioned.vacuum(spark, t, keep = 0)
    assert(!dropped.contains(1L) && dropped.contains(2L))
    assert(snap(t).contains((1L, "p-1"))) // still reads the v1 content
    // file-targeted DML rejects the ref version toward materialize
    val e = intercept[Exception](
      Upsert.merge(spark, t, "k", Seq((3L, "x")).toDF("k", "v")))
    assert(e.getMessage.contains("materialize"))
    Clone.materialize(spark, t)
    Upsert.merge(spark, t, "k", Seq((3L, "post-restore")).toDF("k", "v"))
    assert(snap(t).contains((3L, "post-restore")))
    // with the ref materialized away, vacuum now reclaims v1
    val dropped2 = Versioned.vacuum(spark, t, keep = 0)
    assert(dropped2.contains(1L))
  }

  test("restore to a DV/zero-copy-merge target travels the vector and " +
      "appended files exactly") {
    val t = mk("dv")
    // v2: zero-copy merge (vector + appended files), v3: more churn
    Dv.applyCdc(spark, t, "k",
      Seq(("U", 5L, "dv-5"), ("I", 5000L, "dv-ins"), ("D", 9L, null))
        .toDF("op", "k", "v"))
    val v2Content = snapAt(t, 2L)
    Dv.purge(spark, t, "k", Seq(11L, 12L)) // v3
    assert(snap(t) != v2Content)

    val v4 = Restore.restore(spark, t, 2L)
    assert(v4 == 4L)
    assert(snap(t) == v2Content)
    // the vector traveled (v2's 2 vectored old rows, not v3's cumulative 4)
    assert(Dv.deletedRows(spark, t, 4L) == Dv.deletedRows(spark, t, 2L))
    // appended files byte-carried into the restore version's own dir
    assert(parts(s"$t/v=4").nonEmpty)
    // ref names v2's BASE dir, not v2 itself — refs never chain
    assert(Versioned.dataDir(spark, t, 4L) == s"$t/v=1")
  }

  test("change feed rejects across a restore; replay watermark rewinds") {
    val t = mk("cdf")
    Upsert.applyCdc(spark, t, "k",
      Seq(("U", 1L, "tag-a")).toDF("op", "k", "v"),
      batchTag = Some("batch-a")) // v2, tagged
    assert(Upsert.lastBatchTag(spark, t).contains("batch-a"))
    Restore.restore(spark, t, 1L) // v3 -> content of untagged v1
    // watermark rewound with the content
    assert(Upsert.lastBatchTag(spark, t).isEmpty)
    // changesSince across the restore rejects toward a resync
    val e = intercept[IllegalStateException](
      Cdf.changesSince(spark, t, sinceV = 1L))
    assert(e.getMessage.toLowerCase.contains("snapshot") ||
      e.getMessage.toLowerCase.contains("changeset") ||
      e.getMessage.toLowerCase.contains("resync"))
    // restoring to the TAGGED version carries its tag forward
    Restore.restore(spark, t, 2L) // v4
    assert(Upsert.lastBatchTag(spark, t).contains("batch-a"))
  }
}
