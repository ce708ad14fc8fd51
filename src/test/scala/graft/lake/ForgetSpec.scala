package graft.lake

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import graft.SparkSpec

/**
 * Targeted-delete contract ([[Forget]]): purged keys are gone from the new
 * live snapshot, every file the key set could not touch is transferred
 * BYTE-IDENTICALLY (no decode/re-encode), the pre-purge version stays
 * readable until vacuum, and a re-submitted deletion request is a no-op on
 * the data.
 */
class ForgetSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-forget").toString
  private val table = () => s"$root/users"
  private val purgedKeys = Seq(42L, 4242L, 9999L)

  private def md5(path: String): String =
    MessageDigest.getInstance("MD5")
      .digest(Files.readAllBytes(Paths.get(path)))
      .map("%02x".format(_)).mkString

  /** (fileName -> md5) for every part file of one version dir. */
  private def partSums(dir: String): Map[String, String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(f => f.getName -> md5(f.getPath)).toMap

  private lazy val setup: (Map[String, String], Long) = {
    val rows = (0L until 10000L).map(k => (k, s"payload-$k")).toDF("k", "v")
    val v1 = Forget.publishIndexed(rows, table(), nFiles = 8, keyCol = "k")
    assert(v1 == 1L)
    (partSums(s"${table()}/v=1"), Forget.purge(spark, table(), "k", purgedKeys))
  }

  test("purged keys are absent; every other row survives") {
    val (_, v2) = setup
    assert(v2 == 2L)
    val after = Versioned.read(spark, table())
    assert(after.filter($"k".isin(purgedKeys: _*)).isEmpty)
    assert(after.count() == 10000L - purgedKeys.size)
    // spot-check payloads came through the rewrite unharmed
    assert(after.filter($"k" === 41L).select($"v").as[String].head()
      == "payload-41")
  }

  test("untouched files are byte-identical copies; only admitted files rewrote") {
    val (before, _) = setup
    val after = partSums(s"${table()}/v=2")
    // files carried over under their original names must be bitwise-equal
    val carried = after.keySet.intersect(before.keySet)
    assert(carried.nonEmpty, "purge of 3 keys rewrote all 8 files")
    carried.foreach(n => assert(after(n) == before(n), s"$n changed bytes"))
    // and the rewrite really was targeted: rewritten (new-name) files are
    // bounded by the candidate count, which 3 keys keep well under 8
    val rewritten = after.keySet.diff(before.keySet)
    assert(rewritten.size < 8, s"rewrote ${rewritten.size} of 8 files")
    // sidecars rode along for every carried file
    carried.foreach { n =>
      assert(Files.exists(Paths.get(s"${table()}/v=2/_bloom/$n.bloom")))
    }
  }

  test("pre-purge version stays readable (time travel) until vacuum") {
    val (_, v2) = setup
    val old = Versioned.readVersion(spark, table(), v2 - 1)
    assert(old.filter($"k" === 42L).count() == 1L) // still there, pre-purge
    val dropped = Versioned.vacuum(spark, table(), keep = 0)
    assert(dropped == Seq(v2 - 1))
    assert(!Files.exists(Paths.get(s"${table()}/v=1")))
    // live snapshot unaffected by the vacuum
    assert(Versioned.read(spark, table()).count() == 10000L - purgedKeys.size)
  }

  test("re-submitted deletion request leaves the data unchanged") {
    val (_, v2) = setup
    val again = Forget.purge(spark, table(), "k", purgedKeys)
    // rewritten sidecars no longer admit the keys, so this is normally the
    // no-op fast path; a Bloom false positive may legitimately republish —
    // either way the DATA is already purged and must be unchanged
    assert(again == v2 || again == v2 + 1)
    val df = Versioned.read(spark, table())
    assert(df.count() == 10000L - purgedKeys.size)
    assert(df.filter($"k".isin(purgedKeys: _*)).isEmpty)
  }

  test("range-clustered tables prune by footer min/max alone (no sidecars)") {
    val t = s"$root/clustered"
    val rows = (0L until 10000L).map(k => (k, s"payload-$k")).toDF("k", "v")
    val v1 = Forget.publishClustered(rows, t, nFiles = 8, keyCol = "k")
    assert(v1 == 1L)
    assert(!Files.exists(Paths.get(s"$t/v=1/_bloom"))) // truly stats-only
    val before = partSums(s"$t/v=1")
    // two adjacent keys land in ONE range file: exactly one file rewrites
    val v2 = Forget.purge(spark, t, "k", Seq(5L, 17L))
    assert(v2 == 2L)
    val after = partSums(s"$t/v=2")
    val carried = after.keySet.intersect(before.keySet)
    assert(carried.size == before.size - 1,
      s"expected 1 rewrite of ${before.size}, carried ${carried.size}")
    carried.foreach(n => assert(after(n) == before(n), s"$n changed bytes"))
    val df = Versioned.read(spark, t)
    assert(df.count() == 9998L)
    assert(df.filter($"k".isin(5L, 17L)).isEmpty)
  }

  test("purging every row of a file (and of the whole table) stays readable") {
    val t = s"$root/drain"
    val rows = (0L until 100L).map(k => (k, s"payload-$k")).toDF("k", "v")
    Forget.publishClustered(rows, t, nFiles = 2, keyCol = "k")
    val before = partSums(s"$t/v=1")
    // range file 1 covers the low half: purging all of 0..49 empties it
    val v2 = Forget.purge(spark, t, "k", (0L until 50L).toSeq)
    assert(v2 == 2L)
    val after = Versioned.read(spark, t)
    assert(after.count() == 50L)
    assert(after.agg(org.apache.spark.sql.functions.min($"k"))
      .head().getLong(0) == 50L)
    // the untouched upper-range file carried byte-identically
    val carried = partSums(s"$t/v=2").keySet.intersect(before.keySet)
    assert(carried.nonEmpty)
    // and purging EVERYTHING still publishes a readable empty snapshot
    val v3 = Forget.purge(spark, t, "k", (50L until 100L).toSeq)
    assert(v3 == 3L)
    val empty = Versioned.read(spark, t)
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("k", "v")) // schema survives
  }

  test("NULL-key rows survive a purge (filter must not drop NULL predicates)") {
    val t = s"$root/nullable"
    // 200 keyed rows + 10 NULL-key rows, landing in every file
    val rows = ((0L until 200L).map(k => (Some(k), s"payload-$k"))
      ++ (0 until 10).map(i => (None: Option[Long], s"anon-$i")))
      .toDF("k", "v")
    Forget.publishIndexed(rows, t, nFiles = 4, keyCol = "k")
    val v2 = Forget.purge(spark, t, "k", Seq(7L, 8L, 9L))
    assert(v2 == 2L)
    val after = Versioned.read(spark, t)
    // the three named keys are gone...
    assert(after.filter($"k".isin(7L, 8L, 9L)).isEmpty)
    // ...and every NULL-key row survived: `!isin` alone evaluates to NULL
    // for NULL keys and filter drops NULL — the isNull arm in Forget.purge
    // is what keeps these 10 rows alive
    assert(after.filter($"k".isNull).count() == 10L)
    assert(after.count() == 200L - 3 + 10)
  }

  test("end-to-end on the real documents corpus: publish, purge doc_ids, merge a correction") {
    // the governance flow a training-data lake actually runs: land the
    // documents table Bloom-indexed, serve a deletion request for specific
    // doc_ids, then land a redaction-corrected replacement for another
    val t = s"$root/documents"
    val docs = graft.lake.Tables.load(spark, sf001, "documents")
    val total = docs.count()
    Forget.publishIndexed(docs, t, nFiles = 4, keyCol = "doc_id")
    // deletion request
    val gone = Seq(3L, 17L, 99L)
    Forget.purge(spark, t, "doc_id", gone)
    val purged = Versioned.read(spark, t)
    assert(purged.filter($"doc_id".isin(gone: _*)).isEmpty)
    assert(purged.count() == total - gone.size)
    // correction batch: replace one doc's text, add a late-arriving doc
    val fix = Seq(
      (5L, "[REDACTED]", "en", "web", 10L),
      (900000L, "late arrival", "en", "books", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Upsert.merge(spark, t, "doc_id", fix)
    val after = Versioned.read(spark, t)
    assert(after.filter($"doc_id" === 5L).select($"text").as[String].head()
      == "[REDACTED]")
    assert(after.filter($"doc_id" === 900000L).count() == 1L)
    assert(after.count() == total - gone.size + 1)
    // the untouched corpus content is intact (spot check an unrelated doc)
    val orig = docs.filter($"doc_id" === 42L).select($"text").as[String].head()
    assert(after.filter($"doc_id" === 42L).select($"text").as[String].head()
      == orig)
  }

  test("purging keys the table never held is a bounded no-op") {
    val before = Versioned.currentVersion(spark, table()).get
    val v = Forget.purge(spark, table(), "k", Seq(77777777L))
    assert(v == before || v == before + 1) // fpp may cost one file rewrite
    assert(Versioned.read(spark, table()).count()
      == 10000L - purgedKeys.size)
  }
}
