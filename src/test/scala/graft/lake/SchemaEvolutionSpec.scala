package graft.lake

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import graft.SparkSpec

/**
 * Additive schema evolution ([[Upsert]] `evolveSchema=true`): a changeset
 * can ADD columns; rows the changeset does not touch read NULL in them;
 * untouched files still transfer as byte copies; the `_table_schema`
 * marker pins the authoritative schema from the first evolution on and
 * every later file-targeted rewrite carries it ([[Forget.purge]],
 * [[Compact.compactVersion]], further merges); pre-evolution versions
 * keep their old schema under time travel.
 */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root =
    Files.createTempDirectory("graft-schema-evolution").toString

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

  test("a changeset with a new column evolves the table additively") {
    val t = freshTable("evolve")
    val before = partSums(s"$t/v=1")
    val changes = Seq((42L, "UPDATED-42", 7), (20000L, "NEW-20000", 9))
      .toDF("k", "v", "score")
    assert(Upsert.merge(spark, t, "k", changes, evolveSchema = true) == 2L)
    val after = Versioned.read(spark, t)
    // evolved schema: new column appended, nullable
    assert(after.columns.toSeq == Seq("k", "v", "score"))
    assert(after.schema("score").nullable)
    // touched rows carry the value; every untouched row reads NULL —
    // including rows in byte-copied files that have never heard of it
    assert(after.filter($"k" === 42L).select($"score").as[Int].head() == 7)
    assert(after.filter($"k" === 20000L).select($"score").as[Int].head() == 9)
    assert(after.filter($"score".isNull).count() == 10000L - 1)
    // the marker exists and untouched files are still byte copies
    assert(Files.exists(Paths.get(s"$t/v=2/_table_schema")))
    val carried = partSums(s"$t/v=2").filter { case (n, h) =>
      before.get(n).contains(h)
    }
    assert(carried.nonEmpty, "evolution rewrote every file")
    // time travel: the pre-evolution version keeps its OLD schema
    assert(Versioned.readVersion(spark, t, 1L).columns.toSeq == Seq("k", "v"))
  }

  test("extra columns without the dial, and missing columns, reject") {
    val t = freshTable("reject")
    val extra = Seq((1L, "x", 1)).toDF("k", "v", "score")
    val e1 = intercept[IllegalArgumentException](
      Upsert.merge(spark, t, "k", extra))
    assert(e1.getMessage.contains("evolveSchema"))
    // a changeset LACKING a table column is never a merge, dial or not —
    // it would null out the missing column on every touched row
    val narrow = Seq((1L, 5)).toDF("k", "score")
    val e2 = intercept[IllegalArgumentException](
      Upsert.merge(spark, t, "k", narrow, evolveSchema = true))
    assert(e2.getMessage.contains("lacks"))
  }

  test("the marker survives purge, compaction, and later merges") {
    val t = freshTable("carry")
    Upsert.merge(spark, t, "k",
      Seq((42L, "UPDATED-42", 7)).toDF("k", "v", "score"),
      evolveSchema = true)                                   // v2: evolved
    // purge a key that lives in a PRE-evolution byte-copied file: the
    // rewrite reads those files under the marker schema
    assert(Forget.purge(spark, t, "k", Seq(17L)) == 3L)
    val afterPurge = Versioned.read(spark, t)
    assert(afterPurge.columns.toSeq == Seq("k", "v", "score"))
    assert(afterPurge.filter($"k" === 17L).count() == 0L)
    assert(afterPurge.filter($"k" === 42L).select($"score").as[Int].head() == 7)
    // a later NON-evolving merge must present the full evolved schema...
    val e = intercept[IllegalArgumentException](Upsert.merge(
      spark, t, "k", Seq((5L, "UPDATED-5")).toDF("k", "v")))
    assert(e.getMessage.contains("lacks"))
    // ...and carries the marker when it does
    assert(Upsert.merge(spark, t, "k",
      Seq((5L, "UPDATED-5", null.asInstanceOf[Integer]))
        .toDF("k", "v", "score")) == 4L)
    assert(Files.exists(Paths.get(s"$t/v=4/_table_schema")))
    // compaction homogenizes the files and still carries the marker
    val v5 = Compact.compactVersion(spark, t, "k", targetBytes = 1L << 30)
    if (v5 > 4L) { // compaction may no-op if already at 1 file
      assert(Files.exists(Paths.get(s"$t/v=$v5/_table_schema")))
    }
    val live = Versioned.read(spark, t)
    assert(live.columns.toSeq == Seq("k", "v", "score"))
    assert(live.filter($"score".isNotNull).count() == 1L) // only k=42
    assert(live.count() == 10000L - 1)
  }

  test("applyCdc evolves through the CDC path (and the sink pass-through)") {
    val t = freshTable("cdc-evolve", n = 1000L)
    val batch = Seq(
      ("U", 7L, "UPDATED-7", 1), ("I", 5000L, "NEW-5000", 2),
      ("D", 13L, null, 0)).toDF("op", "k", "v", "score")
    graft.streaming.CdcSink.applyBatch(
      spark, t, "k", batch, batchId = 1L, evolveSchema = true)
    val after = Versioned.read(spark, t)
    assert(after.columns.toSeq == Seq("k", "v", "score"))
    assert(after.filter($"k" === 13L).count() == 0L)
    assert(after.filter($"k" === 5000L).select($"score").as[Int].head() == 2)
    assert(after.filter($"score".isNull).count() == 1000L - 2)
    // replay of the same batch id no-ops even across the evolution
    graft.streaming.CdcSink.applyBatch(
      spark, t, "k", batch, batchId = 1L, evolveSchema = true)
    assert(Versioned.currentVersion(spark, t).contains(2L))
  }
}
