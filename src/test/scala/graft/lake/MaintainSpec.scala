package graft.lake

import java.nio.file.Files

import graft.SparkSpec

/**
 * [[Maintain.auto]]: the metadata-decided maintenance pass. Dials
 * trigger exactly when exceeded, content never changes, a second pass
 * is a no-op, and plain refs only materialize on the explicit flag.
 */
class MaintainSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-maintain").toString

  private def mk(name: String, nFiles: Int = 4): String = {
    val t = s"$root/$name"
    Forget.publishIndexed(
      (0L until 200L).map(k => (k, s"p-$k")).toDF("k", "v"),
      t, nFiles, keyCol = "k")
    t
  }

  private def snap(t: String): Set[(Long, String)] =
    Versioned.read(spark, t).as[(Long, String)].collect().toSet

  test("accumulated zero-copy appends past the dial trigger materialize " +
      "(then compact past the file dial); content identical; rerun no-op") {
    val t = mk("appends", nFiles = 4)
    // 3 zero-copy merges, one appended file each
    (0 until 3).foreach { i =>
      Dv.merge(spark, t, "k", Seq((i.toLong, s"zc-$i"), (500L + i, s"new-$i"))
        .toDF("k", "v"))
    }
    val before = snap(t)
    // appends (3) under dial (8): no-op
    val a0 = Maintain.auto(spark, t, "k", maxAppendedFiles = 8)
    assert(a0.taken.isEmpty)
    // dial at 2: materialize fires; compact does not (4-ish files < 64)
    val a1 = Maintain.auto(spark, t, "k", maxAppendedFiles = 2)
    assert(a1.taken.exists(_.startsWith("materialize")))
    assert(!Versioned.isShallowRef(spark, t, a1.liveVersion))
    assert(snap(t) == before)
    // rerun: nothing left to do
    val a2 = Maintain.auto(spark, t, "k", maxAppendedFiles = 2)
    assert(a2.taken.isEmpty)
  }

  test("vector rows past the dial trigger materialize") {
    val t = mk("vector")
    Dv.purge(spark, t, "k", (0L until 50L))
    val before = snap(t)
    assert(Maintain.auto(spark, t, "k", maxVectorRows = 100L).taken.isEmpty)
    val a = Maintain.auto(spark, t, "k", maxVectorRows = 10L)
    assert(a.taken.exists(_.contains("vector=50")))
    assert(snap(t) == before)
  }

  test("file count past the dial triggers compact on a plain table") {
    val t = mk("files", nFiles = 16)
    val before = snap(t)
    assert(Maintain.auto(spark, t, "k", maxDataFiles = 16).taken.isEmpty)
    val a = Maintain.auto(spark, t, "k", maxDataFiles = 8)
    assert(a.taken.exists(_.startsWith("compact")))
    assert(Versioned.dataFilePaths(spark,
      Versioned.dataDir(spark, t, a.liveVersion)).size <= 8)
    assert(snap(t) == before)
  }

  test("a plain ref (clone seed / schema overlay) materializes only on " +
      "the explicit flag") {
    val t = mk("plainref")
    Evolve.addColumns(spark, t,
      org.apache.spark.sql.types.StructType.fromDDL("x INT")) // ref, no
    val a0 = Maintain.auto(spark, t, "k")                     // appends/dv
    assert(a0.taken.isEmpty)
    assert(Versioned.isShallowRef(spark, t,
      Versioned.currentVersion(spark, t).get))
    val a1 = Maintain.auto(spark, t, "k", materializeRefs = true)
    assert(a1.taken.exists(_.startsWith("materialize")))
    assert(!Versioned.isShallowRef(spark, t, a1.liveVersion))
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k", "v", "x"))
  }
}
