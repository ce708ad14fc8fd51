package graft.lake

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The versioned publish must give readers snapshot isolation: the live
  * manifest only ever points at a COMPLETE version dir, history stays
  * readable until vacuumed, and a crash mid-swap heals to a consistent
  * (old) snapshot — never to half-published data. */
class VersionedSpec extends SparkSpec {

  import spark.implicits._

  private def tbl() = Files.createTempDirectory("graft_versioned").toString + "/t"

  test("publish bumps the version; read sees the latest, time travel the past") {
    val t = tbl()
    assert(Versioned.currentVersion(spark, t).isEmpty)
    val v1 = Versioned.publish(Seq(1, 2, 3).toDF("x"), t)
    val v2 = Versioned.publish(Seq(10, 20).toDF("x"), t)
    assert((v1, v2) == ((1L, 2L)))
    assert(Versioned.currentVersion(spark, t).contains(2L))
    assert(Versioned.read(spark, t).as[Int].collect().sorted.sameElements(Array(10, 20)))
    assert(Versioned.readVersion(spark, t, 1).as[Int].collect().sorted
      .sameElements(Array(1, 2, 3)))
    assert(Versioned.versions(spark, t) == Seq(1L, 2L))
  }

  test("a half-published version without a manifest swap stays invisible") {
    val t = tbl()
    Versioned.publish(Seq(1).toDF("x"), t)
    // simulate a publish that crashed after writing data, before the swap
    Seq(99).toDF("x").write.parquet(s"$t/v=2")
    assert(Versioned.currentVersion(spark, t).contains(1L))
    assert(Versioned.read(spark, t).as[Int].collect().sameElements(Array(1)))
    // the next real publish reclaims the orphaned version number
    val v = Versioned.publish(Seq(7, 8).toDF("x"), t)
    assert(v == 2L)
    assert(Versioned.read(spark, t).as[Int].collect().sorted.sameElements(Array(7, 8)))
  }

  test("a crash between demote and promote heals to the previous snapshot") {
    val t = tbl()
    Versioned.publish(Seq(1).toDF("x"), t)
    Versioned.publish(Seq(2).toDF("x"), t)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // manufacture the crash window: live manifest demoted to bak, tmp lost
    fs.rename(new Path(s"$t/_manifest"), new Path(s"$t/_manifest.bak"))
    // readers resolve via the bak WITHOUT touching the manifest (a reader-
    // side rename would race a live publish's demote->promote window)
    assert(Versioned.currentVersion(spark, t).contains(2L))
    assert(!fs.exists(new Path(s"$t/_manifest")), "readers must not heal")
    assert(Versioned.read(spark, t).as[Int].collect().sameElements(Array(2)))
    // explicit write-path recovery restores the manifest file
    assert(Versioned.recover(spark, t).contains(2L))
    assert(fs.exists(new Path(s"$t/_manifest")), "recover must restore the manifest")
    // and the next publish over a crashed swap works end-to-end
    fs.rename(new Path(s"$t/_manifest"), new Path(s"$t/_manifest.bak"))
    assert(Versioned.publish(Seq(3).toDF("x"), t) == 3L)
    assert(Versioned.read(spark, t).as[Int].collect().sameElements(Array(3)))
  }

  test("an empty manifest shadowing a live bak recovers the bak, not v1") {
    val t = tbl()
    Versioned.publish(Seq(1).toDF("x"), t)
    Versioned.publish(Seq(2).toDF("x"), t)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash window: demote happened, promote's rename landed but the file
    // content was lost (rename-without-fsync) — a zero-byte husk shadows
    // the only good pointer
    fs.rename(new Path(s"$t/_manifest"), new Path(s"$t/_manifest.bak"))
    fs.create(new Path(s"$t/_manifest"), true).close()
    assert(Versioned.currentVersion(spark, t).contains(2L)) // bak fallback
    // recover must promote the bak over the husk — a mere existence check
    // would restart versioning at 1 and DESTROY the bak during publish
    assert(Versioned.recover(spark, t).contains(2L))
    assert(Versioned.publish(Seq(3).toDF("x"), t) == 3L)
    assert(Versioned.read(spark, t).as[Int].collect().sameElements(Array(3)))
  }

  test("an empty or truncated manifest still finds committed versions") {
    val t = tbl()
    Versioned.publish(Seq(1).toDF("x"), t)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new Path(s"$t/_manifest"), true).close() // zero-byte manifest
    // no readable pointer anywhere — the committed v=1 seeds the forward
    // probe (the first-publish crash window: rename done, pointer never
    // written, and readers must not report "never published")
    assert(Versioned.currentVersion(spark, t).contains(1L))
    assert(Versioned.read(spark, t).as[Int].collect().sameElements(Array(1)))
  }

  test("double pointer loss with live version dirs does not rewind the counter") {
    val t = tbl()
    Versioned.publish(Seq(1).toDF("x"), t)
    Versioned.publish(Seq(2).toDF("x"), t)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // both pointers unreadable (manifest truncated, no bak): the worst
    // case — readers recover the live version through the v=1 probe
    fs.create(new Path(s"$t/_manifest"), true).close()
    assert(Versioned.currentVersion(spark, t).contains(2L))
    // publish must seed PAST the highest on-disk version dir — restarting at
    // 1 would overwrite v=1 data that versions()/time travel still expose
    assert(Versioned.publish(Seq(3).toDF("x"), t) == 3L)
    assert(Versioned.currentVersion(spark, t).contains(3L))
    assert(Versioned.readVersion(spark, t, 1).as[Int].collect().sameElements(Array(1)))
    assert(Versioned.readVersion(spark, t, 2).as[Int].collect().sameElements(Array(2)))
    assert(Versioned.read(spark, t).as[Int].collect().sameElements(Array(3)))
  }

  test("schema evolution: a version may carry an evolved schema; travel keeps the old") {
    // because every version dir is a COMPLETE self-contained snapshot,
    // adding/renaming columns needs no migration machinery: publish the
    // evolved frame as the next version. Live readers see the new schema
    // atomically with the manifest swap; time travel reads the old one.
    val t = tbl()
    Versioned.publish(Seq((1L, "a")).toDF("k", "v"), t)
    Versioned.publish(
      Seq((1L, "a", "en")).toDF("k", "v", "lang"), t) // added column
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k", "v", "lang"))
    assert(Versioned.readVersion(spark, t, 1L).columns.toSeq == Seq("k", "v"))
    // cross-schema guard rails: diff() and merge changesets must refuse
    // rather than guess (the changeset names a schema the table lacks)
    val e1 = intercept[IllegalArgumentException] {
      Upsert.diff(spark, t, 1L, 2L, "k")
    }
    assert(e1.getMessage.contains("schema"))
    val e2 = intercept[IllegalArgumentException] {
      Upsert.merge(spark, t, "k", Seq((1L, "b")).toDF("k", "v"))
    }
    assert(e2.getMessage.contains("schema"))
  }

  test("vacuum drops old versions but keeps the live window") {
    val t = tbl()
    (1 to 4).foreach(i => Versioned.publish(Seq(i).toDF("x"), t))
    val dropped = Versioned.vacuum(spark, t, keep = 1)
    assert(dropped == Seq(1L, 2L))
    assert(Versioned.versions(spark, t) == Seq(3L, 4L))
    assert(Versioned.read(spark, t).as[Int].collect().sameElements(Array(4)))
    assert(Versioned.readVersion(spark, t, 3).as[Int].collect().sameElements(Array(3)))
  }
}
