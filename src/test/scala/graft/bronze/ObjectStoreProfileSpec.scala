package graft.bronze

import java.nio.file.Files

import graft.{Conf, SparkSpec}

/**
 * Executes the s3a object-store profile (Conf.objectStoreConfs — the
 * SCALE.md posture as code) instead of merely documenting it: a session
 * with the profile applied runs the full bronze lake round-trip against an
 * explicit `file://` root through the same Hadoop FileSystem code path an
 * `s3a://` root would take. `fs.s3a.*` keys are scheme-scoped, so the
 * profile must be inert for file:// data while still being visible in the
 * Hadoop conf every FS/committer call site reads.
 */
class ObjectStoreProfileSpec extends SparkSpec {

  test("s3a profile reaches the session's Hadoop conf (committer + smoke endpoint)") {
    val s = Conf.objectStoreSession(spark.newSession(),
      endpoint = Some("http://localhost:4566"))
    val hc = s.sessionState.newHadoopConf()
    assert(hc.get("fs.s3a.committer.name") == "magic")
    assert(hc.get("fs.s3a.committer.magic.enabled") == "true")
    assert(hc.get("fs.s3a.path.style.access") == "true")
    assert(hc.get("fs.s3a.endpoint") == "http://localhost:4566")
    assert(hc.get("fs.s3a.connection.maximum") == "256")
    // this container has no spark-hadoop-cloud jar: the profile must probe
    // and degrade rather than bind a committer class that cannot load
    assert(!Conf.cloudCommitterAvailable,
      "container unexpectedly has the cloud committer — tighten this spec " +
        "to assert the binding IS applied")
    // conf reads back the built-in default, not the (unloadable) cloud binding
    assert(!s.conf.get("spark.sql.sources.commitProtocolClass").contains("cloud"))
  }

  test("bronze round-trip passes on a profile-bearing session over file://") {
    val s = Conf.objectStoreSession(spark.newSession(),
      endpoint = Some("http://localhost:4566"))
    val root = "file://" + Files.createTempDirectory("graft-s3a-profile").toString
    def extract(date: String) = Runner.extractEvents(s, sf001, date)

    assert(!Lake.checkExists(s, root, "events", "2024-01-03"))
    val n = Lake.writeDay(s, extract("2024-01-03"), root, "events", "2024-01-03")
    assert(n > 0)
    assert(Lake.checkExists(s, root, "events", "2024-01-03"))
    assert(s.read.parquet(Lake.dayDir(root, "events", "2024-01-03")).count() == n)
    val meta = Lake.readMetadata(s, root, "events", "2024-01-03")
    assert(meta.exists(_.contains(s""""record_count": $n""")))
    assert(Lake.listAvailableDates(s, root, "events") == Seq("2024-01-03"))
    // idempotence survives the profile: second run skips
    val r2 = Runner.runDaily(s, root, "events", "2024-01-03", extract)
    assert(r2.success && r2.skipped)
  }
}
