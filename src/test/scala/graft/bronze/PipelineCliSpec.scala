package graft.bronze

import java.io.ByteArrayOutputStream
import java.nio.file.Files

import graft.SparkSpec

class PipelineCliSpec extends SparkSpec {

  private def runCli(args: String*): String = {
    val out = new ByteArrayOutputStream()
    Console.withOut(out) {
      PipelineCli.run(spark, args.head, args.toArray, sf001,
        args.sliding(2).collectFirst { case Seq("--root", v) => v }.get)
    }
    out.toString.trim
  }

  test("daily -> status -> backfill flow mirrors the reference CLI") {
    val root = Files.createTempDirectory("graft-cli").toString
    val t = runCli("test", "--root", root)
    assert(t.contains(""""source_ok":true""") && t.contains(""""sink_ok":true"""))

    val d = runCli("daily", "--root", root, "--date", "2024-01-02")
    assert(d.contains(""""success":true""") && d.contains(""""skipped":false"""))

    val d2 = runCli("daily", "--root", root, "--date", "2024-01-02")
    assert(d2.contains(""""skipped":true"""))

    val s = runCli("status", "--root", root)
    assert(s.contains(""""sink_days":1"""))
    assert(s.contains("2024-01-01")) // still missing
    assert(!s.contains(""""missing":[]"""))

    val b = runCli("backfill", "--root", root,
      "--start", "2024-01-01", "--end", "2024-01-03")
    assert(b.contains(""""ok":true""") && b.contains(""""skipped":1"""))

    val s2 = runCli("status", "--root", root)
    assert(s2.contains(""""sink_days":3"""))
  }

  test("configProblems names every missing/malformed key at once (settings.py parity)") {
    // all problems reported together, by name — not first-failure
    val p = PipelineCli.configProblems("backfill",
      Array("backfill", "--start", "01/01/2024"), root = None)
    assert(p.exists(_.contains("--root")))
    assert(p.exists(_.contains("--end")))
    assert(p.exists(_.contains("--start must be yyyy-MM-dd")))
    assert(p.size == 3)

    assert(PipelineCli.configProblems("daily",
      Array("daily", "--root", "/x", "--date", "2024-13-0x"), Some("/x"))
      .exists(_.contains("--date must be yyyy-MM-dd")))
    assert(PipelineCli.configProblems("frobnicate",
      Array("frobnicate", "--root", "/x"), Some("/x"))
      .exists(_.contains("unknown command")))
    assert(PipelineCli.configProblems("status",
      Array("status", "--root", "/x"), Some("/x")).isEmpty)
  }

  test("preflight fails fast with a NAMED unreadable source before any work") {
    val root = Files.createTempDirectory("graft-cli").toString
    val bad = PipelineCli.preflightProblems(spark, "daily", "/no/such/lake", root)
    assert(bad.exists(_.contains("source not readable: /no/such/lake")))
    // healthy inputs pass both the read and the write probe
    assert(PipelineCli.preflightProblems(spark, "daily", sf001, root).isEmpty)
    // status never probes the sink for writability (read-only command)
    assert(PipelineCli.preflightProblems(spark, "status", sf001,
      "/proc/definitely-not-writable").isEmpty)
  }

  test("daily without --date picks the newest source day") {
    val root = Files.createTempDirectory("graft-cli").toString
    val newest = PipelineCli.sourceDates(spark, sf001, 1).head
    val d = runCli("daily", "--root", root)
    assert(d.contains(s""""date":"$newest""""))
  }
}
