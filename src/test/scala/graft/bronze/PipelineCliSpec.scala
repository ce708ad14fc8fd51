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

  test("daily without --date picks the newest source day") {
    val root = Files.createTempDirectory("graft-cli").toString
    val newest = PipelineCli.sourceDates(spark, sf001, 1).head
    val d = runCli("daily", "--root", root)
    assert(d.contains(s""""date":"$newest""""))
  }
}
