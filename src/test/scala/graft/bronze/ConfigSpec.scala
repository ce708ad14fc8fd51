package graft.bronze

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The env/dotenv config surface must mirror the reference settings
  * loader: dotenv feeds missing env keys, explicit layers win in CLI >
  * env > .env > default order, and EVERY problem is collected by name —
  * one run tells the operator everything wrong at once. */
class ConfigSpec extends AnyFunSuite {

  test("dotenv parsing: comments, blanks, quotes, malformed lines by number") {
    val (kv, problems) = Config.parseDotenv(Seq(
      "# comment",
      "",
      "SPARK_GRAFT_ROOT=/lake/bronze",
      "SPARK_GRAFT_SOURCE=\"/data/sf0.01\"",
      "SPARK_GRAFT_MASTER='local[8]'",
      "  SPARK_GRAFT_EXTRA = spaced value ",
      "not a kv line",
      "=novalue",
      "BAD KEY=x"))
    assert(kv("SPARK_GRAFT_ROOT") == "/lake/bronze")
    assert(kv("SPARK_GRAFT_SOURCE") == "/data/sf0.01") // double quotes stripped
    assert(kv("SPARK_GRAFT_MASTER") == "local[8]")     // single quotes stripped
    assert(kv("SPARK_GRAFT_EXTRA") == "spaced value")
    // malformed lines are NAMED problems, not silent drops
    assert(problems.size == 3)
    assert(problems.exists(_.contains("line 7")))
    assert(problems.exists(_.contains("line 8")))
    assert(problems.exists(_.contains("line 9")))
  }

  test("precedence: CLI flag > environment > .env > default") {
    val dot = Map("SPARK_GRAFT_ROOT" -> "/from/dotenv",
      "SPARK_GRAFT_SOURCE" -> "/src/dotenv",
      "SPARK_GRAFT_MASTER" -> "local[2]")
    val env = Map("SPARK_GRAFT_ROOT" -> "/from/env")
    // flag beats both
    assert(Config.resolve(Array("daily", "--root", "/from/flag"), env, dot)
      .root.contains("/from/flag"))
    // env beats dotenv
    assert(Config.resolve(Array("daily"), env, dot).root.contains("/from/env"))
    // dotenv beats default
    val r = Config.resolve(Array("daily"), Map.empty, dot)
    assert(r.root.contains("/from/dotenv"))
    assert(r.source == "/src/dotenv")
    assert(r.master == "local[2]")
    // defaults when nothing is set
    val d = Config.resolve(Array("daily"), Map.empty, Map.empty)
    assert(d.root.isEmpty && d.master == "local[4]")
    // legacy SPARK_GRAFT_SF_DIR still feeds source
    assert(Config.resolve(Array("daily"),
      Map("SPARK_GRAFT_SF_DIR" -> "/legacy"), Map.empty).source == "/legacy")
  }

  test("env-var configuration is equivalent to CLI-arg configuration") {
    val viaArgs = Config.resolve(
      Array("daily", "--root", "/lake", "--source", "/src", "--master", "local[3]"),
      Map.empty, Map.empty)
    val viaEnv = Config.resolve(Array("daily"),
      Map("SPARK_GRAFT_ROOT" -> "/lake", "SPARK_GRAFT_SOURCE" -> "/src",
        "SPARK_GRAFT_MASTER" -> "local[3]"), Map.empty)
    assert(viaArgs.copy(problems = Nil) == viaEnv.copy(problems = Nil))
    // and both satisfy the required-config validation identically
    assert(PipelineCli.configProblems("daily", Array("daily"), viaArgs.root).isEmpty)
    assert(PipelineCli.configProblems("daily", Array("daily"), viaEnv.root).isEmpty)
  }

  test("load(): dotenv file on disk feeds resolution; absent file no-ops") {
    val dir = Files.createTempDirectory("graft_env")
    val f = dir.resolve("pipeline.env")
    Files.writeString(f, "SPARK_GRAFT_ROOT=/lake/from/file\nbroken line\n")
    val r = Config.load(Array("daily", "--env-file", f.toString), Map.empty)
    assert(r.root.contains("/lake/from/file"))
    // the malformed line is carried into the aggregated problem report
    assert(r.problems.exists(_.contains("line 2")))
    // absent file: no problems, defaults apply (load_dotenv parity)
    val none = Config.load(
      Array("daily", "--env-file", dir.resolve("absent.env").toString), Map.empty)
    assert(none.root.isEmpty && none.problems.isEmpty)
    // SPARK_GRAFT_ENV_FILE env var also locates the file
    val viaEnv = Config.load(Array("daily"),
      Map("SPARK_GRAFT_ENV_FILE" -> f.toString))
    assert(viaEnv.root.contains("/lake/from/file"))
  }

  test("validation aggregates dotenv problems with missing/malformed keys") {
    val dir = Files.createTempDirectory("graft_env")
    val f = dir.resolve("bad.env")
    Files.writeString(f, "oops\n")
    val cfg = Config.load(
      Array("backfill", "--env-file", f.toString, "--start", "nope"), Map.empty)
    val all = cfg.problems ++
      PipelineCli.configProblems("backfill",
        Array("backfill", "--start", "nope"), cfg.root)
    // one report names: the dotenv line, the missing root, the missing
    // --end, and the malformed --start — everything wrong, at once
    assert(all.size == 4, all.mkString("; "))
    assert(all.exists(_.contains("line 1")))
    assert(all.exists(_.contains("--root")))
    assert(all.exists(_.contains("--end")))
    assert(all.exists(_.contains("--start must be yyyy-MM-dd")))
  }
}
