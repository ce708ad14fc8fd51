package graft.bronze

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/**
 * Env/dotenv configuration surface for [[PipelineCli]] — parity with the
 * reference's settings loader (`/root/reference/config/settings.py:13-56`):
 * a dotenv file feeds the environment, every value resolves through
 * layered precedence, and validation COLLECTS every problem by name
 * instead of failing on the first.
 *
 * Precedence per key (highest wins): CLI flag > process environment >
 * `.env` file > built-in default. Keys:
 *
 *   SPARK_GRAFT_SOURCE   source lake dir (`--source`; legacy fallback env
 *                        SPARK_GRAFT_SF_DIR; default /root/testdata/sf0.001)
 *   SPARK_GRAFT_ROOT     bronze sink root (`--root`; REQUIRED — the one
 *                        key with no default, like the reference's
 *                        GCP_PROJECT_ID/GA4_DATASET_ID)
 *   SPARK_GRAFT_MASTER   spark master (`--master`; default local[4])
 *
 * The dotenv path itself comes from `--env-file` or SPARK_GRAFT_ENV_FILE
 * (default `.env`); a missing file is fine (the reference's load_dotenv
 * no-ops too), but a MALFORMED line in a present file is a named problem —
 * silently dropping a typo'd key would surface later as a confusing
 * "missing required" error.
 */
object Config {

  final case class Resolved(source: String, root: Option[String],
                            master: String, problems: Seq[String])

  private[bronze] def arg(args: Array[String], name: String): Option[String] =
    args.sliding(2).collectFirst { case Array(`name`, v) => v }

  /** Parse dotenv lines: `KEY=VALUE` per line, `#` comments and blanks
    * ignored, optional matching single/double quotes stripped from the
    * value, first `=` splits. Returns (entries, problems). */
  def parseDotenv(lines: Seq[String]): (Map[String, String], Seq[String]) = {
    val entries = Map.newBuilder[String, String]
    val problems = Seq.newBuilder[String]
    lines.zipWithIndex.foreach { case (raw, i) =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        val eq = line.indexOf('=')
        val key = if (eq < 0) "" else line.take(eq).trim
        if (eq < 0 || key.isEmpty || !key.forall(c => c.isLetterOrDigit || c == '_'))
          problems += s".env line ${i + 1} is not KEY=VALUE: '$line'"
        else {
          val v0 = line.drop(eq + 1).trim
          val v =
            if (v0.length >= 2 &&
                ((v0.head == '"' && v0.last == '"') ||
                 (v0.head == '\'' && v0.last == '\''))) v0.tail.init
            else v0
          entries += key -> v
        }
      }
    }
    (entries.result(), problems.result())
  }

  /** Load a dotenv file; absent file → empty (load_dotenv parity). */
  def loadDotenv(path: String): (Map[String, String], Seq[String]) = {
    val p = Paths.get(path)
    if (!Files.isRegularFile(p)) (Map.empty, Nil)
    else
      try parseDotenv(Files.readAllLines(p).asScala.toSeq)
      catch {
        case e: Exception =>
          (Map.empty, Seq(s".env file $path unreadable: ${e.getClass.getSimpleName}"))
      }
  }

  /** Resolve the full config through the precedence layers. Pure — the
    * environment arrives as a Map so specs can exercise every layer
    * without mutating the JVM's real environment. */
  def resolve(args: Array[String], env: Map[String, String],
              dotenv: Map[String, String],
              dotenvProblems: Seq[String] = Nil): Resolved = {
    def layered(flag: String, key: String): Option[String] =
      arg(args, flag).orElse(env.get(key)).orElse(dotenv.get(key))
    val source = layered("--source", "SPARK_GRAFT_SOURCE")
      .orElse(env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val root = layered("--root", "SPARK_GRAFT_ROOT")
    val master = layered("--master", "SPARK_GRAFT_MASTER").getOrElse("local[4]")
    Resolved(source, root, master, dotenvProblems)
  }

  /** The full load path `main` uses: dotenv file location itself resolves
    * flag > env > default. */
  def load(args: Array[String], env: Map[String, String]): Resolved = {
    val envFile = arg(args, "--env-file")
      .orElse(env.get("SPARK_GRAFT_ENV_FILE")).getOrElse(".env")
    val (dot, dotProblems) = loadDotenv(envFile)
    resolve(args, env, dot, dotProblems)
  }
}
