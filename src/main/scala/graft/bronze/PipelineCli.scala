package graft.bronze

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.Tables

/**
 * CLI parity with the reference's entry point
 * (/root/reference/scripts/run_pipeline.py:34-137): daily run, backfill,
 * status/reconciliation, connection test — over a source lake
 * (`--source`, default $SPARK_GRAFT_SF_DIR) and a bronze sink root
 * (`--root`).
 *
 * Usage (runMain graft.bronze.PipelineCli ...):
 *   daily    --root /lake [--date 2024-01-03] [--force]
 *   backfill --root /lake --start 2024-01-01 --end 2024-01-05
 *   status   --root /lake
 *   test     --root /lake
 *
 * `daily` without --date processes the newest source day (the reference
 * defaults to yesterday; a synthetic lake's clock is its data).
 */
object PipelineCli {

  private def arg(args: Array[String], name: String): Option[String] =
    Config.arg(args, name)

  private val DateRe = "\\d{4}-\\d{2}-\\d{2}".r

  /** Required-config validation, reference `settings.py:39-56` parity:
    * every missing/malformed key for `cmd` is collected BY NAME and
    * reported at once (not first-failure), before a session spins up.
    * `root` arrives already resolved through [[Config]]'s layers, so the
    * missing-root message names every way to supply it. */
  private[bronze] def configProblems(cmd: String, args: Array[String],
                                     root: Option[String]): Seq[String] = {
    def badDate(name: String): Seq[String] =
      arg(args, name).toSeq.collect {
        case d if !DateRe.matches(d) => s"$name must be yyyy-MM-dd, got '$d'"
      }
    val needRoot =
      if (root.isEmpty)
        Seq("missing required config: --root (or SPARK_GRAFT_ROOT via env/.env)")
      else Nil
    val needRange = cmd match {
      case "backfill" =>
        Seq("--start", "--end").filter(arg(args, _).isEmpty)
          .map(k => s"missing required argument: $k")
      case _ => Nil
    }
    val knownCmd = cmd match {
      case "daily" | "backfill" | "status" | "test" => Nil
      case other => Seq(s"unknown command: $other")
    }
    knownCmd ++ needRoot ++ needRange ++
      badDate("--date") ++ badDate("--start") ++ badDate("--end")
  }

  /** Fail-fast I/O preflight (the reference's connection test, run before
    * ANY work instead of only under `test`): source events readable, and —
    * for writing commands — sink root creatable/writable. */
  private[bronze] def preflightProblems(spark: SparkSession, cmd: String,
                                        source: String, root: String): Seq[String] = {
    val srcErr =
      try { Tables.events(spark, source).schema; Nil }
      catch { case e: Exception =>
        Seq(s"source not readable: $source (${e.getClass.getSimpleName})") }
    val sinkErr = cmd match {
      case "daily" | "backfill" =>
        try {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.mkdirs(p)) Nil else Seq(s"sink root not writable: $root")
        } catch { case e: Exception =>
          Seq(s"sink root not writable: $root (${e.getClass.getSimpleName})") }
      case _ => Nil
    }
    srcErr ++ sinkErr
  }

  private def errorJson(cmd: String, problems: Seq[String]): String =
    s"""{"cmd":${graft.Jsons.quote(cmd)},"ok":false,"errors":[""" +
      problems.map(graft.Jsons.quote).mkString(",") + "]}"

  def main(args: Array[String]): Unit = {
    val cmd = args.headOption.getOrElse("status")
    // settings.py parity: flag > environment > .env file > default, and
    // dotenv parse problems aggregate with the missing/malformed keys so
    // one run reports EVERYTHING wrong with the configuration
    val cfg = Config.load(args, sys.env)
    val argProblems = cfg.problems ++ configProblems(cmd, args, cfg.root)
    if (argProblems.nonEmpty) {
      println(errorJson(cmd, argProblems))
      sys.exit(1)
    }
    val source = cfg.source
    val root = cfg.root.get
    val spark = graft.Conf.local(SparkSession.builder(), 4)
      .master(cfg.master)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val ioProblems = preflightProblems(spark, cmd, source, root)
      if (ioProblems.nonEmpty) {
        println(errorJson(cmd, ioProblems))
        sys.exit(1)
      }
      run(spark, cmd, args, source, root)
    } finally spark.stop()
  }

  /** Distinct event days present in the source, newest first (the
    * reference's get_available_dates, bigquery_extractor.py:130-163). */
  def sourceDates(spark: SparkSession, source: String, limit: Int = 30): Seq[String] =
    Tables.events(spark, source)
      .select(to_date(col("ts")).cast("string").as("d"))
      .distinct().orderBy(col("d").desc).limit(limit)
      .collect().map(_.getString(0)).toSeq

  private[bronze] def run(spark: SparkSession, cmd: String, args: Array[String],
                          source: String, root: String): Unit = cmd match {
    case "daily" =>
      val date = arg(args, "--date")
        .getOrElse(sourceDates(spark, source, 1).headOption
          .getOrElse(sys.error("source has no event days")))
      val force = args.contains("--force")
      val r = Runner.runDaily(spark, root, "events", date,
        Runner.extractEvents(spark, source, _), skipExisting = !force)
      println(s"""{"cmd":"daily","date":"${r.date}","success":${r.success},""" +
        s""""skipped":${r.skipped},"records":${r.recordsExtracted}""" +
        r.error.map(e => s""","error":${graft.Jsons.quote(e)}""").getOrElse("") + "}")
    case "backfill" =>
      val (s, e) = (arg(args, "--start").get, arg(args, "--end").get)
      val r = Runner.backfill(spark, root, "events", s, e,
        Runner.extractEvents(spark, source, _),
        skipExisting = !args.contains("--force"))
      println(s"""{"cmd":"backfill","ok":${r.failedDays.isEmpty},""" +
        s""""successful":${r.successfulDays.size},"skipped":${r.skippedDays.size},""" +
        s""""failed":${r.failedDays.size},"records":${r.totalRecords}}""")
    case "status" =>
      val src = sourceDates(spark, source)
      val sink = Lake.listAvailableDates(spark, root, "events", limit = 30)
      val missing = Lake.missingDates(src, sink)
      println(s"""{"cmd":"status","source_days":${src.size},""" +
        s""""sink_days":${sink.size},""" +
        s""""missing":[${missing.map("\"" + _ + "\"").mkString(",")}]}""")
    case "test" =>
      // connection self-test (S9): source tables readable, sink root writable
      val srcOk = Tables.all.forall { t =>
        try { Tables.load(spark, source, t).schema.nonEmpty } catch { case _: Exception => false }
      }
      val sinkOk = try {
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.mkdirs(new org.apache.hadoop.fs.Path(root)); true
      } catch { case _: Exception => false }
      println(s"""{"cmd":"test","source_ok":$srcOk,"sink_ok":$sinkOk}""")
    case other => sys.error(s"unknown command: $other")
  }
}
