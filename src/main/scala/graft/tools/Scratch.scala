package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch main — not part of the library surface.
  * Usage: runMain graft.tools.Scratch <sfDir> <queryName>... [--explain]
  *          [--dump <outDir>]
  * Times each named catalog query (count()), optionally dumping the
  * formatted physical plan first. With --dump, writes each query's result
  * parquet plus the matching oracle_sql.json subset to <outDir> so
  * `tools/compare.py <sfDir> <outDir>` can oracle-check just those queries.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Conf.local(SparkSession.builder(), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val explain = args.contains("--explain")
    val dumpDir = args.sliding(2).collectFirst {
      case Array("--dump", d) => d
    }
    val names = args.drop(1)
      .filterNot(_.startsWith("--"))
      .filterNot(dumpDir.contains)
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      // construction INSIDE the clock: iterative queries (BPE, PageRank,
      // components) do their distributed work eagerly while building the
      // result frame — timing only the count() would under-report them.
      // --explain renders AFTER the clock stops so its plan formatting
      // doesn't inflate the printed seconds.
      val t0 = System.nanoTime()
      val df = qs(n)(spark, sfDir)
      val c = dumpDir match {
        case Some(out) =>
          df.coalesce(1).write.mode("overwrite").parquet(s"$out/$n")
          spark.read.parquet(s"$out/$n").count()
        case None => df.count()
      }
      printf("TIMING %-32s %8.3f s  (%d rows)%n", n, (System.nanoTime() - t0) / 1e9, c)
      if (explain) df.explain("formatted")
    }
    dumpDir.foreach { out =>
      val json = graft.SparkEntry.oracleSql
        .filter { case (k, _) => names.contains(k) }
        .map { case (k, v) => s"${graft.Jsons.quote(k)}: ${graft.Jsons.quote(v)}" }
        .mkString("{", ",", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/oracle_sql.json"), json)
    }
    spark.stop()
  }
}
