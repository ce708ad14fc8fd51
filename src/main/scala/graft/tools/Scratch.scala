package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch main — not part of the library surface.
  * Usage: runMain graft.tools.Scratch <sfDir> <queryName>... [--explain]
  * Times each named catalog query (count()), optionally dumping the
  * formatted physical plan first.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Conf.local(SparkSession.builder(), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val explain = args.contains("--explain")
    val names = args.drop(1).filterNot(_.startsWith("--"))
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      val df = qs(n)(spark, sfDir)
      if (explain) df.explain("formatted")
      val t0 = System.nanoTime()
      val c = df.count()
      printf("TIMING %-32s %8.3f s  (%d rows)%n", n, (System.nanoTime() - t0) / 1e9, c)
    }
    spark.stop()
  }
}
